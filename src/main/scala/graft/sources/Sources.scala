package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Source/sink surface beyond the parquet testdata (SURVEY.md §2.1
  * capability rows): CSV/JSON/text readers with explicit schemas,
  * record-oriented text parsing (the reference's XML-dump shape), the
  * partitioned parquet sink, and the JDBC (RDBMS) sink — the north-star
  * "ETL to RDBMS" output path.
  */
object Sources {

  /** CSV with an explicit schema — schema-on-read, no inference pass
    * (an inference pass would read the data twice; at 100 TB that is the
    * difference between one scan and two). */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** JSON-lines with an explicit schema. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSON-lines with malformed-record capture: bad lines land whole in
    * `_corrupt_record` instead of killing the job — at ingest scale some
    * records are ALWAYS malformed, and dropping them silently
    * (DROPMALFORMED) loses the audit trail. Filter `_corrupt_record IS
    * NULL` for the clean stream; route the rest to a quarantine sink. */
  def jsonLinesPermissive(spark: SparkSession, path: String,
                          schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Raw text lines (one row per line). */
  def textLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Native XML source — Spark 4 ships the former spark-xml INSIDE
    * spark-sql (`org.apache.spark.sql.execution.datasources.xml`), so
    * `format("xml")` needs no extra jar. This is the primary reader for
    * the reference's Scopus-dump input shape: one row per `rowTag`
    * element, attributes as `_attr` columns, nested elements as
    * structs/arrays, entities decoded — records may span lines and
    * nest arbitrarily, which the line-oriented [[extractRecords]]
    * fallback cannot represent. Explicit schema for the same
    * single-scan reason as [[csv]]; splitting parallelizes on the
    * rowTag boundary, so a many-record dump file still fans out. */
  def xml(spark: SparkSession, path: String, rowTag: String,
          schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format("xml").option("rowTag", rowTag)
    schema.fold(r)(s => r.schema(s)).load(path)
  }

  /** XML with malformed-record capture, mirroring
    * [[jsonLinesPermissive]]: a record that fails to parse lands whole
    * in `_corrupt_record` instead of killing the 100 TB load. */
  def xmlPermissive(spark: SparkSession, path: String, rowTag: String,
                    schema: StructType): DataFrame =
    spark.read.format("xml")
      .option("rowTag", rowTag)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", StringType))
      .load(path)

  /** Schema-on-read for an XML string column (`from_xml` — the XML twin
    * of [[parseJsonColumn]]): one parse into a typed struct, for dumps
    * that arrive as XML payloads inside another container. */
  def parseXmlColumn(df: DataFrame, column: String, schema: StructType): DataFrame =
    df.withColumn(s"${column}_parsed", from_xml(col(column), schema))

  /** Record-oriented extraction from semi-structured text — the
    * corrupt-tolerant FALLBACK to [[xml]] for dumps too mangled for a
    * real parser (truncated files, interleaved garbage): read lines,
    * filter record boundaries, extract fields with regexp_extract.
    * `fields` maps output column -> regex with one capture group. Only
    * sees single-line records and decodes no entities — prefer the
    * native source wherever the input is well-formed. Stays fully
    * parallel: each task parses its split. */
  def extractRecords(lines: DataFrame, recordFilter: String,
                     fields: Map[String, String]): DataFrame = {
    val base = lines.filter(col("value").rlike(recordFilter))
    fields.foldLeft(base) { case (df, (name, pattern)) =>
      df.withColumn(name, regexp_extract(col("value"), pattern, 1))
    }.drop("value")
  }

  /** Schema-on-read for a JSON string column: `from_json` into a typed
    * struct/map column (the capability twin of q28's `get_json_object` —
    * use this when several fields are needed, one parse instead of N). */
  def parseJsonColumn(df: DataFrame, column: String, schema: StructType): DataFrame =
    df.withColumn(s"${column}_parsed", from_json(col(column), schema))

  /** Partitioned parquet sink — the 100 TB layout: partition by a
    * low-cardinality derived key (e.g. event month) so downstream scans
    * prune partitions, with `maxRecordsPerFile` bounding file sizes. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Upsert (merge) into a keyed parquet dataset — the snapshot-refresh
    * shape: rows from `updates` replace same-key rows in `base`; new
    * keys append. Returns the merged frame; the caller writes it (write
    * to a NEW path / partition and swap — parquet files are immutable,
    * so in-place rewrites of the path being read are not defined).
    * At scale, run per refreshed partition (e.g. by snapshot date) so
    * the rewrite touches only changed partitions; formats with
    * transactional MERGE (Delta/Iceberg) replace the swap step, not the
    * plan shape. Implemented as an anti-join + union: one shuffle of
    * each side on the key. */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val kept = base.join(updates.select(key).withColumnRenamed(key, "__uk"),
      base(key) === col("__uk"), "left_anti")
    kept.unionByName(updates)
  }

  /** SCD Type-2 apply — history-preserving dimension refresh: for each
    * updated key, the current version (valid_to IS NULL) is closed at
    * the update's valid_from, and the update is appended as the new
    * current version. One batch carries at most one version per key
    * (dedupe upstream with keep-last if not). Same cost shape as
    * [[upsert]]: one join on the key + a union. `base` columns:
    * business columns + `valid_from` + `valid_to`; `updates`: business
    * columns + `valid_from`. */
  def scd2Apply(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val validToType = base.schema("valid_to").dataType
    val u = updates.select(col(key).as("__k"), col("valid_from").as("__ts"))
    val closed = base.join(u, base(key) === col("__k"), "left")
      .withColumn("valid_to",
        when(col("__k").isNotNull && col("valid_to").isNull, col("__ts"))
          .otherwise(col("valid_to")))
      .drop("__k", "__ts")
    closed.unionByName(
      updates.withColumn("valid_to", lit(null).cast(validToType)))
  }

  /** Bucketed managed table: pre-shuffles ONCE at write time so every
    * later equi-join/aggregation on the bucket key runs exchange-free —
    * at 100 TB this converts the recurring per-query shuffle of a fact
    * table into a one-time layout cost. Requires `saveAsTable` (bucket
    * metadata lives in the catalog); join two tables bucketed the same
    * way and the plan shows SortMergeJoin with NO Exchange on either
    * side (see the co-located-join spec). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** ORC round-trip (columnar alternative to parquet — Spark ships the
    * ORC reader/writer in core). Same pushdown/pruning properties as the
    * parquet path; useful when the downstream warehouse is ORC-native. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** JDBC sink writer, configured for bulk RDBMS loads: `numPartitions`
    * bounds concurrent connections, `batchsize` amortizes round-trips,
    * and writes should target an idempotent staging table that a final
    * transactional rename promotes (SURVEY.md §7.5). No DB server exists
    * in the sandbox, so this returns the configured writer; `.save()` is
    * the caller's side effect. */
  def jdbcWriter(df: DataFrame, url: String, table: String,
                 user: String, password: String,
                 numPartitions: Int = 8, batchSize: Int = 10000): DataFrameWriter[Row] =
    df.repartition(numPartitions)
      .write.mode("append").format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("numPartitions", numPartitions.toString)
      .option("batchsize", batchSize.toString)
      .option("isolationLevel", "READ_COMMITTED")

  /** Exactly-once JDBC load via stage-validate-swap (SURVEY.md §7.5's
    * missing clause, VERDICT r8 #5). A plain `.save()` that dies mid-way
    * leaves the target half-written, and a blind re-run doubles rows. This
    * writes to `<table>_stg` (overwrite — a partial staging table from a
    * crashed run is simply replaced), validates the landed row count
    * against the source, then promotes staging over the target with
    * DROP + RENAME inside ONE transaction. Any failure before the commit
    * leaves the last fully-validated target untouched, so a re-run after
    * ANY mid-write failure converges to exactly the source rows.
    *
    * Derby (the in-repo test RDBMS) and Postgres have transactional DDL,
    * making the swap atomic; on engines that auto-commit DDL (MySQL) the
    * window shrinks to the rename pair rather than the whole load.
    *
    * `expectedRows` skips the extra source count when the caller already
    * knows it (e.g. just materialized the DataFrame).
    */
  def jdbcStagedWrite(df: DataFrame, url: String, table: String,
                      user: String, password: String,
                      numPartitions: Int = 8, batchSize: Int = 10000,
                      expectedRows: Option[Long] = None): Long = {
    val stg = table + "_stg"
    val expected = expectedRows.getOrElse(df.count())
    df.repartition(numPartitions)
      .write.mode("overwrite").format("jdbc")
      .option("url", url)
      .option("dbtable", stg)
      .option("user", user)
      .option("password", password)
      .option("numPartitions", numPartitions.toString)
      .option("batchsize", batchSize.toString)
      .option("isolationLevel", "READ_COMMITTED")
      .save()
    val props = new java.util.Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val landed = {
        val countSt = conn.createStatement()
        val rs = countSt.executeQuery(s"SELECT COUNT(*) FROM $stg")
        rs.next()
        val n = rs.getLong(1)
        // Derby refuses RENAME while any ResultSet on the table is open.
        rs.close(); countSt.close()
        n
      }
      if (landed != expected)
        throw new IllegalStateException(
          s"staged JDBC load of $table landed $landed rows, expected $expected; " +
            "target left untouched")
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      val meta = conn.getMetaData
      // Unquoted identifiers are case-folded by the engine; look the
      // target up the same way the DDL below will resolve it.
      val targetExists = meta.getTables(null, null, table.toUpperCase, null).next() ||
        meta.getTables(null, null, table, null).next()
      if (targetExists) st.execute(s"DROP TABLE $table")
      st.execute(s"RENAME TABLE $stg TO $table")
      conn.commit()
      landed
    } catch {
      case e: Throwable =>
        try conn.rollback() catch { case _: Throwable => () }
        throw e
    } finally conn.close()
  }
}
