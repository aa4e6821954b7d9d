package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types._

/** Typed readers for the ten testdata tables (schemas: FIXTURES.md).
  *
  * Load pattern is the harness contract: `spark.read.parquet(s"$sfDir/<t>.parquet")`
  * (TESTDATA.md, SparkEntry). Schemas are passed EXPLICITLY: the tables'
  * shapes are externally fixed, and skipping Spark's footer-inference
  * pass removes a driver-side job per read (~80ms each here; at 100 TB,
  * inference over a large file listing is a full extra metadata pass).
  * The one exception is `events`, whose physical time encoding has
  * drifted between testdata generations — it pays a single cached
  * footer probe (see `events` below).
  * Scans still get the vectorized reader + pushdown/pruning. Nothing
  * here assumes a single file — the same readers work against a
  * `partitionBy` directory layout (SURVEY.md §7.5).
  */
object Tables {

  // Timestamps in the source parquet are NAIVE (no UTC adjustment), so
  // they surface as TIMESTAMP_NTZ — matching how DuckDB reads them.
  private val ntz = TimestampNTZType

  val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType), StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType),
      StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", ntz), StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", ntz))),
    // ts encoding has DRIFTED across testdata generations (timestamp[ns]
    // through 2026-08-12, timestamp[us] since 2026-08-13) — events() below
    // probes the footer once and adapts; this map records the current
    // (µs-native) expectation. Do not hardcode a conversion here again.
    "events" -> StructType(Seq(
      StructField("event_id", LongType), StructField("ts", ntz),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
  )

  // One immutable DataFrame per (session, file): repeated reads of the
  // same path re-list the directory and rebuild the relation (~50ms a
  // call) for an identical logical plan. DataFrames are immutable, so
  // reuse is safe; keyed by session so a stopped session's entries are
  // never served to a new one.
  private val readerCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Drop entries owned by stopped sessions so long-lived processes that
    // cycle SparkSessions don't retain dead DataFrames forever.
    readerCache.keySet.removeIf(_._1.sparkContext.isStopped)
    readerCache.computeIfAbsent((spark, s"$dir/$name.parquet"), { case (s, path) =>
      s.read.schema(schemas(name)).parquet(path)
    })
  }

  /** Name-keyed accessor (the same cached readers as the typed methods
    * below — callers like Graft.registerTables must not re-implement the
    * read and bypass the cache). `events` routes through the
    * encoding-adaptive reader. */
  def table(s: SparkSession, d: String, name: String): DataFrame =
    if (name == "events") events(s, d) else t(s, d, name)

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Any epoch value ≥ this is unambiguously NANOseconds (it would be
    * year 5138+ as µs); raw int64 below it is NOT trusted as ns — see
    * the magnitude guard in `eventsTsEncodings`. 1e17 ns = 1973-03-03. */
  private val MinPlausibleEpochNs = 100000000000000000L

  /** Per-file `ts` encodings under the events path — parquet footers read
    * directly (no Spark job), keyed by the Spark type each file's `ts`
    * surfaces as under this session:
    *   - `TimestampNTZType`: naive (isAdjustedToUTC=false) µs/ms
    *     timestamp annotations;
    *   - `TimestampType`: instant-semantics (isAdjustedToUTC=true) µs/ms
    *     annotations — read as LTZ, then rendered as UTC wall-clock;
    *   - `LongType`: ns annotations (via `nanosAsLong`) and unannotated
    *     int64 whose column statistics are ns-magnitude (the raw-epoch-ns
    *     contract). Unannotated int64 that could be µs/ms/s THROWS —
    *     guessing the unit is exactly how round 7's silent 1000×
    *     collapse happened.
    * Any other physical shape throws.
    *
    * The other nine tables keep purely explicit schemas; events alone
    * pays the probe because its physical encoding has actually drifted
    * between testdata generations (ns → µs, 2026-08-13). Footer reads are
    * driver-side and sequential — the same metadata pass Spark's own
    * inference makes; a lake with millions of files would distribute this
    * loop (parallelize the file list, read footers on executors), which
    * changes nothing downstream. */
  private[graft] def eventsTsEncodings(
      s: SparkSession, d: String): Map[DataType, Seq[String]] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val root = new org.apache.hadoop.fs.Path(s"$d/events.parquet")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(root, /* recursive = */ true)
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (f.isFile && !n.startsWith("_") && !n.startsWith("."))
        files += f.getPath.toString
    }
    files.toSeq.groupBy { file =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(file), s.sparkContext.hadoopConfiguration)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val sch = reader.getFileMetaData.getSchema
        val ts = sch.getFields.get(sch.getFieldIndex("ts"))
        if (!(ts.isPrimitive && ts.asPrimitiveType.getPrimitiveTypeName == PrimitiveTypeName.INT64))
          throw new IllegalStateException(
            s"events.ts decoded as $ts in $file — expected a µs/ms timestamp " +
              "or int64 ns. The testdata encoding has drifted again; extend " +
              "Tables.events rather than letting queries run against a misread column.")
        ts.getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            if (t.getUnit == TimeUnit.NANOS) LongType
            else if (t.isAdjustedToUTC) TimestampType
            else TimestampNTZType
          case null =>
            // Raw int64 has NO declared unit. The contract says epoch-ns,
            // but trusting that blindly is the round-7 failure class — so
            // corroborate with the footer's own column statistics (free,
            // same metadata already in hand) and refuse ambiguous data.
            val tsMax = reader.getFooter.getBlocks.asScala.iterator.flatMap { b =>
              b.getColumns.asScala.find(_.getPath.toDotString == "ts")
                .map(_.getStatistics).filter(st => st != null && st.hasNonNullValue)
                .map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue)
            }.maxOption
            tsMax match {
              case Some(m) if m < MinPlausibleEpochNs => throw new IllegalStateException(
                s"events.ts is unannotated int64 with max value $m in $file — " +
                  "too small to be epoch-ns (would be pre-1973); it is probably " +
                  "epoch-µs/ms/s. Refusing to guess the unit: annotate the column " +
                  "or extend Tables.events with the actual encoding.")
              case _ => LongType // ns-magnitude confirmed (or no stats to refute)
            }
          case other => throw new IllegalStateException(
            s"events.ts decoded as int64[$other] in $file — unsupported annotation")
        }
      } finally reader.close()
    }
  }

  /** Encoding-adaptive events reader. Each footer-probed encoding group
    * (see `eventsTsEncodings`) is normalized to a naive µs timestamp:
    *   - naive µs/ms annotations → read as TIMESTAMP_NTZ directly
    *     (matching DuckDB; event-time predicates push down to the scan —
    *     the ns path below can't offer that);
    *   - instant-semantics (adjusted-to-UTC) µs/ms annotations → read as
    *     TIMESTAMP, cast to NTZ: the stored instants surface as UTC
    *     wall-clock (all engine sessions pin the UTC time zone);
    *   - ns-annotated or stats-corroborated raw int64 (surfaced as Long
    *     under `spark.sql.legacy.parquet.nanosAsLong`, which our sessions
    *     keep set for exactly this case) → `ts div 1000` → µs. `div` =
    *     integral division: `/` would go through DOUBLE, which cannot
    *     represent epoch-ns exactly (2^53 < 1.7e18) and yields ±1µs
    *     errors; the ns data carries only µs-scale jitter, so truncation
    *     is lossless.
    * A single-encoding table (the overwhelmingly common case) reads the
    * directory itself — identical plan to a plain `spark.read.parquet`.
    * A MIXED table — the realistic 100 TB lake shape, where files written
    * across years carry different encodings — unions one normalized scan
    * per group (`basePath` preserves partition columns), instead of
    * failing mid-scan with a low-level converter error or, worse, decoding
    * one group 1000× off. Unknown encodings throw (SchemaDriftSpec). */
  def events(s: SparkSession, d: String): DataFrame = {
    readerCache.keySet.removeIf(_._1.sparkContext.isStopped)
    readerCache.computeIfAbsent((s, s"$d/events.parquet#normalized"), { case (sess, _) =>
      val path = s"$d/events.parquet"
      val base = schemas("events")
      def tsAs(t: DataType) = StructType(base.map(f =>
        if (f.name == "ts") f.copy(dataType = t) else f))
      def read(schema: StructType, paths: Seq[String]): DataFrame =
        if (paths.isEmpty) sess.read.schema(schema).parquet(path)
        else sess.read.schema(schema).option("basePath", path).parquet(paths: _*)
      def readGroup(enc: DataType, paths: Seq[String]): DataFrame = enc match {
        case TimestampNTZType => read(base, paths)
        case TimestampType => read(tsAs(TimestampType), paths)
          .withColumn("ts", col("ts").cast("timestamp_ntz"))
        case LongType => read(tsAs(LongType), paths)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
        case other => throw new IllegalStateException(
          s"events.ts group $other (${paths.size} files) has no reader")
      }
      eventsTsEncodings(sess, d).toSeq.sortBy(_._1.typeName) match {
        case Seq((enc, _)) => readGroup(enc, Nil) // whole-directory fast path
        case groups if groups.nonEmpty =>
          groups.map { case (enc, files) => readGroup(enc, files) }
            .reduce(_ unionByName _)
        case _ => throw new IllegalStateException(s"no parquet files under $path")
      }
    })
  }
}
