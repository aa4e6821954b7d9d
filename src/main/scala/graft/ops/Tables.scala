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

  /** Per-file `ts` encodings under the events path — parquet footers read
    * directly (no Spark job), keyed by the Spark type each file's `ts`
    * surfaces as under this session: `TimestampNTZType` for µs/ms
    * timestamp annotations, `LongType` for ns annotations (via
    * `nanosAsLong`) and for unannotated int64 (the raw-epoch-ns
    * contract). Any other physical shape throws.
    *
    * The other nine tables keep purely explicit schemas; events alone
    * pays the probe because its physical encoding has actually drifted
    * between testdata generations (ns → µs, 2026-08-13) and a blind
    * conversion silently collapsed every timestamp 1000× (round-7
    * postmortem). Footer reads are driver-side and sequential — the same
    * metadata pass Spark's own inference makes; a lake with millions of
    * files would distribute this loop (parallelize the file list, read
    * footers on executors), which changes nothing downstream. */
  private[graft] def eventsTsEncodings(
      s: SparkSession, d: String): Map[DataType, Seq[String]] = {
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
      val ts = try {
        val sch = reader.getFileMetaData.getSchema
        sch.getFields.get(sch.getFieldIndex("ts"))
      } finally reader.close()
      if (ts.isPrimitive && ts.asPrimitiveType.getPrimitiveTypeName == PrimitiveTypeName.INT64) {
        ts.getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            if (t.getUnit == TimeUnit.NANOS) LongType else TimestampNTZType
          case null => LongType // unannotated int64: the raw-epoch-ns contract
          case other => throw new IllegalStateException(
            s"events.ts decoded as int64[$other] in $file — unsupported annotation")
        }
      } else throw new IllegalStateException(
        s"events.ts decoded as $ts in $file — expected a µs/ms timestamp " +
          "or int64 ns. The testdata encoding has drifted again; extend " +
          "Tables.events rather than letting queries run against a misread column.")
    }
  }

  /** Encoding-adaptive events reader. Each footer-probed encoding group
    * (see `eventsTsEncodings`) is normalized to a naive µs timestamp:
    *   - µs/ms timestamp annotations → read as TIMESTAMP_NTZ directly
    *     (naive, matching DuckDB; event-time predicates push down to the
    *     scan — the ns path below can't offer that).
    *   - ns-annotated or raw int64 (surfaced as Long under
    *     `spark.sql.legacy.parquet.nanosAsLong`, which our sessions keep
    *     set for exactly this case) → `ts div 1000` → µs. `div` =
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
      val nsSchema = StructType(base.map(f =>
        if (f.name == "ts") f.copy(dataType = LongType) else f))
      def readNtz(paths: Seq[String]): DataFrame =
        if (paths.isEmpty) sess.read.schema(base).parquet(path)
        else sess.read.schema(base).option("basePath", path).parquet(paths: _*)
      def readNs(paths: Seq[String]): DataFrame = {
        val r = if (paths.isEmpty) sess.read.schema(nsSchema).parquet(path)
                else sess.read.schema(nsSchema).option("basePath", path).parquet(paths: _*)
        r.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      }
      eventsTsEncodings(sess, d).toSeq.sortBy(_._1.typeName) match {
        case Seq((TimestampNTZType, _)) => readNtz(Nil) // whole-directory fast path
        case Seq((LongType, _))         => readNs(Nil)
        case groups if groups.nonEmpty =>
          groups.map {
            case (TimestampNTZType, files) => readNtz(files)
            case (LongType, files)         => readNs(files)
            case (other, files) => throw new IllegalStateException(
              s"events.ts group $other (${files.size} files) has no reader")
          }.reduce(_ unionByName _)
        case _ => throw new IllegalStateException(s"no parquet files under $path")
      }
    })
  }
}
