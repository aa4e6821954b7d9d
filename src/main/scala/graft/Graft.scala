package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Tables

/** User-facing entry points: a tuned SparkSession builder, table
  * registration for SQL access, and the full named-operator catalog.
  *
  * A user of the reference engine switches by pointing `session()` at
  * their data directory: every relational/ETL/event/LLM-pipeline operator
  * is available either as a named builder (`Graft.query("q38_star_denorm")`)
  * or as plain Spark SQL over the registered tables — the engine is
  * Catalyst end-to-end, so arbitrary SQL composes with the operator
  * library for free.
  */
object Graft {

  /** Session with the engine's required/recommended settings. `threads`
    * <= 0 means use all cores (on a cluster, drop `.master` and submit
    * normally — only the three SQL confs are load-bearing). */
  def session(appName: String = "graft", threads: Int = 0,
              shufflePartitions: Int = 0): SparkSession = {
    val n = if (threads > 0) threads else Runtime.getRuntime.availableProcessors
    val sp = if (shufflePartitions > 0) shufflePartitions else n
    val spark = SparkSession.builder()
      .master(s"local[$n]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sp)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Write timestamps as annotated µs, not legacy INT96: outputs stay
      // readable by DuckDB/pyarrow AND by our own encoding-adaptive
      // events reader without a third branch.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.expressions.GraftFunctions.register(spark)
    spark
  }

  /** Registers the ten tables of `dir` as temp views for Spark SQL:
    * `spark.sql("SELECT ... FROM lineitem JOIN orders ...")`. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    // Through Tables.table, not a re-implemented read: the accessors
    // carry the per-session reader cache and the encoding-adaptive
    // events normalization, and stay the single place the load pattern
    // lives.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings", "events").foreach { t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
    // The native functions (float_dot, sorted_intersect_size) ride along
    // for SQL users — sessions built outside Graft.session/GraftExtensions
    // would otherwise miss them.
    graft.expressions.GraftFunctions.register(spark)
  }

  /** The named-operator catalog (SURVEY.md §2). */
  def operators: Seq[String] = SparkEntry.queries.keys.toSeq.sorted

  /** Runs a named operator against a data directory. */
  def query(name: String)(spark: SparkSession, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)
}
