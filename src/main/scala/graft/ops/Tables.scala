package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Typed readers for the ten testdata tables (schemas: FIXTURES.md).
  *
  * Load pattern is the harness contract: `spark.read.parquet(s"$sfDir/<t>.parquet")`
  * (TESTDATA.md, SparkEntry). Parquet embeds the schema, so scans get the
  * vectorized reader + pushdown/pruning for free. At 100 TB the same
  * readers work unchanged against a partitioned directory layout
  * (`partitionBy(month)` on write — SURVEY.md §7.5); nothing here assumes
  * a single file.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  /** `events.ts` is parquet timestamp[ns], which Spark's vectorized
    * reader rejects. With `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set by Verify/Bench/Graft sessions) it arrives as LongType ns —
    * convert to a µs TimestampType. The data's jitter is µs-scale
    * (FIXTURES.md: ns%1000 == 0), so the division is lossless. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // timestamp_ntz: naive wall-clock semantics, matching how both
        // engines see the source data — written back without UTC
        // adjustment, as the oracle compare expects.
        // `div` = integral division: `/` would go through DOUBLE, which
        // cannot represent epoch-ns exactly (2^53 < 1.7e18) and yields
        // ±1µs errors.
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
