package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan capture for the optimization rounds: writes each named query's
  * `.explain("formatted")` output to `plans/<tag>/<query>_<suffix>.txt`
  * under the exact bench-session config, so plan-shape claims in
  * OPTIMIZATION_r*.md are reproducible and reviewable without running
  * Spark. Usage:
  *
  *   sbt "runMain graft.PlanDump r17 before all"
  *   sbt "runMain graft.PlanDump r17 after q43_minhash_neardup q60_dedup_clusters"
  *
  * SPARK_GRAFT_SF_DIR overrides the data dir (default sf0.1, the bench
  * scale). Queries whose construction itself runs jobs (q60's clustering
  * loop) still produce a plan — it is the final assembly's plan, noted
  * in the header line.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <tag> <suffix> <query...|all>")
    val tag = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.drop(2).contains("all")) SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    val dir = Paths.get(s"plans/$tag")
    Files.createDirectories(dir)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      try {
        val df = fn(spark, sfDir)
        // queryExecution.explainString is exactly what explain("formatted") prints.
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(dir.resolve(s"${name}_$suffix.txt"),
          s"-- $name @ $sfDir (bench-session config: shuffle=4, AQE off)\n" + txt)
        println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
