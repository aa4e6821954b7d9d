package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing probe under the exact bench-session config:
  * `sbt "runMain graft.QProbe q61_fuzzy_join q64_ngram_jaccard"` times
  * just the named queries (warm-up + 5 passes, per-query minimum — the
  * Bench methodology) without paying for the other 63. The per-query
  * A/B loop for a targeted optimization: probe, edit, probe again.
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_SHUFFLE override scale and
  * partitions as in Bench.
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.get("SPARK_GRAFT_SHUFFLE")
          .flatMap(v => scala.util.Try(v.trim.toInt).toOption.filter(_ > 0))
          .getOrElse(4))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q61_fuzzy_join")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val rows = fn(spark, sfDir).count() // warm-up, also prints the pin
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QPROBE $name rows=$rows min=${times.min}%.3f " +
        s"all=${times.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
