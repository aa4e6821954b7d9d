package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * curation (SURVEY.md §2.10 family).
  *
  * Everything here is HASH-decided per row, which is what a 100 TB
  * pipeline actually needs and what `DataFrame.sample()` does not give:
  * `sample()` draws from a seeded per-partition RNG, so its selection
  * changes whenever partitioning does (one extra input file reshuffles
  * everyone's "random" sample and silently changes a train set between
  * runs). A hash of stable row keys is reproducible across runs,
  * partition layouts, Spark versions, and engines — and it is a pure
  * scan-side codegen'd expression: sampling/splitting 100 TB adds zero
  * shuffles.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Keep ~`fraction` of rows, decided by `xxhash64(salt, keys...)`.
    * Same keys + salt → same decision, forever; different salts →
    * independent samples (e.g. salt=1 for a holdout, salt=2 for an eval
    * subsample — overlap is hash-independent, not disjoint). */
  def hashSample(df: DataFrame, keyCols: Seq[String], fraction: Double,
                 salt: Long = 0L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction outside [0,1]")
    val bucket = pmod(xxhash64((lit(salt) +: keyCols.map(col)): _*), lit(Buckets))
    df.filter(bucket < lit((fraction * Buckets).toLong))
  }

  /** Adds a `split` column ("train"/"val"/... per `weights`, which must
    * sum to ~1) by hash bucket over the key columns. Key-stable: a
    * document keeps its split across runs and reshards, and — when
    * keyed on content — duplicate documents land in the SAME split, so
    * near-dup leakage across train/test cannot happen through exact
    * copies. The md5-based declared twin is [[graft.ops.Extended]]'s
    * q50 (DuckDB-oracled); this variant uses xxhash64 (8-byte hash, no
    * hex detour) for production. */
  def assignSplit(df: DataFrame, keyCols: Seq[String],
                  weights: Seq[(String, Double)] =
                    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
                  salt: Long = 0L): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-6,
      "split weights must sum to 1")
    val bucket = pmod(xxhash64((lit(salt) +: keyCols.map(col)): _*), lit(Buckets))
    val thresholds = weights.scanLeft(0.0)(_ + _._2).tail.map(c => (c * Buckets).toLong)
    val split = weights.map(_._1).zip(thresholds).init
      .foldRight(lit(weights.last._1)) { case ((name, upper), acc) =>
        when(bucket < upper, name).otherwise(acc)
      }
    df.withColumn("split", split)
  }

  /** Exactly `min(n, |stratum|)` rows per stratum, chosen by hash order
    * — a deterministic without-replacement "random" sample per group
    * (per-language quotas, per-source caps). One shuffle on the stratum
    * key; the hash order makes the pick independent of input order.
    * The final tie-break orders by EVERY column, so the selection stays
    * partition-invariant even when `keyCols` values repeat within a
    * stratum (duplicate texts are this repo's normal case) — rows that
    * are fully identical are interchangeable, so any pick is the same
    * output. */
  def stratifiedQuota(df: DataFrame, strataCol: String, keyCols: Seq[String],
                      n: Int, salt: Long = 0L): DataFrame = {
    require(n > 0, "quota must be positive")
    val w = Window.partitionBy(strataCol)
      .orderBy((pmod(xxhash64((lit(salt) +: keyCols.map(col)): _*), lit(Buckets))
        +: df.columns.toIndexedSeq.map(col)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
