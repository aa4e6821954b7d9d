package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + balanced shard assignment — the last
  * step of a training-data pipeline: packed sequences come out of
  * [[Packing.packSequences]] in document-stream order, which correlates
  * adjacent sequences (same language, same source, same crawl slice), and
  * a training run wants them decorrelated and split into equal-sized
  * shard files. This operator gives every row a pseudo-random but fully
  * reproducible position: rank the rows by a seeded hash of their id,
  * then deal them round-robin into `nShards` shards.
  *
  * Output, one row per input row, fully determined by (ids, nShards,
  * salt):
  *   - the id column, passed through
  *   - shard — 0-based shard index; shard sizes differ by at most 1
  *             (round-robin off the global hash rank, so balance is
  *             exact by construction, not probabilistic)
  *   - pos   — 0-based position within the shard, in hash order (the
  *             within-shard read order is itself shuffled)
  *
  * The global rank is the two-phase prefix form [[Packing.packSequences]]
  * uses, NOT a single-partition window: rows are range-partitioned by
  * the hash key, per-partition counts (one tiny row per partition) take
  * a driver-size window for base offsets, and the within-partition
  * row_number plus the broadcast base is the global rank. At 100 TB the
  * only data-sized exchange is the one range layout of (id, hash)
  * pairs — sequence CONTENT never enters this operator; join the result
  * back to the payload (or feed it to a partitionBy("shard") writer) to
  * materialize shard files.
  *
  * Ids MUST be unique — a duplicate id means a duplicated training
  * sequence, so the rank window detects adjacent equal ids (equal ids
  * hash equal, land in one range partition, and sort adjacent) and
  * FAILS LOUDLY (assert_true) instead of silently emitting both.
  */
object Sharding {

  /** Shuffle-shard `rows` by `idCol`. `salt` selects the permutation
    * (an epoch index in training terms: different salt, different
    * order, same exact balance). `reliable = true` materializes the
    * ranked layout via reliable `checkpoint` instead of
    * `localCheckpoint` (the dedupClusters/packSequences trade). The
    * ranked layout (id + hash + pid) stays RESIDENT behind the returned
    * plan — release with [[Materialized.free]] once consumed. */
  def shuffleShards(rows: DataFrame, nShards: Int,
                    idCol: String = "seq_id", salt: Long = 0L,
                    nParts: Int = 0, reliable: Boolean = false): DataFrame = {
    require(nShards > 0, s"nShards $nShards must be positive")
    val sess = rows.sparkSession
    val materialize: DataFrame => DataFrame =
      if (reliable) df => df.checkpoint(true) else df => df.localCheckpoint(true)
    val parts = if (nParts > 0) nParts
      else math.max(sess.sessionState.conf.numShufflePartitions,
        sess.sparkContext.defaultParallelism)
    // md5 hex, not xxhash64: the declared q80 replays this rank in
    // DuckDB value-for-value, and md5-of-the-same-string is the one
    // hash family both engines render identically (the q59/q76
    // convention). Hex strings compare bytewise in both engines'
    // ORDER BY, so the rank order cannot drift. The materialization
    // reasoning is packSequences': repartitionByRange samples
    // boundaries and spark_partition_id is non-deterministic — the
    // phase-1 counts and phase-2 ranks must read ONE layout, not two
    // independent evaluations of it.
    val keyed = materialize(rows.select(col(idCol).as("id"))
      .withColumn("rk", md5(concat_ws(":",
        lit("shuf"), lit(salt), col("id").cast("string"))))
      .repartitionByRange(parts, col("rk"), col("id"))
      .sortWithinPartitions("rk", "id")
      .withColumn("pid", spark_partition_id()))
    // Phase 1: per-partition row counts and their exclusive prefix —
    // the partition's base rank. Window over ≤ `parts` rows.
    val bases = keyed.groupBy(col("pid")).agg(count(lit(1)).as("pn"))
      .withColumn("base",
        coalesce(sum(col("pn")).over(
          Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("pid").as("bpid"), col("base"))
    // Phase 2: within-partition row_number + broadcast base = global
    // 0-based hash rank. The duplicate-id guard folds into the rank the
    // packSequences way, so pruning cannot discard it.
    val ord = Window.partitionBy("pid").orderBy("rk", "id")
    val prevId = lag(col("id"), 1).over(ord)
    val dupGuard = coalesce(
      assert_true(prevId.isNull || prevId =!= col("id"),
        lit(s"shuffleShards: duplicate $idCol — a duplicate id is a duplicated training row"))
        .cast("long"),
      lit(0L))
    val n = lit(nShards.toLong)
    keyed
      .join(broadcast(bases), col("pid") === col("bpid"))
      .withColumn("rank0",
        col("base") + row_number().over(ord).cast("long") - 1 + dupGuard)
      .select(col("id").as(idCol),
        pmod(col("rank0"), n).as("shard"),
        expr(s"rank0 div ${nShards.toLong}").as("pos"))
  }

  /** Shard-level summary — size and id-span per shard, the manifest a
    * training launcher reads: one aggregate over the assignment. */
  def shardStats(sharded: DataFrame, idCol: String = "seq_id"): DataFrame =
    sharded.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
}
