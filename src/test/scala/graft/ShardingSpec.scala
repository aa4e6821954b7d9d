package graft

import org.apache.spark.sql.functions._
import graft.operators.{Packing, Sharding}

/** Sharding.shuffleShards — the pipeline's final shuffle+shard step:
  * exact round-robin balance, permutation semantics (every id exactly
  * once, dense in-shard positions), salt-keyed determinism, and the
  * composition over packSequences' seq_id stream that buildTrainingSet
  * consumers run. */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0L until n.toLong).toDF("doc_id")

  test("round-robin balance is exact and every id appears exactly once") {
    val out = Sharding.shuffleShards(docs(1003), nShards = 8, idCol = "doc_id")
      .collect()
    assert(out.length === 1003)
    assert(out.map(_.getLong(0)).toSet === (0L until 1003L).toSet,
      "an id was lost or duplicated")
    val sizes = out.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(sizes.keySet === (0L until 8L).toSet, s"missing shard: $sizes")
    assert(sizes.values.max - sizes.values.min <= 1,
      s"round-robin balance broken: $sizes")
    // In-shard positions are dense 0..size-1 — a loader can address a
    // shard by position with no gaps.
    out.groupBy(_.getLong(1)).foreach { case (sh, rows) =>
      val ps = rows.map(_.getLong(2)).sorted.toSeq
      assert(ps === (0L until rows.length.toLong), s"shard $sh positions not dense")
    }
  }

  test("salt selects the permutation; same salt reproduces bit-for-bit") {
    def run(salt: Long) =
      Sharding.shuffleShards(docs(400), 4, idCol = "doc_id", salt = salt)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(run(0L) === run(0L), "same salt must reproduce exactly")
    assert(run(0L) !== run(1L), "different salt must permute differently")
    // The shuffle actually decorrelates: reading shard 0 in pos order
    // must not walk ids in ascending order (the corpus-order bias the
    // operator exists to remove).
    val sh0 = run(0L).filter(_._2 == 0L).sortBy(_._3).map(_._1)
    assert(sh0 !== sh0.sorted, "shard stream collapsed to id order")
  }

  test("duplicate ids fail loudly instead of duplicating a training row") {
    val dup = Seq(1L, 2L, 2L, 3L).toDF("doc_id")
    val ex = intercept[Exception] {
      Sharding.shuffleShards(dup, 2, idCol = "doc_id").collect()
    }
    assert(ex.getMessage.contains("duplicate") ||
      Option(ex.getCause).exists(_.getMessage.contains("duplicate")),
      s"wrong failure: ${ex.getMessage}")
  }

  test("nShards = 1 degenerates to a pure shuffle; shardStats summarizes") {
    val out = Sharding.shuffleShards(docs(64), 1, idCol = "doc_id")
    val rows = out.collect()
    assert(rows.forall(_.getLong(1) == 0L))
    assert(rows.map(_.getLong(2)).sorted.toSeq === (0L until 64L))
    val stats = Sharding.shardStats(out, idCol = "doc_id").collect()
    assert(stats.length === 1 && stats(0).getLong(1) === 64L)
    assert(stats(0).getLong(2) === 0L && stats(0).getLong(3) === 63L)
  }

  test("composes over packSequences' seq_id stream (the pipeline seam)") {
    // 100 docs x 7 tokens packed at 32 -> ceil(700/32) = 22 sequences;
    // shard the distinct seq_ids exactly as a training launcher would.
    val corpus = (0L until 100L).map(i => (i, 7L)).toDF("doc_id", "n_tokens")
    val packed = Packing.packSequences(corpus, seqLen = 32L)
    val seqs = packed.select(col("seq_id")).distinct()
    val shardedDf = Sharding.shuffleShards(seqs, 4, idCol = "seq_id")
    val sharded = shardedDf.collect()
    assert(sharded.length === 22)
    assert(sharded.map(_.getLong(0)).toSet === (0L until 22L).toSet)
    val sizes = sharded.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(sizes.values.max - sizes.values.min <= 1, s"unbalanced: $sizes")
    graft.operators.Materialized.free(packed)
    graft.operators.Materialized.free(shardedDf)
  }

  test("shard files: partitionBy(shard) writes one directory per shard") {
    // The operator's claim is that its output FEEDS a shard-file
    // writer — prove the whole path: write the assignment partitioned
    // by shard, read it back, and check the on-disk layout is the
    // training launcher's contract (one directory per shard, every id
    // exactly once, positions intact).
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    try {
      Sharding.shuffleShards(docs(257), 4, idCol = "doc_id")
        .write.partitionBy("shard").mode("overwrite").parquet(dir)
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
      assert(shardDirs.toSeq === (0 until 4).map(i => s"shard=$i"))
      val back = spark.read.parquet(dir)
      assert(back.count() === 257)
      assert(back.select("doc_id").distinct().count() === 257)
      // Partition pruning works on the shard column — a launcher reads
      // ONE shard without touching the others.
      val one = back.filter(col("shard") === 2)
      val scan = one.queryExecution.executedPlan.toString
      assert(one.count() >= 64 && one.count() <= 65)
      assert(scan.contains("PartitionFilters: [isnotnull(shard"),
        s"shard filter not pushed to partition pruning:\n${scan.take(400)}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("the rank is two-phase: no global single-partition sort of the data") {
    // The range layout itself is materialized (localCheckpoint — the
    // packSequences contract), so the returned plan starts at a Scan
    // ExistingRDD; what must be visible downstream is the two-phase
    // shape: the DATA-side rank window partitioned by pid (never an
    // empty partition spec, which would mean a global single-partition
    // sort), and the base offsets arriving by broadcast.
    val df = Sharding.shuffleShards(docs(1000), 8, idCol = "doc_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(pid"),
      s"rank window not pid-partitioned:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"base join not broadcast:\n$plan")
    graft.operators.Materialized.free(df)
  }
}
