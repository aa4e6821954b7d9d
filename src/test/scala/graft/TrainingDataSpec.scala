package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingData

/** End-to-end training-set pipeline: stage semantics verified on the
  * real sf0.01 documents table — contaminated docs dropped, duplicates
  * collapsed, budgets respected, packing conserves tokens, and the
  * whole run reproduces bit-for-bit.
  */
class TrainingDataSpec extends SparkSpec {

  private lazy val docs = graft.ops.Tables.documents(spark, sf001)
    .select("doc_id", "text", "lang")
  // Benchmark = the first ten documents' texts: every one of their
  // 8-grams is "an eval question", so those docs (and any doc sharing
  // an 8-gram) must be decontaminated away.
  private lazy val benchmark = docs.filter(col("doc_id") < 10).select("text")
  private val budgets = Map("en" -> 3000L, "de" -> 1500L, "es" -> 1500L,
    "fr" -> 1500L, "zh" -> 1500L)

  private lazy val ts = TrainingData.buildTrainingSet(
    spark, docs, benchmark, budgets, seqLen = 256L)
  private lazy val selected = ts.selected.collect()

  test("pipeline survives to a non-empty packed training set") {
    assert(selected.length > 50)
    assert(ts.packed.count() > 0)
  }

  test("contaminated documents are gone") {
    val picked = selected.map(_.getLong(0)).toSet
    assert((0L until 10L).forall(id => !picked.contains(id)),
      "benchmark-source docs must be dropped by decontamination")
  }

  test("no two selected documents share text") {
    val texts = docs.join(
        ts.selected.select("doc_id"), "doc_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("text")).as("d"))
      .head()
    assert(texts.getLong(0) === texts.getLong(1))
  }

  test("every language stays within its token budget (+ one overshoot doc)") {
    selected.groupBy(_.getString(1)).foreach { case (lang, rows) =>
      val mass = rows.map(_.getLong(2)).sum
      val last = rows.maxBy(_.getLong(4)).getLong(2)
      assert(mass - last < budgets(lang),
        s"$lang kept $mass tokens against budget ${budgets(lang)}")
    }
  }

  test("packing conserves the selected token stream exactly") {
    val selTokens = selected.map(_.getLong(2)).sum
    val packTokens = ts.packed.agg(sum(col("slice_len"))).head().getLong(0)
    assert(packTokens === selTokens)
    // Full sequences tile exactly; the final one holds the remainder.
    val perSeq = ts.packed.groupBy("seq_id").agg(sum(col("slice_len")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(perSeq.init.forall(_._2 == 256L))
    assert(perSeq.last._2 === (if (selTokens % 256 == 0) 256L else selTokens % 256))
  }

  test("the pipeline is reproducible bit-for-bit") {
    val again = TrainingData.buildTrainingSet(
        spark, docs, benchmark, budgets, seqLen = 256L)
      .selected.collect()
    assert(again.map(r => (r.getLong(0), r.getLong(4))).sortBy(_._1).toSeq ===
      selected.map(r => (r.getLong(0), r.getLong(4))).sortBy(_._1).toSeq)
  }

  test("stage 6 packs a document-shuffled stream, not id order") {
    // The packed stream must follow the fresh pack hash: sequences
    // would otherwise inherit corpus adjacency (language/source runs)
    // that stage 7's sequence-level shuffle cannot undo. With ~190
    // selected docs, id-order packing would make nearly every adjacent
    // slice pair consecutive ids; the hash order makes that vanishingly
    // rare (deterministic here: same salt, same corpus, same chain).
    val chains = ts.packed.collect()
      .groupBy(_.getLong(0)).values
      .map(_.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq)
    val pairs = chains.flatMap(c => c.zip(c.tail)).toSeq
    assert(pairs.nonEmpty)
    val consecutive = pairs.count { case (a, b) => b == a + 1 }
    assert(consecutive.toDouble / pairs.size < 0.2,
      s"packed stream still id-ordered: $consecutive/${pairs.size} consecutive")
  }

  test("withReplacement: an over-mass budget fills by repeating data") {
    // zh's surviving corpus is a few thousand whitespace tokens; a
    // 30k budget can only fill by repetition. Without replacement the
    // fill silently caps at one pass; with it the budget is MET
    // (within one straddling doc) and epochs appear.
    val budgets = Map("zh" -> 30000L)
    val wr = TrainingData.buildTrainingSet(
      spark, docs, benchmark, budgets, seqLen = 256L, withReplacement = true)
    val rows = wr.selected.collect()
    assert(rows.nonEmpty && rows.forall(_.getString(1) == "zh"))
    val mass = rows.map(_.getLong(2)).sum
    val maxDoc = rows.map(_.getLong(2)).max
    assert(mass >= 30000L && mass < 30000L + maxDoc,
      s"with-replacement fill missed the budget: $mass")
    val epochs = wr.selected.select("epoch").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(epochs.length > 1, s"no repetition despite over-mass budget: $epochs")
    // Packing conserves the REPEATED stream (every copy packed), and
    // the copies' stream slots are their own: total packed tokens equal
    // the epoch-expanded mass, not the distinct-doc mass.
    val packTokens = wr.packed.agg(sum(col("slice_len"))).head().getLong(0)
    assert(packTokens === mass)
    // Reproducible like the without-replacement path.
    val again = TrainingData.buildTrainingSet(
        spark, docs, benchmark, budgets, seqLen = 256L, withReplacement = true)
      .selected.collect().map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    assert(again === rows.map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq)
  }

  test("stage 7: sharding addresses every slice, balanced and complete") {
    val sharded = TrainingData.shardTrainingSet(ts.packed, nShards = 4)
    val rows = sharded.select("seq_id", "shard", "pos", "doc_id", "slice_len")
      .collect()
    // Every packed slice row survives with exactly one (shard, pos)
    // address, and the token mass is untouched.
    assert(rows.length === ts.packed.count())
    assert(rows.map(_.getLong(4)).sum ===
      ts.packed.agg(sum(col("slice_len"))).head().getLong(0))
    // A sequence has ONE address (all its slices agree), shards are
    // balanced to +-1 over sequences, and within a shard the positions
    // are dense.
    val bySeq = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getLong(2))).distinct).toMap
    assert(bySeq.values.forall(_.length == 1), "a sequence split across shards")
    val perShard = bySeq.values.map(_.head).groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sorted).toMap
    assert(perShard.values.map(_.length).max -
      perShard.values.map(_.length).min <= 1, "shards unbalanced")
    perShard.foreach { case (sh, ps) =>
      assert(ps === (0L until ps.length.toLong), s"shard $sh positions not dense")
    }
    // Different epoch salt -> different permutation of the same set.
    val epoch1 = TrainingData.shardTrainingSet(ts.packed, 4, salt = 1L)
      .select("seq_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(epoch1.map(_._1) === bySeq.keySet)
    assert(epoch1 !== rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      "epoch salt did not change the shard order")
  }
}
