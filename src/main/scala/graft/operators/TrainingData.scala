package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end corpus → training-set pipeline, composed from the
  * library's own operators in the order a production curation run uses
  * them:
  *
  *  1. quality filter   — scan-side, first, so every later (joining)
  *                        stage sees fewer rows
  *                        ([[graft.functions.TextFunctions.curate]])
  *  2. exact dedup      — keep-first by content fingerprint
  *  3. near-dup dedup   — MinHash pairs via the mass-routed
  *                        [[Approx.nearDupAuto]], components via
  *                        [[Approx.dedupClusters]], keepers survive
  *  4. decontamination  — 8-gram containment vs a broadcast benchmark
  *                        set (q57's shape); contaminated docs drop
  *  5. mixture sampling — per-group token budgets in deterministic
  *                        hash order ([[Sampling.quotaSampleBudgets]])
  *  6. sequence packing — the surviving stream cut into fixed-length
  *                        sequences ([[Packing.packSequences]])
  *
  * Every stage is deterministic (hash-ordered, seeded, or exact), so
  * the whole pipeline is reproducible bit-for-bit from (corpus,
  * benchmark, parameters) — re-running it cannot silently change a
  * training set. Scale notes live with each operator; nothing here
  * adds a shuffle beyond what the stages themselves declare.
  */
object TrainingData {

  /** `selected`: the surviving documents — (doc_id, lang, n_tokens,
    * cum_before, pick_pos) per [[Sampling.quotaSampleBudgets]].
    * `packed`: the (seq_id, doc_id, doc_offset, seq_offset, slice_len)
    * slice map over the selected stream per [[Packing.packSequences]].
    * Both are backed by materialized layouts — release with
    * [[Materialized.free]] when done. */
  final case class TrainingSet(selected: DataFrame, packed: DataFrame)

  /** Runs the six-stage pipeline over `docs` (doc_id, text, lang).
    * `benchmark` supplies the eval texts to decontaminate against (any
    * DataFrame with a `text` column; pass an empty one to skip).
    * `budgets` maps each lang to its token budget — groups absent from
    * the map are excluded (a mixture is a whitelist). */
  def buildTrainingSet(spark: SparkSession, docs: DataFrame,
                       benchmark: DataFrame, budgets: Map[String, Long],
                       seqLen: Long = 512L, minJaccard: Double = 0.8,
                       maxContamination: Double = 0.0,
                       minQuality: Double = 0.5, maxRepetition: Double = 0.2,
                       minTokens: Int = 10, salt: Long = 0L): TrainingSet = {
    import graft.functions.TextFunctions

    // 1. Quality: curate() scores scan-side; keep survivors' text for
    // the later stages (curate itself returns only features).
    val quality = docs
      .join(TextFunctions.curate(docs, minQuality, maxRepetition, minTokens)
          .filter(col("keep")).select(col("doc_id"), col("n_tokens")),
        "doc_id")

    // 2. Exact dedup, keep-first: one aggregate on the 8-byte content
    // fingerprint — text never shuffles.
    val keepers = quality
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val exactDeduped = quality.join(keepers, "doc_id")

    // 3. Near-dup dedup: the mass-routed MinHash family finds pairs,
    // connected components pick one keeper per near-dup cluster. Docs
    // in no pair keep themselves (left join, null label).
    val pairs = Approx.nearDupAuto(spark, exactDeduped, minJaccard)
      .select(col("a"), col("b"))
    val labels = Approx.dedupClusters(pairs).toDF("cid", "ckeeper")
    val nearDeduped = exactDeduped
      .join(labels, col("doc_id") === col("cid"), "left")
      .filter(col("ckeeper").isNull || col("ckeeper") === col("doc_id"))
      .select(exactDeduped.columns.map(col): _*)

    // 4. Decontamination: per-doc 8-gram containment vs the broadcast
    // benchmark shingle set; docs under the contamination ceiling pass,
    // and docs too short to shingle pass vacuously (no 8-gram of
    // theirs can appear in an eval set).
    val benchShingles = benchmark
      .select(split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 7), i -> array_join(slice(toks, i, 8), ' '))"))
        .as("bsh"))
      .distinct()
    val ratios = nearDeduped
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 7), i -> array_join(slice(toks, i, 8), ' '))"))
        .as("sh"))
      .join(broadcast(benchShingles), col("sh") === col("bsh"), "left")
      .groupBy("doc_id")
      .agg((count(col("bsh")).cast("double") / count(lit(1)).cast("double"))
        .as("contamination"))
    val clean = nearDeduped
      .join(ratios, Seq("doc_id"), "left")
      .filter(coalesce(col("contamination"), lit(0.0)) <= lit(maxContamination))
      .select(nearDeduped.columns.map(col): _*)

    // 5. Mixture: per-lang token budgets in salted-hash order.
    val mixIn = clean.select(col("doc_id"), col("lang"), col("n_tokens"),
      md5(concat_ws(":", lit(salt), col("doc_id").cast("string"))).as("rk"))
    val selected = Sampling.quotaSampleBudgets(mixIn, budgets)

    // 6. Pack the selected stream into fixed-length sequences.
    val packed = Packing.packSequences(
      selected.select(col("doc_id"), col("n_tokens")), seqLen)
    TrainingSet(selected, packed)
  }
}
