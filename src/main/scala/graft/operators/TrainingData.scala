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
  *  3b. substring scrub — optional (`substrK`): duplicated ≥ k-token
  *                        runs cut keep-first across the survivors
  *                        ([[SubstringDedup.scrub]])
  *  4. decontamination  — 8-gram containment vs a broadcast benchmark
  *                        set (q57's shape); contaminated docs drop
  *  5. mixture sampling — per-group token budgets in deterministic
  *                        hash order ([[Sampling.quotaSampleBudgets]])
  *  6. sequence packing — the surviving stream, document-shuffled by a
  *                        fresh salted hash, cut into fixed-length
  *                        sequences ([[Packing.packSequences]] with
  *                        `orderCol`; id-order packing would bake
  *                        corpus adjacency INTO sequences, beyond what
  *                        stage 7's sequence shuffle can undo)
  *  7. shuffle + shard  — the packed sequences dealt into balanced,
  *                        hash-shuffled shard files
  *                        ([[shardTrainingSet]] → [[Sharding
  *                        .shuffleShards]]; separate call — a caller
  *                        re-sharding per epoch re-runs only this)
  *
  * Every stage is deterministic (hash-ordered, seeded, or exact), so
  * the whole pipeline is reproducible bit-for-bit from (corpus,
  * benchmark, parameters) — re-running it cannot silently change a
  * training set. Scale notes live with each operator; nothing here
  * adds a shuffle beyond what the stages themselves declare.
  */
object TrainingData {

  /** Hard ceiling on the DEFAULT IVF fit-sample size (rows). 2M
    * points × the testdata's 64-float embeddings ≈ 512 MB of fit
    * input — comfortably distributed-KMeans-sized — while keeping the
    * default fit cost linear in the corpus once 64·nlist would exceed
    * it (see the stage 4c sizing comment). */
  private val FitSampleCap: Double = 2000000.0

  /** nlist above which the AUTO tree-assign default engages — the edge
    * of the MEASURED flat-vs-tree envelope (round-14 sem_xover smoke):
    * end-to-end semanticDedup walls are at parity through 3M vectors /
    * nlist 4800 (1M: flat 61.7 s vs tree 60.0 s; 3M: 288.1 vs 285.0 —
    * Spark ML's norm-pruned flat transform beats the naive O(N·nlist)
    * model the r13 extrapolation assumed; the NAIVE exact assign does
    * follow that law — mip_assign 10.8 → 97.2 s for 3× data — but the
    * operator's flat path doesn't pay it). Within the envelope flat is
    * EXACT and free, so auto keeps it; beyond it the flat path's
    * pruning effectiveness is unmeasured while the tree's O(N·√nlist)
    * is bounded and its recall trade is pinned (CapabilitySpec), so
    * auto bounds the asymptote. Manual Some(_) always wins. */
  private[operators] val SemTreeAssignNlistThreshold: Int = 4800

  /** The auto rule behind `semTreeAssign = None` — exposed for the
    * plumbing pin in TrainingDataSpec. */
  private[graft] def semTreeAuto(nlist: Int): Boolean =
    nlist > SemTreeAssignNlistThreshold

  /** `selected`: the surviving documents — (doc_id, lang, n_tokens,
    * cum_before, pick_pos) per [[Sampling.quotaSampleBudgets]], plus an
    * `epoch` column (one row per doc × epoch) when the build ran
    * `withReplacement`.
    * `packed`: the (seq_id, doc_id, doc_offset, seq_offset, slice_len)
    * slice map over the selected stream per [[Packing.packSequences]].
    * Both are backed by materialized layouts — release with
    * [[Materialized.free]] when done. */
  final case class TrainingSet(selected: DataFrame, packed: DataFrame)

  /** Runs the six-stage pipeline over `docs` (doc_id, text, lang).
    * `benchmark` supplies the eval texts to decontaminate against (any
    * DataFrame with a `text` column; pass an empty one to skip): a doc
    * is dropped when it contains at least `minBenchContainment` of any
    * single benchmark item's 8-grams — the default drops on ANY shared
    * 8-gram. `budgets` maps each lang to its token budget — groups
    * absent from the map are excluded (a mixture is a whitelist);
    * derive them from measured per-lang counts with
    * [[Sampling.temperatureBudgets]] when the mixture is a temperature
    * law rather than hand-picked numbers.
    *
    * `tokenCounter` is the real-tokenizer seam: a Column over the
    * `text` column — typically [[Tokenizer.tokenCount]] over a
    * BPE-style vocab — that REPLACES the whitespace `n_tokens` for the
    * budgeting stages (mixture fill and sequence packing), so budgets
    * mean tokenizer tokens. It sees the ORIGINAL text: redaction here
    * only feeds the dedup fingerprint (`clean_fp` — so docs differing
    * only in PII dedup together); no redacted text column flows
    * through the pipeline, and a caller whose training tokens are
    * post-redaction should redact BEFORE calling (budgets then count
    * what is actually trained on). The QUALITY gate's `minTokens`
    * stays whitespace-based either way (a text-shape filter, not a
    * budget). Default None keeps the whitespace count: the SELECTED
    * set is then bit-identical to rounds ≤ 10, while the packed slice
    * map is NOT — round 11 switched stage 6 to salted-hash pack order
    * (below), so a regenerated set's sequences cut differently from an
    * archived pre-round-11 one by design.
    *
    * `substrK` activates the optional SUBSTRING scrub as stage 3b
    * (between near-dup dedup and decontamination — see the stage
    * comment): duplicated runs of ≥ substrK tokens are cut keep-first
    * across the surviving corpus, token counts re-derive from the
    * scrubbed text, and docs scrubbed to nothing drop. Default None
    * keeps the stage off and the selected set bit-identical to
    * rounds ≤ 13.
    *
    * `embeddings` (doc_id, embedding) activates the optional SEMANTIC
    * stages 4b/4c between lexical decontam and the mixture (see the
    * stage comment below); `benchmarkEmbeddings` (embedding) is the
    * eval set for stage 4b, `minCosine` the similarity threshold both
    * stages share. The IVF quantizer defaults derive from the measured
    * scale laws — `semNlist` = survivors/625 (constant cell size),
    * `semFitFraction` = a 64-points-per-centroid sample capped at
    * [[FitSampleCap]] rows — and `semTreeAssign` picks the cell-assign
    * implementation: None (default) applies the measured auto rule
    * ([[semTreeAuto]] — exact flat within the proven-parity envelope,
    * the coarse-quantizer tree beyond it), Some(_) forces one arm.
    * Override any of the three for a tuned quantizer.
    *
    * The scored+deduped working set is materialized ONCE (five
    * downstream consumers — the near-dup mass probe, the pair build,
    * the keeper filter, the contamination join, the mixture input —
    * would otherwise each re-run the scoring scan); it and
    * dedupClusters' label checkpoint are FREED before returning, so
    * the only resident blocks are the ones backing the returned
    * DataFrames (release those with [[Materialized.free]]). */
  def buildTrainingSet(spark: SparkSession, docs: DataFrame,
                       benchmark: DataFrame, budgets: Map[String, Long],
                       seqLen: Long = 512L, minJaccard: Double = 0.8,
                       minBenchContainment: Double = 1e-9,
                       minQuality: Double = 0.5, maxRepetition: Double = 0.2,
                       minTokens: Int = 10, salt: Long = 0L,
                       tokenCounter: Option[org.apache.spark.sql.Column] = None,
                       withReplacement: Boolean = false,
                       embeddings: Option[DataFrame] = None,
                       benchmarkEmbeddings: Option[DataFrame] = None,
                       minCosine: Double = 0.35,
                       semNlist: Option[Int] = None,
                       semFitFraction: Option[Double] = None,
                       semTreeAssign: Option[Boolean] = None,
                       substrK: Option[Int] = None): TrainingSet = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions

    // 1+2. Quality scoring scan-side (no self-join — curateColumns
    // keeps the text), then exact dedup keep-first as a window over
    // the post-redaction fingerprint: duplicates differing only in PII
    // dedup together, and the one text-carrying shuffle doubles as the
    // dedup exchange. Materialized: the shared working set.
    val wFp = Window.partitionBy("clean_fp").orderBy("doc_id")
    val exactDeduped =
      TextFunctions.curateColumns(docs, minQuality, maxRepetition, minTokens)
        .filter(col("keep"))
        .withColumn("rn", row_number().over(wFp))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("text"), col("lang"), col("n_tokens"))
        .localCheckpoint(true)

    // 3. Near-dup dedup: the mass-routed MinHash family finds pairs,
    // connected components pick one keeper per near-dup cluster. Docs
    // in no pair keep themselves (left join, null label).
    val pairs = Approx.nearDupAuto(spark, exactDeduped, minJaccard)
      .select(col("a"), col("b"))
    val labels = Approx.dedupClusters(pairs).toDF("cid", "ckeeper")
    val nearDeduped = exactDeduped
      .join(labels, col("doc_id") === col("cid"), "left")
      .filter(col("ckeeper").isNull || col("ckeeper") === col("doc_id"))
      .select(exactDeduped.columns.toIndexedSeq.map(col): _*)

    // 3b. SUBSTRING scrub (round 14, optional — active when `substrK`
    // is set): rewrite each surviving document with its duplicated
    // ≥ k-token runs removed, keep-first across the whole surviving
    // corpus ([[SubstringDedup.scrub]] — Lee et al. 2022's ExactSubstr
    // rationale: document-level dedup cannot see a boilerplate
    // paragraph shared by otherwise-distinct docs). Placed AFTER
    // near-dup dedup (the cheaper document-level stages shrink the
    // window-hash mass first; a near-dup cluster contributes ONE
    // keeper's windows instead of the whole clique's) and BEFORE
    // decontamination (a scrubbed-away passage is no longer trained
    // on, so it should no longer count as contamination). n_tokens is
    // recomputed from the scrubbed text so the budgeting stages count
    // what is actually trained on — same whitespace rule as stage 1's
    // counter. The OPERATOR never drops a doc (q74's convention); the
    // PIPELINE drops docs scrubbed to nothing — a fully-covered doc
    // is pure repetition and carries zero trainable tokens. Default
    // None keeps the stage off and every existing pin bit-identical.
    val afterSubstr = substrK match {
      case None => nearDeduped
      case Some(k) =>
        val scrubbed = SubstringDedup
          .scrub(nearDeduped.select(col("doc_id"), col("text")), k)
          .filter(col("kept_text") =!= "")
          .select(col("doc_id"), col("kept_text"))
        nearDeduped.drop("text", "n_tokens")
          .join(scrubbed, Seq("doc_id"))
          .withColumn("text", col("kept_text")).drop("kept_text")
          .withColumn("n_tokens",
            graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
          .select(nearDeduped.columns.toIndexedSeq.map(col): _*)
    }

    // 4. Decontamination via the library's own containment operator
    // (robust \s+ tokenization with empty-token filtering and the
    // full-shingle guard — a benchmark passage split across a newline
    // or double space still matches): drop every doc that contains
    // ≥ minBenchContainment of some benchmark item's 8-grams. Bench
    // ids are content hashes, so the stage stays deterministic for
    // any benchmark row order.
    val benchIds = benchmark.select(col("text")).distinct()
      .select(xxhash64(col("text")).as("doc_id"), col("text"))
    val contaminated = Approx.ngramContamination(spark,
        afterSubstr.select(col("doc_id"), col("text")), benchIds,
        n = 8, minContainment = minBenchContainment)
      .select(col("doc_id")).distinct()
    val lexClean = afterSubstr.join(contaminated, Seq("doc_id"), "left_anti")

    // 4b+4c. SEMANTIC stages (round 13, optional — active only when an
    // `embeddings` frame (doc_id, embedding) is supplied): first
    // semantic decontamination (q87's shape — drop survivors whose
    // embedding lands within `minCosine` of ANY `benchmarkEmbeddings`
    // vector; benchmark broadcasts, corpus streams scan-side), then
    // semantic dedup (q66's production sampled-fit IVF path; keeper =
    // min doc_id, the pipeline's keep-first convention). Docs WITHOUT
    // a vector pass through unjudged — absence of an embedding is not
    // evidence of redundancy. Both stages run on the lexically-clean
    // survivors only, so the embedding work is bounded by what
    // earlier, cheaper stages already kept.
    var semWorkingSet: DataFrame = null
    val clean = embeddings match {
      case None => lexClean
      case Some(embAll) =>
        val dot = (a: String, b: String) =>
          graft.expressions.GraftFunctions.floatDot(spark, a, b)
        val emb = embAll.select(col("doc_id"), col("embedding"))
          .join(lexClean.select(col("doc_id")), Seq("doc_id"))
        val afterDecon = benchmarkEmbeddings match {
          case None => emb
          case Some(bench) =>
            val b = broadcast(bench.select(col("embedding").as("be"))
              .withColumn("bnorm", sqrt(dot("be", "be")).cast("float"))
              .filter(col("bnorm") > 0))
            val sim = (dot("be", "embedding") /
              (col("bnorm") * col("cnorm"))).cast("float")
            val hits = emb
              .withColumn("cnorm", sqrt(dot("embedding", "embedding")).cast("float"))
              .filter(col("cnorm") > 0)
              .crossJoin(b)
              .filter(round(sim, 4) >= lit(minCosine.toFloat))
              .select(col("doc_id")).distinct()
            emb.join(hits, Seq("doc_id"), "left_anti")
        }
        // Materialize the survivor set before the IVF fit: KMeans
        // persists its input, and computing those cache blocks through
        // this point's long join lineage (lexical stages → anti-joins)
        // trips Spark's sorter-spill NPE under memory pressure at the
        // 100× smoke scale — from checkpoint blocks the fit reads the
        // same shape the standalone semantic_dedup smoke proved.
        // An empty decontam survivor set is legal (every vectored doc
        // matched the benchmark — τ too loose for the embedding
        // distribution, or a genuinely contaminated batch); the IVF
        // fit cannot run on zero rows, and "no survivors" needs no
        // dedup anyway.
        semWorkingSet = afterDecon.localCheckpoint(true)
        // The IVF quantizer must SCALE with the survivor count or the
        // within-cell pairing degenerates toward all-pairs: at the 100×
        // smoke (~440k survivor vectors) semanticDedup's nlist=8
        // default means ~N²/8 scored pairs — the first cut of this
        // stage sat in exactly that join. The standalone smoke's
        // measured laws apply verbatim: constant ~625-vector cells
        // (nlist = N/625, the O(N) pair mass the 10×→300× decade
        // held), and a BOUNDED fit sample (the full-corpus Lloyd's
        // fit is the other superlinear term — O(N·nlist) with
        // nlist ∝ N). The sample targets 64 points/centroid (floor
        // 50k) but is CAPPED at FitSampleCap: under the nlist ∝ N law,
        // 64·nlist alone is ~10.24% of N — a proportional sample whose
        // fit cost stays O(N²·0.1024/625) forever; the cap makes the
        // default fit O(FitSampleCap·nlist) = linear in N past ~20M
        // survivors, at the price of fewer points per centroid on
        // enormous corpora (acceptable for a dedup quantizer — the
        // cells only partition space, recall rides the within-cell
        // pairing). The count is a cached-block scan of the checkpoint
        // just taken. Callers with a tuned quantizer override both
        // via semNlist/semFitFraction.
        val nVec = semWorkingSet.count()
        val keepers =
          if (nVec == 0L) semWorkingSet.select(col("doc_id"))
          else {
            val nlist = semNlist.getOrElse(
              math.min(1 << 20, math.max(8L, nVec / 625L)).toInt)
            val fitFrac = semFitFraction.getOrElse(
              math.min(1.0,
                math.min(FitSampleCap, math.max(50000.0, 64.0 * nlist)) / nVec))
            // semTreeAssign: None = the MEASURED auto rule — exact
            // flat assign inside the envelope where flat and tree
            // walls are proven tied (nlist <= 4800 / ~3M survivors,
            // the round-14 sem_xover smoke), the coarse-quantizer
            // tree's bounded O(N·√nlist) beyond it (at the pinned
            // boundary-pair recall trade). Some(_) overrides either
            // way (see SemTreeAssignNlistThreshold's derivation).
            Approx.semanticDedup(
                semWorkingSet.select(col("doc_id").as("vec_id"), col("embedding")),
                minSim = minCosine, nlist = nlist, fitFraction = fitFrac,
                treeAssign = semTreeAssign.getOrElse(semTreeAuto(nlist)))
              .filter(col("is_keeper"))
              .select(col("vec_id").as("doc_id"))
          }
        lexClean.join(emb.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .unionByName(lexClean.join(keepers, Seq("doc_id"), "left_semi"))
    }

    // 5. Mixture: per-lang token budgets in salted-hash order. The
    // pluggable counter evaluates here — scan-side over the surviving
    // docs' text, so a codegen'd vocab count adds zero shuffles and
    // only runs on rows that cleared dedup + decontamination.
    val counted = tokenCounter match {
      case Some(c) => clean.withColumn("n_tokens", c.cast("long"))
      case None => clean
    }
    val mixIn = counted.select(col("doc_id"), col("lang"), col("n_tokens"),
      md5(concat_ws(":", lit(salt), col("doc_id").cast("string"))).as("rk"))
    // withReplacement routes through the epoch-repeat fill
    // (quotaSampleEpochs): a group whose budget exceeds its surviving
    // mass repeats its documents across epochs instead of silently
    // capping at one pass — `selected` then carries an extra `epoch`
    // column and one row per (doc, epoch).
    val selected =
      if (withReplacement) Sampling.quotaSampleEpochs(mixIn, budgets)
      else Sampling.quotaSampleBudgets(mixIn, budgets)

    // 6. Pack the selected stream into fixed-length sequences — in a
    // FRESH salted-hash order, not doc_id order: id-order packing puts
    // corpus-adjacent documents (same language, same source run) into
    // the same sequence, a within-sequence correlation stage 7's
    // sequence-level shuffle can never undo. The "pack" prefix
    // decorrelates this order from the mixture's fill order (same
    // salt, different stream), and determinism is untouched. With
    // replacement the hash keys (doc, epoch), so each repeated copy
    // owns its own stream slot (packSequences' per-order-key
    // uniqueness) and the copies scatter across the stream instead of
    // sitting adjacent.
    val packKey =
      if (withReplacement)
        md5(concat_ws(":", lit(salt), lit("pack"),
          col("doc_id").cast("string"), col("epoch").cast("string")))
      else
        md5(concat_ws(":", lit(salt), lit("pack"),
          col("doc_id").cast("string")))
    val packed = Packing.packSequences(
      selected.select(col("doc_id"), col("n_tokens"), packKey.as("prk")),
      seqLen, orderCol = "prk")

    // Both returned frames are backed by their own (quotaSample /
    // packSequences) checkpoints by now; the upstream working set and
    // the clustering labels are dead weight — free them here rather
    // than leaking one O(corpus) block per build (the degradation
    // Materialized.free exists to prevent).
    Materialized.free(labels)
    Materialized.free(exactDeduped)
    if (semWorkingSet != null) Materialized.free(semWorkingSet)
    TrainingSet(selected, packed)
  }

  /** Stage 7 — shuffle + shard the packed sequences for a training
    * launcher: [[Sharding.shuffleShards]] over the packed map's
    * distinct seq_ids (salt = epoch), joined back to the slice map so
    * every slice row carries its (shard, pos) address. The join
    * broadcasts the assignment when it fits and hash-joins on seq_id
    * otherwise — either way the slice payload moves at most once, and
    * a `partitionBy("shard")` writer downstream produces the shard
    * files. One row per input slice row, in any shard exactly the
    * sequences the rank assigns — deterministic from (packed, nShards,
    * salt) like every other stage. */
  def shardTrainingSet(packed: DataFrame, nShards: Int,
                       salt: Long = 0L): DataFrame = {
    val assignment = Sharding.shuffleShards(
      packed.select(col("seq_id")).distinct(), nShards,
      idCol = "seq_id", salt = salt)
    packed.join(assignment, Seq("seq_id"))
  }
}
