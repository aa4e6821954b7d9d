package graft

import org.apache.spark.sql.functions._

import graft.ops.Extended

/** Edge-corpus hardening for the text/near-dup family: the testdata's
  * documents are well-formed 400-char paragraphs, so the degenerate
  * shapes — empty text, whitespace-only, single token, consecutive
  * spaces, exact duplicates — never exercise the `size(toks) > 0`
  * guards, the bigram slice arithmetic, or the signature folds. This
  * spec runs the document-driven queries against a synthetic corpus
  * made of exactly those shapes and pins the semantics:
  * empty/whitespace docs drop out of signature queries without
  * crashing, exact duplicates pair at Hamming 0 / Jaccard 1, and only
  * docs with at least one adjacent non-empty token pair appear in the
  * LM score.
  */
class EdgeCorpusSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_edge").toString
    val docs = Seq(
      (0L, "", "en", "synth", 0L),                                // empty
      (1L, "   ", "en", "synth", 3L),                             // whitespace only
      (2L, "solitary", "en", "synth", 8L),                        // single token
      (3L, "alpha  beta   gamma", "en", "synth", 19L),            // multi-space runs
      (4L, "the quick brown fox jumps over the lazy dog", "en", "synth", 44L),
      (5L, "the quick brown fox jumps over the lazy dog", "en", "synth", 44L), // exact dup of 4
      (6L, "the quick brown fox jumps over the lazy cat", "en", "synth", 44L)  // near dup of 4
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q58 SimHash: degenerate docs drop out; exact duplicates pair at Hamming 0") {
    val rows = Extended.q58SimhashMd5(spark, dir).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // 0 ("" splits to [""], filtered empty) and 1 (whitespace tokens
    // filtered) have no signature; they must appear in no pair.
    assert(!pairs.exists(p => Set(p._1, p._2).exists(Set(0L, 1L))),
      s"empty/whitespace docs leaked into SimHash pairs: $pairs")
    assert(pairs.exists(p => p._1 == 4L && p._2 == 5L && p._3 == 0),
      s"exact duplicates 4/5 missing or nonzero Hamming: $pairs")
  }

  test("q59 MinHash: exact duplicates score Jaccard 1.0; banding finds the 8/9-token near-dup") {
    val rows = Extended.q59MinhashMd5(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows.get((4L, 5L)).contains(1.0),
      s"exact duplicates 4/5 missing or J != 1: $rows")
    // 4 vs 6 share 8 of 9 distinct tokens: J = 8/10 = 0.8, exactly at
    // the threshold — included IF one of the 4 bands matched (identical
    // minhashes for 4/5 guarantee their pair; 4/6 depends on banding
    // luck, so only the score is pinned when present).
    rows.get((4L, 6L)).foreach(j => assert(j == 0.8, s"J(4,6) = $j, expected 0.8"))
    assert(!rows.keys.exists(k => Set(k._1, k._2).exists(Set(0L, 1L))),
      "empty/whitespace docs leaked into MinHash pairs")
  }

  test("q69/q70: degenerate docs flow through mixture sampling and vocab counting") {
    // q70: exactly one row per doc; empty/whitespace docs count 0;
    // exact duplicates count equally; multi-space runs are invariant
    // (doc 3 re-counted single-spaced must match).
    val counts = Extended.q70VocabTokens(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.size === 7)
    assert(counts(0L) === 0L && counts(1L) === 0L,
      s"empty/whitespace docs must count 0: $counts")
    assert(counts(4L) === counts(5L), "exact duplicates must count equally")
    assert(counts(2L) > 0L && counts(3L) > 0L)
    import spark.implicits._
    val singleSpaced = Seq("alpha beta gamma").toDF("text")
      .select(graft.operators.Tokenizer.tokenCount(spark,
        Extended.Q70Vocab, col("text")).as("n")).as[Long].head()
    assert(counts(3L) === singleSpaced, "whitespace-run shape changed the count")

    // q69: every doc is "en" (budget 3000, far above this corpus's
    // mass) — all 7 rows kept, and the fill invariants hold even with
    // the 0-token docs in the stream: cum_before advances by EXACTLY
    // the previous pick's n_tokens (0-token docs occupy a pick_pos
    // without moving the running sum).
    val picked = Extended.q69MixtureBudgets(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._4)
    assert(picked.length === 7)
    assert(picked.map(_._4).toSeq === (1L to 7L))
    picked.sliding(2).foreach {
      case Array(prev, cur) =>
        assert(cur._3 === prev._3 + prev._2,
          s"cum_before must advance by the previous n_tokens: $prev -> $cur")
      case _ =>
    }
  }

  test("q72/q73/q74: degenerate docs through segmentation, repetition, and scrubbing") {
    // q72: token-less docs emit NO rows (posexplode of an empty array),
    // and each doc's id-stream length equals q70's count — the
    // size==count invariant on the shapes the real corpus never has.
    val counts = Extended.q70VocabTokens(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streams = Extended.q72VocabTokenIds(spark, dir).collect()
      .map(r => r.getLong(0)).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(!streams.contains(0L) && !streams.contains(1L),
      s"token-less docs leaked segmentation rows: $streams")
    (2L to 6L).foreach { id =>
      assert(streams.getOrElse(id, 0L) === counts(id),
        s"doc $id: stream length != q70 count")
    }

    // q73: one row per doc INCLUDING token-less ones (zero-guards);
    // worked fractions on doc 4 ("the" appears twice in 9 tokens).
    val rep = Extended.q73RepetitionStats(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(rep.keySet === (0L to 6L).toSet)
    assert(rep(0L) === ((0L, 0.0, 0.0, 0.0)) && rep(1L) === ((0L, 0.0, 0.0, 0.0)),
      s"token-less docs must zero-guard: $rep")
    assert(rep(2L) === ((1L, 0.0, 1.0, 0.0)),
      s"single-token doc: mode covers everything, no dup bigrams: ${rep(2L)}")
    assert(rep(3L) === ((3L, 0.0, 0.3333, 0.0)),
      s"multi-space runs must not create empty tokens: ${rep(3L)}")
    assert(rep(4L) === ((9L, 0.1111, 0.2222, 0.0)),
      s"doc 4: 1 repeat of 9, mode 2/9, all bigrams distinct: ${rep(4L)}")
    assert(rep(4L) === rep(5L), "exact duplicates must score identically")

    // q74: df on this corpus — every doc-4 word except dog/cat has
    // df 3; ties break by the word, so the boilerplate set is exactly
    // {brown, fox, jumps, lazy, over}. Token-less docs are OUT of the
    // output domain; the rewrite single-spaces multi-space runs.
    val scrub = Extended.q74BoilerplateScrub(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(scrub.keySet === (2L to 6L).toSet,
      s"q74 domain must be docs with >= 1 token: ${scrub.keySet}")
    assert(scrub(2L) === ((0L, "solitary")))
    assert(scrub(3L) === ((0L, "alpha beta gamma")),
      s"multi-space runs single-space in the rewrite: ${scrub(3L)}")
    assert(scrub(4L) === ((5L, "the quick the dog")), s"doc 4 scrub: ${scrub(4L)}")
    assert(scrub(6L) === ((5L, "the quick the cat")), s"doc 6 scrub: ${scrub(6L)}")
    assert(scrub(4L)._1 === scrub(5L)._1 && scrub(5L)._2 === "the quick the dog")
  }

  test("q80/q81/q82: degenerate docs through sharding, capping, epochs") {
    // q80: sharding is id-driven — every doc (including empty/
    // whitespace) gets exactly one (shard, pos); the permutation covers
    // the corpus regardless of text shape.
    val sharded = Extended.q80ShardShuffle(spark, dir).collect()
    assert(sharded.length === 7)
    assert(sharded.map(_.getLong(0)).toSet === (0L until 7L).toSet)
    val pos = sharded.map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(pos.size === 7, s"duplicate (shard, pos) address: $pos")

    // q81: all 7 docs share one source; cap 15 > 7 keeps everything
    // with dense ranks — the cap must not invent or drop rows on a
    // tiny group.
    val capped = Extended.q81SourceCap(spark, dir).collect()
    assert(capped.length === 7)
    assert(capped.map(_.getLong(2)).sorted.toSeq === (1L to 7L))

    // q82: the en budgets (4000) dwarf this corpus's ~23-token mass ->
    // every lang present in the budget map upsamples; the 0-token docs
    // ride inside full epochs (they occupy stream slots with no
    // tokens) and the per-epoch doc set is IDENTICAL for full epochs.
    val ep = Extended.q82EpochMixture(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    val byEpoch = ep.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val fullEpochs = byEpoch.keys.max
    assert(fullEpochs >= 1, s"over-mass budget produced no repetition: $byEpoch")
    (0L until fullEpochs).foreach { e =>
      assert(byEpoch(e) === (0L until 7L).toSet,
        s"full epoch $e must hold every doc (0-token docs included): ${byEpoch(e)}")
    }
  }

  test("q62 LM score: only docs with an adjacent non-empty token pair are scored") {
    val rows = Extended.q62LmBigramScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 0 (no tokens), 1 (no non-empty tokens), 2 (one token — no
    // adjacent pair) are unscoreable. doc 3's multi-space runs yield
    // empty tokens BETWEEN words: "alpha  beta" has no ADJACENT
    // non-empty pair at all (every neighbour of a word is ''), so 3 is
    // unscoreable too — the q56 bigram convention, pinned here.
    assert(rows.keySet === Set(4L, 5L, 6L), s"unexpected scored set: $rows")
    assert(rows(4L) === 8L, s"doc 4 should have 8 bigrams, got ${rows(4L)}")
    // identical docs get identical n_bigrams (scores share the corpus
    // model, so equality of counts is the invariant worth pinning)
    assert(rows(4L) === rows(5L))
  }

  test("q60 clustering groups the duplicate family into one component") {
    val rows = Extended.q60DedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // The component is exactly the q59 pair graph's nodes: always
    // {4, 5}, plus 6 iff banding surfaced the 0.8-threshold pair.
    val nodes = rows.map(_._1).toSet
    assert(nodes.contains(4L) && nodes.contains(5L), s"4/5 missing from components: $rows")
    rows.foreach { case (_, keeper, size) =>
      assert(keeper == 4L, s"min-label keeper should be 4: $rows")
      assert(size == nodes.size, s"component size mismatch: $rows")
    }
  }

  test("semanticDedup: zero vectors stay singletons (NaN cosine never matches)") {
    // A zero-norm embedding makes every cosine against it 0/0 = NaN;
    // the threshold filter must drop those pairs (NaN >= t is false, the
    // SQL convention), never propagate NaN into the keeper map — and
    // identical non-zero vectors must still cluster across it.
    import spark.implicits._
    val emb = Seq(
      (0L, Array.fill(8)(0.0f)),                         // zero vector
      (1L, Array.fill(8)(0.0f)),                         // second zero vector
      (2L, Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)),       // base
      (3L, Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)),       // exact dup of 2
      (4L, Array(-1f, -2f, -3f, -4f, -5f, -6f, -7f, -8f)) // antipode of 2
    ).toDF("vec_id", "embedding")
    val rows = graft.operators.Approx.semanticDedup(emb, minSim = 0.95, nlist = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(rows.keySet === Set(0L, 1L, 2L, 3L, 4L))
    assert(rows(0L) === ((0L, 1L, true)), "zero vector must keep itself")
    assert(rows(1L) === ((1L, 1L, true)), "zero vectors must not pair with each other")
    assert(rows(2L) === ((2L, 2L, true)) && rows(3L) === ((2L, 2L, false)),
      "exact duplicates must cluster to the min id")
    assert(rows(4L) === ((4L, 1L, true)), "antipodal vector (cosine -1) stays a singleton")
  }

  test("incrementalSemanticDedup: empty increment and empty index both degrade cleanly") {
    // The shapes a daily ingest actually produces: a quiet day (empty
    // batch — also every idle microbatch of the streaming twin) must
    // yield zero verdicts without touching the index; a FIRST-day
    // screen (empty index) must still dedup the batch against itself
    // (dup_new/keep only — there is no "old" to be a duplicate of).
    import spark.implicits._
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val vecs = Seq(
      (10L, Array(1f, 0f)), (20L, Array(1f, 0f)), (30L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val empty = vecs.filter(lit(false))
    val idx = graft.operators.Approx.buildSemanticIndex(vecs, cents)
    assert(graft.operators.Approx.incrementalSemanticDedup(idx, empty)
      .collect().isEmpty, "empty increment must yield zero verdicts")
    val emptyIdx = graft.operators.Approx.buildSemanticIndex(empty, cents)
    val firstDay = graft.operators.Approx
      .incrementalSemanticDedup(emptyIdx, vecs, minSim = 0.95)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(firstDay === Map(10L -> "keep", 20L -> "dup_new", 30L -> "keep"),
      "an empty index must reduce the screen to within-batch keep-first dedup")
  }

  test("incrementalDedup + window screen: empty increment, empty index, empty-day fold") {
    // The lexical and substring twins of the semantic edge test above,
    // plus the fold: a quiet day folded into an index must change
    // NOTHING about later screens (the idle-microbatch path of the
    // durable streaming twin).
    import spark.implicits._
    val a = (1 to 12).map(i => s"e$i").mkString(" ")
    val docs = Seq((10L, a), (20L, a), (30L, "totally different words entirely")) // 20 dups 10
      .toDF("doc_id", "text")
    val empty = docs.filter(lit(false))
    // empty increment → zero verdicts; empty index → first-day self-dedup
    assert(graft.operators.Approx.incrementalDedup(spark, docs, empty)
      .collect().isEmpty)
    val firstDay = graft.operators.Approx.incrementalDedup(spark, empty, docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(firstDay === Map(10L -> "keep", 20L -> "dup_new", 30L -> "keep"))
    // folding an empty day is a no-op for later screens
    val idx = graft.operators.Approx.buildMinHashIndex(spark, Seq((1L, a)).toDF("doc_id", "text"))
    val folded = graft.operators.Approx.advanceIndex(spark, idx, empty)
    val after = graft.operators.Approx.incrementalDedup(spark, folded, docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after === Map(10L -> "dup_old", 20L -> "dup_old", 30L -> "keep"))
    // window seam: empty increment → zero stats rows / zero scrub rows;
    // degenerate (empty/whitespace/short) increment docs keep their
    // rows with zero windows and pass through the scrub untouched.
    val widx = graft.operators.SubstringDedup.buildWindowIndex(docs, k = 8)
    assert(graft.operators.SubstringDedup
      .incrementalWindowStats(widx, empty, k = 8).collect().isEmpty)
    assert(graft.operators.SubstringDedup
      .incrementalWindowScrub(widx, empty, k = 8).collect().isEmpty)
    val weird = Seq((100L, ""), (200L, "   "), (300L, "short text"),
      (400L, a)).toDF("doc_id", "text") // 400 duplicates the index's 12-token run
    val stats = graft.operators.SubstringDedup
      .incrementalWindowStats(widx, weird, k = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(stats(100L) === ((0L, 0L)) && stats(200L) === ((0L, 0L)) &&
      stats(300L) === ((0L, 0L)), s"degenerate docs must carry zeros: $stats")
    assert(stats(400L) === ((5L, 5L)),
      s"the 12-token dup run has 5 8-windows, all shadowed by the index: $stats")
    val scrubbed = graft.operators.SubstringDedup
      .incrementalWindowScrub(widx, weird, k = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(scrubbed(100L) === ((0L, "")) && scrubbed(300L) === ((0L, "short text")))
    assert(scrubbed(400L) === ((12L, "")),
      "a fully index-shadowed doc scrubs to empty, never drops")
  }
}
