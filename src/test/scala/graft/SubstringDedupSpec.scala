package graft

import org.apache.spark.sql.functions._

import graft.operators.SubstringDedup

/** Substring-level (window-hash) dedup — crafted-corpus value checks
  * for every documented edge (overlap merge, within-doc repeats, short
  * docs, fully-covered docs), plus the production-vs-declared key
  * equivalence (xxhash64 ≡ md5 outputs on a real corpus). The declared
  * q76/q77 value semantics are the DuckDB oracle's job; these pin the
  * OPERATOR's contract directly.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // Crafted corpus, k = 3:
  //  doc 0: a b c d e        — owns windows (abc, bcd, cde)
  //  doc 1: x y a b c d z    — contains doc-0's run "a b c d" (two
  //                            shadowed windows: abc@2, bcd@3 → covered
  //                            positions 2..5, ONE merged region)
  //  doc 2: a b              — shorter than k: zero windows
  //  doc 3: c d e            — exactly k tokens, its one window shadowed
  //                            by doc 0 → fully covered
  //  doc 4: p q p q p q      — self-repeating: "p q p" occurs at 0 and 2
  //                            (same doc!), "q p q" at 1 and 3
  private def corpus = Seq(
    (0L, "a b c d e"),
    (1L, "x y a b c d z"),
    (2L, "a b"),
    (3L, "c d e"),
    (4L, "p q p q p q")).toDF("doc_id", "text")

  test("windowStats: dup/shadowed counts per doc, zero-window docs kept") {
    val got = SubstringDedup.windowStats(corpus, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc 0: 3 windows; abc+bcd recur in doc 1, cde in doc 3 → all 3
    // dup; none shadowed (doc 0 is the first occurrence of each).
    assert(got(0L) === ((3L, 3L, 0L, 1.0)))
    // doc 1: 5 windows (xya, yab, abc, bcd, cdz); abc and bcd dup+shadowed.
    assert(got(1L) === ((5L, 2L, 2L, 0.4)))
    // doc 2: below k — zero windows, zero fractions.
    assert(got(2L) === ((0L, 0L, 0L, 0.0)))
    // doc 3: one window (cde), dup with doc 0 and shadowed by it.
    assert(got(3L) === ((1L, 1L, 1L, 1.0)))
    // doc 4: 4 windows (pqp@0, qpq@1, pqp@2, qpq@3) — all dup (each
    // content occurs twice IN THIS DOC); the later instance of each is
    // shadowed → 2 shadowed.
    assert(got(4L) === ((4L, 4L, 2L, 1.0)))
  }

  test("scrub: keep-first removal, overlap merge, never drops a doc") {
    val got = SubstringDedup.scrub(corpus, k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // doc 0 owns everything it has — untouched.
    assert(got(0L) === ((0L, "a b c d e")))
    // doc 1: shadowed starts 2 and 3 merge into covered positions 2..5
    // ("a b c d") — the overlap is unioned, not double-counted.
    assert(got(1L) === ((4L, "x y z")))
    // doc 2: no windows — untouched.
    assert(got(2L) === ((0L, "a b")))
    // doc 3: its only window is shadowed → fully covered, row kept
    // with empty text (the never-drop-a-doc convention).
    assert(got(3L) === ((3L, "")))
    // doc 4: shadowed starts 2 and 3 cover positions 2..5 → "p q" kept.
    assert(got(4L) === ((4L, "p q")))
  }

  test("stats/scrub consistency: n_shadowed = 0 iff scrub keeps the doc intact") {
    val stats = SubstringDedup.windowStats(corpus, k = 3)
      .select("doc_id", "n_shadowed").as[(Long, Long)].collect().toMap
    val scrubbed = SubstringDedup.scrub(corpus, k = 3)
      .select("doc_id", "n_removed").as[(Long, Long)].collect().toMap
    stats.foreach { case (id, nShad) =>
      assert((nShad == 0L) === (scrubbed(id) == 0L),
        s"doc $id: n_shadowed=$nShad but n_removed=${scrubbed(id)}")
    }
  }

  test("production xxhash64 keys ≡ declared md5 keys on a real corpus") {
    val docs = graft.ops.Tables.documents(spark, sf0001)
    def dump(md5Keys: Boolean) = Seq(
      SubstringDedup.windowStats(docs, k = 8, md5Keys = md5Keys)
        .orderBy("doc_id").collect().toSeq,
      SubstringDedup.scrub(docs, k = 8, md5Keys = md5Keys)
        .orderBy("doc_id").collect().toSeq)
    assert(dump(md5Keys = false) === dump(md5Keys = true))
  }

  test("degenerate inputs: null/empty/whitespace text and k=1") {
    val weird = Seq((0L, null.asInstanceOf[String]), (1L, ""), (2L, "   "),
      (3L, "solo"), (4L, "solo")).toDF("doc_id", "text")
    val stats = SubstringDedup.windowStats(weird, k = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    // null/empty/whitespace docs: zero windows, still present.
    assert(stats(0L) === ((0L, 0L)) && stats(1L) === ((0L, 0L))
      && stats(2L) === ((0L, 0L)))
    // k=1: single-token docs dedup like exact tokens — doc 4 shadowed.
    assert(stats(3L) === ((1L, 0L)) && stats(4L) === ((1L, 1L)))
    val scrubbed = SubstringDedup.scrub(weird, k = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(scrubbed(0L) === ((0L, "")) && scrubbed(3L) === ((0L, "solo"))
      && scrubbed(4L) === ((1L, "")))
  }

  // ----- incremental window screen (round 14): the q86 index seam at
  // substring granularity -----

  private def statRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("incremental window stats vs stored index == batch windowStats restricted") {
    // One batch against a prebuilt (and parquet round-tripped) index
    // must reproduce the batch run over index ∪ increment exactly —
    // including n_dup_windows, because a single increment IS the full
    // remaining corpus (no unseen later days).
    val docs = graft.ops.Tables.documents(spark, sf0001)
      .select("doc_id", "text")
    val isNew = pmod(col("doc_id"), lit(10)) >= 7
    val dir = java.nio.file.Files.createTempDirectory("graft_widx").toString
    SubstringDedup.buildWindowIndex(docs.filter(!isNew), k = 8)
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val inc = statRows(SubstringDedup.incrementalWindowStats(
      stored, docs.filter(isNew), k = 8))
    val batch = statRows(SubstringDedup.windowStats(docs, k = 8)
      .join(docs.filter(isNew).select("doc_id"), Seq("doc_id"), "left_semi"))
    assert(inc === batch,
      "stored-index screen diverged from the batch run's increment rows")
  }

  test("compacted advanceWindowIndex == buildWindowIndex over the unioned corpus") {
    // The fold is O(day) — an APPEND of the day's per-hash aggregate,
    // one row per (hash, folded day) — and compaction is the separate,
    // caller-scheduled consolidation. Compacted fold ≡ from-scratch
    // build is the pair's correctness contract.
    val docs = graft.ops.Tables.documents(spark, sf0001)
      .select("doc_id", "text")
    val isNew = pmod(col("doc_id"), lit(10)) >= 7
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("h").collect()
        .map(r => (r.get(0), r.getLong(1), r.getLong(2))).toSeq
    val advanced = SubstringDedup.advanceWindowIndex(
      SubstringDedup.buildWindowIndex(docs.filter(!isNew), k = 8),
      docs.filter(isNew), k = 8)
    assert(dump(SubstringDedup.compactWindowIndex(advanced)) ===
      dump(SubstringDedup.buildWindowIndex(docs, k = 8)),
      "compacted folded index diverged from a from-scratch build")
  }

  test("log-structured stored index: screen over day partitions == over compacted") {
    // The scale contract behind the O(day) fold: the screens resolve
    // count-sum/owner-min at read time over increment-matched hashes,
    // so a day-partitioned stored index (appendWindowIndexDay — one
    // batch_id= partition per fold, no rewrite) screens identically to
    // a compacted one. Three folded days, stats AND scrub.
    val docs = graft.ops.Tables.documents(spark, sf0001)
      .select("doc_id", "text")
    val isNew = pmod(col("doc_id"), lit(10)) >= 7
    import spark.implicits._
    val ingested = docs.filter(!isNew).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_wlog").toString
    ingested.grouped(math.max(1, (ingested.length + 2) / 3)).zipWithIndex
      .foreach { case (day, i) =>
        SubstringDedup.appendWindowIndexDay(day.toDF("doc_id", "text"),
          k = 8, dir, batchId = i.toLong)
      }
    val logIdx = SubstringDedup.readWindowIndex(spark, dir)
    // One row per (hash, day) in the log form; compaction collapses it.
    assert(logIdx.count() > SubstringDedup.compactWindowIndex(logIdx).count(),
      "log-structured index carries no per-day rows — the O(day) fold is vacuous")
    val compacted = SubstringDedup.compactWindowIndex(logIdx).localCheckpoint(true)
    val inc = docs.filter(isNew)
    assert(statRows(SubstringDedup.incrementalWindowStats(logIdx, inc, k = 8)) ===
      statRows(SubstringDedup.incrementalWindowStats(compacted, inc, k = 8)),
      "stats over the log-structured index diverged from the compacted one")
    def scrubDump(idx: org.apache.spark.sql.DataFrame) =
      SubstringDedup.incrementalWindowScrub(idx, inc, k = 8)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(scrubDump(logIdx) === scrubDump(compacted),
      "scrub over the log-structured index diverged from the compacted one")
    // And a retried day REPLACES its partition (the StateStore
    // convention): re-append day 0 and nothing changes.
    SubstringDedup.appendWindowIndexDay(
      ingested.grouped(math.max(1, (ingested.length + 2) / 3)).next()
        .toDF("doc_id", "text"), k = 8, dir, batchId = 0L)
    assert(statRows(SubstringDedup.incrementalWindowStats(
      SubstringDedup.readWindowIndex(spark, dir), inc, k = 8)) ===
      statRows(SubstringDedup.incrementalWindowStats(compacted, inc, k = 8)),
      "a retried day partition changed the screen")
  }

  test("k metadata: mismatched window length fails loudly, even with zero matches") {
    // The silent failure class the metadata exists to kill: an index
    // built at k=8 screened at k=5 would simply never hash-match and
    // report plausible all-zero duplication. The stored k rides a
    // scan-side assert on the hash column, so the mismatch throws on
    // the first scanned index row — including when NO window matches.
    val docs = graft.ops.Tables.documents(spark, sf0001)
      .select("doc_id", "text")
    val isNew = pmod(col("doc_id"), lit(10)) >= 7
    val dir = java.nio.file.Files.createTempDirectory("graft_wk").toString
    SubstringDedup.buildWindowIndex(docs.filter(!isNew), k = 8)
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val ex = intercept[Exception] {
      SubstringDedup.incrementalWindowStats(stored, docs.filter(isNew), k = 5)
        .collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
    assert(rootMessages(ex).exists(_.contains("window index k mismatch")),
      s"expected the k-mismatch assert, got: ${ex.getMessage}")
    // The fold checks too — on any consumption that reads the data
    // columns (compact, screen, parquet write; a bare count() prunes
    // every column and is the one action the rider cannot see).
    val ex2 = intercept[Exception] {
      SubstringDedup.compactWindowIndex(
        SubstringDedup.advanceWindowIndex(stored, docs.filter(isNew), k = 5))
        .collect()
    }
    assert(rootMessages(ex2).exists(_.contains("window index k mismatch")))
    // Key-variant mismatch (md5 index, xxhash64 screen) is a static
    // type check — no job even starts.
    val md5Dir = java.nio.file.Files.createTempDirectory("graft_wm").toString
    SubstringDedup.buildWindowIndex(docs.filter(!isNew), k = 8, md5Keys = true)
      .write.mode("overwrite").parquet(md5Dir)
    val exV = intercept[IllegalArgumentException] {
      SubstringDedup.incrementalWindowStats(
        spark.read.parquet(md5Dir), docs.filter(isNew), k = 8)
    }
    assert(exV.getMessage.contains("key variant mismatch"))
  }

  test("incremental window scrub vs stored index == batch scrub restricted") {
    // Shadowing is replay-exact, so an increment doc's REBUILT TEXT
    // must equal the batch scrub's output for that doc — and unlike
    // the dup counts this holds for any id interleaving (the %10 split
    // interleaves increment ids below index ids on purpose): a doc's
    // kept positions depend only on the global owner of its own
    // windows, which the merged (index, increment) owner computes
    // exactly.
    val docs = graft.ops.Tables.documents(spark, sf0001)
      .select("doc_id", "text")
    val isNew = pmod(col("doc_id"), lit(10)) >= 7
    val idx = SubstringDedup.buildWindowIndex(docs.filter(!isNew), k = 8)
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val inc = dump(SubstringDedup.incrementalWindowScrub(
      idx, docs.filter(isNew), k = 8))
    val batch = dump(SubstringDedup.scrub(docs, k = 8)
      .join(docs.filter(isNew).select("doc_id"), Seq("doc_id"), "left_semi"))
    assert(inc === batch,
      "stored-index scrub diverged from the batch rewrite's increment rows")
    // Consistency with the screen: a doc's removed-token mass is
    // positive iff the stats form says it has shadowed windows.
    val shad = SubstringDedup.incrementalWindowStats(idx, docs.filter(isNew), k = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    inc.foreach { case (id, nRemoved, _) =>
      assert((nRemoved > 0) === (shad(id) > 0),
        s"doc $id: scrub removed $nRemoved but stats n_shadowed=${shad(id)}")
    }
  }

  test("incremental window screens: unhinted (shuffle-join) plan ≡ broadcast-hinted outputs") {
    // broadcastIncrement = false is the corpus-sized-increment escape
    // hatch (a seed replayed as one "day" must not collect a 1 GB+
    // broadcast): the joins keep their shape, only the planner's side
    // choice changes, so stats and rebuilt text must match the hinted
    // plan row for row.
    val docs = graft.ops.Tables.documents(spark, sf0001)
      .select("doc_id", "text")
    val isNew = pmod(col("doc_id"), lit(10)) >= 7
    val idx = SubstringDedup.buildWindowIndex(docs.filter(!isNew), k = 8)
    def statsOf(hint: Boolean) = SubstringDedup
      .incrementalWindowStats(idx, docs.filter(isNew), k = 8,
        broadcastIncrement = hint)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(statsOf(false) === statsOf(true),
      "unhinted window stats diverged from the broadcast-hinted plan")
    def scrubOf(hint: Boolean) = SubstringDedup
      .incrementalWindowScrub(idx, docs.filter(isNew), k = 8,
        broadcastIncrement = hint)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(scrubOf(false) === scrubOf(true),
      "unhinted window scrub diverged from the broadcast-hinted plan")
  }

  test("3-day window replay: n_shadowed exact, n_dup_windows converges") {
    // The replay contract the operator documents: shadow counts (what
    // a scrub removes) are replay-exact under id-monotone days; dup
    // counts are horizon-relative — day k sees index ∪ days(1..k), a
    // lower bound on the batch value, with equality on the final day
    // (whose horizon IS the full corpus).
    val docs = graft.ops.Tables.documents(spark, sf0001)
      .select("doc_id", "text")
    val isNew = pmod(col("doc_id"), lit(10)) >= 7
    import spark.implicits._
    val incDocs = docs.filter(isNew).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val dayList = incDocs.grouped(math.max(1, (incDocs.length + 2) / 3)).toSeq
    var idx = SubstringDedup.buildWindowIndex(docs.filter(!isNew), k = 8)
    val perDay = dayList.zipWithIndex.map { case (day, i) =>
      val dayDf = day.toDF("doc_id", "text")
      val stats = statRows(SubstringDedup.incrementalWindowStats(idx, dayDf, k = 8))
      idx = SubstringDedup.advanceWindowIndex(idx, dayDf, k = 8).localCheckpoint(true)
      (i, day.map(_._1).toSet, stats)
    }
    val batch = statRows(SubstringDedup.windowStats(docs, k = 8)
      .join(docs.filter(isNew).select("doc_id"), Seq("doc_id"), "left_semi"))
      .map(t => t._1 -> t).toMap
    var sawUndercount = false
    perDay.foreach { case (dayI, ids, stats) =>
      assert(stats.map(_._1).toSet === ids)
      stats.foreach { case (id, nw, ndup, nshad) =>
        val (_, bnw, bdup, bshad) = batch(id)
        assert(nw === bnw, s"doc $id day $dayI: window count drifted")
        assert(nshad === bshad,
          s"doc $id day $dayI: replay n_shadowed $nshad != batch $bshad")
        assert(ndup <= bdup,
          s"doc $id day $dayI: horizon dup count $ndup exceeds batch $bdup")
        if (dayI == dayList.length - 1)
          assert(ndup === bdup,
            s"doc $id final day: horizon is the full corpus, dup must match")
        if (ndup < bdup) sawUndercount = true
      }
    }
    // The ≤ pin is only meaningful if the corpus actually plants a
    // future-day duplicate; this testdata does.
    assert(sawUndercount,
      "no early-day dup undercount found — the convergence pin is vacuous")
  }
}
