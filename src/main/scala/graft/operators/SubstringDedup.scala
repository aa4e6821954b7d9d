package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Substring-level (window-hash) deduplication — the dedup granularity
  * the document-level family (exact / MinHash / SimHash / semantic)
  * cannot express: two documents that are globally dissimilar may still
  * share a long verbatim run (a quoted paragraph, boilerplate headers,
  * licence text), and training on the repeat measurably hurts the model
  * ("Deduplicating Training Data Makes Language Models Better", Lee et
  * al. 2022 — their suffix-array ExactSubstr). The scalable relational
  * form of that idea: slide a k-token window over every document, hash
  * each window, and group the hashes — a window whose content occurs
  * anywhere else in the corpus is a duplicated substring, and every
  * occurrence AFTER the first (stream order: ascending (doc_id, start))
  * is removable. A suffix array finds variable-length repeats on one
  * machine; the fixed-k window grid is the shuffle-friendly equivalent
  * (any duplicated run of >= k tokens contains a duplicated k-window,
  * so recall for >= k-token repeats is total; runs shorter than k are
  * deliberately below the radar — that is the knob's meaning).
  *
  * Scale shape, the point of the design: document TEXT never enters the
  * dedup exchanges. The window stream is (doc_id, start, h) — with the
  * default 64-bit hash, 20 bytes per window — grouped/joined on `h`
  * alone; the corpus-wide ownership pass is one partial-aggregated
  * groupBy (map-side combine collapses same-partition repeats first).
  * Window count = token count − (k−1) per document, so every stage is
  * linear in corpus tokens. The one place text CAN move is [[scrub]]'s
  * final rebuild join, and only when the shadowed-starts side outgrows
  * the broadcast threshold (same inherent-rewrite trade as the
  * boilerplate scrub, ops/Extended q74 — a rewrite has to deliver the
  * text somewhere); stats never move text at all.
  *
  * Key strategy, the q47/q59 twin convention: `md5Keys = false`
  * (default) hashes windows with xxhash64 — 8-byte keys on the wire,
  * the production form, no SQL twin. `md5Keys = true` hashes with md5 —
  * bit-identical hex in Spark and DuckDB, so the declared queries
  * (q76/q77, ops/Extended) are full value oracles; the two variants are
  * proven output-equal on a real corpus in SubstringDedupSpec. A hash
  * collision would merge two distinct windows (under-count uniques);
  * with 64-bit keys the expected collision count stays < 1 up to ~10^9
  * windows per corpus — and the md5 declared form narrows that to 128
  * bits. Both stats and scrub are pure functions of (corpus, k):
  * partition-layout- and engine-invariant, the Sampling.scala
  * reproducibility bar.
  */
object SubstringDedup {

  private def toks(textCol: String): Column =
    filter(split(trim(coalesce(col(textCol), lit(""))), "\\s+"), w => w =!= "")

  private def hashOf(c: Column, md5Keys: Boolean): Column =
    if (md5Keys) md5(c) else xxhash64(c)

  /** The window-hash stream: one row per k-token window start,
    * `(doc_id, start, h)` — start is the 0-based token position of the
    * window's first token in the whitespace-token stream of the doc.
    * Documents shorter than k tokens emit nothing. The hash array is
    * built scan-side in one array expression (slice + array_join per
    * start — O(k · tokens) character work, no shuffle); the space
    * re-join is collision-free because whitespace cannot occur inside
    * a token. */
  def windowHashes(docs: DataFrame, k: Int,
                   textCol: String = "text", idCol: String = "doc_id",
                   md5Keys: Boolean = false): DataFrame = {
    require(k > 0, "window length k must be positive")
    val ws = toks(textCol)
    // sequence(0, size-k) would run DESCENDING for size < k (Spark
    // fills start > stop with step -1) — guard short docs to an
    // explicit empty array instead.
    val starts = when(size(col("ws")) >= k,
      sequence(lit(0), size(col("ws")) - lit(k))).otherwise(array().cast("array<int>"))
    docs
      .select(col(idCol).as("doc_id"), ws.as("ws"))
      .select(col("doc_id"),
        explode(transform(starts, i =>
          struct(i.as("start"),
            hashOf(array_join(slice(col("ws"), i + 1, lit(k)), " "), md5Keys)
              .as("h")))).as("w"))
      .select(col("doc_id"), col("w.start").as("start"), col("w.h").as("h"))
  }

  /** Per-document window-duplication profile — the filter-stage signal
    * (how much of this document is verbatim-repeated elsewhere?):
    *   - n_windows      — k-token window starts in the doc (0 if < k tokens)
    *   - n_dup_windows  — windows whose content occurs more than once
    *                      anywhere in the corpus (including this doc)
    *   - n_shadowed     — windows with an EARLIER occurrence in
    *                      (doc_id, start) stream order — exactly the
    *                      instances [[scrub]] removes, so
    *                      n_shadowed = 0 ⟺ scrub keeps the doc intact
    *   - dup_window_frac — n_dup_windows / n_windows, 4-dp rounded
    * Every document appears in the output (zero-window docs carry
    * zeros) — the q70/q73 LEFT-JOIN convention. */
  def windowStats(docs: DataFrame, k: Int,
                  textCol: String = "text", idCol: String = "doc_id",
                  md5Keys: Boolean = false): DataFrame = {
    val wins = windowHashes(docs, k, textCol, idCol, md5Keys)
    val inst = markInstances(wins)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup_windows"),
        sum(when(col("shad"), 1L).otherwise(0L)).as("n_shadowed"))
    docs.select(col(idCol).as("doc_id")).join(inst, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_shadowed"), lit(0L)).as("n_shadowed"))
      .withColumn("dup_window_frac",
        graft.ops.Determinism.dround(
          col("n_dup_windows").cast("double") /
            greatest(col("n_windows"), lit(1L)).cast("double"), 4))
  }

  /** A window instance's position in keep-first stream order, packed
    * into ONE long: doc_id · 2²¹ + start. Packing exists so the owner
    * aggregate below is `min(long)` — an all-primitive buffer that
    * plans as HashAggregateExec — instead of `min(struct)`, which has
    * no hash-agg buffer and forced a SortAggregate pair whose per-task
    * sort was the operator's ONE multi-GB spill at the 300× smoke
    * (measured: partition sizing halved it; this removes the sort
    * altogether). min over the packed key ≡ lexicographic
    * (doc_id, start) iff 0 ≤ start < 2²¹ and the product cannot
    * overflow — both asserted LOUDLY per row, scan-side (a 2M-token
    * document or a 2⁴²-range doc id is out of contract, not silently
    * misordered; the guard is the packing's left operand so null rows
    * cannot skip it, and it rides the packed value so pruning cannot
    * drop it). */
  private val StartBound = 1L << 21
  private def packedPos: Column = {
    val guard = coalesce(
      assert_true(
        col("start").cast("long").between(0L, StartBound - 1) &&
          col("doc_id").between(0L, Long.MaxValue / StartBound - 1),
        lit(s"SubstringDedup: window start >= 2^21 tokens or doc_id >= 2^42 — " +
          "outside the packed keep-first key's contract")).cast("long"),
      lit(0L))
    guard + col("doc_id") * lit(StartBound) + col("start").cast("long")
  }

  /** Instance marks: each window row joined with its hash group's
    * occurrence count and owner. `dup` = content occurs > 1 time in the
    * corpus; `shad` = a strictly earlier (doc_id, start) instance of
    * the same content exists (the packed min is the global keep-first
    * owner — q33's convention lifted to substrings). The group side is
    * distinct-window-sized — NOT broadcastable at scale — so this is a
    * plain equi-join on the hash key, 8 bytes wide in the production
    * form; both aggregate buffers are longs, so the ownership pass
    * hash-aggregates with map-side combine and never sorts. */
  private def markInstances(wins: DataFrame): DataFrame = {
    val grp = wins.groupBy("h")
      .agg(count(lit(1)).as("n_inst"),
        min(packedPos).as("own"))
    wins.join(grp, Seq("h"))
      .select(col("doc_id"), col("start"),
        (col("n_inst") > 1L).as("dup"),
        (packedPos =!= col("own")).as("shad"))
  }

  /** Storable window-hash index for the INCREMENTAL screen — one row
    * per DISTINCT window content in the ingested corpus:
    * `(h, n_inst, own, k)` = occurrence count, the packed keep-first
    * owner position ([[packedPos]]'s doc_id·2²¹+start encoding — a
    * plain long, parquet-storable like everything else), and the
    * window length the index was built with. `k` is METADATA, not a
    * key: an index screened or folded with a different k would produce
    * plausible-looking but silently wrong stats/rewrites (different-
    * length windows simply never hash-match), so every consumer rides
    * a scan-side assert on it ([[checkedIndex]] — the packedPos guard
    * idiom: zero extra jobs, fails loudly on the first scanned row;
    * the md5-vs-xxhash64 key variant is checked statically from `h`'s
    * type). This is [[markInstances]]'s group side made persistent:
    * build once per corpus, then either [[compactWindowIndex]] after
    * in-memory folds or — the scale path — store LOG-STRUCTURED, one
    * `batch_id=` parquet partition per folded day
    * ([[appendWindowIndexDay]]): the screens merge-on-read, so a fold
    * is an O(day) append, never an O(index) rewrite. */
  def buildWindowIndex(docs: DataFrame, k: Int,
                       textCol: String = "text", idCol: String = "doc_id",
                       md5Keys: Boolean = false): DataFrame =
    windowHashes(docs, k, textCol, idCol, md5Keys)
      .groupBy("h")
      .agg(count(lit(1)).as("n_inst"), min(packedPos).as("own"))
      .withColumn("k", lit(k))

  /** The index projected to its data columns with the k-metadata
    * contract enforced: `h`'s type must match the caller's key variant
    * (md5 → string, xxhash64 → long — a static check), and every
    * scanned row asserts `k` equals the caller's k. The assert rides
    * the `h` column itself — the one column EVERY consumer reads for
    * every index row (the screens' semi-join scans the whole index
    * side by design) — so column pruning cannot drop it and a
    * mismatched-k index fails loudly even when zero windows match
    * (the exact case that is otherwise silent: no matches looks like
    * "no duplication"). Indexes stored before the k column existed
    * pass unchecked, documented as the caller's contract. */
  private def checkedIndex(index: DataFrame, k: Int,
                           md5Keys: Boolean): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType}
    val ht = index.schema("h").dataType
    val expect = if (md5Keys) StringType else LongType
    require(ht == expect,
      s"window index key variant mismatch: index h is $ht but md5Keys=$md5Keys " +
        s"expects $expect — stats/rewrites against the wrong key family would " +
        "silently never match")
    if (!index.columns.contains("k"))
      index.select(col("h"), col("n_inst"), col("own"))
    else {
      val guard = assert_true(col("k") === lit(k),
        lit(s"window index k mismatch: caller passed k=$k but the stored index " +
          "was built with a different window length — different-length windows " +
          "never hash-match, so the results would be silently wrong"))
      val checkedH =
        if (md5Keys) concat(coalesce(guard.cast("string"), lit("")), col("h"))
        else coalesce(guard.cast("long"), lit(0L)) + col("h")
      index.select(checkedH.as("h"), col("n_inst"), col("own"))
    }
  }

  /** Fold an increment's windows INTO a stored window index — O(day):
    * the day's windows aggregate to their own per-hash (count, owner)
    * rows and APPEND; the same hash may then appear once per folded
    * day, and every consumer resolves count-sum/owner-min at read time
    * (the screens' merge is increment-bounded — they only aggregate
    * hashes the increment matched). Run [[compactWindowIndex]] on the
    * operator's own schedule to consolidate — periodic O(index), not
    * per-day (the r14 form re-aggregated the FULL index every fold:
    * flat at the smoke scales only because a day was ≤1% of the index,
    * O(D·index) over D days). On stored parquet the fold is
    * [[appendWindowIndexDay]] — one new `batch_id=` partition, no
    * rewrite. ALL of the day's windows fold, matching the batch
    * semantics in which a shadowed (removed) instance still shadows
    * later occurrences — same non-transitivity argument as
    * [[graft.operators.Approx.advanceIndex]], at window rather than
    * document granularity. The index's k and key variant must match
    * (checked — see [[buildWindowIndex]]; the k assert rides the data
    * columns, so it fires on any consumption that reads them — screen,
    * compact, store — while a bare count() prunes every column and
    * sees nothing). */
  def advanceWindowIndex(index: DataFrame, increment: DataFrame, k: Int,
                         textCol: String = "text", idCol: String = "doc_id",
                         md5Keys: Boolean = false): DataFrame =
    advanceWindowIndexPrebuilt(index,
      buildWindowIndex(increment, k, textCol, idCol, md5Keys), k, md5Keys)

  /** [[advanceWindowIndex]] with the day's aggregate already built (a
    * [[buildWindowIndex]] output, typically localCheckpointed) — the
    * prebuilt seam for driver replay loops: a lazy fold would re-run
    * every prior day's window aggregation inside every later screen
    * (O(days²) over a replay), while a checkpointed day folds as an
    * O(1)-plan union over materialized blocks. */
  def advanceWindowIndexPrebuilt(index: DataFrame, dayIndex: DataFrame,
                                 k: Int, md5Keys: Boolean = false): DataFrame =
    checkedIndex(index, k, md5Keys).withColumn("k", lit(k))
      .unionByName(checkedIndex(dayIndex, k, md5Keys).withColumn("k", lit(k)))

  /** Consolidate a log-structured window index (one row per hash PER
    * FOLDED DAY) back to one row per hash: counts sum, owners take the
    * packed min — the merge the screens otherwise do per-read,
    * amortized on the caller's schedule (after N folds, or when the
    * partition count hurts scan cost). O(index) by nature; the point
    * of the log-structured form is that correctness never requires
    * running it. */
  def compactWindowIndex(index: DataFrame): DataFrame = {
    // Repartition on the key BEFORE aggregating: window hashes are
    // near-unique (the fold appends at most one row per hash per day,
    // and most windows occur once), so map-side partial aggregation
    // combines ~nothing while its per-task hash map holds the task's
    // whole input — on row-group-bounded (~128 MB) scan tasks that map
    // overflows and falls back to sort-based aggregation, external-
    // sorting the ENTIRE index once (measured at 1000×-class: 6.2 GB
    // of spill, invariant under scan-split and reduce-side dials; the
    // shuffle itself was only 2.5 GB because combining bought ~3%).
    // With the explicit exchange first, both aggregate passes run on
    // already-partitioned AQE-sized chunks and stay in memory.
    val merged = index.repartition(col("h")).groupBy("h")
      .agg(sum("n_inst").as("n_inst"), min("own").as("own"))
    if (!index.columns.contains("k")) merged
    else {
      // k must be UNIFORM across the whole store, not taken per-group:
      // different-length windows almost never hash-collide, so a
      // mixed-k store would compact cleanly per hash and come out
      // consolidated under one misleading k — the guard rides the
      // output's k column (a one-row global (min, max) broadcast), so
      // any consumption of the compacted index fails loudly instead.
      val kRange = index.agg(min("k").as("k_min"), max("k").as("k_max"))
      val guard = assert_true(col("k_min") === col("k_max"),
        lit("mixed-k log-structured window index: the store holds rows built " +
          "with different window lengths — compacting them under one k would " +
          "be silently wrong; split or rebuild the store"))
      merged.crossJoin(broadcast(kRange))
        .select(col("h"), col("n_inst"), col("own"),
          (coalesce(guard.cast("int"), lit(0)) + col("k_min")).as("k"))
    }
  }

  /** Compact a STORED log-structured window index into a fresh
    * single-generation store at `outDir` — [[compactWindowIndex]] over
    * [[readWindowIndex]], executed under the store-compaction dials
    * ([[TrainingData.CompactStoreConfs]] — the q76/q77 reduce-side
    * sizing PLUS a 16 MB scan split: the compaction's dominant cost is
    * the map-side partial hash-aggregate over near-unique hash keys,
    * which the scan split sizes; unsized, the 1000×-class compaction
    * measured 66 s with 7.4 GB of spill, and reduce-side dials alone
    * still 58 s / 6.2 GB) and restoring the caller's session confs
    * afterwards. Writes to a NEW directory rather than rewriting in
    * place: overwriting the store being read is both unsafe in Spark
    * and non-atomic on a real filesystem — the caller swaps readers to
    * the new generation (or renames) on its own schedule, and a crash
    * mid-compaction leaves the source store untouched and
    * re-compactable. */
  def compactWindowIndexStore(spark: org.apache.spark.sql.SparkSession,
                              dir: String, outDir: String,
                              md5Keys: Boolean = false): Unit = {
    // Fresh-generation contract, enforced: a second compaction into a
    // populated outDir would leave the old cumulative generation's
    // partition beside the new one, and every merge-on-read consumer
    // would double-count n_inst from then on.
    require(!graft.sources.StateStore.exists(spark, outDir),
      s"window-index compaction target $outDir already exists; compact " +
        "into a fresh generation directory — a second cumulative " +
        "generation in one store double-counts every merge-on-read")
    TrainingData.withScopedConfs(spark, TrainingData.CompactStoreConfs) {
      graft.sources.StateStore.writePartition(
        compactWindowIndex(readWindowIndex(spark, dir, md5Keys)), outDir, 0L)
    }
  }

  /** The stored-parquet fold: write one day's window aggregate as the
    * `batch_id = id` partition of `dir`'s log-structured index table
    * (dynamic overwrite — a retried day REPLACES its partition; the
    * library-wide [[graft.sources.StateStore]] convention). O(day)
    * write, no rewrite of prior days. Read the whole index back with
    * [[readWindowIndex]]; compact by writing
    * [[compactWindowIndex]]'s output as a fresh single partition. */
  def appendWindowIndexDay(increment: DataFrame, k: Int, dir: String,
                           batchId: Long, textCol: String = "text",
                           idCol: String = "doc_id",
                           md5Keys: Boolean = false): Unit = {
    val spark = increment.sparkSession
    // Fail fast on a mismatched store BEFORE writing: without this, a
    // misconfigured caller builds a mixed-k log-structured store that
    // only fails later, at screen/compact time, far from the mistake.
    // One stored row's k suffices (appends through this path are
    // uniform by induction); reading it through readWindowIndex's
    // explicit md5Keys-typed schema also surfaces a key-variant
    // mismatch as a parquet conversion error at append time. A pre-k
    // store (k reads back null) passes unchecked — the same caller's
    // contract checkedIndex documents.
    if (graft.sources.StateStore.exists(spark, dir)) {
      readWindowIndex(spark, dir, md5Keys).select(col("k"), col("h"))
        .head(1).headOption.filterNot(_.isNullAt(0)).foreach { r =>
          require(r.getInt(0) == k,
            s"window index k mismatch on append: $dir holds k=${r.getInt(0)} " +
              s"rows but this day was built with k=$k — different-length " +
              "windows never hash-match, so the mixed store would be " +
              "silently wrong at screen time")
        }
    }
    graft.sources.StateStore.writePartition(
      buildWindowIndex(increment, k, textCol, idCol, md5Keys), dir, batchId)
  }

  /** Read a log-structured stored window index back ([[appendWindowIndexDay]]'s
    * partitions, batch_id dropped) — the screens take it as-is,
    * merge-on-read. */
  def readWindowIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                      md5Keys: Boolean = false,
                      beforeBatch: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.types._
    val hType: DataType = if (md5Keys) StringType else LongType
    graft.sources.StateStore.readFolded(spark, dir, StructType(Seq(
      StructField("h", hType), StructField("n_inst", LongType),
      StructField("own", LongType), StructField("k", IntegerType))),
      beforeBatch)
  }

  /** Per-increment-document duplication profile against a stored
    * [[buildWindowIndex]] — [[windowStats]]'s columns, increment rows
    * only, with "the corpus" = index ∪ increment:
    *   - n_shadowed is EXACT replay semantics: a window with an
    *     earlier (packed-position) occurrence in index ∪ increment is
    *     shadowed, so under id-monotone day feeding an N-day replay's
    *     n_shadowed equals the single-batch [[windowStats]] run's,
    *     row for row (SubstringDedupSpec pins it) — and n_shadowed is
    *     what a scrub removes, so the SCREEN is replay-exact.
    *   - n_dup_windows is horizon-relative BY CONSTRUCTION: the batch
    *     form counts duplicate content anywhere in the corpus
    *     INCLUDING days that haven't arrived yet, which no incremental
    *     screen can know — day-k dup counts cover index ∪ days(1..k),
    *     a lower bound that converges to the batch value as days fold
    *     (the spec pins ≤ and the final-day equality).
    *
    * Scale shape: the index never crosses an exchange — the
    * increment's distinct window hashes broadcast, the index streams
    * map-side through one semi-join scan, and every later join is
    * increment-bounded (matched index rows ≤ increment windows).
    * `broadcastIncrement = false` drops the forced hints for a
    * NON-day-sized increment (a seed corpus replayed as one giant
    * "day"): the joins keep their shape but Spark/AQE plans them —
    * shuffling both sides, the honest cost of a corpus-sized screen —
    * instead of collecting an over-driver-limit broadcast (a 5M-doc
    * seed's 163M-hash set measured 1.03 GB of driver results, over
    * the 1 GB default `spark.driver.maxResultSize`). */
  def incrementalWindowStats(index: DataFrame, increment: DataFrame, k: Int,
                             textCol: String = "text", idCol: String = "doc_id",
                             md5Keys: Boolean = false,
                             broadcastIncrement: Boolean = true): DataFrame = {
    def bcastIf(df: DataFrame) = if (broadcastIncrement) broadcast(df) else df
    val wins = windowHashes(increment, k, textCol, idCol, md5Keys)
    val incGrp = wins.groupBy("h")
      .agg(count(lit(1)).as("n_inc"), min(packedPos).as("own_inc"))
    // One map-side pass over the stored index: increment hashes
    // broadcast, matched rows come back small enough to broadcast
    // everywhere downstream. The post-semi groupBy is the
    // merge-on-read of the log-structured form — a hash folded over
    // several days carries one row per day, and this resolves
    // count-sum/owner-min over INCREMENT-MATCHED hashes only (≤
    // increment windows × folded partitions, never O(index)); on a
    // compacted index it is a no-op pass over the same bounded rows.
    val matched = checkedIndex(index, k, md5Keys)
      .join(bcastIf(incGrp.select(col("h"))), Seq("h"), "left_semi")
      .groupBy("h")
      .agg(sum("n_inst").as("n_inst"), min("own").as("own"))
    val combined = incGrp
      .join(bcastIf(matched), Seq("h"), "left")
      .select(col("h"),
        (col("n_inc") + coalesce(col("n_inst"), lit(0L))).as("n_inst"),
        least(col("own_inc"), coalesce(col("own"), lit(Long.MaxValue))).as("own"))
    val inst = wins.join(bcastIf(combined), Seq("h"))
      .select(col("doc_id"), col("start"),
        (col("n_inst") > 1L).as("dup"),
        (packedPos =!= col("own")).as("shad"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup_windows"),
        sum(when(col("shad"), 1L).otherwise(0L)).as("n_shadowed"))
    increment.select(col(idCol).as("doc_id")).join(inst, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_shadowed"), lit(0L)).as("n_shadowed"))
      .withColumn("dup_window_frac",
        graft.ops.Determinism.dround(
          col("n_dup_windows").cast("double") /
            greatest(col("n_windows"), lit(1L)).cast("double"), 4))
  }

  /** Remove duplicated substrings, keep-first: every shadowed window's
    * k tokens are cut from the document (overlapping shadowed windows
    * union into one covered region), the kept tokens re-join with
    * single spaces, in order. Output one row per input document:
    * `(doc_id, n_removed, kept_text)` — a doc with no shadowed windows
    * passes through with n_removed = 0; a fully-covered doc keeps its
    * row with kept_text = '' (q74's never-drop-a-doc convention).
    *
    * The rebuild is array arithmetic, not a positions join: shadowed
    * starts aggregate to one sorted int array per affected doc, the
    * covered position set is flatten(sequence(s, s+k−1)) ∪-deduped, and
    * the kept positions are `array_except(0..n−1, covered)` — hash-
    * based, O(tokens), order-preserving — indexed back into the token
    * array. So the only thing that crosses the wire before the final
    * join is (doc_id, start) pairs; the join back to the corpus
    * broadcasts while the affected-doc side is small and degrades to
    * one text-bearing shuffle only when it is not (the inherent
    * rewrite cost, exactly q74's). */
  def scrub(docs: DataFrame, k: Int,
            textCol: String = "text", idCol: String = "doc_id",
            md5Keys: Boolean = false): DataFrame = {
    val wins = windowHashes(docs, k, textCol, idCol, md5Keys)
    val starts = markInstances(wins).filter(col("shad"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("start"))).as("starts"))
    rebuildFromShadowStarts(docs, starts, k, textCol, idCol)
  }

  /** The scrub's rebuild tail, shared with [[incrementalWindowScrub]]:
    * given per-doc sorted shadowed-start arrays, cut the covered
    * positions and re-join the kept tokens (see [[scrub]]'s scaladoc
    * for the array-arithmetic argument). `starts` joins back to the
    * full `docs` domain with a LEFT join — docs with no shadowed
    * window pass through untouched. */
  private def rebuildFromShadowStarts(docs: DataFrame, starts: DataFrame,
                                      k: Int, textCol: String,
                                      idCol: String): DataFrame = {
    val covered = array_distinct(flatten(transform(col("starts"), s =>
      sequence(s, s + lit(k - 1)))))
    val allPos = when(size(col("ws")) > 0,
      sequence(lit(0), size(col("ws")) - 1)).otherwise(array().cast("array<int>"))
    docs.select(col(idCol).as("doc_id"), toks(textCol).as("ws"))
      .join(starts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("ws"),
        coalesce(col("starts"), array().cast("array<int>")).as("starts"))
      .select(col("doc_id"), col("ws"),
        array_except(allPos, covered).as("kept_pos"))
      .select(col("doc_id"),
        (size(col("ws")) - size(col("kept_pos"))).cast("long").as("n_removed"),
        array_join(transform(col("kept_pos"), i =>
          element_at(col("ws"), i + 1)), " ").as("kept_text"))
  }

  /** Rewrite an INCREMENT's documents against a stored
    * [[buildWindowIndex]] — [[scrub]]'s keep-first removal at daily-
    * batch cost: an increment window is cut iff a strictly earlier
    * (packed-position) occurrence of its content exists in
    * index ∪ increment. Because shadowing is replay-exact (an earlier
    * occurrence never un-happens as later days arrive), the rebuilt
    * text of an increment doc equals what the batch [[scrub]] over the
    * whole corpus produces for that doc — for ANY id interleaving, not
    * just monotone days: the doc's kept positions depend only on the
    * global owner of each of ITS windows, which the merged
    * (index, increment) owner computes exactly
    * (SubstringDedupSpec pins the restriction equality). Only
    * increment docs are rewritten — the index side is already-ingested
    * immutable text by the family's contract (and under monotone-id
    * ingest its windows all precede the increment's, so the batch form
    * would not rewrite them either). Join shapes are
    * [[incrementalWindowStats]]'s: one map-side semi-join scan of the
    * stored index, everything else increment-bounded. */
  def incrementalWindowScrub(index: DataFrame, increment: DataFrame, k: Int,
                             textCol: String = "text", idCol: String = "doc_id",
                             md5Keys: Boolean = false,
                             broadcastIncrement: Boolean = true): DataFrame = {
    def bcastIf(df: DataFrame) = if (broadcastIncrement) broadcast(df) else df
    val wins = windowHashes(increment, k, textCol, idCol, md5Keys)
    val incGrp = wins.groupBy("h")
      .agg(count(lit(1)).as("n_inc"), min(packedPos).as("own_inc"))
    // Merge-on-read over increment-matched hashes, as in
    // [[incrementalWindowStats]] — the scrub only needs the global
    // owner, so only `own` resolves here.
    val matched = checkedIndex(index, k, md5Keys)
      .join(bcastIf(incGrp.select(col("h"))), Seq("h"), "left_semi")
      .groupBy("h")
      .agg(min("own").as("own"))
    val combined = incGrp
      .join(bcastIf(matched), Seq("h"), "left")
      .select(col("h"),
        least(col("own_inc"), coalesce(col("own"), lit(Long.MaxValue))).as("own"))
    val starts = wins.join(bcastIf(combined), Seq("h"))
      .filter(packedPos =!= col("own"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("start"))).as("starts"))
    rebuildFromShadowStarts(increment, starts, k, textCol, idCol)
  }
}
