package graft

import org.apache.spark.sql.functions.{col, lit, pmod}

/** Plan-quality regression net: asserts the physical plans keep the
  * shapes that matter at scale (PLANS.md is the human-readable audit;
  * this pins it). A regression here means a future edit silently lost
  * pushdown, a broadcast, or introduced an unintended cartesian product.
  */
class PlanQualitySpec extends SparkSpec {

  // FormattedMode puts PushedFilters and join nodes on their own
  // (untruncated) lines; planning alone suffices for these checks — only
  // the codegen test below needs to actually execute.
  private val planCache = scala.collection.mutable.Map.empty[String, String]
  private def plan(name: String): String = planCache.getOrElseUpdate(name,
    SparkEntry.queries(name)(spark, sf001).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode))

  // BNLJ/cross is intended only where a pair-loop (or a broadcast scalar)
  // is the algorithm.
  private val intendedCross =
    Set("q14_join_cross", "q35_jaccard_neardup", "q36_cosine_topk", "q37_tfidf_top_term",
      "q45_cosine_neardup",
      // q64 is q35's probe-bounded broadcast pair loop over trigram sets.
      "q64_ngram_jaccard",
      // q62 crossJoins its broadcast 1-row vocabulary scalar into the
      // bigram-count model — same shape as q37's document-count scalar.
      "q62_lm_bigram_score",
      // q71 is q36's probe-bounded broadcast pair loop with the
      // Hamming-bucket prune as the join predicate (round 11).
      "q71_ann_planes",
      // q87 is q45's benchmark-bounded broadcast pair loop — the
      // benchmark slice (1/40 of the vectors) broadcasts and the
      // corpus streams scan-side (round 13).
      "q87_semantic_decontam")

  test("no query plan contains an unintended cartesian product or Scala UDF") {
    SparkEntry.queries.keys.foreach { name =>
      val p = plan(name)
      if (!intendedCross(name)) {
        assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
          s"$name has an unintended nested-loop/cartesian join")
      }
      assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
        s"$name fell out of codegen into a UDF")
    }
  }

  test("q01 pushes the shipdate range and flag predicates to the scan") {
    val p = plan("q01_scan_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull"), "no pushed filters on q01 scan")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") && p.contains("GreaterThan(l_quantity"),
      "range predicates missing from pushdown")
  }

  test("events ts predicates reach the parquet scan (µs-native read)") {
    // A round-8 scale win from the encoding-adaptive events reader: with
    // µs-encoded data, `ts` is read as a timestamp directly, so event-time
    // range predicates push down to the parquet scan (row-group pruning at
    // 100 TB). The old ns path (Long read + div-1000 projection) placed
    // every ts filter AFTER a computed column — unpushable by construction.
    // (On legacy ns data the adaptive reader still answers correctly; only
    // this pushdown is forfeited — so the assertion only applies to
    // µs-encoded testdata, and the test cancels rather than fails if the
    // sandbox regenerates back to ns.)
    assume(graft.sources.AdaptiveTimestamps.tsEncodings(
      spark, s"$sf001/events.parquet", "ts").keySet ==
      Set(org.apache.spark.sql.types.TimestampNTZType),
      "testdata is not µs-encoded; ts pushdown legitimately unavailable")
    val p = graft.ops.Tables.events(spark, sf001)
      .filter(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp_ntz"))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("GreaterThanOrEqual(ts"),
      s"ts range predicate not pushed to the events scan:\n$p")
  }

  test("q09 and q38 broadcast their dimension sides") {
    assert(plan("q09_join_multiway_topn").contains("BroadcastHashJoin"))
    assert(plan("q38_star_denorm").contains("BroadcastHashJoin"))
  }

  test("top-k queries use TakeOrderedAndProject, not a global sort") {
    assert(plan("q21_sort_topk").contains("TakeOrderedAndProject"))
    assert(plan("q09_join_multiway_topn").contains("TakeOrderedAndProject"))
  }

  test("q34 prunes to the columns it needs (no full-width scan)") {
    val p = plan("q34_dedup_exact_text")
    assert(p.contains("doc_id") && p.contains("n_chars") && !p.contains("lang"),
      s"q34 should read only the 3 needed columns (no lang/source)")
  }

  test("q43 candidate generation is an LSH-bucketed hash join, not an all-pairs product") {
    // The whole point of MinHash-LSH over exact Jaccard is that the pair
    // loop becomes an equi-join on the banded hash keys; if this plan
    // ever degrades to a cartesian, the 100 TB story is gone. Since the
    // round-6 rewrite the join keys are the exploded (table, hash-value)
    // pairs from the ML model's transform output — id-only, no row
    // structs crossing the exchange (the approxSimilarityJoin shape this
    // replaced shuffled both sides' full rows per candidate).
    val p = plan("q43_minhash_neardup")
    assert(p.contains("hv#"),
      "LSH (table, hash-value) band join keys missing from the q43 plan")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), "no hash join in q43")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "q43 candidate join degraded to an all-pairs product")
  }

  test("q47 shuffles fingerprints only — document text never crosses an exchange") {
    // The dedup shuffle must carry (doc_id, md5-fp), never the documents:
    // FormattedMode prints each Exchange with its Input attribute list.
    val p = plan("q47_fingerprint_dedup")
    val exchanges = p.split("\\(\\d+\\) ").filter(_.startsWith("Exchange"))
    assert(exchanges.nonEmpty, "q47 plan has no exchange to audit")
    exchanges.foreach { e =>
      val input = e.linesIterator.find(_.startsWith("Input")).getOrElse("")
      assert(!input.contains("text#"), s"q47 exchange carries full text: $input")
    }
  }

  test("q51 combines map-side: partial power sums cross the exchange, not rows") {
    // The moment statistics are six decimal sums per group; the whole
    // point of the formulation is that the shuffle carries O(groups)
    // partial sums. partial_ aggregate functions in the plan = map-side
    // combine; a raw measure column in an exchange input = regression.
    val p = plan("q51_stats_moments")
    assert(p.contains("partial_sum") && p.contains("partial_count"),
      "q51 lost its partial (map-side) aggregation")
    val exchanges = p.split("\\(\\d+\\) ").filter(_.startsWith("Exchange"))
    assert(exchanges.nonEmpty, "q51 plan has no exchange to audit")
    exchanges.foreach { e =>
      val input = e.linesIterator.find(_.startsWith("Input")).getOrElse("")
      assert(!input.contains("l_extendedprice#") && !input.contains("l_quantity#"),
        s"q51 exchange carries raw measures: $input")
    }
  }

  test("q57 broadcasts the benchmark shingle set (corpus side stays scan-local)") {
    assert(plan("q57_decontam_overlap").contains("BroadcastHashJoin"),
      "q57 benchmark join is not a broadcast hash join")
  }

  test("q58/q59 shuffle signatures and band keys — document text never crosses an exchange") {
    // Both md5-family near-dup queries hash tokens scan-side (explode +
    // codegen'd partial aggregate since round 6); the exchanges must
    // carry only (doc_id, partial balance/min columns, sig/band) and
    // candidate ids. PLANS.md documents the shape; this pins it. (q59's
    // token-SET column does cross its re-score join — that is the
    // sorted-merge intersect's input, bounded to candidate pairs, not
    // the corpus; only raw text# is the regression signal.)
    Seq("q58_simhash_md5", "q59_minhash_md5").foreach { name =>
      val p = plan(name)
      val exchanges = p.split("\\(\\d+\\) ").filter(_.startsWith("Exchange"))
      assert(exchanges.nonEmpty, s"$name plan has no exchange to audit")
      exchanges.foreach { e =>
        val input = e.linesIterator.find(_.startsWith("Input")).getOrElse("")
        assert(!input.contains("text#"), s"$name exchange carries full text: $input")
      }
    }
  }

  test("q58/q59 signature aggregation is partial before its exchange — tokens stay scan-local") {
    // The round-6 explode + sum/min reshape only holds its 100 TB claim
    // if the per-bit/per-hash aggregation map-side combines: the
    // signature exchange must carry partial aggregates keyed by doc_id,
    // never the exploded per-token hash column itself.
    Seq("q58_simhash_md5", "q59_minhash_md5").foreach { name =>
      val p = plan(name)
      assert(p.contains("partial_"),
        s"$name has no partial aggregate — map-side combine lost")
      val exchanges = p.split("\\(\\d+\\) ").filter(_.startsWith("Exchange"))
      exchanges.foreach { e =>
        val input = e.linesIterator.find(_.startsWith("Input")).getOrElse("")
        assert(!input.matches(".*\\b(w|h|x)#\\d+.*"),
          s"$name exchange carries a per-token column: $input")
      }
    }
  }

  test("q86's candidate stage is an equi-join on the band key — text stays out of its exchanges") {
    // The incremental screen's whole scale claim is the ASYMMETRIC
    // band join: increment bands against the full band index, keyed
    // (g, v) — never a cartesian, never text-keyed. Same audit as
    // q58/q59 (the family it extends): every exchange carries ids,
    // signatures, bands, or verdict flags; the token-SET column is
    // allowed only into the bounded re-score join, raw text# nowhere.
    val p = plan("q86_incremental_dedup")
    assert(!p.contains("CartesianProduct"),
      "q86 candidate stage degenerated to a cartesian")
    val exchanges = p.split("\\(\\d+\\) ").filter(_.startsWith("Exchange"))
    assert(exchanges.nonEmpty, "q86 plan has no exchange to audit")
    exchanges.foreach { e =>
      val input = e.linesIterator.find(_.startsWith("Input")).getOrElse("")
      assert(!input.contains("text#"), s"q86 exchange carries full text: $input")
    }
  }

  test("q62 shuffles token pairs and log-probs — document text never crosses an exchange") {
    // The LM pipeline explodes bigrams scan-side; every exchange carries
    // (doc_id, w1, w2) instances, (w1, w2, n) model counts, or 6dp
    // log-probs. A text# column in an exchange input means the explode
    // stopped being scan-local — the 100 TB regression to catch.
    val p = plan("q62_lm_bigram_score")
    val exchanges = p.split("\\(\\d+\\) ").filter(_.startsWith("Exchange"))
    assert(exchanges.nonEmpty, "q62 plan has no exchange to audit")
    exchanges.foreach { e =>
      val input = e.linesIterator.find(_.startsWith("Input")).getOrElse("")
      assert(!input.contains("text#"), s"q62 exchange carries full text: $input")
    }
  }

  test("q62's occurrence join is threshold-governed: no hint forces the corpus side to broadcast at scale") {
    // VERDICT r17 #5 / round-18 #7: at bench scale the planner
    // broadcasts q62's exploded corpus side on ESTIMATES — fine at this
    // size, but the at-scale contract is that the occurrence join falls
    // back to an honest shuffle join once the corpus side exceeds the
    // broadcast bound. Nothing in the code may FORCE that broadcast.
    // Simulate "estimates above every bound" by disabling auto
    // broadcast: the only broadcast allowed to survive is the
    // explicitly-hinted vocabulary scalar (one COUNT-DISTINCT row,
    // bounded by construction — the q37 document-count-scalar shape),
    // and the occurrence join must plan as a shuffle join.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = SparkEntry.queries("q62_lm_bigram_score")(spark, sf001)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(!p.contains("BroadcastHashJoin"),
        "with auto-broadcast off, no estimate-driven broadcast may remain — " +
          "a surviving BroadcastHashJoin means a hint forces a corpus-sized build side")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "the occurrence join must fall back to a shuffle join at scale")
      // The vocab scalar stays broadcast BY HINT — 1 row, size-bounded.
      assert(p.contains("BroadcastNestedLoopJoin"),
        "the explicitly-hinted 1-row vocabulary scalar should still broadcast")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // And at the default threshold the bench-scale plan is unchanged:
    // the small exploded side broadcasts on estimates (documented in
    // OPTIMIZATION_r17/r18 — cheaper at this size, flips by itself).
    assert(plan("q62_lm_bigram_score").contains("BroadcastHashJoin"),
      "bench-scale q62 should keep its estimate-driven broadcast (unchanged bench)")
  }

  test("q46 computes LSH signatures through the native plane_signatures call") {
    // Round-17 regression net: the composed array(sig_0..sig_7) Column
    // tree plans as whole-stage codegen but its ONE unsplittable
    // projection method crosses HotSpot's 8000-byte
    // DontCompileHugeMethods limit, so the corpus-linear signature
    // stage silently runs in the bytecode interpreter (measured: L=4
    // 0.07 CPU-s vs L=8 3.48 — a 47x cliff explain output cannot
    // show). Both join sides must keep the constant-codegen-size
    // native call.
    val p = plan("q46_ann_lsh")
    assert(p.contains("plane_signatures"),
      "q46 lost the native plane_signatures expression — the composed " +
        "per-plane form exceeds the JIT method limit and runs interpreted")
  }

  test("hot-path generated methods stay under HotSpot's 8000-byte JIT limit") {
    // The round-17 class of silent regression, pinned structurally:
    // whole-stage codegen whose generated method exceeds
    // -XX:DontCompileHugeMethods' 8000-byte default is NEVER
    // JIT-compiled — the stage runs in the bytecode interpreter with
    // no signal in explain output or any green test (q46 ran its
    // corpus-linear signature stage that way at ~10x cost; q43 its
    // fused re-score). codegenStringSeq's ByteCodeStats exposes the
    // max compiled method size per codegen subtree; every heavy
    // pair-stage query must stay under the limit.
    import org.apache.spark.sql.execution.debug._
    val heavies = Seq("q43_minhash_neardup", "q59_minhash_md5",
      "q35_jaccard_neardup", "q64_ngram_jaccard", "q46_ann_lsh",
      "q58_simhash_md5", "q44_simhash_neardup", "q86_incremental_dedup")
    // AQE OFF for the measurement (round 18): under AQE (the Spark 4
    // default, on in this shared test session) any plan with an
    // exchange wraps in AdaptiveSparkPlanExec and codegenStringSeq
    // returns NO subtrees before execution — which is exactly how this
    // net passed vacuously for every heavy query until the nonEmpty
    // guard below (ADVICE r17). The bench session — where the JIT-size
    // claims live — runs AQE off, so this measures the plans as
    // benched.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try heavies.foreach { name =>
      val p = SparkEntry.queries(name)(spark, sf001).queryExecution.executedPlan
      val subtrees = codegenStringSeq(p)
      // ADVICE r17: the net must not pass VACUOUSLY — a heavy query
      // whose plan yields no codegen subtrees (codegen disabled, plan
      // drift), or whose ByteCodeStats reports the unavailable sentinel
      // (-1 <= 8000), would otherwise silently stop being guarded.
      assert(subtrees.nonEmpty,
        s"$name: no whole-stage-codegen subtrees — the JIT-limit net is " +
          "not measuring this query at all")
      assert(subtrees.exists(_._3.maxMethodCodeSize > 0),
        s"$name: every subtree reports a non-positive maxMethodCodeSize — " +
          "ByteCodeStats is unavailable and the net is vacuous")
      subtrees.foreach { case (subtree, _, stats) =>
        assert(stats.maxMethodCodeSize <= 8000,
          s"$name: a generated method is ${stats.maxMethodCodeSize} bytecode " +
            "bytes (> 8000) — HotSpot will refuse to JIT it and the stage " +
            s"will run in the bytecode interpreter. Subtree:\n$subtree")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("JIT-limit net sweeps every declared query, including construction-time stages") {
    // Round 18 (VERDICT r17 #4): the r17 heavies list missed two whole
    // families — queries whose FINAL plan hosts a pushed graft
    // expression but were never listed (q36/q45/q70/q71/q87/q88/q90/
    // q91), and the eager-at-construction paths (q60/q85/q93/q95/q96,
    // the composed ingest day — which fuses more operators than any
    // bench query) whose hot stages execute while the DataFrame is
    // BUILT and never appear in the returned assembly plan. This sweep
    // covers both: every declared query's final plan is netted, and a
    // QueryExecutionListener captures every construction-time execution
    // (localCheckpoint actions, counts) so their fused stages are
    // netted too. The streaming twins share these exact operator seams
    // (incrementalDedupPrebuilt / runPipelineDay), so their stages are
    // the same generated classes.
    import org.apache.spark.sql.execution.debug._
    import org.apache.spark.sql.util.QueryExecutionListener
    import org.apache.spark.sql.execution.QueryExecution
    import scala.jdk.CollectionConverters._
    val captured =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, org.apache.spark.sql.execution.SparkPlan)]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        captured.add((funcName, qe.executedPlan))
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    // Expressions registered by graft that can be pushed into fused
    // join/filter stages — the class of the r17 q46/q43 disease.
    val graftExprs = Seq("sorted_intersect_size", "sorted_jaccard",
      "plane_signatures", "mip_assign", "ivf_tree_assign",
      "band_match_before", "double_dot", "float_dot")
    def netOver(label: String, p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val subtrees = codegenStringSeq(p)
      subtrees.foreach { case (subtree, _, stats) =>
        assert(stats.maxMethodCodeSize <= 8000,
          s"$label: a generated method is ${stats.maxMethodCodeSize} bytecode " +
            s"bytes (> 8000) — HotSpot will refuse to JIT it. Subtree:\n$subtree")
      }
      subtrees.count(_._3.maxMethodCodeSize > 0)
    }
    // AQE OFF (same reason as the heavies test above): adaptive-wrapped
    // plans yield no codegen subtrees pre-execution, which would make
    // this sweep blind for exactly the exchange-bearing queries it
    // exists to cover; the bench session runs AQE off.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.listenerManager.register(listener)
    try {
      var measured = 0
      var hosting = 0
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val df = fn(spark, sf0001) // eager queries run their jobs HERE (captured)
        val p = df.queryExecution.executedPlan
        val n = netOver(s"$name (final plan)", p)
        measured += n
        if (graftExprs.exists(p.toString.contains)) {
          hosting += 1
          // A graft-expression-hosting plan with zero measured methods
          // would be the vacuous-net failure mode (ADVICE r17).
          assert(n > 0, s"$name hosts a graft expression but the net " +
            "measured no generated method for it")
        }
      }
      // The execution-listener bus is asynchronous: poll until the
      // captured set stops growing (construction jobs all finished
      // above, so only delivery latency remains).
      var prev = -1
      var waited = 0
      while (captured.size != prev && waited < 100) {
        prev = captured.size; Thread.sleep(100); waited += 1
      }
      captured.asScala.foreach { case (fn, p) =>
        measured += netOver(s"construction-time execution ($fn)", p)
      }
      // Sanity floor: the sweep must actually be measuring. The lazy
      // surface alone hosts graft expressions in >= 10 final plans, and
      // the eager paths (q60/q85/q93/q95/q96 at minimum) run
      // construction-time executions.
      assert(hosting >= 10, s"only $hosting final plans host graft expressions")
      assert(captured.size >= 5,
        s"only ${captured.size} construction-time executions captured")
      assert(measured >= 100, s"only $measured generated methods measured")
    } finally {
      spark.listenerManager.unregister(listener)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("the JIT-limit net detects the disease: the pre-fix composed signature form exceeds it") {
    // Canary proving the previous test can actually see the failure
    // class it guards against: the round-17 PRE-fix q46 signature
    // projection (8 tables of composed CASE/shiftleft/double_dot in one
    // array(...) expression) must measure OVER the 8000-byte limit. If
    // a future Spark learns to subdivide single projection expressions,
    // this canary fails first — delete it and celebrate; the net above
    // keeps guarding the sizes that matter either way.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.debug._
    graft.expressions.GraftFunctions.register(spark)
    def dotc(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("double_dot", a, b)
    def planesFor(t: Int): Array[Array[Double]] = {
      val rnd = new scala.util.Random(42L + t)
      Array.fill(8, 64)(rnd.nextGaussian())
    }
    def signature(v: org.apache.spark.sql.Column, planes: Array[Array[Double]]) = {
      planes.zipWithIndex.map { case (p, i) =>
        when(dotc(v, lit(p)) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val oldForm = graft.ops.Tables.embeddings(spark, sf001)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding").as("ne"))
      .withColumn("nsigs", array((0 until 8).map(t =>
        signature(org.apache.spark.sql.functions.col("ne"), planesFor(t))): _*))
    val maxOld = codegenStringSeq(oldForm.queryExecution.executedPlan)
      .map(_._3.maxMethodCodeSize).max
    assert(maxOld > 8000,
      s"the composed 8-table signature projection now compiles to $maxOld <= 8000 " +
        "bytecode bytes — Spark has learned to split it; this canary is obsolete")
  }

  test("q61 compares only within blocks — the fuzzy join is an equi-join on the block key") {
    // Blocking is the point of the operator: the levenshtein comparison
    // must sit on top of a hash join keyed by p_brand (broadcast or
    // shuffled — either is block-local), never a nested-loop over all
    // part pairs.
    val p = plan("q61_fuzzy_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
           p.contains("ShuffledHashJoin"),
      s"q61 is not a hash/merge equi-join on the block key:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "q61 degenerated to an all-pairs comparison")
  }

  test("runtime bloom-filter join pruning injects on a selective shuffle join") {
    // The 100 TB scan-reduction feature: when one join side shrinks
    // behind a selective filter, Spark can build a bloom filter over its
    // keys at runtime and push `bloom_filter_might_contain` into the big
    // side's scan stage, skipping rows that cannot match before the
    // shuffle. The default size thresholds (10 MB creation side) never
    // trigger at test scale, so pin the MECHANISM by lowering them; the
    // production session keeps the defaults, where the feature arms
    // itself exactly when the big-side scan is worth pruning.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> scala.util.Try(conf.get(k)).toOption)
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      val li = ops.Tables.lineitem(spark, sf001)
      val ord = ops.Tables.orders(spark, sf001)
        .filter(col("o_orderpriority") === "1-URGENT")
      val p = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
        .queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"runtime bloom filter did not inject:\n${p.take(800)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("partition pruning: static literal and runtime dynamic (DPP) both prune the scan") {
    // The other half of the 100 TB scan story: a date/category-
    // partitioned fact table must be read partially. Static pruning
    // (literal predicate on the partition column) and dynamic partition
    // pruning (the partition predicate only materializes at runtime from
    // the filtered dimension side of a join) are both pinned here on a
    // small partitioned copy of events.
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val ev = ops.Tables.events(spark, sf001).select("event_id", "event_type", "value")
    graft.sources.Sources.writePartitioned(ev, dir, Seq("event_type"))
    val part = spark.read.parquet(dir)
    // static: the literal partition filter reaches the scan
    val pStatic = part.filter(col("event_type") === "click")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(pStatic.contains("PartitionFilters: [isnotnull(event_type") &&
           pStatic.contains("(event_type"), s"static partition pruning missing:\n$pStatic")
    // dynamic: joining a filtered dim on the partition column plants a
    // dynamicpruning subquery in the scan's partition filters. Two
    // traps make this test deliberately production-shaped: the dim must
    // be a real datasource relation (a literal in-memory relation
    // constant-folds its filter away, failing DPP's selectivity
    // heuristic), and the dim filter must be on a NON-join column — a
    // filter on the join key itself gets transitively inferred into the
    // fact scan as a STATIC partition filter, which is better than DPP
    // and leaves it nothing to do.
    import spark.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("purchase", 1), ("click", 0), ("view", 0)).toDF("t", "billable")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("billable") === 1)
    val pDyn = part.join(dim, part("event_type") === dim("t"))
      .groupBy("event_type").count()
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(pDyn.contains("dynamicpruning"), s"DPP subquery missing:\n${pDyn.take(900)}")
  }

  test("semanticDedup's pair stage is an equi-join on the cell key, never a cartesian") {
    // The SemDeDup composite's scale contract: the quadratic compare is
    // BLOCKED by the k-means cell — the pair stage must plan as a
    // hash/merge equi-join on `cell` (embeddings cross exactly one
    // exchange), and nothing in the pair pipeline may degrade to a
    // nested-loop over the corpus. Pinned on the PRODUCTION pair plan
    // (Approx.semanticDedupPairs — the exact DataFrame semanticDedup
    // feeds to dedupClusters), so a drift in the operator's join shape
    // (e.g. dropping the cell predicate) trips this test; the previous
    // hand-rebuilt replica could not.
    val emb = graft.ops.Tables.embeddings(spark, sf0001)
    val p = graft.operators.Approx
      .semanticDedupPairs(emb, minSim = 0.35, nlist = 4, seed = 42L)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"semanticDedup pair stage degraded to a nested loop:\n${p.take(600)}")
    assert(p.contains("Join") && p.contains("cella"),
      "expected an equi-join keyed on the cell")
  }

  test("incrementalSemanticDedup broadcasts the increment — the index never crosses an exchange") {
    // The daily-batch screen's scale contract: the small increment is
    // the BUILD side of a broadcast hash join keyed on the cell, so the
    // ingested index streams map-side off its parquet scan; no
    // cartesian/NLJ fallback, and no index-sized shuffle may exist
    // before the verdict aggregate (the q88_stored_batch smoke's
    // shuffleWrite ≈ 0.1 MB at 495k index vectors is this plan's
    // runtime receipt). Pinned on the production operator itself.
    val emb = graft.ops.Tables.embeddings(spark, sf0001)
    val isNew = pmod(col("vec_id"), lit(10)) >= 7
    val idx = graft.operators.Approx.buildSemanticIndex(
      emb.filter(!isNew), graft.ops.Extended.Q84Centroids.map(_.map(_.toDouble)))
    val p = graft.operators.Approx
      .incrementalSemanticDedup(idx, emb.filter(isNew))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"incremental semantic screen degraded to a nested loop:\n${p.take(600)}")
    assert(p.contains("BroadcastHashJoin") && p.contains("cella"),
      "expected the increment broadcast as a hash join keyed on the cell")
  }

  test("q89 exchanges only the (lang, cell) key space — partial agg below, window above") {
    // The monitoring query's scale contract: cell assignment is
    // scan-side, the count aggregates PARTIALLY before its exchange
    // (so the exchange carries languages × nlist rows, not vectors),
    // and the share window runs over that aggregate — nothing
    // corpus-sized moves past the id-keyed lang join.
    val p = plan("q89_cell_balance")
    assert(p.contains("HashAggregate") && p.contains("partial_count"),
      "q89 lost its map-side partial aggregation")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "q89 degenerated to a nested loop")
  }

  test("q73 computes every repetition signal in one narrow scan pass") {
    // The point of the sorted-run-fold/array_distinct formulation: no
    // aggregate operator, no exchange except the declared orderBy's
    // range partition — at 100 TB the whole query is a single map pass.
    val p = plan("q73_repetition_stats")
    val exchanges = p.split("\\(\\d+\\) ").filter(_.startsWith("Exchange"))
    assert(exchanges.length === 1,
      s"q73 grew a compute shuffle (expected only the orderBy):\n${p.take(600)}")
    assert(exchanges.head.contains("rangepartitioning"),
      s"q73's one exchange should be the orderBy range partition: ${exchanges.head.take(200)}")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"q73 should have no aggregate operator (all signals are array exprs):\n${p.take(600)}")
    assert(p.contains("struct<doc_id:bigint,text:string>"),
      "q73 should scan only doc_id and text")
  }

  test("q74's boilerplate set broadcasts — the hot words never key a shuffle join") {
    // The 5 boilerplate words cover ~80% of all tokens; a shuffle join
    // keyed on the word would funnel the corpus into 5 partitions. The
    // set must come out of a TakeOrderedAndProject (vocabulary-sized
    // partial agg, never a global sort) and join as a broadcast.
    val p = plan("q74_boilerplate_scrub")
    assert(p.contains("BroadcastHashJoin"),
      s"q74's boilerplate mark lost its broadcast:\n${p.take(600)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"q74 joins on the hot word via a shuffle:\n${p.take(600)}")
    assert(p.contains("TakeOrderedAndProject"),
      s"q74's top-5 selection became a global sort:\n${p.take(600)}")
  }

  test("q76/q77's dedup exchanges carry window hashes, never text") {
    // SubstringDedup's scale contract: document text stays scan-side —
    // the ownership groupBy and its joins move (doc_id, start, h)
    // tuples only. If a refactor ever materialized `text` (or the
    // token array `ws`) into a shuffle or broadcast, that exchange's
    // Input list would name it — the 100 TB wire cost would jump from
    // 20 B/window to the corpus bytes.
    Seq("q76_window_stats", "q77_window_scrub").foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$n degraded to a nested loop:\n${p.take(600)}")
      val sections = p.split("\\(\\d+\\) ")
      // Word-bounded: `kept_text#` (q77's REWRITTEN output, which the
      // presentation sort legitimately carries) must not match.
      val textAttr = "(?<![A-Za-z0-9_])(text|ws)#".r
      sections.filter(s => s.startsWith("Exchange") || s.startsWith("BroadcastExchange"))
        .foreach { e =>
          assert(textAttr.findFirstIn(e).isEmpty,
            s"$n ships text through an exchange:\n${e.take(400)}")
        }
    }
    // q77's rebuild join IS allowed to move the token array (the
    // inherent rewrite delivery) — but only AFTER the dedup stages:
    // the exchange feeding the ownership aggregate must still be
    // hash-only, which the blanket assertion above already proves.
  }

  test("q81's per-source cap runs as a map-side window group limit") {
    // The scale contract of a rank-<=-k cap: InferWindowGroupLimit must
    // rewrite the row_number filter into partial WindowGroupLimit nodes
    // below the exchange, so a skew-heavy source ships <= k rows per
    // input partition instead of its whole crawl. Losing the rewrite
    // (e.g. by ranking with a non-rank function or filtering after a
    // projection barrier) silently reverts to full-partition sorts.
    val p = plan("q81_source_cap")
    assert(p.contains("WindowGroupLimit"),
      s"q81 lost the group-limit rewrite:\n${p.take(600)}")
  }

  test("incremental window screen broadcasts increment hashes — the index never shuffles") {
    // The q92/incrementalWindowStats scale contract: the stored window
    // index is touched by exactly ONE map-side pass (a broadcast
    // left-semi against the increment's distinct hashes), and every
    // other join is increment-bounded broadcast — no index-sized
    // exchange, no SMJ over the index, no nested loop. Pinned on the
    // production operator (xxhash64 keys) against a parquet-backed
    // index, the deployment shape.
    val docs = graft.ops.Tables.documents(spark, sf0001).select("doc_id", "text")
    val isNew = pmod(col("doc_id"), lit(10)) >= 7
    val dir = java.nio.file.Files.createTempDirectory("graft_widxplan").toString
    graft.operators.SubstringDedup.buildWindowIndex(docs.filter(!isNew), k = 8)
      .write.mode("overwrite").parquet(dir)
    Seq(
      graft.operators.SubstringDedup.incrementalWindowStats(
        spark.read.parquet(dir), docs.filter(isNew), k = 8),
      graft.operators.SubstringDedup.incrementalWindowScrub(
        spark.read.parquet(dir), docs.filter(isNew), k = 8)
    ).foreach { df =>
      val p = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"window screen degraded to a nested loop:\n${p.take(600)}")
      assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
        s"expected the index's one pass to be a broadcast left-semi scan:\n${p.take(600)}")
      // Every hash-keyed join must be broadcast (the index's semi pass
      // and the increment-bounded combined/instance joins); the one
      // permitted sort-merge is the final doc_id-keyed LEFT join back
      // to the increment's doc list — increment-sized by construction.
      val smjKeys = """\(\d+\) SortMergeJoin[\s\S]*?Left keys \[\d+\]: \[(\w+)""".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
      assert(smjKeys.forall(_.startsWith("doc_id")),
        s"a sort-merge join on a non-doc key (index-sized side?) appeared: $smjKeys")
    }
  }

  test("whole-stage codegen is active in the scan-heavy queries") {
    // the AQE-final simple plan marks fused codegen stages with "*(n)"
    Seq("q01_scan_filter_project", "q03_agg_pricing", "q38_star_denorm").foreach { n =>
      val df = SparkEntry.queries(n)(spark, sf001)
      df.collect() // collect executes THIS QueryExecution (count/foreach build new ones)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("*("), s"$n lost whole-stage codegen:\n${p.take(400)}")
    }
  }
}
