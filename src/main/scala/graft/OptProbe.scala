package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 optimization scratch probe: stage decompositions of the
  * bench heavies under the exact bench-session config. Each experiment
  * is a named thunk; `sbt "runMain graft.OptProbe <name>..."` times the
  * requested ones (1 warm + 3 passes, min). Kept in-tree so the numbers
  * in OPTIMIZATION_r17.md are reproducible.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftFunctions.register(spark)

    // Wall-clock on this sandbox is unusable for A/B right now (external
    // CPU stalls inflate single passes up to 10x); executor CPU time
    // (task metrics) measures the actual work and is stable across
    // stalls. Report both: min wall for context, min summed CPU for the
    // decision.
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) cpuNs.addAndGet(m.executorCpuTime + m.executorDeserializeCpuTime)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def time(name: String)(mk: () => DataFrame): Unit = {
      val r = mk().count()
      val ts = (1 to 3).map { _ =>
        cpuNs.set(0)
        val t0 = System.nanoTime(); mk().count()
        val wall = (System.nanoTime() - t0) / 1e9
        // Listener-bus delivery lags task end; drain with a sentinel.
        spark.sparkContext.parallelize(Seq(0), 1).count()
        Thread.sleep(200)
        (wall, cpuNs.get() / 1e9)
      }
      val minWall = ts.map(_._1).min
      val minCpu = ts.map(_._2).min
      println(f"OPTPROBE $name rows=$r wallMin=$minWall%.3f cpuMin=$minCpu%.3f " +
        s"cpuAll=${ts.map(t => f"${t._2}%.3f").mkString(",")}")
    }

    // q59 decomposition pieces, replicated from Extended.minhashPairs /
    // Approx.md5SetsAndBands so stages can be timed in isolation.
    def q59cand(): DataFrame = {
      val (_, cand) = graft.operators.Approx.bandedMd5Candidates(
        spark, graft.ops.Tables.documents(spark, sfDir))
      cand
    }
    def q59full(): DataFrame = graft.ops.Extended.minhashPairs(spark, sfDir)
    // Variant: exact-integer acceptance (9i >= 4(na+nb)) instead of the
    // double-ratio filter — same pair set (rational-vs-double-boundary
    // proof in OPTIMIZATION_r17.md), but the pushed join condition then
    // carries ONE sorted_intersect_size call instead of two.
    def q59int(): DataFrame = {
      val (sets, cand) = graft.operators.Approx.bandedMd5Candidates(
        spark, graft.ops.Tables.documents(spark, sfDir))
      val ratio = col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double")
      graft.operators.Approx.rescoredPairs(spark, cand, sets,
        col("na") * 5 >= col("nb") * 4 && col("nb") * 5 >= col("na") * 4)
        .filter(col("i") * 9 >= (col("na") + col("nb")) * 4)
        .select(col("a"), col("b"),
          graft.ops.Determinism.dround(ratio, 4).as("jaccard"))
    }
    // Candidates surviving the size prune (how many sis calls the
    // condition pays), and the post-prune candidate count.
    def q59pruned(): DataFrame = {
      val (sets, cand) = graft.operators.Approx.bandedMd5Candidates(
        spark, graft.ops.Tables.documents(spark, sfDir))
      cand
        .join(sets.select(col("doc_id").as("a"), col("n").as("na")), "a")
        .join(sets.select(col("doc_id").as("b"), col("n").as("nb")), "b")
        .filter(col("na") * 5 >= col("nb") * 4 && col("nb") * 5 >= col("na") * 4)
    }

    // Round-16 formulations kept verbatim for same-session CPU A/Bs
    // against the declared (changed) queries.
    def q35old(): DataFrame = {
      val toks = graft.ops.Tables.documents(spark, sfDir)
        .select(col("doc_id"), sort_array(array_distinct(split(col("text"), " "))).as("toks"))
      val probe = toks.filter(col("doc_id") < 100)
        .select(col("doc_id").as("a"), col("toks").as("ta"), size(col("toks")).cast("long").as("sa"))
      val corpus = toks.select(col("doc_id").as("b"), col("toks").as("tb"), size(col("toks")).cast("long").as("sb"))
        .repartition(math.min(spark.sparkContext.defaultParallelism, 8))
      val i = graft.expressions.GraftFunctions.sortedIntersectSize(spark, "ta", "tb")
      val ratio = col("i").cast("double") / (col("sa") + col("sb") - col("i"))
      broadcast(probe).crossJoin(corpus)
        .filter(col("a") < col("b") &&
                col("sa") * 5 >= col("sb") * 4 && col("sb") * 5 >= col("sa") * 4)
        .select(col("a"), col("b"), i.as("i"), col("sa"), col("sb"))
        .filter(ratio >= 0.8)
        .select(col("a"), col("b"), graft.ops.Determinism.dround(ratio, 4).as("jaccard"))
        .orderBy("a", "b")
    }
    def q64old(): DataFrame = {
      val grams = graft.ops.Tables.documents(spark, sfDir)
        .filter(length(col("text")) >= 3)
        .select(col("doc_id"), expr("packed_trigrams(text)").as("gs"))
      val probe = grams.filter(col("doc_id") < 100)
        .select(col("doc_id").as("a"), col("gs").as("ta"), size(col("gs")).cast("long").as("sa"))
      val corpus = grams
        .select(col("doc_id").as("b"), col("gs").as("tb"), size(col("gs")).cast("long").as("sb"))
        .repartition(math.min(spark.sparkContext.defaultParallelism, 8))
      val i = graft.expressions.GraftFunctions.sortedIntersectSize(spark, "ta", "tb")
      val ratio = col("i").cast("double") / (col("sa") + col("sb") - col("i"))
      broadcast(probe).crossJoin(corpus)
        .filter(col("a") < col("b") &&
                col("sa") * 5 >= col("sb") * 4 && col("sb") * 5 >= col("sa") * 4)
        .select(col("a"), col("b"), i.as("i"), col("sa"), col("sb"))
        .filter(ratio >= 0.8)
        .select(col("a"), col("b"), graft.ops.Determinism.dround(ratio, 4).as("jaccard"))
        .orderBy("a", "b")
    }

    // q43 replica (the mid-round two-intersect formulation — predates
    // the sorted_jaccard + merge-kernel rewrites; kept verbatim so the
    // round's A/B numbers reproduce) and the prefiltered variant:
    // a NECESSARY one-intersect integer bound (round4(i/u) >= 0.8 ⟹
    // r > 0.7999 ⟹ 17999·i > 7999·(na+nb)) ahead of the exact rounded
    // acceptance, so the two-intersect + BigDecimal-round condition only
    // runs on near-threshold candidates.
    def q43variant(prefilter: Boolean): DataFrame = {
      val docs = graft.ops.Tables.documents(spark, sfDir)
      val tokens = docs.select(col("doc_id"),
        sort_array(array_distinct(filter(split(col("text"), " "), w => w =!= ""))).as("toks"))
      val sigs = graft.operators.Approx.mlMinhashSignatures(tokens, 8)
        .repartition(spark.sparkContext.defaultParallelism)
      val banded = sigs
        .select(col("doc_id"), col("sig"), posexplode(col("sig")).as(Seq("t", "hv")))
      val cand = banded.as("x").join(banded.as("y"),
          col("x.t") === col("y.t") && col("x.hv") === col("y.hv") &&
          col("x.doc_id") < col("y.doc_id") &&
          !expr("band_match_before(x.sig, y.sig, 1, x.t)"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      val sets = tokens.select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("n"))
      val inter = graft.expressions.GraftFunctions.sortedIntersectSize(spark, "ta", "tb")
      val jac = col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double")
      val base = cand
        .join(sets.select(col("doc_id").as("a"), col("toks").as("ta"), col("n").as("na")), "a")
        .join(sets.select(col("doc_id").as("b"), col("toks").as("tb"), col("n").as("nb")), "b")
        .filter(least(col("na"), col("nb")).cast("double") >=
                (lit(0.8) - lit(5.1e-5)) * greatest(col("na"), col("nb"))
                  - lit(1e-9) * greatest(col("na"), col("nb")))
        .select(col("a"), col("b"), inter.as("i"), col("na"), col("nb"))
      val pre = if (prefilter)
        base.filter(col("i") * 17999L > (col("na") + col("nb")) * 7999L)
      else base
      pre
        .select(col("a"), col("b"), round(jac, 4).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
        .orderBy("a", "b")
    }

    var lastEdges: Option[DataFrame] = None
    // q60's `edges` phase in isolation: explode both directions of the
    // pair set, repartition by y, localCheckpoint — measures the
    // materialization overhead above the bare pair-pipeline count.
    def q60edges(): DataFrame = {
      val pairs = graft.ops.Extended.minhashPairs(spark, sfDir).select(col("a"), col("b"))
      val parts = math.max(spark.sessionState.conf.numShufflePartitions,
        spark.sparkContext.defaultParallelism)
      lastEdges.foreach(e =>
        try graft.operators.Materialized.free(e) catch { case _: Throwable => () })
      val e = pairs
        .select(explode(array(
          struct(col("a").as("x"), col("b").as("y")),
          struct(col("b").as("x"), col("a").as("y")))).as("e"))
        .select(col("e.x").as("x"), col("e.y").as("y"))
        .repartition(parts, col("y"))
        .localCheckpoint(true)
      lastEdges = Some(e)
      e
    }

    // The round-17 q62 candidate REJECTED by measurement (kept for the
    // reproducible A/B): per-doc bigram counts shared by model and
    // score sides through one ReusedExchange — one tokenize pass
    // instead of two, but a full occurrence-scale exchange + two extra
    // hash aggregates. cnt ≈ 1 on this corpus, so nothing compresses:
    // 0.671 → 0.983 CPU-s (+46%) vs the declared occurrence form.
    def q62docbg(): DataFrame = {
      import graft.ops.Determinism.dround
      val toks = split(col("text"), " ")
      val nAdj = greatest(size(toks) - 1, lit(0))
      val docBG = graft.ops.Tables.documents(spark, sfDir)
        .select(col("doc_id"), explode(zip_with(
            slice(toks, lit(1), nAdj), slice(toks, lit(2), nAdj),
            (x, y) => struct(x.as("w1"), y.as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .filter(col("w1") =!= "" && col("w2") =!= "")
        .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("cnt"))
      val c2 = docBG.groupBy("w1", "w2").agg(sum(col("cnt")).as("n2"))
      val vocab = graft.ops.Tables.documents(spark, sfDir)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .agg(countDistinct(col("w")).as("vocab"))
      val w1Tot = org.apache.spark.sql.expressions.Window.partitionBy("w1")
      val lp = c2.withColumn("n1", sum(col("n2")).over(w1Tot))
        .crossJoin(broadcast(vocab))
        .select(col("w1"), col("w2"),
                dround(log((col("n2") + 1).cast("double") /
                           (col("n1") + col("vocab")).cast("double")), 6).as("logp"))
      val logpDec = col("logp").cast(org.apache.spark.sql.types.DecimalType(27, 6))
      docBG.join(lp, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(sum(col("cnt")).as("n_bigrams"),
             sum(logpDec * col("cnt")).as("sd"))
        .select(col("doc_id"), col("n_bigrams"),
                dround(col("sd").cast("double") / col("n_bigrams"), 6).as("lm_score"))
        .orderBy("doc_id")
    }
    // Round-16 q57 formulation (size-filter duplicating the split) kept
    // verbatim for same-session CPU A/B against the guarded-explode form.
    def q57old(): DataFrame = {
      import graft.ops.Determinism.dround
      val sh = graft.ops.Tables.documents(spark, sfDir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 7), i -> array_join(slice(toks, i, 8), ' '))"))
          .as("sh"))
      val bench = sh.filter(col("doc_id") < 20).select(col("sh").as("bsh")).distinct()
      sh.filter(col("doc_id") >= 20)
        .join(broadcast(bench), col("sh") === col("bsh"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"), count(col("bsh")).as("n_hits"))
        .select(col("doc_id"), col("n_shingles"), col("n_hits"),
                dround(col("n_hits").cast("double") / col("n_shingles").cast("double"), 4)
                  .as("ratio"),
                (col("n_hits") > 0).as("contaminated"))
        .orderBy("doc_id")
    }

    // q46's corpus side in isolation: per-vector norms + 8 table
    // signatures (64 plane dots) + the table explode — how much of
    // q46's CPU is signature arithmetic vs the bucket join + re-score.
    def q46corpus(): DataFrame = {
      val emb = graft.ops.Tables.embeddings(spark, sfDir)
      def dotc(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        call_function("double_dot", a, b)
      def planesFor(t: Int): Array[Array[Double]] = {
        val rnd = new scala.util.Random(42L + t)
        Array.fill(8, 64)(rnd.nextGaussian())
      }
      def signature(v: org.apache.spark.sql.Column, planes: Array[Array[Double]]) = {
        val bits = planes.zipWithIndex.map { case (p, i) =>
          when(dotc(v, lit(p)) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
        }
        bits.reduce(_ + _)
      }
      emb.repartition(math.min(spark.sparkContext.defaultParallelism, 8))
        .select(col("vec_id").as("nid"), col("embedding").as("ne"))
        .withColumn("nnorm", sqrt(dotc(col("ne"), col("ne"))))
        .filter(col("nnorm") > 0)
        .withColumn("nsigs", array((0 until 8).map(t =>
          signature(col("ne"), planesFor(t))): _*))
        .withColumn("tb", explode(array((0 until 8).map(t =>
          struct(lit(t).as("t"), col("nsigs")(t).as("bucket"))): _*)))
        .select(col("nid"), col("nnorm"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    }

    // q60 edges-phase sub-steps: where do the ~20 CPU-s between the bare
    // pair pipeline (q59full ~10.5) and the materialized directed edge
    // set (q60edges ~30.4) go? Each isolates one mechanism.
    var lastCp: Option[DataFrame] = None
    def freeCp(): Unit = { lastCp.foreach(e =>
      try graft.operators.Materialized.free(e) catch { case _: Throwable => () }); lastCp = None }
    def cp(df: DataFrame): DataFrame = { freeCp(); val m = df.localCheckpoint(true); lastCp = Some(m); m }
    // pipeline + localCheckpoint of the 5M undirected pairs (no explode,
    // no exchange).
    def q60cpPairs(): DataFrame =
      cp(graft.ops.Extended.minhashPairs(spark, sfDir).select(col("a"), col("b")))
    // pipeline + explode to 10M directed rows, counted (no exchange, no
    // checkpoint).
    def q60explCount(): DataFrame =
      graft.ops.Extended.minhashPairs(spark, sfDir).select(col("a"), col("b"))
        .select(explode(array(
          struct(col("a").as("x"), col("b").as("y")),
          struct(col("b").as("x"), col("a").as("y")))).as("e"))
        .select(col("e.x").as("x"), col("e.y").as("y"))
    // pipeline + explode + repartition(32, y), counted (no checkpoint).
    def q60exchCount(): DataFrame =
      q60explCount().repartition(32, col("y"))

    // Same corpus side but carrying the full-width rows the real q46
    // join consumes (ne + nsigs ride the explode) — isolates the cost
    // of the wide interpreted Project/Generate chain from the join.
    def q46corpusWide(): DataFrame = {
      val emb = graft.ops.Tables.embeddings(spark, sfDir)
      def dotc(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        call_function("double_dot", a, b)
      def planesFor(t: Int): Array[Array[Double]] = {
        val rnd = new scala.util.Random(42L + t)
        Array.fill(8, 64)(rnd.nextGaussian())
      }
      def signature(v: org.apache.spark.sql.Column, planes: Array[Array[Double]]) = {
        val bits = planes.zipWithIndex.map { case (p, i) =>
          when(dotc(v, lit(p)) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
        }
        bits.reduce(_ + _)
      }
      emb.repartition(math.min(spark.sparkContext.defaultParallelism, 8))
        .select(col("vec_id").as("nid"), col("embedding").as("ne"))
        .withColumn("nnorm", sqrt(dotc(col("ne"), col("ne"))))
        .filter(col("nnorm") > 0)
        .withColumn("nsigs", array((0 until 8).map(t =>
          signature(col("ne"), planesFor(t))): _*))
        .withColumn("tb", explode(array((0 until 8).map(t =>
          struct(lit(t).as("t"), col("nsigs")(t).as("bucket"))): _*)))
        .select(col("nid"), col("ne"), col("nnorm"), col("nsigs"),
          col("tb.t").as("t"), col("tb.bucket").as("bucket"))
        .filter(col("bucket") >= 0 && size(col("nsigs")) > 0 && size(col("ne")) > 0 &&
                col("nnorm") >= 0)
    }

    // ---- r18 probes ----
    // q83 as MATERIALIZING consumers execute it (Verify's collect, any
    // write): under .count() Catalyst's EliminateSorts removes the
    // declared orderBy, so the count-based probes above never see the
    // global sort's cost — but a consumer that materializes the result
    // pays the RangePartitioner boundary-sampling job (one full upstream
    // evaluation) plus the sort pass (a second). Materializing via
    // localCheckpoint makes that cost visible for the r18 A/B: run this
    // probe before and after the Extended.q83SplitLeakage change.
    def q83mat(): DataFrame =
      cp(graft.ops.Extended.q83SplitLeakage(spark, sfDir))

    // q66 fit decomposition: the seeded Spark-ML KMeans fit alone (the
    // exact declared-q66 fit input: 8-partition pin, nlist = 4), to
    // split q66's CPU into [ML fit] vs [pair stage + components] (the
    // latter ≈ the q84 probe, same tail). The fit's centroids are
    // value-pinned through the q66 checksum, so this probe only
    // ACCOUNTS the cost — any change to the fit would change results.
    def q66fit(): DataFrame = {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val featured = graft.ops.Tables.embeddings(spark, sfDir)
        .repartition(8, col("vec_id"))
        .select(col("vec_id"), col("embedding"),
          array_to_vector(col("embedding")).as("features"))
      val model = new KMeans().setK(4).setSeed(42L)
        .setFeaturesCol("features").setPredictionCol("cell")
        .fit(featured)
      // Return a tiny DataFrame derived from the model so time() has an
      // action; the fit itself ran eagerly above.
      spark.createDataFrame(
        model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.size) }.toSeq)
        .toDF("cell", "dim")
    }

    // q37 argmax alternative (round 18, VERDICT r17 #8): per-doc max
    // score as a HASH aggregate, then an equality join back + min(w)
    // tie-break — trades the SortAggregate's in-partition sort for an
    // extra exchange + join + second aggregate. The struct/min form has
    // no hash-aggregable encoding (struct and string buffers are not
    // UnsafeRow-mutable; no fixed-width packing preserves the
    // (score desc, w asc) composite order with a string tie-break).
    def q37joinback(): DataFrame = {
      import graft.ops.Determinism.dround
      val docs = graft.ops.Tables.documents(spark, sfDir)
      val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val n = docs.agg(count(lit(1)).as("n"))
      val wdf = org.apache.spark.sql.expressions.Window.partitionBy("w")
      val scored = tf.withColumn("df", count(lit(1)).over(wdf))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("w"),
          dround(col("tf") * log(col("n") / col("df")), 6).as("score"))
      val best = scored.groupBy("doc_id").agg(max(col("score")).as("score"))
      best.join(scored, Seq("doc_id", "score"))
        .groupBy("doc_id", "score")
        .agg(min(col("w")).as("top_term"))
        .select(col("doc_id"), col("top_term"), col("score"))
        .orderBy("doc_id")
    }

    // q84's composed literal-quantizer assignment in isolation (the
    // 4-cell × 64-dim element_at chains + first-max CASE, forced past
    // count()-pruning by a filter on the cell).
    def q84assign(): DataFrame =
      graft.ops.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), graft.ops.Extended.q84Cell.as("cell"))
        .filter(col("cell") >= 0)
    // The same assignment through the mip_assign native call — the
    // bit-identity MipAssign's contract note + the q84/q88 equivalence
    // spec already pin.
    def q84mip(): DataFrame =
      graft.ops.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), call_function("mip_assign", col("embedding"),
          typedLit(graft.ops.Extended.Q84Centroids.map(_.map(_.toDouble)))).as("cell"))
        .filter(col("cell") >= 0)

    val experiments: Map[String, () => DataFrame] = Map(
      "q83mat" -> (() => q83mat()),
      "q37joinback" -> (() => q37joinback()),
      "q66fit" -> (() => q66fit()),
      "q84assign" -> (() => q84assign()),
      "q84mip" -> (() => q84mip()),
      "q62docbg" -> (() => q62docbg()),
      "q60cpPairs" -> (() => q60cpPairs()),
      "q60explCount" -> (() => q60explCount()),
      "q60exchCount" -> (() => q60exchCount()),
      "q57old" -> (() => q57old()),
      "q46corpus" -> (() => q46corpus()),
      "q46corpusWide" -> (() => q46corpusWide()),
      "q60edges" -> (() => q60edges()),
      "q59cand" -> (() => q59cand()),
      "q59pruned" -> (() => q59pruned()),
      "q59full" -> (() => q59full()),
      "q59int" -> (() => q59int()),
      "q35old" -> (() => q35old()),
      "q64old" -> (() => q64old()),
      "q43asis" -> (() => q43variant(false)),
      "q43pref" -> (() => q43variant(true))
    )
    val names = if (args.nonEmpty) args.toSeq else experiments.keys.toSeq.sorted
    names.foreach { n =>
      experiments.get(n) match {
        case Some(e) => time(n)(e)
        case None => // declared-query probe by name
          val fn = SparkEntry.queries.getOrElse(n, sys.error(s"unknown $n"))
          time(n)(() => fn(spark, sfDir))
      }
    }
    // Release the last experiment's outstanding checkpoint (ADVICE r17:
    // without this the final cp() block stayed resident for the session,
    // polluting any experiment run after it in the same invocation).
    freeCp()
    lastEdges.foreach(e =>
      try graft.operators.Materialized.free(e) catch { case _: Throwable => () })
    spark.stop()
  }
}
