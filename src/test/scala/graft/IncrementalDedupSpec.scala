package graft

import org.apache.spark.sql.functions._

/** Incremental dedup (round 13): the asymmetric increment-vs-index
  * screen must agree with the symmetric family it claims to shortcut,
  * and its verdict conventions must hold on a corpus where every case
  * is planted by hand. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("crafted corpus: dup_old / dup_new / keep conventions") {
    // Index: doc 1 is the "already ingested" text, doc 2 is unrelated.
    val index = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    // Increment:
    //  17 ≡ index doc 1                        → dup_old
    //  27 new-unique text, first of its pair   → keep (nothing earlier)
    //  37 ≡ 27 (within-increment duplicate)    → dup_new (27 is earlier)
    //  47 shares 5 of 10 tokens with 27        → keep (J = 1/3 < 0.8)
    //  57 empty text (no token set)            → keep (never pairs)
    //  67 ≡ index doc 1 AND ≡ 17               → dup_old (CASE priority
    //     over the also-true dup_new)
    val increment = Seq(
      (17L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (27L, "red orange yellow green blue indigo violet black white grey"),
      (37L, "red orange yellow green blue indigo violet black white grey"),
      (47L, "red orange yellow green blue lion tiger bear wolf fox"),
      (57L, ""),
      (67L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val out = graft.operators.Approx.incrementalDedup(spark, index, increment)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      17L -> "dup_old", 27L -> "keep", 37L -> "dup_new",
      47L -> "keep", 57L -> "keep", 67L -> "dup_old"))
  }

  test("stored-index round trip: parquet-persisted MinHashIndex screens identically") {
    // The production deployment builds the index ONCE, writes it, and
    // every batch reads it back — the screen must not care. The index
    // frames round-trip through parquet (losing lineage, stats, and
    // the in-memory partitioning) and the verdicts must equal the
    // direct two-corpus form row for row.
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    val isNew = pmod(col("doc_id"), lit(10)) >= 7
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx").toString
    val built = graft.operators.Approx.buildMinHashIndex(spark, docs.filter(!isNew))
    built.sets.write.mode("overwrite").parquet(s"$dir/sets")
    built.bands.write.mode("overwrite").parquet(s"$dir/bands")
    val stored = graft.operators.Approx.MinHashIndex(
      spark.read.parquet(s"$dir/sets"), spark.read.parquet(s"$dir/bands"))
    val viaStored = graft.operators.Approx
      .incrementalDedup(spark, stored, docs.filter(isNew))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val direct = SparkEntry.queries("q86_incremental_dedup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(viaStored.toSeq === direct.toSeq)
  }

  test("asymmetric screen ≡ verdicts derived from the symmetric pair set (sf0.001)") {
    // The operator's claim: restricting the symmetric q59 pair set to
    // increment-involving pairs yields exactly what the asymmetric
    // band join emits (banding is per-doc; the emit-once minimal-band
    // check is symmetric in the two signatures). So deriving verdicts
    // from minhashPairs — the declared q59 surface, a completely
    // independent join shape — must reproduce q86 row for row.
    val isNewOf: Long => Boolean = id => id % 10 >= 7
    val pairs = graft.ops.Extended.minhashPairs(spark, sf0001)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val newIds = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).filter(isNewOf).sorted
    val expected = newIds.map { d =>
      val others = sym.collect { case (x, y) if x == d => y }
      val verdict =
        if (others.exists(!isNewOf(_))) "dup_old"
        else if (others.exists(o => isNewOf(o) && o < d)) "dup_new"
        else "keep"
      d -> verdict
    }.toMap
    val actual = SparkEntry.queries("q86_incremental_dedup")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(actual === expected)
  }

  // ----- semantic family (incrementalSemanticDedup / declared q88) -----

  test("semantic crafted corpus: dup_old / dup_new / keep conventions") {
    // Hand-planted 4-dim vectors where every verdict case is known.
    // Quantizer: two axis centroids; 27/37 score 0 against BOTH (tie →
    // first cell, q84's convention), so they co-cell with v1 but their
    // cosine against it is 0 → only their mutual ≈1 pairs.
    val cents = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val index = graft.operators.Approx.buildSemanticIndex(
      Seq((1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)))
        .toDF("vec_id", "embedding"), cents)
    val increment = Seq(
      17L -> Seq(0.995f, 0.0999f, 0f, 0f), //  ≈ index v1     → dup_old
      27L -> Seq(0f, 0f, 0.9f, 0.436f),    //  ⊥ everything   → keep
      37L -> Seq(0f, 0f, 0.9f, 0.436f),    //  ≡ 27 (earlier) → dup_new
      47L -> Seq(0f, 0f, 0f, 0f),          //  zero-norm      → keep
      67L -> Seq(0.995f, 0.0999f, 0f, 0f)  //  ≈ v1 AND ≈ 17  → dup_old
                                           //  (CASE priority over dup_new)
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Approx.incrementalSemanticDedup(index, increment)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(17L -> "dup_old", 27L -> "keep", 37L -> "dup_new",
      47L -> "keep", 67L -> "dup_old"))
  }

  test("semantic: operator with q84's literal cells ≡ declared q88 (sf0.001)") {
    // The operator generalizes q88's quantizer to ANY centroid list;
    // under q84's literals it must reproduce the declared, DuckDB-
    // value-checked query row for row — cell arithmetic (double_dot ≡
    // the element_at fold), first-max tie rule, float32 cosine chain,
    // and verdict CASE all pinned at once.
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    val isNew = pmod(col("vec_id"), lit(10)) >= 7
    val cents = graft.ops.Extended.Q84Centroids.map(_.map(_.toDouble))
    val index = graft.operators.Approx.buildSemanticIndex(emb.filter(!isNew), cents)
    val viaOp = graft.operators.Approx
      .incrementalSemanticDedup(index, emb.filter(isNew))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val declared = SparkEntry.queries("q88_incremental_semantic")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(viaOp.toSeq === declared.toSeq)
  }

  test("semantic stored-index round trip: parquet vectors + centroid table") {
    // Production builds the index once and reads it back per batch:
    // vectors through parquet, the quantizer through its tiny
    // (cell, centroid) table — the screen must not care.
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    val isNew = pmod(col("vec_id"), lit(10)) >= 7
    val cents = graft.ops.Extended.Q84Centroids.map(_.map(_.toDouble))
    val dir = java.nio.file.Files.createTempDirectory("graft_semidx").toString
    val built = graft.operators.Approx.buildSemanticIndex(emb.filter(!isNew), cents)
    built.vectors.write.mode("overwrite").parquet(s"$dir/vectors")
    graft.operators.Approx.semanticCentroidsDF(spark, built.centroids)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    val stored = graft.operators.Approx.SemanticIndex(
      spark.read.parquet(s"$dir/vectors"),
      graft.operators.Approx.semanticCentroidsFromDF(
        spark.read.parquet(s"$dir/centroids")))
    assert(stored.centroids === built.centroids)
    val viaStored = graft.operators.Approx
      .incrementalSemanticDedup(stored, emb.filter(isNew))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val direct = SparkEntry.queries("q88_incremental_semantic")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(viaStored.toSeq === direct.toSeq)
  }

  test("semantic: fitted IVF quantizer (q66's production cells) screens sanely") {
    // The production path: fit centroids ONCE on the full corpus (the
    // sampled-fit seam is the same hashSample rule the q66 smoke
    // measured), index the old side, screen the increment. Fitted cells
    // have no SQL twin — the pins here are structural: one verdict per
    // increment vector, planted families straddling the %10 split must
    // surface as dup_old (family members are near-identical, and a
    // same-family index vector exists for some increment vectors), and
    // keepers exist (singletons whose family fell wholly old or new).
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    val isNew = pmod(col("vec_id"), lit(10)) >= 7
    val cents = graft.operators.Approx.fitSemanticCentroids(emb, nlist = 8)
    assert(cents.length === 8)
    val index = graft.operators.Approx.buildSemanticIndex(emb.filter(!isNew), cents)
    val out = graft.operators.Approx
      .incrementalSemanticDedup(index, emb.filter(isNew))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expectedIds = emb.filter(isNew).collect().map(_.getLong(0)).sorted
    assert(out.map(_._1).sorted.toSeq === expectedIds.toSeq)
    val hist = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(hist.getOrElse("dup_old", 0) > 0, s"no dup_old in $hist")
    assert(hist.getOrElse("keep", 0) > 0, s"no keep in $hist")
  }
}
