package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Determinism._
import Tables._

/** LLM-data-pipeline operator family: JSON extraction, array ops, exact
  * and near deduplication, vector similarity search, tf-idf, token
  * frequency (SURVEY.md §2.8, §2.10).
  *
  * Everything stays inside codegen'd builtin expressions — no UDFs. The
  * declared queries are the exact formulations; their approximate
  * 100 TB-scale twins (MinHashLSH near-dup, LSH-bucketed ANN) live in
  * graft.operators.Approx since an exact quadratic join stops being the
  * right plan beyond memory scale.
  */
object TextSim {

  /** q28: JSON field extraction + aggregate. `get_json_object` is lighter
    * than `from_json` for a single path and stays codegen-friendly. */
  def q28JsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("event_type")
      .agg(dround(avg(get_json_object(col("props"), "$.k").cast("int")), 4).as("avg_k"),
           count(lit(1)).as("n"))
      .orderBy("event_type")

  /** q29: array element access (1-based on both engines), length, avg of
    * first coordinate. Inner round stays in FLOAT (DuckDB keeps float32
    * through round); len → LONG for parity. */
  def q29ArrayOps(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
           dround(avg(round(element_at(col("embedding"), 1), 6)), 6).as("avg_first"),
           max(size(col("embedding"))).cast("long").as("dim"))
      .orderBy("label")

  /** q34: exact dedup on content — group by full text, emit keeper id and
    * copy count only (never re-materialize the text). At 100 TB the same
    * plan shuffles hash(text) once; a sha2(text) pre-hash would shrink
    * shuffle bytes without changing semantics. */
  def q34DedupExactText(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy("text")
      .agg(min(col("doc_id")).as("keep_id"),
           count(lit(1)).as("n_copies"),
           min(col("n_chars")).as("n_chars"))
      .select("keep_id", "n_copies", "n_chars")
      .orderBy("keep_id")

  /** q35: exact token-set Jaccard near-dup — probe docs (doc_id < 100)
    * against all. Token-SET formulation: each doc becomes its distinct
    * token array once (one scan, no explode), the bounded probe side
    * broadcasts, and intersection/union sizes come from `array_intersect`
    * per candidate pair. Identical semantics to the oracle's
    * explode→self-join→count formulation, but it moves |docs| array rows
    * instead of |docs|·|tokens| exploded rows — and a token self-join
    * here would hash-shuffle on a ~31-word vocabulary (pathological key
    * skew at any scale). The ≥0.8 filter uses the unrounded ratio
    * (integer-derived — cross-engine safe).
    * Production twin at scale: MinHashLSH (Approx.minHashNearDup). */
  def q35JaccardNeardup(s: SparkSession, d: String): DataFrame = {
    // Token sets are canonicalized ONCE per document (sorted + distinct):
    // the per-pair intersection then runs as the native two-pointer merge
    // [[graft.expressions.SortedIntersectSize]] — zero hashing, zero
    // allocation per pair, inside whole-stage codegen. `array_intersect`
    // here would rebuild a hash set per candidate pair.
    val toks = documents(s, d)
      .select(col("doc_id"), sort_array(array_distinct(split(col("text"), " "))).as("toks"))
    val probe = toks.filter(col("doc_id") < 100)
      .select(col("doc_id").as("a"), col("toks").as("ta"), size(col("toks")).cast("long").as("sa"))
    // The testdata corpus is one small parquet file = one input split, so
    // without a repartition the whole pair loop would run on one core; at
    // real scale the input already has many splits and this exchange is
    // noise relative to the pair work. Width capped at 8: past that, the
    // extra tasks on this corpus are near-empty and pure dispatch cost
    // (r3 verdict measured 32 tasks costing ~2x the useful work).
    val corpus = toks.select(col("doc_id").as("b"), col("toks").as("tb"), size(col("toks")).cast("long").as("sb"))
      .repartition(math.min(s.sparkContext.defaultParallelism, 8))
    val i = graft.expressions.GraftFunctions.sortedIntersectSize(s, "ta", "tb")
    val ratio = col("i").cast("double") / (col("sa") + col("sb") - col("i"))
    broadcast(probe).crossJoin(corpus)
      // Size-ratio pruning: J ≥ 0.8 forces min(|A|,|B|)/max(|A|,|B|) ≥ 0.8
      // (intersection ≤ min, union ≥ max), i.e. 5·min ≥ 4·max in exact
      // integer math — candidates failing it skip the merge entirely. The
      // exact ratio filter below still decides membership.
      .filter(col("a") < col("b") &&
              col("sa") * 5 >= col("sb") * 4 && col("sb") * 5 >= col("sa") * 4)
      .select(col("a"), col("b"), i.as("i"), col("sa"), col("sb"))
      // Exact-integer acceptance (round 17): identical to
      // `ratio >= 0.8` for every union size < 2^51 (proof in
      // OPTIMIZATION_r17.md; same rewrite as minhashPairs), but the
      // condition Catalyst pushes into the pair loop evaluates the
      // sorted-merge intersect ONCE instead of twice.
      .filter(col("i") * 9 >= (col("sa") + col("sb")) * 4)
      .select(col("a"), col("b"), dround(ratio, 4).as("jaccard"))
      .orderBy("a", "b")
  }

  /** Naive left-fold float32 dot product via builtin HOFs — replicates
    * DuckDB's `list_cosine_similarity` float accumulation exactly
    * (verified element-order-sequential on both engines). Kept as the
    * extension-free formulation; q36 uses the codegen'd native
    * [[graft.expressions.FloatDotProduct]], which is bit-identical. */
  private def fdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0f), (acc, x) => acc + x)

  /** q36: vector similarity top-k — 10 probe vectors × top-5 neighbors by
    * cosine. Probe side broadcasts (NLJ over the corpus, embarrassingly
    * parallel at scale); full cosine formula (÷ norms) for robustness even
    * though vectors are unit-norm. All accumulation in float32 to match
    * the oracle bit-for-bit; sim is rounded to 4dp BEFORE the rank with
    * nid tie-break (SURVEY.md §2.12 rule 3). Scale twin: Approx.annLsh. */
  def q36CosineTopk(s: SparkSession, d: String): DataFrame =
    probeCosineTopk(s, embeddings(s, d))

  /** Shared scaffolding of the probe-broadcast cosine top-5 family
    * (q36 exact, q71 bucketed ANN): the parity-critical conventions —
    * float32 dot via the codegen'd native expression, norms precomputed
    * per SIDE before the pair join (never per pair), sim rounded to 4dp
    * BEFORE the rank with nid tie-break (SURVEY §2.12 rule 3), probe
    * side broadcast, corpus spread over ≤8 splits (q35 note) — live
    * HERE exactly once, so a convention fix cannot reach one query and
    * miss the other. `vecs` carries (vec_id, embedding [, extras]);
    * each extra column c surfaces as p\<c\> / n\<c\> for `pairPred`
    * (e.g. q71's Hamming-bucket gate) to reference. */
  private[ops] def probeCosineTopk(s: SparkSession, vecs: DataFrame,
      extras: Seq[String] = Nil, pairPred: Column = lit(true)): DataFrame = {
    // The dot product runs as the native codegen'd FloatDotProduct
    // expression (tight primitive loop, same float32 left-fold as the
    // builtin-HOF fdot and as DuckDB's list_cosine_similarity).
    val dot = (a: String, b: String) => graft.expressions.GraftFunctions.floatDot(s, a, b)
    // Norms are precomputed per side BEFORE the pair join — computing
    // them inside the pair expression would redo an O(dim) fold per pair
    // (n·k times) instead of once per vector.
    val probes = vecs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("pid") +: col("embedding").as("pe") +:
              sqrt(dot("embedding", "embedding")).cast("float").as("pnorm") +:
              extras.map(c => col(c).as(s"p$c")): _*)
    // single-file input = single split: spread the NLJ stream side across
    // cores, width capped at 8 (see q35 note).
    val corpus = vecs
      .select(col("vec_id").as("nid") +: col("embedding").as("ne") +:
              sqrt(dot("embedding", "embedding")).cast("float").as("nnorm") +:
              extras.map(c => col(c).as(s"n$c")): _*)
      .repartition(math.min(s.sparkContext.defaultParallelism, 8))
    val sim = (dot("pe", "ne") / (col("pnorm") * col("nnorm"))).cast("float")
    val w = Window.partitionBy("pid").orderBy(col("sim").desc, col("nid"))
    broadcast(probes).crossJoin(corpus)
      .filter(col("nid") =!= col("pid") && pairPred)
      .select(col("pid"), col("nid"), round(sim, 4).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .orderBy("pid", "rn")
      .select("pid", "nid", "sim")
  }

  /** q64: character-trigram Jaccard near-dup — the n-gram flavor of
    * q35 (tokenization-free: catches near-dups that differ in
    * whitespace/punctuation where word-level Jaccard fragments).
    * Trigram sets are canonicalized once per document scan-side
    * (transform over the character positions — no explode), then the
    * same broadcast-probe + codegen'd sorted-merge intersect as q35.
    * Background trigram Jaccard tops out ≈ 0.64 on unrelated docs at
    * sf0.01, so 0.8 is a clean near-dup separator. Docs shorter than 3
    * chars have no trigram and drop out on BOTH engines (explicit
    * length guard; Spark's sequence(1, 0) would count DOWN, not empty).
    * Scale notes as q35: probe-bounded pair loop; the banded/LSH twins
    * (q43/q44/q58/q59) are the whole-corpus path. */
  def q64NgramJaccard(s: SparkSession, d: String): DataFrame = {
    // Trigram sets canonicalize scan-side as packed code-point-triple
    // longs ([[graft.expressions.PackedTrigrams]] — a bijection of the
    // string trigrams, so every count and Jaccard value is identical to
    // the string formulation the oracle computes), and the per-pair
    // merge below runs [[SortedIntersectSize]]'s primitive long path:
    // no UTF8String wrapper per element visited, which is the whole
    // cost at candidate-loop scale.
    graft.expressions.GraftFunctions.register(s)
    val grams = documents(s, d)
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), expr("packed_trigrams(text)").as("gs"))
    val probe = grams.filter(col("doc_id") < 100)
      .select(col("doc_id").as("a"), col("gs").as("ta"), size(col("gs")).cast("long").as("sa"))
    val corpus = grams
      .select(col("doc_id").as("b"), col("gs").as("tb"), size(col("gs")).cast("long").as("sb"))
      .repartition(math.min(s.sparkContext.defaultParallelism, 8))
    val i = graft.expressions.GraftFunctions.sortedIntersectSize(s, "ta", "tb")
    val ratio = col("i").cast("double") / (col("sa") + col("sb") - col("i"))
    broadcast(probe).crossJoin(corpus)
      .filter(col("a") < col("b") &&
              col("sa") * 5 >= col("sb") * 4 && col("sb") * 5 >= col("sa") * 4)
      .select(col("a"), col("b"), i.as("i"), col("sa"), col("sb"))
      // Same exact-integer acceptance as q35 — one intersect eval in
      // the pushed pair-loop condition instead of two.
      .filter(col("i") * 9 >= (col("sa") + col("sb")) * 4)
      .select(col("a"), col("b"), dround(ratio, 4).as("jaccard"))
      .orderBy("a", "b")
  }

  /** q37: tf-idf top term per document. Score is rounded to 6dp BEFORE
    * the per-doc rank — equal-in-reals scores from different (tf, df)
    * pairs would otherwise order nondeterministically across engines. */
  def q37TfidfTopTerm(s: SparkSession, d: String): DataFrame = {
    val tok = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    // N = documents containing ≥1 token. split() yields [""] even for
    // empty text, so every document row contributes — N is exactly the
    // document count, no explode needed.
    val n = documents(s, d).agg(count(lit(1)).as("n"))
    // df comes from a whole-partition window count over tf (tf has one
    // row per (doc, term), so rows-per-term IS the document frequency).
    // A separate `tf.groupBy(w)` branch looks cheaper but plans as a
    // SECOND full explode+shuffle of the corpus: the optimizer prunes
    // that branch's count, the subtrees stop being identical, and
    // exchange reuse never fires. The window keeps everything in one
    // pipeline — the corpus is exploded and shuffled exactly once.
    val wdf = Window.partitionBy("w")
    // Top term per doc = argmax by (score desc, w asc). min over
    // struct(-score, w) is the same argmax (struct ordering is
    // lexicographic; double negation is IEEE-exact both ways). The
    // struct buffer plans as SortAggregate (local sort by doc_id), but
    // partial aggregation still combines map-side, so the exchange
    // carries one row per document instead of one per (doc, term) into
    // a window rank.
    tf.withColumn("df", count(lit(1)).over(wdf))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("w"),
              dround(col("tf") * log(col("n") / col("df")), 6).as("score"))
      .groupBy("doc_id")
      .agg(min(struct((-col("score")).as("ns"), col("w"))).as("m"))
      .select(col("doc_id"), col("m.w").as("top_term"), (-col("m.ns")).as("score"))
      .orderBy("doc_id")
  }

  /** q39: global token frequency top-N — explode → count → top-k heap. */
  def q39WordcountTopn(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(20)
}
