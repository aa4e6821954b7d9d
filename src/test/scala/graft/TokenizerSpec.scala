package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sampling, Tokenizer, TrainingData}

/** The real-tokenizer seam (VERDICT r10 #1): greedy longest-match vocab
  * counting as a codegen'd expression, the merge-table → vocab
  * derivation, and the invariant that packing/mixture/the full pipeline
  * compose with tokenizer-token budgets exactly as with whitespace
  * ones.
  */
class TokenizerSpec extends SparkSpec {

  // Independent driver-side replay of the maximal-munch rule — kept
  // deliberately naive (substring scans, no trie) so it shares no code
  // with the expression under test.
  private def replayCount(vocab: Seq[String], text: String): Long = {
    // The FULL Java-regex \\s class; \\u000B spelled as an escape, not an
    // invisible literal byte, so the width parity with VocabTrie.isWs
    // is auditable (review finding, round 11).
    val ws = "[ \t\n\u000B\f\r]"
    text.split(s"$ws+").filter(_.nonEmpty).map { word =>
      var i = 0
      var cnt = 0L
      while (i < word.length) {
        val best = vocab.filter(v => word.startsWith(v, i)).map(_.length)
          .foldLeft(0)(math.max)
        cnt += 1
        i += math.max(best, 1)
      }
      cnt
    }.sum
  }

  private val vocab = Seq("a", "b", "c", "ab", "abc", "bc", "hello", "lo", "l")

  test("vocab_token_count: worked segmentation examples") {
    import spark.implicits._
    val cases = Seq(
      // maximal munch: "abc" is one token, not ab+c or a+bc
      ("abc", 1L),
      // "abca" -> abc + a
      ("abca", 2L),
      // unknown chars fall back to one token per char: x, y
      ("xy", 2L),
      // mixed: ab + x + c
      ("abxc", 3L),
      // words never merge across whitespace: ab | c, with tab/newline runs
      ("ab c", 2L),
      ("ab\t\nc", 2L),
      // "hello" is one token though h/e are not in the vocab alone
      ("hello", 1L),
      // "hellol" -> hello + l
      ("hellol", 2L),
      ("", 0L),
      ("   \t ", 0L))
    val got = cases.map(_._1).toDF("text")
      .select(Tokenizer.tokenCount(spark, vocab, col("text")).as("n"))
      .as[Long].collect().toSeq
    assert(got === cases.map(_._2), s"counts $got vs expected ${cases.map(_._2)}")
  }

  test("vocab_token_count: null text yields null, not a crash or zero") {
    import spark.implicits._
    val got = Seq(Some("abc"), None).toDF("text")
      .select(Tokenizer.tokenCount(spark, vocab, col("text")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq === Seq(Some(1L), None))
  }

  test("vocab_token_count matches the driver-side replay on a generated corpus") {
    import spark.implicits._
    // Deterministic pseudo-random words over the vocab alphabet plus
    // unknown chars, several per row, varied lengths.
    val texts = (0 until 500).map { i =>
      val rnd = new scala.util.Random(i)
      (0 until 1 + rnd.nextInt(12)).map { _ =>
        (0 until 1 + rnd.nextInt(10)).map { _ =>
          "abcxloeh".charAt(rnd.nextInt(8))
        }.mkString
      }.mkString(" ")
    }
    val got = texts.toDF("text")
      .select(Tokenizer.tokenCount(spark, vocab, col("text")).as("n"))
      .as[Long].collect().toSeq
    val want = texts.map(replayCount(vocab, _))
    assert(got === want)
  }

  test("vocabFromMerges: base alphabet + parts + products, and merges shrink counts") {
    import spark.implicits._
    // th + e -> the ; i + n -> in ; th stays usable alone.
    val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"))
    val v = Tokenizer.vocabFromMerges(merges)
    assert(Set("t", "h", "e", "i", "n", "th", "the", "in").subsetOf(v.toSet))
    val df = Seq("the thin inn").toDF("text")
    val merged = df.select(Tokenizer.tokenCount(spark, v, col("text")).as("n"))
      .as[Long].head()
    // the=1, thin=th+in=2, inn=in+n=2
    assert(merged === 5L)
    val baseOnly = df.select(Tokenizer.tokenCount(spark,
        Seq("t", "h", "e", "i", "n"), col("text")).as("n"))
      .as[Long].head()
    assert(baseOnly === 10L, "char-level count = non-ws chars")
  }

  test("VocabTrie invariants hold on generated corpora (driver-side, 1000 texts)") {
    import graft.expressions.VocabTrie
    // Pure-trie properties — these hold for ANY text and vocab, so they
    // guard the walk's semantics rather than specific values.
    val trie = new VocabTrie(vocab)
    val maxLen = vocab.map(_.length).max
    // Every vocab entry is exactly one token of itself.
    vocab.foreach(v => assert(trie.countTokens(v) === 1L, s"entry $v"))
    val rnd = new scala.util.Random(7)
    (0 until 1000).foreach { _ =>
      val words = (0 until 1 + rnd.nextInt(8)).map(_ =>
        (0 until 1 + rnd.nextInt(12)).map(_ =>
          "abcxloh?9".charAt(rnd.nextInt(9))).mkString)
      val text = words.mkString(" ")
      val n = trie.countTokens(text)
      val chars = words.map(_.length).sum
      // Bounds: one token consumes between 1 and maxLen chars.
      assert(n <= chars, s"count $n > $chars non-ws chars for '$text'")
      assert(n >= (chars + maxLen - 1) / maxLen, s"count $n too low for '$text'")
      // Whitespace-run invariance: the separator shape cannot matter.
      assert(trie.countTokens(words.mkString("  \t ")) === n)
      assert(trie.countTokens(" \n" + text + "\r ") === n)
      // Word-concatenation additivity across a whitespace boundary.
      val split = rnd.nextInt(words.length)
      val (l, r) = words.splitAt(split)
      assert(trie.countTokens(l.mkString(" ")) + trie.countTokens(r.mkString(" ")) === n)
    }
  }

  test("tokenCountFromTable compiles a vocab table into the scan, collect bounded") {
    import spark.implicits._
    val vocabDf = Seq("ab", "abc", "c").toDF("token")
    val c = Tokenizer.tokenCountFromTable(spark, vocabDf, "token", col("text"))
    // "abca" -> abc (maximal munch) + a (unknown char fallback)
    val got = Seq("abca").toDF("text").select(c.as("n")).as[Long].head()
    assert(got === 2L)
    // The guard must fire BEFORE compiling a data-sized table into the
    // plan — a caller pointing this at a token-per-row data table gets
    // a loud error, not a gigabyte literal.
    val big = spark.range(50).select(concat(lit("t"), col("id")).as("token"))
    val ex = intercept[IllegalArgumentException] {
      Tokenizer.tokenCountFromTable(spark, big, "token", col("text"), maxVocab = 10)
    }
    assert(ex.getMessage.contains("exceeds"))
  }

  test("vocab_token_count runs inside whole-stage codegen, not as a UDF") {
    import spark.implicits._
    // Source must be a real (range) scan: a local Seq would be folded by
    // ConvertToLocalRelation at optimize time and never reach codegen.
    val df = spark.range(100)
      .select(concat(lit("abc x"), col("id").cast("string")).as("text"))
      .select(Tokenizer.tokenCount(spark, vocab, col("text")).as("n"))
      .filter(col("n") > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"tokenizer fell out of codegen into a UDF:\n$plan")
    assert(plan.contains("*("), s"tokenizer lost whole-stage codegen:\n$plan")
    // "abc x<digits>": abc=1, then x + each digit char (digits not in
    // this vocab) -> 1 + 1 + len(id) tokens.
    val got = df.as[Long].collect()
    val want = (0 until 100).map(i => 2L + i.toString.length)
    assert(got.toSeq === want)
  }

  // Driver-side replay of the maximal-munch SEGMENTATION (ids, not
  // counts) — same naive no-trie shape as replayCount. maxBy keeps the
  // first maximal element, matching the trie's first-occurrence rule
  // for duplicate entries; length ties between distinct entries are
  // impossible (same start, same length ⇒ same string).
  private def replayIds(vocab: Seq[String], text: String): Seq[Long] = {
    val ws = "[ \t\n\u000B\f\r]"  // \u000B as an escape (auditable), see replayCount
    text.split(s"$ws+").filter(_.nonEmpty).toSeq.flatMap { word =>
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var i = 0
      while (i < word.length) {
        val ms = vocab.zipWithIndex.filter { case (v, _) => word.startsWith(v, i) }
        if (ms.isEmpty) { out += -1L; i += 1 }
        else { val (v, id) = ms.maxBy(_._1.length); out += id.toLong; i += v.length }
      }
      out
    }
  }

  test("vocab_tokenize: worked segmentation examples (ids)") {
    import spark.implicits._
    // vocab indices: a=0 b=1 c=2 ab=3 abc=4 bc=5 hello=6 lo=7 l=8
    val cases = Seq(
      ("abca", Seq(4L, 0L)),        // maximal munch: abc, then a
      ("abxc", Seq(3L, -1L, 2L)),   // unknown x falls back to -1
      ("hellol", Seq(6L, 8L)),      // hello, l
      ("xy", Seq(-1L, -1L)),
      ("ab c", Seq(3L, 2L)),        // never merges across whitespace
      ("", Seq.empty[Long]),
      ("   \t ", Seq.empty[Long]))
    val got = cases.map(_._1).toDF("text")
      .select(Tokenizer.tokenIds(spark, vocab, col("text")).as("ids"))
      .as[Seq[Long]].collect().toSeq
    assert(got === cases.map(_._2), s"ids $got vs expected ${cases.map(_._2)}")
    // NULL text stays NULL (not an empty array).
    val nulls = Seq(Some("abc"), None).toDF("text")
      .select(Tokenizer.tokenIds(spark, vocab, col("text")).as("ids"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getSeq[Long](0)))
    assert(nulls.toSeq === Seq(Some(Seq(4L)), None))
  }

  test("vocab_tokenize matches the replay and its size IS vocab_token_count") {
    import spark.implicits._
    val texts = (0 until 500).map { i =>
      val rnd = new scala.util.Random(1000 + i)
      (0 until 1 + rnd.nextInt(12)).map { _ =>
        (0 until 1 + rnd.nextInt(10)).map { _ =>
          "abcxloeh".charAt(rnd.nextInt(8))
        }.mkString
      }.mkString(" ")
    }
    val got = texts.toDF("text")
      .select(Tokenizer.tokenIds(spark, vocab, col("text")).as("ids"),
        Tokenizer.tokenCount(spark, vocab, col("text")).as("n"))
      .collect().map(r => (r.getSeq[Long](0), r.getLong(1)))
    got.zip(texts).foreach { case ((ids, n), t) =>
      assert(ids === replayIds(vocab, t), s"segmentation diverged on '$t'")
      // The one invariant every consumer leans on: the ids ARE the
      // budgeted count, element for element.
      assert(ids.size.toLong === n, s"size(ids) != count on '$t'")
    }
  }

  test("vocab_tokenize: duplicate vocab entries resolve to the first index") {
    import spark.implicits._
    val got = Seq("abab").toDF("text")
      .select(Tokenizer.tokenIds(spark, Seq("ab", "x", "ab"), col("text")).as("ids"))
      .as[Seq[Long]].head()
    assert(got === Seq(0L, 0L))
  }

  test("vocab_tokenize runs inside whole-stage codegen, not as a UDF") {
    import spark.implicits._
    val df = spark.range(100)
      .select(concat(lit("abc x"), col("id").cast("string")).as("text"))
      .select(Tokenizer.tokenIds(spark, vocab, col("text")).as("ids"))
      .filter(size(col("ids")) > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"tokenizer fell out of codegen into a UDF:\n$plan")
    assert(plan.contains("*("), s"tokenizer lost whole-stage codegen:\n$plan")
    // "abc x<digits>": abc, then x and each digit as fallbacks under
    // the letters-only test vocab.
    val got = df.as[Seq[Long]].collect()
    got.zipWithIndex.foreach { case (ids, i) =>
      assert(ids === 4L +: Seq.fill(1 + i.toString.length)(-1L), s"row $i: $ids")
    }
  }

  test("packing + mixture budget in tokenizer tokens end-to-end (conservation + budgets)") {
    // The seam's whole point: the SAME packSequences/quotaSampleBudgets,
    // fed a vocab-counted n_tokens instead of the whitespace one, with
    // every invariant intact in the new unit.
    val docs = graft.ops.Tables.documents(spark, sf0001)
    val bpeVocab = Tokenizer.vocabFromMerges(Seq(
      ("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"), ("i", "n"),
      ("e", "r"), ("o", "r"), ("s", "t"), ("e", "n"), ("o", "n"))) ++
      ('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString)
    val sized = docs.select(col("doc_id"), col("lang"),
      Tokenizer.tokenCount(spark, bpeVocab.distinct, col("text")).as("n_tokens"),
      md5(concat_ws(":", lit("mix"), col("doc_id").cast("string"))).as("rk"))
    val budgets = Map("en" -> 4000L, "de" -> 1500L, "zh" -> 2000L)
    val picked = Sampling.quotaSampleBudgets(sized, budgets)
    val rows = picked.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).toSet.subsetOf(budgets.keySet), "whitelist leaked a group")
    rows.groupBy(_._2).foreach { case (g, rs) =>
      // Every kept doc started under budget; mass minus the straddler
      // stays under budget (≤ one-doc overshoot).
      assert(rs.forall(_._4 < budgets(g)))
      val mass = rs.map(_._3).sum
      assert(mass - rs.maxBy(_._5)._3 < budgets(g), s"group $g overfilled")
    }
    // Pack the selection in the same unit: slice conservation says every
    // selected tokenizer-token lands in exactly one sequence slice.
    val packed = Packing.packSequences(
      picked.select(col("doc_id"), col("n_tokens")).filter(col("n_tokens") > 0), 256L)
    val sliceSum = packed.agg(sum(col("slice_len"))).head().getLong(0)
    val tokSum = rows.filter(_._3 > 0).map(_._3).sum
    assert(sliceSum === tokSum, "token conservation broke under the vocab count")
    graft.operators.Materialized.free(picked)
    graft.operators.Materialized.free(packed)
  }

  test("buildTrainingSet accepts a tokenizer counter through the nCol seam") {
    import spark.implicits._
    // Small synthetic corpus; budgets in vocab tokens. The pipeline's
    // selected.n_tokens must BE the vocab counts (not whitespace), and
    // packing must conserve them.
    val docs = (0L until 120L).map { i =>
      val lang = if (i % 3 == 0) "en" else "de"
      val words = (0 until 12 + (i % 7).toInt).map(j =>
        s"w${(i * 31 + j * 7) % 40}").mkString(" ")
      (i, s"doc $i says $words", lang)
    }.toDF("doc_id", "text", "lang")
    val vocab = ('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString) ++
      Seq("doc", "says", "w1", "w2", "w3")
    val counter = Tokenizer.tokenCount(spark, vocab, col("text"))
    // Quality gates opened wide: this test pins the COUNTER seam, not
    // the filter (whose thresholds are tuned for real text, not "w12").
    val ts = TrainingData.buildTrainingSet(spark, docs,
      benchmark = Seq.empty[String].toDF("text"),
      budgets = Map("en" -> 300L, "de" -> 500L),
      seqLen = 64L, minQuality = 0.0, maxRepetition = 1.0, minTokens = 1,
      tokenCounter = Some(counter))
    val sel = ts.selected.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(sel.nonEmpty)
    // Budget respected in the tokenizer unit.
    sel.groupBy(_._2).foreach { case (g, rs) =>
      val budget = Map("en" -> 300L, "de" -> 500L)(g)
      assert(rs.forall(_._4 < budget), s"group $g has a pick at/past budget")
    }
    // The counts flowing through ARE vocab counts: spot-check one doc
    // against the expression evaluated directly.
    val byId = docs.select(col("doc_id"), counter.as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sel.foreach { case (id, _, n, _) =>
      assert(n === byId(id), s"doc $id budgeted $n != vocab count ${byId(id)}")
    }
    val sliceSum = ts.packed.agg(sum(col("slice_len"))).head().getLong(0)
    assert(sliceSum === sel.map(_._3).sum, "pipeline token conservation broke")

    // PAYLOAD: materialize the pipeline's OWN slice map (no re-pack)
    // with the matching id streams — size(ids) == counter per doc by
    // construction, the materializeSlices precondition. Every
    // sequence but the last must be exactly seqLen, and the total ids
    // must equal the budgeted token mass.
    val idsDf = docs.select(col("doc_id"),
      Tokenizer.tokenIds(spark, vocab, col("text")).as("token_ids"))
    val rows = Packing.materializeSlices(ts.packed, idsDf)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).sortBy(_._1)
    assert(rows.map(_._2.length.toLong).sum === sliceSum,
      "materialized payload lost or duplicated ids")
    rows.dropRight(1).foreach { case (sid, ids) =>
      assert(ids.length === 64, s"sequence $sid not full") }
    graft.operators.Materialized.free(ts.selected)
    graft.operators.Materialized.free(ts.packed)
  }

  // ---- true merge-order BPE (bpe_tokens) ----

  // Independent driver-side replay of the BPE encode loop — naive
  // (list-of-strings, re-scan per iteration), shares no code with
  // BpeMergeTable.
  private def replayBpe(merges: Seq[(String, String)], text: String): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    val ws = "[ \t\n\u000B\f\r]"  // \u000B as an escape (auditable), see replayCount
    text.split(s"$ws+").filter(_.nonEmpty).toSeq.flatMap { word =>
      var syms = word.map(_.toString).toList
      var go = true
      while (go && syms.length > 1) {
        val ranked = syms.zip(syms.tail).flatMap(p => rank.get(p).map(p -> _))
        if (ranked.isEmpty) go = false
        else {
          val (bestPair, _) = ranked.minBy(_._2)
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var rest = syms
          while (rest.nonEmpty) rest match {
            case a :: b :: tail if (a, b) == bestPair =>
              out += a + b; rest = tail
            case a :: tail => out += a; rest = tail
            case Nil =>
          }
          syms = out.toList
        }
      }
      syms
    }
  }

  test("bpe_tokens: worked merge-order examples") {
    import spark.implicits._
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val cases = Seq(
      ("lower", Seq("low", "er")),
      ("lowest", Seq("low", "e", "s", "t")),
      ("low lower", Seq("low", "low", "er")),   // words encode independently
      ("xyz", Seq("x", "y", "z")),              // untouched chars pass through
      ("", Seq.empty[String]),
      ("   ", Seq.empty[String]),
      ("looow", Seq("lo", "o", "o", "w")))      // one merge pass, left-to-right
    val got = cases.map(_._1).toDF("text")
      .select(Tokenizer.bpeTokens(spark, merges, col("text")).as("t"))
      .as[Seq[String]].collect().toSeq
    assert(got === cases.map(_._2), s"got $got expected ${cases.map(_._2)}")
    // NULL text stays NULL.
    val nulls = Seq(Some("low"), None).toDF("text")
      .select(Tokenizer.bpeTokens(spark, merges, col("text")).as("t"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getSeq[String](0)))
    assert(nulls.toSeq === Seq(Some(Seq("low")), None))
  }

  test("bpe_tokens diverges from greedy longest-match exactly where merge order says") {
    import spark.implicits._
    // merges [(b,c), (a,b)]: BPE on "abc" applies rank 0 first -> [a, bc];
    // greedy longest-match over the derived vocab takes the leftmost
    // longest entry -> [ab, c]. Same table, different algorithms — the
    // reason the seam carries both arms.
    val merges = Seq(("b", "c"), ("a", "b"))
    val gVocab = Tokenizer.vocabFromMerges(merges)
    val row = Seq("abc").toDF("text").select(
      Tokenizer.bpeTokens(spark, merges, col("text")).as("bpe"),
      graft.operators.Tokenizer.tokenIds(spark, gVocab, col("text")).as("greedy_ids"),
      Tokenizer.tokenCount(spark, gVocab, col("text")).as("greedy_n")).head()
    assert(row.getSeq[String](0) === Seq("a", "bc"))
    assert(row.getLong(2) === 2L)
    assert(row.getSeq[Long](1).map(id => gVocab(id.toInt)) === Seq("ab", "c"),
      "greedy should take the leftmost-longest entry, not the merge order")
  }

  test("bpe_tokens matches the naive replay on random corpora and reassembles") {
    import spark.implicits._
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("a", "b"),
      ("ab", "c"), ("h", "e"), ("he", "l"), ("hel", "lo"), ("o", "w"))
    val rnd = new scala.util.Random(42)
    val texts = (0 until 300).map { _ =>
      (0 until 1 + rnd.nextInt(8)).map { _ =>
        (0 until 1 + rnd.nextInt(12)).map(_ =>
          "lowerabchs".charAt(rnd.nextInt(10))).mkString
      }.mkString(" ")
    }
    val got = texts.toDF("text")
      .select(Tokenizer.bpeTokens(spark, merges, col("text")).as("t"))
      .as[Seq[String]].collect()
    got.zip(texts).foreach { case (toks, t) =>
      assert(toks === replayBpe(merges, t), s"BPE diverged on '$t'")
      // Segmentation is a partition of the non-whitespace chars.
      assert(toks.mkString === t.split("\\s+").filter(_.nonEmpty).mkString,
        s"tokens do not reassemble '$t'")
    }
  }

  test("bpe_tokens runs inside whole-stage codegen, not as a UDF") {
    import spark.implicits._
    val merges = Seq(("a", "b"), ("ab", "c"))
    val df = spark.range(50)
      .select(concat(lit("abc x"), col("id").cast("string")).as("text"))
      .select(Tokenizer.bpeTokens(spark, merges, col("text")).as("t"))
      .filter(size(col("t")) > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"bpe_tokens fell out of codegen into a UDF:\n$plan")
    assert(plan.contains("*("), s"bpe_tokens lost whole-stage codegen:\n$plan")
    val got = df.as[Seq[String]].collect()
    got.zipWithIndex.foreach { case (toks, i) =>
      assert(toks.head === "abc" && toks.tail === ("x" + i.toString).map(_.toString),
        s"row $i: $toks")
    }
  }

  test("tokenizer config arrays reject NULL elements loudly, with the function name") {
    import spark.implicits._
    graft.expressions.GraftFunctions.register(spark)
    for ((fn, sql) <- Seq(
      ("vocab_token_count", "SELECT vocab_token_count(text, array('a', NULL)) FROM t"),
      ("vocab_tokenize", "SELECT vocab_tokenize(text, array('a', NULL)) FROM t"),
      ("bpe_tokens", "SELECT bpe_tokens(text, array('a b', NULL)) FROM t"))) {
      Seq("abc").toDF("text").createOrReplaceTempView("t")
      val ex = intercept[Throwable] { spark.sql(sql).collect() }
      val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("NULL element") && msgs.contains(fn),
        s"$fn: expected a loud config error naming the function, got: $msgs")
    }
  }

  test("packing budgets in TRUE BPE tokens through the same nCol seam") {
    // bpeTokenCount is a drop-in n_tokens source: conservation must
    // hold in the new unit exactly as for whitespace/greedy counts.
    val docs = graft.ops.Tables.documents(spark, sf0001)
    val merges = Seq(("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"),
      ("e", "r"), ("o", "r"), ("s", "t"), ("o", "n"))
    val sized = docs.select(col("doc_id"),
      Tokenizer.bpeTokenCount(spark, merges, col("text")).as("n_tokens"))
    val total = sized.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(total > 0L)
    val packed = Packing.packSequences(sized, seqLen = 512)
    val sliceSum = packed.agg(sum(col("slice_len"))).head().getLong(0)
    assert(sliceSum === total, "BPE-token conservation broke through packing")
  }
}
