package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column library for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting (SURVEY.md
  * §2.10 / the north-star LLM-pipeline surface).
  *
  * Everything is built from codegen'd builtin expressions (no UDFs), so
  * each helper composes into any DataFrame plan and stays inside
  * whole-stage codegen — the property that matters when the `documents`
  * table is 100 TB instead of 500 rows.
  */
object TextFunctions {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), w => w =!= ""))

  /** BPE-ish subword count: alphabetic runs + non-alpha non-space runs,
    * counted separately (a cheap deterministic proxy for a real
    * tokenizer's token count — the standard pre-filter statistic).
    * Two regexp_extract_all counts rather than a lookaround split: the
    * split formulation miscounts when an alpha→non-alpha boundary is
    * immediately followed by more whitespace (Java's find() skips a char
    * after a zero-width match, leaving a stray " " token), and the run
    * counts mirror verbatim into the q42 DuckDB oracle. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+"), lit(0))) +
      size(regexp_extract_all(text, lit("[^a-zA-Z\\s]+"), lit(0)))

  /** Mean token length — long tokens suggest code/garbage, very short
    * suggest boilerplate. */
  def meanTokenLen(text: Column): Column =
    (length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(tokenCount(text), lit(1)))

  /** Ratio of alphabetic characters (quality heuristic). */
  def alphaRatio(text: Column): Column =
    (length(regexp_replace(text, "[^a-zA-Za-яА-Яçáéíóúäöüßàèìòùâêîôû]", ""))
      .cast("double") / greatest(length(text), lit(1)))

  /** Ratio of punctuation characters. */
  def punctRatio(text: Column): Column =
    (length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", "")).cast("double") /
      greatest(length(text), lit(1)))

  /** English stopword hit ratio over tokens — the classic cheap
    * language/quality signal. */
  def stopwordRatio(text: Column): Column = {
    val stops = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is",
      "are", "was", "on", "for", "with", "by", "at", "as", "it", "this", "that")
    val toks = filter(split(lower(text), "\\s+"), w => w =!= "")
    (size(filter(toks, w => w.isin(stops.map(lit(_)): _*))).cast("double") /
      greatest(size(toks), lit(1)))
  }

  /** n-gram-heuristic language ID over a closed candidate set: scores
    * per-language marker words/characters and takes the argmax. Real
    * systems use fastText/CLD3; this is the deterministic, dependency-free
    * engine shape (scored entirely in one codegen'd expression). */
  def langIdHeuristic(text: Column): Column = {
    val lowered = lower(text)
    def hits(markers: Seq[String]): Column =
      markers.map(m => when(lowered.contains(s" $m "), 1).otherwise(0))
        .reduce(_ + _)
    val scores = Seq(
      "en" -> hits(Seq("the", "and", "of", "is", "to", "with")),
      "de" -> (hits(Seq("der", "die", "das", "und", "ist", "mit")) +
        when(lowered.rlike("[äöüß]"), 2).otherwise(0)),
      "es" -> (hits(Seq("el", "la", "los", "es", "con", "por")) +
        when(lowered.rlike("[ñ¿¡]"), 2).otherwise(0)),
      "fr" -> (hits(Seq("le", "la", "les", "est", "avec", "pour")) +
        when(lowered.rlike("[àâçèêîôû]"), 2).otherwise(0)),
      "zh" -> when(lowered.rlike("[\\u4e00-\\u9fff]"), 10).otherwise(0)
    )
    // argmax via chained when on pairwise comparisons (closed set of 5)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("unknown")) { case ((langName, score), acc) =>
      when(score === best && best > 0, langName).otherwise(acc)
    }
  }

  /** Composite quality score in [0,1] from length/punct/stopword ratios —
    * the standard pre-training text filter shape. Rounded via
    * [[graft.ops.Determinism.dround]] (explicit floor formula) so the
    * q42 DuckDB oracle can reproduce the rounding bit-identically on any
    * DuckDB version. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val alpha = alphaRatio(text)
    val stop = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    graft.ops.Determinism.dround((lenScore + alpha + stop + punctPenalty) / 4.0, 4)
  }

  /** The multiplicity of a STRING array's most frequent element, as a
    * narrow codegen'd expression: the longest run in the SORTED array
    * equals the mode's count, found by one linear `aggregate` fold
    * with a (prev, run, best) accumulator — no explode, no groupBy, no
    * exchange. This is the piece that keeps q73's Gopher repetition
    * signals a pure scan-side pass at 100 TB (the relational mode —
    * explode → count per (doc, token) → max — costs a corpus-wide
    * shuffle for a per-row statistic). Empty arrays → 0.
    *
    * Scope (by the accumulator's string-typed `prev`): `array<string>`
    * only — another element type fails analysis on the struct-schema
    * mismatch. NULL elements are not counted as a mode (NULL === prev
    * is NULL, so each restarts the run at 1): pass filtered token
    * arrays, as every caller here does. */
  def modeCount(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  /** 64-bit rolling (polynomial) content fingerprint via the built-in
    * xxhash64 — stable across partitions/engines, the cheap exact-dup
    * pre-filter: equal fingerprints → candidate duplicates, so the
    * 100 TB exact dedup shuffles 8-byte keys instead of full texts. */
  def fingerprint(text: Column): Column = xxhash64(text)

  /** PII redaction — the standard pre-training scrub: emails, phone-ish
    * number runs, URLs, and IPv4s replaced by typed placeholder tokens.
    * Chained codegen'd regexp_replace; patterns are deliberately
    * high-recall (training-data hygiene prefers over-redaction). Order
    * matters: emails first, so a URL match never leaves a bare
    * local-part behind. */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val url = regexp_replace(email,
      "(https?://|www\\.)[^\\s]+", "<URL>")
    val ip = regexp_replace(url,
      "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>")
    regexp_replace(ip,
      "(?<!\\d)\\+?\\d{0,2}[\\s.-]?\\(?\\d{3}\\)?[\\s.-]?\\d{3}[\\s.-]?\\d{4}(?!\\d)",
      "<PHONE>")
  }

  /** The RE2-portable PII family — the declared-twin subset of
    * [[redactPii]]'s patterns (q78, ops/Extended): every construct here
    * means the same thing to Java regex (Spark) and RE2 (DuckDB) —
    * character classes, `(?:…)` groups, bounded repetition, and `\b`
    * ASCII word boundaries. The production phone pattern's
    * `(?<!\d)…(?!\d)` digit-run isolation is Java-only lookaround (the
    * reason q49 is a rows-only query); the portable phone twin uses
    * `\b` boundaries instead — same verdict on the separated forms
    * (555-123-4567, 555.123.4567, 555 123 4567), narrower on runs glued
    * to other word characters. The whitespace class is spelled out as
    * `[^ \t\n\x0B\f\r]` rather than `[^\s]` because `\s` itself is the
    * one "shared" construct the engines disagree on (RE2's lacks \x0B)
    * — the same convention the oracle's tokenizer splits follow.
    * One definition, two engines: the oracle
    * splices these strings into its SQL literals verbatim (the Q70Vocab
    * convention), so the engines cannot drift apart. */
  private[graft] val PiiEmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PiiUrlPattern = "(https?://|www\\.)[^ \\t\\n\\x0B\\f\\r]+"
  private[graft] val PiiIpv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  private[graft] val PiiPhonePortablePattern = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** The portable scrub as DATA: (pattern, placeholder, count column)
    * per stage, in scrub order — email → URL → IPv4 → phone (each stage
    * sees the previous stage's output, so a URL never leaves a bare
    * redactable tail and an IPv4's dots can never be re-read as a
    * phone's separators). This list is the single definition both
    * [[redactPiiPortable]] and the declared q78 (ops/Extended) fold
    * over: reordering or editing a stage here changes both together,
    * and the q78 oracle — which splices the same pattern constants but
    * fixes the stage order in its SQL — fails parity if the orders
    * ever drift apart. */
  private[graft] val PiiPortableStages: Seq[(String, String, String)] = Seq(
    (PiiEmailPattern, "<EMAIL>", "n_emails"),
    (PiiUrlPattern, "<URL>", "n_urls"),
    (PiiIpv4Pattern, "<IP>", "n_ips"),
    (PiiPhonePortablePattern, "<PHONE>", "n_phones"))

  /** [[redactPii]] restricted to the portable family
    * ([[PiiPortableStages]], folded in order). All four stages are
    * codegen'd `regexp_replace` — scan-side, no exchange, the 100 TB
    * shape of every per-row rewrite here. */
  def redactPiiPortable(text: Column): Column =
    PiiPortableStages.foldLeft(text) { case (t, (pat, tok, _)) =>
      regexp_replace(t, pat, tok)
    }

  /** SimHash-64 over whitespace tokens: per-token xxhash64, bitwise
    * majority vote — near-identical texts differ in few bits (Hamming
    * distance ≤ 3 is the classic near-dup criterion). */
  def simhash64(text: Column): Column = {
    val toks = filter(split(text, "\\s+"), w => w =!= "")
    val hashes = transform(toks, t => xxhash64(t))
    val bits = (0 until 64).map { i =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(votes > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Full per-document profile — one pass over the documents table. */
  def profile(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      tokenCount(col("text")).as("n_tokens"),
      subwordCount(col("text")).as("n_subwords"),
      round(meanTokenLen(col("text")), 4).as("mean_tok_len"),
      round(alphaRatio(col("text")), 4).as("alpha_ratio"),
      round(punctRatio(col("text")), 4).as("punct_ratio"),
      round(stopwordRatio(col("text")), 4).as("stopword_ratio"),
      langIdHeuristic(col("text")).as("lang_pred"),
      qualityScore(col("text")).as("quality"),
      fingerprint(col("text")).as("fp64"),
      simhash64(col("text")).as("simhash"))

  /** End-to-end curation decision per document — the q49 pipeline as a
    * reusable operator: PII-redact, fingerprint the CLEAN text (dedup
    * keys computed post-redaction, or two docs differing only in PII
    * stay distinct), score quality/repetition/length, emit keep/drop.
    * Entirely codegen'd per-row expressions — scan-side at any scale.
    * Unit-oracled on fixed docs in CapabilitySpec (expected values
    * re-derived in plain Scala outside the query path). */
  def curate(docs: DataFrame, minQuality: Double = 0.5,
             maxRepetition: Double = 0.2, minTokens: Int = 10): DataFrame =
    curateColumns(docs, minQuality, maxRepetition, minTokens)
      .select(col("doc_id"), col("clean_fp"), col("quality"),
        col("repetition"), col("n_tokens"), col("keep"))

  /** curate's scoring APPENDED to `df` as columns (clean_fp, quality,
    * repetition, n_tokens, keep) — the scan-side form for pipelines
    * that need the surviving rows WITH their text ([[curate]] projects
    * features only, which forces a text-shuffling self-join to get the
    * text back). One definition of the keep rule; curate derives from
    * this. */
  def curateColumns(df: DataFrame, minQuality: Double = 0.5,
                    maxRepetition: Double = 0.2, minTokens: Int = 10): DataFrame =
    df.withColumn("clean_fp", fingerprint(redactPii(col("text"))))
      .withColumn("quality", qualityScore(col("text")))
      .withColumn("repetition", round(repetitionRatio(col("text")), 4))
      .withColumn("n_tokens", tokenCount(col("text")).cast("long"))
      .withColumn("keep",
        col("quality") >= minQuality && col("repetition") <= maxRepetition &&
          col("n_tokens") >= minTokens)

  /** Repetition score per document: frequency share of the most common
    * word n-gram (degenerate/looped text scores near 1, natural text
    * near 1/n_shingles). Entirely inside one row — sort the shingles,
    * then the longest run of equal neighbours IS the mode count
    * (O(s log s) per doc, no explode/shuffle): the filter runs
    * scan-side even at 100 TB. */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val toks = filter(split(text, "\\s+"), w => w =!= "")
    // Full-length shingles only: a doc with < n tokens has no n-gram to
    // repeat and scores 0 (previously its single TRUNCATED shingle made
    // every short doc score a degenerate-looking 1.0).
    val sh = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    val best = aggregate(
      sort_array(sh),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    best.cast("double") / greatest(size(sh), lit(1)).cast("double")
  }
}
