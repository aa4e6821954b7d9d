package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The real-tokenizer seam (VERDICT r10 #1): turn a vocab or BPE merge
  * table into an `n_tokens` column that packing and mixture sampling
  * can budget in TOKENIZER tokens instead of whitespace tokens.
  *
  * Everything downstream already takes the count as data
  * ([[Packing.packSequences]]' and [[Sampling.quotaSample]]'s `nCol`,
  * [[TrainingData.buildTrainingSet]]'s `tokenCounter`); this module
  * supplies the missing first step at scale: a driver-side vocabulary
  * (a config artifact — tokenizer vocabs are ≤ a few hundred k entries
  * by construction) compiled into a codegen'd scan expression
  * ([[graft.expressions.VocabTokenCount]]), so counting 100 TB of text
  * is one trie walk per row inside whole-stage codegen — no per-row
  * Scala UDF, no join against a token table, no shuffle.
  */
object Tokenizer {

  /** A BPE merge table → the equivalent counting vocab: the base
    * alphabet (every character of every merge part, the BPE byte/char
    * fallback tier) plus each merge's parts and product. Counting with
    * greedy longest-match over this vocab approximates merge-order BPE
    * segmentation the way production fast tokenizers do (maximal
    * munch); the count is exact for any text a full merge replay would
    * segment the same way, and within ±the rare merge-order inversions
    * otherwise — the right trade for a BUDGETING count. */
  def vocabFromMerges(merges: Seq[(String, String)]): Seq[String] = {
    require(merges.nonEmpty, "merge table must not be empty")
    val chars = merges.flatMap { case (a, b) => (a + b).map(_.toString) }
    val parts = merges.flatMap { case (a, b) => Seq(a, b, a + b) }
    (chars ++ parts).distinct
  }

  /** The tokenizer-token count of `text` as a codegen'd Column —
    * greedy longest-match over `vocab` (see
    * [[graft.expressions.VocabTokenCount]] for the exact rule). Wire
    * it anywhere an `n_tokens` column is expected:
    * `docs.withColumn("n_tokens", Tokenizer.tokenCount(spark, vocab,
    * col("text")))` feeds packSequences / quotaSample* / the pipeline
    * unchanged. */
  def tokenCount(spark: SparkSession, vocab: Seq[String], text: Column): Column = {
    require(vocab.nonEmpty, "vocab must not be empty")
    graft.expressions.GraftFunctions.register(spark)
    call_function("vocab_token_count", text, array(vocab.map(lit): _*))
  }

  /** The token IDS of `text` as a codegen'd `array<long>` Column — the
    * same greedy longest-match walk as [[tokenCount]] (0-based vocab
    * index per match, −1 per unknown-char fallback; see
    * [[graft.expressions.VocabTokenize]]), so
    * `size(tokenIds(...)) == tokenCount(...)` always. This is the
    * PAYLOAD half of the seam: counts budget packing/mixture, ids are
    * what a packed training sequence carries. */
  def tokenIds(spark: SparkSession, vocab: Seq[String], text: Column): Column = {
    require(vocab.nonEmpty, "vocab must not be empty")
    graft.expressions.GraftFunctions.register(spark)
    call_function("vocab_tokenize", text, array(vocab.map(lit): _*))
  }

  /** TRUE merge-order BPE segmentation as a codegen'd `array<string>`
    * Column ([[graft.expressions.BpeTokens]]): replays `merges` —
    * ("left", "right") pairs in rank order, the tokenizer-file
    * convention — exactly as a production BPE encoder does. Use when
    * the segmentation must MATCH a real tokenizer; use [[tokenCount]]
    * (greedy longest-match over [[vocabFromMerges]]) when a cheap
    * budgeting count suffices. The two genuinely diverge on
    * merge-order inversions (pinned in TokenizerSpec). */
  def bpeTokens(spark: SparkSession, merges: Seq[(String, String)], text: Column): Column = {
    require(merges.nonEmpty, "merge table must not be empty")
    graft.expressions.GraftFunctions.register(spark)
    call_function("bpe_tokens", text,
      array(merges.map { case (a, b) => lit(s"$a $b") }: _*))
  }

  /** The merge-replay token count: `size(bpeTokens(...))` as a long —
    * the drop-in `n_tokens` column for packing/mixture when budgets
    * must be in TRUE BPE tokens. */
  def bpeTokenCount(spark: SparkSession, merges: Seq[(String, String)], text: Column): Column =
    size(bpeTokens(spark, merges, text)).cast("long")

  /** The vocab-TABLE path: a (token) DataFrame — e.g. a vocab file read
    * as a table — collected driver-side and compiled into the scan.
    * The collect is bounded and correct by construction: a tokenizer
    * vocab is a CONFIG artifact (50k–256k entries for production BPE
    * vocabs), not data; the guard fails loudly if a caller points this
    * at a data-sized table. Entry order cannot matter (longest-match
    * is order-independent), so the collect's nondeterministic row
    * order is harmless. */
  def tokenCountFromTable(spark: SparkSession, vocabTable: DataFrame,
                          tokenCol: String, text: Column,
                          maxVocab: Int = 1000000): Column = {
    val vocab = vocabTable.select(col(tokenCol).cast("string").as("t"))
      .na.drop().distinct().limit(maxVocab + 1)
      .collect().map(_.getString(0)).toSeq
    require(vocab.size <= maxVocab,
      s"vocab table exceeds $maxVocab entries — tokenizer vocabs are " +
        "config-sized; this looks like a data table")
    tokenCount(spark, vocab, text)
  }
}
