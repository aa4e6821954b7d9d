package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match (maximal-munch) subword tokenizer over a fixed
  * vocabulary, compiled into the scan: `vocab_token_count(text, vocab)`
  * returns the number of vocabulary tokens the text segments into — the
  * TOKENIZER-token count a training-data pipeline budgets in, where the
  * declared q41/q67/q68/q69 forms budget in whitespace tokens.
  *
  * Semantics (the WordPiece/maximal-munch counting rule, which is also
  * how a BPE vocab is applied at inference by most production
  * tokenizers' fast paths):
  *   - the text is pre-tokenized on `\s+` runs (the repo's whitespace
  *     convention — same character class as Java regex `\s`);
  *   - within a word, the longest vocab entry matching at the cursor is
  *     taken and the cursor advances past it;
  *   - a position where NO vocab entry matches counts one token
  *     (byte/char-fallback, the <unk> convention) and advances one char.
  * Total = Σ per-word token counts. Deterministic, order-independent,
  * and engine-replayable — CapabilitySpec value-matches a driver-side
  * replay.
  *
  * Scale shape: the vocab must be a FOLDABLE array<string> (a literal —
  * e.g. `array(lit(...))` from a driver-side vocab/merge table, see
  * [[graft.operators.Tokenizer]]). The match trie is built ONCE on the
  * driver at codegen time and ships to executors through the generated
  * code's reference array, inside the stage's one-per-executor
  * TorrentBroadcast task binary — per-row work is a trie walk inside
  * whole-stage codegen, no per-row UDF dispatch, no join, no shuffle.
  * A 50k-entry vocab is a few MB once, then pure scan-side compute.
  */
case class VocabTokenCount(text: Expression, vocab: Expression)
  extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = vocab

  override def checkInputDataTypes(): TypeCheckResult = {
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"vocab_token_count expects a string text arg, got ${text.dataType.sql}")
    else vocab.dataType match {
      case ArrayType(StringType, _) if vocab.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckFailure(
          "vocab_token_count's vocab must be FOLDABLE (a literal array — " +
            "build it driver-side; a per-row vocab would rebuild the trie per row)")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"vocab_token_count expects array<string> vocab, got ${other.sql}")
    }
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "vocab_token_count"

  /** Built once per JVM that evaluates this expression instance: on the
    * driver for codegen (then shipped built, via addReferenceObj) and
    * interpreted driver-side folding; on an executor only if the
    * expression itself is serialized there un-codegen'd (the trie
    * rebuilds from the literal child — @transient keeps the closure
    * small either way). */
  @transient private lazy val trie: VocabTrie = {
    val arr = vocab.eval(null).asInstanceOf[ArrayData]
    new VocabTrie(VocabTrie.stringElems(arr, prettyName))
  }

  override protected def nullSafeEval(t: Any, v: Any): Any =
    trie.countTokens(t.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("vocabTrie", trie, classOf[VocabTrie].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $trieRef.countTokens($t.toString());")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(text = newLeft, vocab = newRight)
}

/** Greedy longest-match tokenization to token IDS:
  * `vocab_tokenize(text, vocab)` returns `array<long>` — the 0-based
  * vocab index of each matched entry in segmentation order, `-1` for
  * each unknown-char fallback position (the <unk> convention). The
  * segmentation rule (and therefore `size(vocab_tokenize(t, v)) =
  * vocab_token_count(t, v)` for every input, property-pinned in
  * TokenizerSpec) is EXACTLY [[VocabTokenCount]]'s: same `\s+`
  * pre-tokenization, same maximal munch, same one-char fallback —
  * both walks share one [[VocabTrie]].
  *
  * This is the missing half of the tokenizer seam: counts budget the
  * pipeline (packing spans, mixture quotas), ids are the PAYLOAD a
  * packed training row carries. Scale shape identical to the count
  * form — foldable vocab literal, trie built once driver-side, shipped
  * via the generated code's reference array, per-row walk inside
  * whole-stage codegen. Duplicate vocab entries resolve to the FIRST
  * occurrence's index (the count form is insensitive to duplicates;
  * feeding a distinct vocab makes ids unambiguous).
  */
case class VocabTokenize(text: Expression, vocab: Expression)
  extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = vocab

  override def checkInputDataTypes(): TypeCheckResult = {
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"vocab_tokenize expects a string text arg, got ${text.dataType.sql}")
    else vocab.dataType match {
      case ArrayType(StringType, _) if vocab.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckFailure(
          "vocab_tokenize's vocab must be FOLDABLE (a literal array — " +
            "build it driver-side; a per-row vocab would rebuild the trie per row)")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"vocab_tokenize expects array<string> vocab, got ${other.sql}")
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vocab_tokenize"

  @transient private lazy val trie: VocabTrie = {
    val arr = vocab.eval(null).asInstanceOf[ArrayData]
    new VocabTrie(VocabTrie.stringElems(arr, prettyName))
  }

  override protected def nullSafeEval(t: Any, v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      trie.tokenizeIds(t.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("vocabTrie", trie, classOf[VocabTrie].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $trieRef.tokenizeIds($t.toString()));""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(text = newLeft, vocab = newRight)
}

/** The match structure behind [[VocabTokenCount]]: a char-keyed trie
  * over the vocab with terminal marks, walked left-to-right for the
  * longest match at each cursor. Transitions live in one primitive
  * LongMap (key = node << 16 | UTF-16 unit) — no per-node objects, so
  * a 50k-entry vocab is a few MB and the walk is cache-friendly.
  * Serializable so interpreted-path expression shipping still works.
  */
final class VocabTrie(vocab: Seq[String]) extends Serializable {
  private val trans = scala.collection.mutable.LongMap.empty[Int]
  private val terminal = scala.collection.mutable.BitSet.empty
  // terminal node → 0-based index of the FIRST vocab entry ending there
  // (duplicate entries trace the same path; first occurrence wins — the
  // count walk never reads this, only tokenizeIds does).
  private val terminalId = scala.collection.mutable.HashMap.empty[Int, Int]
  private var nNodes = 1
  vocab.zipWithIndex.foreach { case (tok, id) =>
    require(tok.nonEmpty, "vocab entries must be non-empty")
    require(!tok.exists(VocabTrie.isWs),
      s"vocab entry ${tok.take(20)} contains whitespace — entries must not " +
        "span the \\s+ pre-tokenization boundary")
    var node = 0
    var i = 0
    while (i < tok.length) {
      val key = node.toLong << 16 | tok.charAt(i)
      node = trans.get(key) match {
        case Some(nx) => nx
        case None =>
          val nn = nNodes; nNodes += 1; trans(key) = nn; nn
      }
      i += 1
    }
    terminal += node
    if (!terminalId.contains(node)) terminalId(node) = id
  }

  def size: Int = terminal.size

  /** Token count under greedy longest-match; see [[VocabTokenCount]]
    * for the exact rule. Called from generated code — keep the
    * signature primitive-friendly. */
  def countTokens(s: String): Long = {
    val n = s.length
    var i = 0
    var cnt = 0L
    while (i < n) {
      if (VocabTrie.isWs(s.charAt(i))) i += 1
      else {
        var node = 0
        var j = i
        var last = -1
        var walking = true
        while (walking && j < n) {
          val ch = s.charAt(j)
          if (VocabTrie.isWs(ch)) walking = false
          else trans.get(node.toLong << 16 | ch) match {
            case Some(nx) =>
              node = nx; j += 1
              if (terminal(node)) last = j
            case None => walking = false
          }
        }
        cnt += 1
        i = if (last > i) last else i + 1
      }
    }
    cnt
  }

  /** Token IDS under the IDENTICAL walk as [[countTokens]] (same
    * cursor rule, so the result length always equals the count):
    * 0-based vocab index per match, −1 per one-char fallback. Called
    * from generated code. */
  def tokenizeIds(s: String): Array[Long] = {
    val n = s.length
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    var i = 0
    while (i < n) {
      if (VocabTrie.isWs(s.charAt(i))) i += 1
      else {
        var node = 0
        var j = i
        var last = -1
        var lastId = -1
        var walking = true
        while (walking && j < n) {
          val ch = s.charAt(j)
          if (VocabTrie.isWs(ch)) walking = false
          else trans.get(node.toLong << 16 | ch) match {
            case Some(nx) =>
              node = nx; j += 1
              if (terminal(node)) { last = j; lastId = terminalId(node) }
            case None => walking = false
          }
        }
        if (last > i) { out += lastId.toLong; i = last }
        else { out += -1L; i += 1 }
      }
    }
    out.result()
  }
}

object VocabTrie {
  /** Java regex `\s` exactly — the same class the declared queries'
    * `split(text, "\\s+")` pre-tokenization uses (NOT the broader
    * Character.isWhitespace). */
  def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Literal-array extraction with a LOUD null check for the tokenizer
    * expressions' config arrays: a nullable-TYPED literal is legal
    * (checkInputDataTypes accepts any containsNull), but a null
    * ELEMENT is a config error — report it with the function name and
    * index instead of an NPE from deep inside the trie/rank build
    * (review finding, round 11). */
  def stringElems(arr: ArrayData, fn: String): Seq[String] =
    (0 until arr.numElements()).map { i =>
      require(!arr.isNullAt(i),
        s"$fn: the literal array contains a NULL element at index $i")
      arr.getUTF8String(i).toString
    }
}
