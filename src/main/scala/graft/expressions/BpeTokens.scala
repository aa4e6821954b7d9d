package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** TRUE merge-order BPE encoding, compiled into the scan:
  * `bpe_tokens(text, merges)` returns the surface-token segmentation
  * (`array<string>`) produced by replaying a BPE merge table in RANK
  * order — the algorithm production BPE tokenizers define their
  * segmentation by, as opposed to [[VocabTokenCount]]'s greedy
  * longest-match approximation of it.
  *
  * Semantics (the standard encode loop):
  *   - text is pre-tokenized on `\s+` runs (the repo's whitespace
  *     convention, identical to [[VocabTrie]]'s);
  *   - each word starts as its sequence of single chars (the char
  *     fallback tier — every char is a token even if no merge ever
  *     touches it, the <unk>-free byte/char-level convention);
  *   - repeatedly: find the adjacent symbol pair with the LOWEST merge
  *     rank present in the word; merge ALL its occurrences
  *     left-to-right (non-overlapping); stop when no adjacent pair has
  *     a rank.
  *
  * Greedy-vs-BPE divergence is real and pinned in TokenizerSpec: with
  * merges [(b,c), (a,b)] the word "abc" BPE-encodes to [a, bc] (rank 0
  * fires first) while greedy longest-match over the derived vocab
  * takes [ab, c] (leftmost-longest) — which is why the seam offers
  * BOTH: greedy for cheap budgeting counts ([[VocabTokenCount]]),
  * merge replay when the count/ids must match a production tokenizer
  * exactly.
  *
  * Scale shape: identical to [[VocabTokenCount]] — `merges` must be a
  * FOLDABLE array<string> of "left right" pairs in rank order (rank =
  * array index; a merge table is a config artifact, not data), the
  * rank map builds once driver-side and ships via the generated code's
  * reference array, and the per-row encode runs inside whole-stage
  * codegen. Per-word cost is O(len · merges-applied) with a LinkedList-
  * free array walk — the standard quadratic worst case on pathological
  * single-char runs, linear on natural text.
  */
case class BpeTokens(text: Expression, merges: Expression)
  extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = merges

  override def checkInputDataTypes(): TypeCheckResult = {
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bpe_tokens expects a string text arg, got ${text.dataType.sql}")
    else merges.dataType match {
      case ArrayType(StringType, _) if merges.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckFailure(
          "bpe_tokens' merges must be FOLDABLE (a literal array — " +
            "build it driver-side; a per-row table would rebuild the rank map per row)")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"bpe_tokens expects array<string> merges, got ${other.sql}")
    }
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  @transient private lazy val table: BpeMergeTable = {
    val arr = merges.eval(null).asInstanceOf[ArrayData]
    new BpeMergeTable(VocabTrie.stringElems(arr, prettyName))
  }

  override protected def nullSafeEval(t: Any, m: Any): Any =
    new GenericArrayData(
      table.encode(t.asInstanceOf[UTF8String].toString)
        .map(UTF8String.fromString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table, classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $tableRef.encodeArrayData($t.toString());")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(text = newLeft, merges = newRight)
}

/** The rank structure behind [[BpeTokens]]: "left right" merge strings
  * parsed once into a (left, right) → rank map (first occurrence wins
  * on duplicates, matching tokenizer-file conventions). `encode` is
  * the classic loop: scan for the present pair with minimum rank,
  * merge its occurrences left-to-right, repeat. */
final class BpeMergeTable(merges: Seq[String]) extends Serializable {
  // Scala map, not java.util.HashMap[String, Int]: the java generic's
  // get would UNBOX a missing key's null to 0 — silently rank 0, the
  // highest (most-preferred) rank, for every ABSENT pair.
  private val rank = scala.collection.mutable.HashMap.empty[String, Int]
  merges.zipWithIndex.foreach { case (m, i) =>
    val sp = m.indexOf(' ')
    require(sp > 0 && sp < m.length - 1 && m.indexOf(' ', sp + 1) < 0,
      s"merge entry '$m' must be exactly 'left right' (one interior space)")
    require(!m.exists(c => BpeMergeTable.isWs(c) && c != ' '),
      s"merge parts in '$m' must not contain non-space whitespace")
    if (!rank.contains(m)) rank.put(m, i)
  }
  require(rank.nonEmpty, "merge table must not be empty")

  def size: Int = rank.size

  private def pairRank(a: String, b: String): Int =
    rank.getOrElse(a + " " + b, Int.MaxValue)

  /** Encode one whitespace-free word: char split, then merge the
    * minimum-rank adjacent pair (all occurrences, left-to-right) until
    * no adjacent pair has a rank. */
  private def encodeWord(word: String,
                         out: scala.collection.mutable.ArrayBuilder[String]): Unit = {
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    var n = word.length
    var done = n < 2
    while (!done) {
      // find the minimum-rank adjacent pair
      var best = Int.MaxValue
      var j = 0
      while (j < n - 1) {
        val r = pairRank(syms(j), syms(j + 1))
        if (r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // merge all occurrences of the best pair, left-to-right
        val merged = new Array[String](n)
        var src = 0
        var dst = 0
        while (src < n) {
          if (src < n - 1 && pairRank(syms(src), syms(src + 1)) == best) {
            merged(dst) = syms(src) + syms(src + 1)
            src += 2
          } else {
            merged(dst) = syms(src)
            src += 1
          }
          dst += 1
        }
        syms = merged
        n = dst
        done = n < 2
      }
    }
    i = 0
    while (i < n) { out += syms(i); i += 1 }
  }

  /** The BPE segmentation of `s` (words pre-split on whitespace runs,
    * encoded independently, concatenated in order). */
  def encode(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuilder.make[String]
    val len = s.length
    var i = 0
    while (i < len) {
      if (BpeMergeTable.isWs(s.charAt(i))) i += 1
      else {
        var j = i
        while (j < len && !BpeMergeTable.isWs(s.charAt(j))) j += 1
        encodeWord(s.substring(i, j), out)
        i = j
      }
    }
    out.result()
  }

  /** Called from generated code: the encode wrapped for Catalyst. */
  def encodeArrayData(s: String): GenericArrayData =
    new GenericArrayData(encode(s).map(UTF8String.fromString))
}

object BpeMergeTable {
  /** Java regex `\s` — delegates to [[VocabTrie.isWs]] so the two
    * tokenizer arms can never disagree on the whitespace class. */
  def isWs(c: Char): Boolean = VocabTrie.isWs(c)
}
