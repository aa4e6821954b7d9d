package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the distinct character trigrams of a
  * string as a SORTED `array<bigint>` of packed code-point triples —
  * the scan-side canonicalization for character-n-gram set similarity
  * (q64), built to feed [[SortedIntersectSize]]'s primitive long merge.
  *
  * Packing is a bijection, not a hash: a Unicode code point needs 21
  * bits (max U+10FFFF), so three of them pack losslessly into 63 bits
  * (`cp0 << 42 | cp1 << 21 | cp2`, always non-negative). Two trigrams
  * are equal iff their packed longs are equal, so distinct counts —
  * and therefore every Jaccard value computed from them — are
  * IDENTICAL to the string-trigram formulation
  * (`sort_array(array_distinct(transform(sequence(1, length(text)-2),
  * i -> substring(text, i, 3))))`); only the sort order differs
  * (packed numeric vs string binary), and set intersection is
  * order-agnostic as long as both sides sort the same way. Both
  * `length`/`substring` and this expression count CODE POINTS (an
  * astral character is one position in each), so the trigram windows
  * line up exactly.
  *
  * What it replaces is the expensive part of the string formulation:
  * per document, the SQL pipeline above allocates one UTF8String per
  * window plus the distinct/sort machinery on string objects; per
  * candidate PAIR, the string merge materializes two UTF8String
  * wrappers per element visited. This expression does one code-point
  * scan per document into a primitive long[] (sort + in-place dedup,
  * zero per-window allocation), and the downstream merge compares
  * plain longs. The per-pair loop is where the quadratic candidate
  * work lives, so that is the win that scales.
  */
case class PackedTrigrams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"packed_trigrams expects a string arg, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "packed_trigrams"

  override protected def nullSafeEval(input: Any): Any =
    PackedTrigrams.pack(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.PackedTrigrams$$.MODULE$$.pack($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PackedTrigrams {
  private val empty: ArrayData =
    UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  /** Static worker the generated code calls — sorted distinct packed
    * trigrams of `u`. Called once per ROW (scan side), not per pair. */
  def pack(u: UTF8String): ArrayData = {
    val cps = u.toString.codePoints().toArray
    val n = cps.length - 2
    if (n <= 0) return empty
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) {
      arr(i) = (cps(i).toLong << 42) | (cps(i + 1).toLong << 21) | cps(i + 2).toLong
      i += 1
    }
    java.util.Arrays.sort(arr)
    var w = 1
    var r = 1
    while (r < n) {
      if (arr(r) != arr(w - 1)) { arr(w) = arr(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == n) arr else java.util.Arrays.copyOf(arr, w))
  }
}
