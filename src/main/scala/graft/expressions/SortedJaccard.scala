package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}

/** Native Catalyst expression: exact Jaccard similarity of two SORTED,
  * distinct arrays as ONE two-pointer merge —
  * `cast(i as double) / cast((na + nb - i) as double)` with
  * `i = sorted_intersect_size(a, b)`, `na`/`nb` the arrays' sizes.
  *
  * Bit-identical to composing [[SortedIntersectSize]] with `size()` and
  * double division (same merge, same counts — `numElements` is exactly
  * `size()` — and one IEEE-754 double division of the same two longs),
  * so swapping a `i/(na+nb-i)` formulation for this expression cannot
  * move any value. The point is WHERE the work happens: an acceptance
  * filter `round(jaccard, 4) >= t` that Catalyst pushes into a join
  * condition evaluates its expression tree verbatim — join conditions
  * get no codegen subexpression elimination — so the two-`i` ratio form
  * pays TWO merges per candidate pair; this form pays one (round 17,
  * measured on q43: the exact re-score is the query's dominant cost).
  *
  * Same input invariants and null handling as [[SortedIntersectSize]]:
  * inputs sorted ascending + distinct (callers canonicalize per
  * document); null ELEMENTS are skipped by the merge but still counted
  * in the union term, exactly as `size()` counts them. Both-empty
  * arrays yield 0/0 = NaN, matching the double-division composition.
  */
case class SortedJaccard(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(e: Expression): Option[DataType] = e.dataType match {
      case ArrayType(t @ (StringType | LongType), _) => Some(t)
      case _ => None
    }
    (elem(left), elem(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "sorted_jaccard expects two array<string> or two array<bigint> args, got (" +
          s"${left.dataType.sql}, ${right.dataType.sql})")
    }
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  private lazy val longElems: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  // ONE merge implementation for eval and codegen; the generated code
  // CALLS it out-of-line so the (often join-condition-hosting, heavily
  // fused) enclosing method stays under HotSpot's 8000-byte JIT limit —
  // see [[SortedMergeKernel]] for the measured q43 cliff this fixes.
  @transient private lazy val kernel = new SortedMergeKernel(longElems)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedMergeKernel", kernel,
      classOf[SortedMergeKernel].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $ref.jaccard($x, $y);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
