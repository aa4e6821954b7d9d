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

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var ia = 0; var ib = 0; var cnt = 0L
    while (ia < na && ib < nb) {
      if (x.isNullAt(ia)) ia += 1
      else if (y.isNullAt(ib)) ib += 1
      else {
        val cmp =
          if (longElems) java.lang.Long.compare(x.getLong(ia), y.getLong(ib))
          else x.getUTF8String(ia).compareTo(y.getUTF8String(ib))
        if (cmp == 0) { cnt += 1; ia += 1; ib += 1 }
        else if (cmp < 0) ia += 1
        else ib += 1
      }
    }
    cnt.toDouble / (na.toLong + nb.toLong - cnt).toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val ia = ctx.freshName("ia"); val ib = ctx.freshName("ib")
      val cnt = ctx.freshName("cnt"); val cmp = ctx.freshName("cmp")
      val compare =
        if (longElems) s"java.lang.Long.compare($x.getLong($ia), $y.getLong($ib))"
        else s"$x.getUTF8String($ia).compareTo($y.getUTF8String($ib))"
      s"""
         |int $na = $x.numElements(); int $nb = $y.numElements();
         |int $ia = 0; int $ib = 0; long $cnt = 0L;
         |while ($ia < $na && $ib < $nb) {
         |  if ($x.isNullAt($ia)) { $ia++; }
         |  else if ($y.isNullAt($ib)) { $ib++; }
         |  else {
         |    int $cmp = $compare;
         |    if ($cmp == 0) { $cnt++; $ia++; $ib++; }
         |    else if ($cmp < 0) { $ia++; } else { $ib++; }
         |  }
         |}
         |${ev.value} = (double) $cnt / (double) (((long) $na + (long) $nb) - $cnt);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
