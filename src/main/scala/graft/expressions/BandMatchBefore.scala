package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType}

/** Native Catalyst expression: does any band strictly BEFORE band `upTo`
  * match between two banded LSH signatures? Signature arrays are flat
  * `array<long>`; band g is the slice `[g·width, (g+1)·width)`; the
  * expression returns true iff ∃ g < upTo with all `width` positions
  * equal.
  *
  * This is the emit-once LSH dedup predicate: a banded candidate join
  * emits a colliding pair once per matching band, and the classic fix —
  * keep a pair only at its MINIMAL matching band, i.e. filter
  * `!band_match_before(sigA, sigB, width, band)` — removes the
  * duplicates inside the band-bucket partitions, before any exchange.
  * Replacing the post-join `distinct()` this way drops the full
  * O(candidates × duplication) pair exchange (measured on q43 at sf0.1:
  * 62M pre-distinct rows for ~7M distinct candidates — the near-clique
  * corpus collides in nearly every one of the 8 bands). The filter sees
  * every pre-dedup row, so it must be cheap: a higher-order-function
  * formulation (`exists` over a sequence) evaluates interpreted per row;
  * this expression generates a tight two-level primitive loop inside
  * whole-stage codegen — ≤ width·upTo long compares, no allocation.
  *
  * The candidate SET is unchanged by construction (every colliding pair
  * has exactly one minimal matching band), so swapping distinct() for
  * this filter cannot change any downstream result.
  */
case class BandMatchBefore(first: Expression, second: Expression,
                           third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val arraysOk = Seq(first, second).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    val intsOk = Seq(third, fourth).forall(_.dataType == IntegerType)
    if (arraysOk && intsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "band_match_before expects (array<bigint>, array<bigint>, int width, int upTo), got (" +
        Seq(first, second, third, fourth).map(_.dataType.sql).mkString(", ") + ")")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "band_match_before"

  override protected def nullSafeEval(a: Any, b: Any, w: Any, g: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val width = w.asInstanceOf[Int]
    val upTo = g.asInstanceOf[Int]
    var band = 0
    while (band < upTo) {
      var j = 0
      var all = true
      while (all && j < width) {
        if (x.getLong(band * width + j) != y.getLong(band * width + j)) all = false
        j += 1
      }
      if (all) return true
      band += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, w, g) => {
      val band = ctx.freshName("band")
      val j = ctx.freshName("j")
      val all = ctx.freshName("all")
      s"""
         |${ev.value} = false;
         |for (int $band = 0; $band < $g && !${ev.value}; $band++) {
         |  boolean $all = true;
         |  for (int $j = 0; $all && $j < $w; $j++) {
         |    if ($x.getLong($band * $w + $j) != $y.getLong($band * $w + $j)) $all = false;
         |  }
         |  ${ev.value} = $all;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}
