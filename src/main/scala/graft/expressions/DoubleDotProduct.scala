package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: double-accumulated dot product of two
  * FLOAT or DOUBLE arrays — the hot loop of the hyperplane-LSH ANN path
  * (bucket signatures, norms, and the exact cosine re-score, q46).
  *
  * Bit-compatibility with the higher-order-function formulation it
  * replaces (`aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0),
  * (acc, x) => acc + x)`) is load-bearing: q46's similarity values and
  * recall are pinned to that arithmetic. The HOF multiplies each pair
  * in the COMMON type of the element types (float·float → float
  * product; float·double → double product, e.g. a float embedding
  * against literal double hyperplanes) and folds left-to-right into a
  * double accumulator. This expression reproduces exactly that: the
  * per-pair product is computed in float only when BOTH sides are
  * float, and every sum is a sequential double add in element order —
  * so swapping it in cannot move any rounded similarity or flip any
  * signature bit. What changes is the execution: one tight primitive
  * loop inside whole-stage codegen instead of an interpreted lambda
  * per element with boxing.
  *
  * Arrays are assumed non-null-elemented (embedding vectors / plane
  * literals); length mismatch folds over the shorter prefix like
  * [[FloatDotProduct]].
  */
case class DoubleDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "double_dot expects two array<float|double> args, got (" +
          s"${left.dataType.sql}, ${right.dataType.sql})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_dot"

  private lazy val bothFloat: Boolean =
    elemType(left).contains(FloatType) && elemType(right).contains(FloatType)
  private lazy val leftFloat: Boolean = elemType(left).contains(FloatType)
  private lazy val rightFloat: Boolean = elemType(right).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    if (bothFloat) {
      while (i < n) { acc += (x.getFloat(i) * y.getFloat(i)).toDouble; i += 1 }
    } else {
      while (i < n) {
        val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
        i += 1
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val product =
        if (bothFloat) s"(double) ($x.getFloat($i) * $y.getFloat($i))"
        else {
          val xv = if (leftFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
          val yv = if (rightFloat) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
          s"$xv * $yv"
        }
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $product;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
