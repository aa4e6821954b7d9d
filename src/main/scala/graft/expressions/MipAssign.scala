package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Exact max-inner-product cell assignment:
  * `mip_assign(vec, centroids)` maps a float vector to the FIRST
  * centroid index attaining the maximal inner product — the quantizer
  * rule of the semantic-dedup value harness (q84/q88) and of
  * [[graft.operators.Approx.buildSemanticIndex]].
  *
  * Why an expression and not a composed Column: the composed form
  * (`array(double_dot(vec, c₀), …, double_dot(vec, c_{k-1}))` +
  * `array_position(…, array_max(…))`) materializes k expression NODES —
  * at the production cell-count law (nlist ∝ corpus, 2400 cells at the
  * 300× smoke) that tree blows past JVM codegen limits and falls back
  * to interpreted per-node evaluation: the q88_stored_batch smoke
  * measured the increment assign going superlinear exactly that way
  * (24.1 s → 132.0 s for 3× data, the only stage whose work grows with
  * nlist). This expression carries the centroid matrix as ONE driver-
  * prepared reference object (the [[IvfTreeAssign]] pattern) and scores
  * it in a tight primitive loop — O(nlist·dim) per row at native speed,
  * constant codegen size.
  *
  * Arithmetic contract (pinned by the operator-≡-q88 equivalence spec):
  * per-element products are float-element → double times double
  * centroid, accumulated sequentially into a double — bit-identical to
  * the declared q84/q88 `element_at(e, j+1) * lit(c)` fold and to
  * [[DoubleDotProduct]] on (float, double) inputs — and ties keep the
  * FIRST index (q84's `>=`-over-later-cells fold ≡ first occurrence of
  * the maximum, hence the strict `>` update below).
  *
  * `centroids` (array<array<double>>, index = cell id) must be a
  * FOLDABLE literal from the driver-side quantizer.
  */
case class MipAssign(vec: Expression, cents: Expression)
  extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = cents

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val centsOk = cents.foldable && (cents.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    })
    if (vecOk && centsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "mip_assign expects (array<float> vec, foldable array<array<double>> " +
        s"centroids); got (${vec.dataType.sql}, ${cents.dataType.sql})")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "mip_assign"

  @transient private lazy val model: MipModel = {
    val ca = cents.eval(null).asInstanceOf[ArrayData]
    new MipModel((0 until ca.numElements()).map { i =>
      ca.getArray(i).toDoubleArray()
    }.toArray)
  }

  override protected def nullSafeEval(v: Any, c: Any): Any =
    model.assign(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("mipModel", model, classOf[MipModel].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $modelRef.assign($v);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(vec = newLeft, cents = newRight)
}

/** The prepared centroid matrix behind [[MipAssign]]. */
final class MipModel(cents: Array[Array[Double]]) extends Serializable {
  require(cents.nonEmpty, "mip_assign: empty centroid set")
  // One quantizer = one dimensionality; a ragged centroid table is a
  // construction error, caught once here rather than per row.
  private val dim = cents(0).length
  require(cents.forall(_.length == dim),
    s"mip_assign: ragged centroid set (dims ${cents.map(_.length).distinct.mkString(",")})")

  def assign(v: ArrayData): Int = {
    // A mis-dimensioned embedding must fail LOUDLY: silently scoring a
    // prefix inner product would return a plausible-looking cell and
    // desynchronize assignments from a correctly-dimensioned index —
    // the repo's fail-loud convention (packedPos, centroid-table gap
    // guard). One branch per row against a hoisted constant.
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"mip_assign: embedding dim ${v.numElements()} != quantizer dim $dim")
    var best = 0
    var bestScore = Double.NegativeInfinity
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += v.getFloat(i).toDouble * c(i); i += 1 }
      if (acc > bestScore) { best = k; bestScore = acc }
      k += 1
    }
    best
  }
}
