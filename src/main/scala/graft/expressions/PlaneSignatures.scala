package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All L random-hyperplane LSH bucket signatures of one vector in one
  * call: `plane_signatures(vec, planes)` with `planes` a foldable
  * `array<array<array<double>>>` ([table][plane][dim]) returns
  * `array<long>` — element t = Σ_i (double_dot(vec, planes[t][i]) >= 0
  * ? 1L << i : 0), the exact bit rule of the per-plane Column
  * formulation it replaces.
  *
  * Why an expression and not composed Columns (the [[MipAssign]]
  * lesson, found again by measurement in round 17): the composed
  * `array(sig_0 … sig_{L-1})` — L·b CASE/shiftleft/[[DoubleDotProduct]]
  * nodes — is ONE top-level projection expression, so Catalyst's
  * expression splitter cannot break it up, and at the q46 design point
  * (L=8 tables × b=8 planes × 64 dims) the generated method crosses
  * HotSpot's 8000-byte DontCompileHugeMethods limit: the stage stays
  * "whole-stage codegen" but runs in the BYTECODE INTERPRETER.
  * Measured on the corpus signature projection (sf0.1, noop sink,
  * 2000 vectors): L=1 0.05 CPU-s, L=4 0.07, L=8 3.48 — a 47× cliff at
  * the method-size boundary, reproducibly moved by
  * -XX:-DontCompileHugeMethods. This expression is a constant-size
  * codegen call into a tight primitive loop — O(L·b·dim) per row at
  * compiled speed regardless of L.
  *
  * Arithmetic contract (q46's 50-row pin + 0.94-recall pin both ride
  * on it): per-plane dots are bit-identical to [[DoubleDotProduct]] —
  * float elements widen per element, products accumulate sequentially
  * into a double over the min-length prefix — and the sign cut matches
  * Spark's `dot >= 0` on EVERY double including the edges: -0.0 sets
  * the bit, and a NaN dot sets the bit too (Spark's comparison orders
  * NaN above all values, so its `>= 0` is true; the `!(acc < 0)` form
  * below reproduces that, where a plain Java `acc >= 0` would say
  * false — ADVICE r17). A NaN dot is unreachable from finite inputs
  * (it needs ±Inf overflow cancellation), but the registered SQL
  * function is callable with arbitrary doubles, so the two forms now
  * agree everywhere by construction, not by reachability.
  */
case class PlaneSignatures(vec: Expression, planes: Expression)
  extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = planes

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val planesOk = planes.foldable && (planes.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false
    })
    if (vecOk && planesOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "plane_signatures expects (array<float|double> vec, foldable " +
        "array<array<array<double>>> planes); got (" +
        s"${vec.dataType.sql}, ${planes.dataType.sql})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "plane_signatures"

  private lazy val vecFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val model: PlaneSigModel = {
    // Foldable NULLs of the correct type pass checkInputDataTypes (the
    // plane literal's nested containsNull is whatever the caller's
    // encoder derived — typedLit of Seq[Seq[Seq[Double]]] marks outer
    // levels nullable); fail with a descriptive message instead of an
    // opaque NPE deep in construction (ADVICE r17).
    val raw = planes.eval(null)
    require(raw != null, "plane_signatures: the planes literal is NULL")
    val ts = raw.asInstanceOf[ArrayData]
    new PlaneSigModel((0 until ts.numElements()).map { t =>
      val ps = ts.getArray(t)
      require(ps != null,
        s"plane_signatures: planes table $t is NULL (nulls are not valid planes)")
      (0 until ps.numElements()).map { i =>
        val p = ps.getArray(i)
        require(p != null,
          s"plane_signatures: plane $i of table $t is NULL (nulls are not valid planes)")
        p.toDoubleArray()
      }.toArray
    }.toArray, vecFloat)
  }

  override protected def nullSafeEval(v: Any, p: Any): Any =
    model.signatures(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("planeSigModel", model,
      classOf[PlaneSigModel].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $modelRef.signatures($v);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(vec = newLeft, planes = newRight)
}

/** The prepared plane tensor behind [[PlaneSignatures]]. */
final class PlaneSigModel(planes: Array[Array[Array[Double]]],
                          vecFloat: Boolean) extends Serializable {
  require(planes.forall(_.length <= 64),
    "plane_signatures: more than 64 planes per table cannot pack into a long")

  def signatures(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val table = planes(t)
      var sig = 0L
      var i = 0
      while (i < table.length) {
        val plane = table(i)
        val m = math.min(n, plane.length)
        var acc = 0.0
        var j = 0
        if (vecFloat) {
          while (j < m) { acc += v.getFloat(j).toDouble * plane(j); j += 1 }
        } else {
          while (j < m) { acc += v.getDouble(j) * plane(j); j += 1 }
        }
        // !(acc < 0) ≡ Spark's `>= 0` on all doubles: true for +0.0,
        // -0.0 AND NaN (Spark orders NaN above everything); a plain
        // `acc >= 0` would diverge on NaN (ADVICE r17).
        if (!(acc < 0)) sig |= (1L << i)
        i += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }
}
