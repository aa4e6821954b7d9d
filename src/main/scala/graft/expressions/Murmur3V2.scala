package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the CORRECTED 32-bit murmur3 of a string
  * (seed 42) — `Murmur3_x86_32.hashUnsafeBytes2`, the tail-byte-correct
  * variant (SPARK-23381) that `org.apache.spark.ml.feature.HashingTF`
  * hashes terms with since Spark 3.0.
  *
  * This is NOT the same function as SQL's `hash(...)`: that one keeps
  * the legacy `hashUnsafeBytes` (tail bytes folded one at a time, kept
  * for on-disk compatibility), so `pmod(hash(w), numFeatures)` does NOT
  * reproduce `HashingTF.indexOf` — the two agree only when a string's
  * length is a multiple of 4 (or by collision). This expression exists
  * so the q43 MinHash family replay ([[graft.operators.Approx]]) can
  * compute the ML pipeline's feature indices scan-side, codegen'd,
  * without building a 2^18-dim sparse vector per document; the
  * native-vs-model equality test in CapabilitySpec pins the match. */
case class Murmur3V2(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"murmur3_v2 expects a string arg, got ${child.dataType.sql}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "murmur3_v2"

  override protected def nullSafeEval(input: Any): Any =
    Murmur3V2.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Murmur3V2$$.MODULE$$.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Murmur3V2 {
  /** HashingTF's term hash: corrected murmur3 over the UTF-8 bytes,
    * seed 42 (`FeatureHasher.murmur3Hash`). */
  def hash(u: UTF8String): Int =
    Murmur3_x86_32.hashUnsafeBytes2(
      u.getBaseObject, u.getBaseOffset, u.numBytes(), 42)
}
