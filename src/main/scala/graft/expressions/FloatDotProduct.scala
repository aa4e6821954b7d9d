package graft.expressions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Native Catalyst expression: naive sequential float32 dot product of two
  * FLOAT arrays — the hot loop of cosine similarity (q36, ANN).
  *
  * Preference order for extending Spark is builtin functions > native
  * `Expression` with codegen > UDF (SURVEY.md §4): the builtin HOF
  * formulation (`aggregate(zip_with(...))`) is interpreted per element
  * with boxed lambda calls, while this generates a tight primitive loop
  * inside whole-stage codegen. Accumulation is float32 left-to-right —
  * bit-identical to both the HOF formulation and DuckDB's
  * `list_cosine_similarity` (the oracle), so swapping it in cannot change
  * any rounded result.
  *
  * Arrays are assumed non-null-elemented (embedding vectors); length
  * mismatch folds over the shorter prefix like `zip_with`-with-null-drop.
  */
case class FloatDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // Match either containsNull variant: array(CAST(... AS FLOAT)) and
    // transform(...)-built columns carry containsNull=false, and an
    // exact == ArrayType(FloatType) (containsNull=true) would reject
    // them with an error naming the very type they have.
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"float_dot expects two array<float> args, got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = FloatType
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0f
    var i = 0
    while (i < n) { acc += x.getFloat(i) * y.getFloat(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |float $acc = 0.0f;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getFloat($i) * $y.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration for the engine's native functions — either imperatively
  * (`GraftFunctions.register(spark)`) or through the standard plugin path
  * (`spark.sql.extensions=graft.expressions.GraftExtensions`). */
object GraftFunctions {
  val info = new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot")
  val intersectInfo =
    new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size")
  val jaccardInfo =
    new ExpressionInfo(classOf[SortedJaccard].getName, "sorted_jaccard")
  val bandInfo =
    new ExpressionInfo(classOf[BandMatchBefore].getName, "band_match_before")
  val trigramInfo =
    new ExpressionInfo(classOf[PackedTrigrams].getName, "packed_trigrams")
  val doubleDotInfo =
    new ExpressionInfo(classOf[DoubleDotProduct].getName, "double_dot")
  val murmurV2Info =
    new ExpressionInfo(classOf[Murmur3V2].getName, "murmur3_v2")
  val vocabCountInfo =
    new ExpressionInfo(classOf[VocabTokenCount].getName, "vocab_token_count")
  val ivfTreeInfo =
    new ExpressionInfo(classOf[IvfTreeAssign].getName, "ivf_tree_assign")
  val mipAssignInfo =
    new ExpressionInfo(classOf[MipAssign].getName, "mip_assign")
  val vocabTokenizeInfo =
    new ExpressionInfo(classOf[VocabTokenize].getName, "vocab_tokenize")
  val bpeTokensInfo =
    new ExpressionInfo(classOf[BpeTokens].getName, "bpe_tokens")
  val planeSigsInfo =
    new ExpressionInfo(classOf[PlaneSignatures].getName, "plane_signatures")
  val signBitPackInfo =
    new ExpressionInfo(classOf[SignBitPack].getName, "sign_bit_pack")

  /** The one canonical registration table: both the imperative
    * `register(spark)` path and the `spark.sql.extensions` plugin walk
    * THIS list, so a new native function added here reaches both paths
    * by construction (and the plugin spec derives its probe-name set
    * from it — an entry without a probe fails the build loudly). */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("float_dot"), info,
      exprs => FloatDotProduct(exprs(0), exprs(1))),
    (FunctionIdentifier("sorted_intersect_size"), intersectInfo,
      exprs => SortedIntersectSize(exprs(0), exprs(1))),
    (FunctionIdentifier("sorted_jaccard"), jaccardInfo,
      exprs => SortedJaccard(exprs(0), exprs(1))),
    (FunctionIdentifier("band_match_before"), bandInfo,
      exprs => BandMatchBefore(exprs(0), exprs(1), exprs(2), exprs(3))),
    (FunctionIdentifier("packed_trigrams"), trigramInfo,
      exprs => PackedTrigrams(exprs(0))),
    (FunctionIdentifier("double_dot"), doubleDotInfo,
      exprs => DoubleDotProduct(exprs(0), exprs(1))),
    (FunctionIdentifier("murmur3_v2"), murmurV2Info,
      exprs => Murmur3V2(exprs(0))),
    (FunctionIdentifier("vocab_token_count"), vocabCountInfo,
      exprs => VocabTokenCount(exprs(0), exprs(1))),
    (FunctionIdentifier("ivf_tree_assign"), ivfTreeInfo,
      exprs => IvfTreeAssign(exprs(0), exprs(1), exprs(2), exprs(3))),
    (FunctionIdentifier("mip_assign"), mipAssignInfo,
      exprs => MipAssign(exprs(0), exprs(1))),
    (FunctionIdentifier("vocab_tokenize"), vocabTokenizeInfo,
      exprs => VocabTokenize(exprs(0), exprs(1))),
    (FunctionIdentifier("bpe_tokens"), bpeTokensInfo,
      exprs => BpeTokens(exprs(0), exprs(1))),
    (FunctionIdentifier("plane_signatures"), planeSigsInfo,
      exprs => PlaneSignatures(exprs(0), exprs(1))),
    (FunctionIdentifier("sign_bit_pack"), signBitPackInfo,
      exprs => SignBitPack(exprs(0))))

  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }

  /** SQL-callable after register: `float_dot(<colA>, <colB>)` — column
    * references by (possibly qualified) name, resolved by the analyzer. */
  def floatDot(spark: SparkSession, a: String, b: String): Column = {
    register(spark)
    expr(s"float_dot($a, $b)")
  }

  /** `sorted_intersect_size(<colA>, <colB>)` — see [[SortedIntersectSize]]
    * for the sorted/distinct input invariant. */
  def sortedIntersectSize(spark: SparkSession, a: String, b: String): Column = {
    register(spark)
    expr(s"sorted_intersect_size($a, $b)")
  }

  /** `band_match_before(<sigA>, <sigB>, width, upTo)` — the emit-once
    * LSH dedup predicate; see [[BandMatchBefore]]. */
  def bandMatchBefore(spark: SparkSession, a: String, b: String,
                      width: Int, upTo: String): Column = {
    register(spark)
    expr(s"band_match_before($a, $b, $width, $upTo)")
  }

  /** `packed_trigrams(<col>)` — sorted distinct code-point-triple longs;
    * see [[PackedTrigrams]] for the bijection argument. */
  def packedTrigrams(spark: SparkSession, c: String): Column = {
    register(spark)
    expr(s"packed_trigrams($c)")
  }
}

/** `SparkSessionExtensions` plugin: injects the engine's native functions
  * into every session built with
  * `--conf spark.sql.extensions=graft.expressions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registrations.foreach(ext.injectFunction)
}
