package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: intersection cardinality of two SORTED
  * string arrays via a two-pointer merge — the hot loop of exact
  * set-similarity (Jaccard) joins (q35).
  *
  * `size(array_intersect(a, b))` builds a hash set and materializes the
  * intersection array per pair — per-element string hashing plus an
  * allocation on every probe of an O(n·m) candidate loop. When both
  * inputs are sorted and duplicate-free (`sort_array(array_distinct(…))`,
  * computed once per document, not per pair), the cardinality needs only
  * a linear merge of binary `UTF8String` comparisons with zero
  * allocation; `sort_array`'s string ordering is the same binary
  * comparison, so the merge sees a consistent order.
  *
  * Inputs MUST be sorted ascending and distinct; duplicates or unsorted
  * input silently undercount (callers own the invariant — both q35 and
  * the Approx near-dup operators canonicalize token arrays on creation).
  *
  * Null ELEMENTS are skipped: they never match anything (SQL null
  * semantics — `null = null` is not true) and `sort_array` places them
  * first, so the merge advances past a null on either side. This makes
  * the function total over parquet-sourced arrays (containsNull=true)
  * instead of NPE-ing on `getUTF8String(null slot)`.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    // Element-type match only: containsNull varies by producer (split()
    // yields containsNull=false, parquet reads containsNull=true); null
    // elements are skipped by the merge (see class doc). array<bigint>
    // inputs (e.g. [[PackedTrigrams]] output) take a primitive-compare
    // merge — same algorithm, no per-element UTF8String wrapper.
    def elem(e: Expression): Option[DataType] = e.dataType match {
      case ArrayType(t @ (StringType | LongType), _) => Some(t)
      case _ => None
    }
    (elem(left), elem(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_size expects two array<string> or two array<bigint> args, got (" +
          s"${left.dataType.sql}, ${right.dataType.sql})")
    }
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_size"

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
    kernel.intersect(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedMergeKernel", kernel,
      classOf[SortedMergeKernel].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $ref.intersect($x, $y);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
