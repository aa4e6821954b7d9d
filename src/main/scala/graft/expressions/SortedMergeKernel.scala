package graft.expressions

import org.apache.spark.sql.catalyst.util.ArrayData

/** The shared two-pointer sorted-merge behind [[SortedIntersectSize]]
  * and [[SortedJaccard]] — ONE implementation serving both expressions'
  * interpreted eval AND their generated code.
  *
  * Why the generated code CALLS this instead of inlining the loop
  * (round-17 continuation, found by measurement): the merge loop sits
  * inside whatever whole-stage-codegen method contains the join
  * condition it was pushed into, and on q43's fused
  * band-join + sets-join + acceptance stage that method crosses
  * HotSpot's 8000-byte DontCompileHugeMethods limit — the stage then
  * runs in the bytecode interpreter, re-scoring millions of candidate
  * pairs at interpreter speed (measured: 33.5 CPU-s for the fused
  * stage vs 23.2 with the JIT limit lifted; q59's smaller fused method
  * stayed under the limit, which is why only q43 showed the cliff).
  * An out-of-line call keeps every fused method small regardless of
  * how many operators Catalyst fuses around it, and this kernel — a
  * few hundred bytecode bytes, invoked per candidate pair — is always
  * JIT-hot and inlinable BACK into the compiled caller.
  *
  * Loop semantics are exactly the former inline form's (null elements
  * skipped, binary UTF8String / primitive long compares, count in a
  * long): bit-identical values by construction, pinned by the existing
  * sorted_jaccard ≡ composed-form generated-property test.
  */
final class SortedMergeKernel(longElems: Boolean) extends Serializable {

  /** |A ∩ B| over sorted, distinct arrays; null elements never match. */
  def intersect(x: ArrayData, y: ArrayData): Long = {
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
    cnt
  }

  /** Exact Jaccard: one merge, then the same IEEE division of the same
    * two longs the composed `i / (na + nb − i)` form performs. */
  def jaccard(x: ArrayData, y: ArrayData): Double = {
    val cnt = intersect(x, y)
    cnt.toDouble / (x.numElements().toLong + y.numElements().toLong - cnt).toDouble
  }
}
