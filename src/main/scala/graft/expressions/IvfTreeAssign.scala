package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Two-level (coarse-quantizer tree) IVF cell assignment:
  * `ivf_tree_assign(vec, centroids, top_of, nprobe)` maps a float
  * vector to its k-means cell by scoring the ~√nlist GROUP means
  * first, then only the `nprobe` best groups' member centroids —
  * O(nprobe·√nlist) distance computations per vector instead of the
  * flat assign's O(nlist).
  *
  * This is the mitigation for semanticDedup's residual asymptote
  * (VERDICT r10 #5): under the constant-cell-size scaling path nlist ∝
  * N, so the flat one-pass assignment is O(N·nlist) = O(N²); the tree
  * cuts it to O(N·√nlist) = O(N^1.5). The price is the standard IVF
  * approximation: a vector lands on the nearest member of its nearest
  * GROUP, which can differ from the global nearest centroid near group
  * boundaries — recall under the tree is re-measured and pinned in
  * CapabilitySpec, and the declared q66 keeps the exact assign.
  * `nprobe` is the balance/accuracy dial: nprobe = 1 (pure tree)
  * measured a 2.5× within-cell pair-mass blowup at the 100× smoke
  * scale (boundary vectors of a whole group funnel into a few member
  * cells — a 12.6k-vector hot cell vs the flat assign's 1.0k max), so
  * the default callers use nprobe ≥ 2, which restores near-flat cell
  * balance while keeping the assign sublinear in nlist.
  *
  * `centroids` (array<array<double>>, index = cell id) and `top_of`
  * (array<int>, cell id → group id) must be FOLDABLE literals from the
  * driver-side fitted model (see
  * [[graft.operators.Approx.semanticDedupPairs]]); the prepared
  * tree — group means derived as the member-centroid means, member
  * index lists — is built once on the driver and ships through the
  * generated code's reference array, the [[VocabTokenCount]] pattern.
  */
case class IvfTreeAssign(vec: Expression, cents: Expression, topOf: Expression,
                         nprobe: Expression)
  extends QuaternaryExpression {

  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = topOf
  override def fourth: Expression = nprobe

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val centsOk = cents.foldable && (cents.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    })
    val topOk = topOf.foldable && (topOf.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })
    val nprobeOk = nprobe.foldable && nprobe.dataType == IntegerType
    if (vecOk && centsOk && topOk && nprobeOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "ivf_tree_assign expects (array<float> vec, foldable array<array<double>> " +
        s"centroids, foldable array<int> top_of, foldable int nprobe); got " +
        s"(${vec.dataType.sql}, ${cents.dataType.sql}, ${topOf.dataType.sql}, " +
        s"${nprobe.dataType.sql})")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_tree_assign"

  @transient private lazy val tree: IvfTreeModel = {
    val ca = cents.eval(null).asInstanceOf[ArrayData]
    val centroids = (0 until ca.numElements()).map { i =>
      ca.getArray(i).toDoubleArray()
    }.toArray
    val ta = topOf.eval(null).asInstanceOf[ArrayData].toIntArray()
    val np = nprobe.eval(null).asInstanceOf[Int]
    new IvfTreeModel(centroids, ta, np)
  }

  override protected def nullSafeEval(v: Any, c: Any, t: Any, n: Any): Any =
    tree.assign(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val treeRef = ctx.addReferenceObj("ivfTree", tree, classOf[IvfTreeModel].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _, _) =>
      s"${ev.value} = $treeRef.assign($v);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(vec = newFirst, cents = newSecond, topOf = newThird, nprobe = newFourth)
}

/** The prepared two-level quantizer behind [[IvfTreeAssign]]: per-group
  * member index lists plus group means (the mean of the member
  * centroids — derived here so the expression's literal payload stays
  * (centroids, top_of) only). Squared-L2 scoring, first-minimum
  * tie-break at both levels (the Spark ML `findClosest` convention).
  * Groups no cell references are dropped at build. */
final class IvfTreeModel(cents: Array[Array[Double]], topOf: Array[Int],
                         nprobe: Int)
  extends Serializable {
  require(cents.nonEmpty, "ivf_tree_assign: empty centroid set")
  require(topOf.length == cents.length,
    s"ivf_tree_assign: top_of has ${topOf.length} entries for ${cents.length} cells")
  require(nprobe >= 1, "ivf_tree_assign: nprobe must be >= 1")

  private val groupIds: Array[Int] = topOf.distinct.sorted
  private val members: Array[Array[Int]] = groupIds.map(g =>
    topOf.indices.filter(topOf(_) == g).toArray)
  private val groupMeans: Array[Array[Double]] = members.map { ms =>
    val dim = cents(ms(0)).length
    val m = new Array[Double](dim)
    ms.foreach { c =>
      val v = cents(c)
      var i = 0
      while (i < dim) { m(i) += v(i); i += 1 }
    }
    var i = 0
    while (i < dim) { m(i) /= ms.length; i += 1 }
    m
  }

  private val dim = cents(0).length

  private def d2(v: ArrayData, c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < dim) {
      val d = v.getFloat(i).toDouble - c(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Cell id for `v`: the `nprobe` nearest group means, then the
    * nearest member centroid among those groups' members. Called from
    * generated code. Top-n selection is a tiny insertion pass (nprobe
    * ≤ 4 in practice); an exact distance tie across probed groups
    * breaks to the LOWER CELL ID (globally, regardless of which probe
    * found it) — fully deterministic. A vector whose length differs
    * from the centroid dimension fails loudly, matching the flat
    * `model.transform` path (a truncated comparison would assign a
    * corrupted row a plausible wrong cell silently). */
  def assign(v: ArrayData): Int = {
    require(v.numElements() == dim,
      s"ivf_tree_assign: vector of length ${v.numElements()} vs " +
        s"$dim-dimensional centroids")
    val np = math.min(nprobe, groupMeans.length)
    val topG = new Array[Int](np)
    val topD = Array.fill(np)(Double.MaxValue)
    var g = 0
    while (g < groupMeans.length) {
      val d = d2(v, groupMeans(g))
      if (d < topD(np - 1)) {
        var j = np - 1
        while (j > 0 && topD(j - 1) > d) {
          topD(j) = topD(j - 1); topG(j) = topG(j - 1); j -= 1
        }
        topD(j) = d; topG(j) = g
      }
      g += 1
    }
    var bc = -1
    var bcd = Double.MaxValue
    var p = 0
    while (p < np) {
      val ms = members(topG(p))
      var i = 0
      while (i < ms.length) {
        val d = d2(v, cents(ms(i)))
        if (d < bcd || (d == bcd && ms(i) < bc)) { bcd = d; bc = ms(i) }
        i += 1
      }
      p += 1
    }
    bc
  }
}

object IvfTreeAssign {
  /** Driver-side grouping of the fitted centroids into ~√nlist groups:
    * seeded Lloyd over the CENTROIDS (nlist points — trivially
    * driver-sized at any corpus scale, since nlist ∝ cells, not rows).
    * Deterministic: stride-sampled initial means, fixed 15 iterations,
    * first-minimum tie-break. Returns cell → group id. */
  def groupCentroids(cents: Array[Array[Double]], k: Int): Array[Int] = {
    require(k >= 1 && cents.nonEmpty)
    val kk = math.min(k, cents.length)
    val dim = cents(0).length
    var means = Array.tabulate(kk)(i => cents((i.toLong * cents.length / kk).toInt).clone())
    val assign = new Array[Int](cents.length)
    var iter = 0
    while (iter < 15) {
      var c = 0
      while (c < cents.length) {
        var best = 0
        var bd = Double.MaxValue
        var g = 0
        while (g < kk) {
          var d = 0.0
          var i = 0
          while (i < dim) {
            val x = cents(c)(i) - means(g)(i)
            d += x * x
            i += 1
          }
          if (d < bd) { bd = d; best = g }
          g += 1
        }
        assign(c) = best
        c += 1
      }
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      var c2 = 0
      while (c2 < cents.length) {
        val g = assign(c2)
        counts(g) += 1
        var i = 0
        while (i < dim) { sums(g)(i) += cents(c2)(i); i += 1 }
        c2 += 1
      }
      means = Array.tabulate(kk) { g =>
        if (counts(g) == 0) means(g)
        else { val m = sums(g); var i = 0; while (i < dim) { m(i) /= counts(g); i += 1 }; m }
      }
      iter += 1
    }
    assign
  }
}
