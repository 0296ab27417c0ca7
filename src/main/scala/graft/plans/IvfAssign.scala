package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: IVF probe-cell assignment — the
  * two-level (coarse → fine) quantizer descent as one tight codegen'd
  * loop per row.
  *
  * The first implementation composed Spark higher-order functions
  * (`transform`/`array_sort`/`flatten`/`slice` over centroid literals,
  * `pipeline/Similarity.scala` rounds 3-4). HOFs are CodegenFallback:
  * every candidate centroid costs an interpreted lambda dispatch plus a
  * struct allocation, and the sorts allocate and order full score
  * arrays per row. ScaleProbe measured the consequence at the 200k-vec
  * decade: assignment dominated the whole ANN query (flat 143 s,
  * hierarchical 18-41 s), and GROWING the cell count per the n^(2/3)
  * rule made queries SLOWER because the interpreted assignment scan
  * outweighed the search-pass savings. This expression is the
  * build-brief preference order applied to the whole descent: primitive
  * double arrays resolved once at analysis time, no per-row allocation
  * beyond the output, selection by bounded insertion instead of a full
  * sort.
  *
  * Semantics are EXACTLY the HOF composition's (pinned by the
  * SimilaritySpec parity + oracle tests): cosine rounded HALF_UP to 4
  * decimals, candidates ranked (cos desc, centroid id asc), coarse
  * groups ranked (cos desc, group index asc), output = best `nprobe`
  * fine cells among the best `coarseProbe` groups' members, best first.
  * The flat quantizer is the single-group special case.
  *
  * SQL shape: `ivf_assign(v, nrm, coarseVecs, groupVecs, groupIds,
  * nprobe, coarseProbe)` where the centroid arguments are foldable
  * literals — the registered builder collapses them into a [[Quantizer]]
  * at analysis time, so the expression tree the executor sees has only
  * the two row-dependent children.
  *
  * Scale bound of the embedded-quantizer design: the centroid matrix
  * ships with the task binary, which is the right call up to roughly
  * 10^5-10^6 centroids (tens-to-hundreds of MB at embedding dims —
  * broadcast-sized, scanned from L2/L3). `ivfCellCount`'s n^(2/3) rule
  * crosses that around 10^9 corpus vectors; past it the next rungs are
  * (a) a deeper quantizer tree (O(log k) assignment, k ≈ n/log n) with
  * the same embedded-matrix trick per level, then (b) distributing the
  * assignment itself as a join against a centroid *frame* (centroids
  * partitioned by coarse group; vectors routed to their coarse group
  * first) once no level fits in a task binary. The expression's
  * semantics (round-4 cosine, cos desc / cid asc) are the contract all
  * three rungs share. */
case class IvfAssign(left: Expression, right: Expression,
                     quantizer: IvfAssign.Quantizer) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ivf_assign requires (ARRAY<DOUBLE>, DOUBLE), got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ivf_assign"

  override protected def nullSafeEval(v: Any, nrm: Any): Any =
    IvfAssign.assign(v.asInstanceOf[ArrayData], nrm.asInstanceOf[Double], quantizer)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val q = ctx.addReferenceObj("quantizer", quantizer, classOf[IvfAssign.Quantizer].getName)
    defineCodeGen(ctx, ev, (v, n) => s"graft.plans.IvfAssign.assign($v, $n, $q)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IvfAssign =
    copy(left = newLeft, right = newRight)
}

object IvfAssign {

  /** Resolved centroid structure: primitive arrays, norms precomputed
    * with the same sequential fold the literal-based version used
    * (`math.sqrt(c.map(x*x).sum)`), so cosines are bit-identical.
    *
    * Optional THIRD level (`top` non-empty): `top` centers partition
    * the COARSE centers (`topGroups(i)` = coarse indices under top
    * center i), and the descent scores O(∛k) top centers, the best
    * `topProbe` groups' coarse members, then the fine members — the
    * deeper-tree rung the 2-level Scaladoc promises (assignment
    * O(k^(1/3)) per row, balance k = n^(3/4)). Empty `top` = the
    * 2-level descent, bit-identical to before the level existed.
    *
    * Equality is STRUCTURAL (deep array compare), not by reference:
    * case-class equality on Array fields would compare references, so
    * two `ivfTopK` calls with equal centroids would build non-equal
    * expressions, the canonicalized index plans would differ, and
    * `cacheOnce` would add a fresh CacheManager entry per invocation —
    * breaking the materialized-index memo (and leaking cache entries)
    * that repeated queries rely on. Pinned by SimilaritySpec. */
  case class Quantizer(coarse: Array[Array[Double]],
                       groupVecs: Array[Array[Array[Double]]],
                       groupIds: Array[Array[Int]],
                       nprobe: Int, coarseProbe: Int,
                       top: Array[Array[Double]] = Array.empty,
                       topGroups: Array[Array[Int]] = Array.empty,
                       topProbe: Int = 1) {
    val coarseNorms: Array[Double] = coarse.map(norm)
    val groupNorms: Array[Array[Double]] = groupVecs.map(_.map(norm))
    val topNorms: Array[Double] = top.map(norm)
    require(coarse.length == groupVecs.length && coarse.length > 0,
            s"quantizer needs one coarse center per group (${coarse.length} vs ${groupVecs.length})")
    require(nprobe >= 1 && coarseProbe >= 1 && topProbe >= 1,
            s"nprobe=$nprobe coarseProbe=$coarseProbe topProbe=$topProbe")
    require(top.length == topGroups.length,
            s"quantizer needs one top center per top group (${top.length} vs ${topGroups.length})")
    require(top.isEmpty || java.util.Arrays.equals(
              topGroups.iterator.flatMap(_.iterator).toArray.sorted,
              coarse.indices.toArray),
            "top groups must partition the coarse centers exactly")
    /** Uniform centroid dimensionality, enforced at construction so a
      * dim-mismatched input vector can be REJECTED per row rather than
      * silently truncated to a plausible-but-wrong cosine. */
    val dim: Int = coarse(0).length
    require(coarse.forall(_.length == dim) &&
            groupVecs.forall(_.forall(_.length == dim)) &&
            top.forall(_.length == dim),
            s"quantizer centroids must share one dimensionality (expected $dim)")

    private def deep(a: Array[_]): Array[AnyRef] = a.asInstanceOf[Array[AnyRef]]
    override def equals(o: Any): Boolean = o match {
      case q: Quantizer =>
        nprobe == q.nprobe && coarseProbe == q.coarseProbe && topProbe == q.topProbe &&
        java.util.Arrays.deepEquals(deep(coarse), deep(q.coarse)) &&
        java.util.Arrays.deepEquals(deep(groupVecs), deep(q.groupVecs)) &&
        java.util.Arrays.deepEquals(deep(groupIds), deep(q.groupIds)) &&
        java.util.Arrays.deepEquals(deep(top), deep(q.top)) &&
        java.util.Arrays.deepEquals(deep(topGroups), deep(q.topGroups))
      case _ => false
    }
    override def hashCode: Int =
      java.util.Objects.hash(Int.box(nprobe), Int.box(coarseProbe), Int.box(topProbe),
        Int.box(java.util.Arrays.deepHashCode(deep(coarse))),
        Int.box(java.util.Arrays.deepHashCode(deep(groupVecs))),
        Int.box(java.util.Arrays.deepHashCode(deep(groupIds))),
        Int.box(java.util.Arrays.deepHashCode(deep(top))),
        Int.box(java.util.Arrays.deepHashCode(deep(topGroups))))
  }

  private def norm(c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  /** Mirror of Spark's `round(x, 4)` on doubles (HALF_UP via BigDecimal,
    * NaN/Inf passed through) — the oracle-visible rounding. */
  private def round4(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  private def dot(v: ArrayData, c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) { s += v.getDouble(i) * c(i); i += 1 }
    s
  }

  /** Bounded best-k insertion by (score desc, id asc) — `Double.compare`
    * ranks NaN above every value, matching Spark's double ordering in
    * the `array_sort`-based composition. Returns the fill count. */
  private def insert(scores: Array[Double], ids: Array[Int], filled: Int,
                     s: Double, id: Int): Int = {
    val k = scores.length
    var pos = filled
    while (pos > 0 && {
             val c = java.lang.Double.compare(s, scores(pos - 1))
             c > 0 || (c == 0 && id < ids(pos - 1))
           }) pos -= 1
    if (pos >= k) return filled
    val last = math.min(filled, k - 1)
    var i = last
    while (i > pos) { scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1 }
    scores(pos) = s; ids(pos) = id
    math.min(filled + 1, k)
  }

  /** Static helper invoked from generated code. A vector whose length
    * differs from the quantizer's dimensionality fails loudly: a
    * truncated dot product would rank cells by a plausible-but-wrong
    * cosine, which no test or oracle could distinguish from a real
    * score — a data-contract violation should stop the job, not skew
    * its output. */
  def assign(v: ArrayData, nrm: Double, q: Quantizer): ArrayData = {
    if (v.numElements() != q.dim)
      throw new IllegalArgumentException(
        s"ivf_assign: input vector has ${v.numElements()} dims, quantizer expects ${q.dim}")
    // optional top pass (3-level tree): best `topProbe` of the ∛k top
    // centers select which coarse centers the next pass scores at all
    val nG = math.min(q.coarseProbe, q.coarse.length)
    val gScores = new Array[Double](nG)
    val gIdx = new Array[Int](nG)
    var filled = 0
    if (q.top.nonEmpty) {
      val nT = math.min(q.topProbe, q.top.length)
      val tScores = new Array[Double](nT)
      val tIdx = new Array[Int](nT)
      var tFilled = 0
      var t = 0
      while (t < q.top.length) {
        tFilled = insert(tScores, tIdx, tFilled,
                         round4(dot(v, q.top(t)) / (nrm * q.topNorms(t))), t)
        t += 1
      }
      // coarse pass restricted to the selected top groups' members;
      // ranking still by (score desc, GLOBAL coarse index asc), so with
      // every top group probed this is exactly the unrestricted pass
      var ti = 0
      while (ti < tFilled) {
        val members = q.topGroups(tIdx(ti))
        var m = 0
        while (m < members.length) {
          val g = members(m)
          filled = insert(gScores, gIdx, filled,
                          round4(dot(v, q.coarse(g)) / (nrm * q.coarseNorms(g))), g)
          m += 1
        }
        ti += 1
      }
    } else {
      // coarse pass: best `coarseProbe` groups of the √k coarse centers
      var g = 0
      while (g < q.coarse.length) {
        filled = insert(gScores, gIdx, filled,
                        round4(dot(v, q.coarse(g)) / (nrm * q.coarseNorms(g))), g)
        g += 1
      }
    }
    // fine pass: best `nprobe` cells among the selected groups' members
    val cScores = new Array[Double](q.nprobe)
    val cIds = new Array[Int](q.nprobe)
    var cFilled = 0
    var gi = 0
    while (gi < filled) {
      val grp = gIdx(gi)
      val vecs = q.groupVecs(grp)
      val norms = q.groupNorms(grp)
      val ids = q.groupIds(grp)
      var i = 0
      while (i < vecs.length) {
        cFilled = insert(cScores, cIds, cFilled,
                         round4(dot(v, vecs(i)) / (nrm * norms(i))), ids(i))
        i += 1
      }
      gi += 1
    }
    val out = new Array[Long](cFilled)
    var i = 0
    while (i < cFilled) { out(i) = cIds(i).toLong; i += 1 }
    new GenericArrayData(out)
  }

  /** Analysis-time builder for the registered `ivf_assign` function:
    * evaluates the foldable centroid literals once and folds them into
    * the [[Quantizer]], leaving (v, nrm) as the only children. */
  def fromArgs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 7 || exprs.length == 10,
      "ivf_assign expects (v, nrm, coarse, groups, groupIds, nprobe, coarseProbe" +
      s"[, top, topGroups, topProbe]), got ${exprs.length} args")
    def lit(e: Expression, what: String): Any = {
      require(e.foldable, s"ivf_assign: $what must be a literal")
      e.eval()
    }
    def to2D(a: Any): Array[Array[Double]] = {
      val ad = a.asInstanceOf[ArrayData]
      Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
    }
    val coarse = to2D(lit(exprs(2), "coarse centers"))
    val groupsAd = lit(exprs(3), "group vectors").asInstanceOf[ArrayData]
    val groups = Array.tabulate(groupsAd.numElements())(i => to2D(groupsAd.getArray(i)))
    val idsAd = lit(exprs(4), "group ids").asInstanceOf[ArrayData]
    val ids = Array.tabulate(idsAd.numElements())(i => idsAd.getArray(i).toIntArray())
    val nprobe = lit(exprs(5), "nprobe").asInstanceOf[Int]
    val coarseProbe = lit(exprs(6), "coarseProbe").asInstanceOf[Int]
    val q =
      if (exprs.length == 7) Quantizer(coarse, groups, ids, nprobe, coarseProbe)
      else {
        val top = to2D(lit(exprs(7), "top centers"))
        val tgAd = lit(exprs(8), "top groups").asInstanceOf[ArrayData]
        val tg = Array.tabulate(tgAd.numElements())(i => tgAd.getArray(i).toIntArray())
        val topProbe = lit(exprs(9), "topProbe").asInstanceOf[Int]
        Quantizer(coarse, groups, ids, nprobe, coarseProbe, top, tg, topProbe)
      }
    IvfAssign(exprs(0), exprs(1), q)
  }
}
