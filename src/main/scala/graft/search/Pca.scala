package graft.search

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PCA over an `array<float>` embedding column, and the OPQ-style rotation
  * it yields for the PQ tier.
  *
  * Distributed shape (the classic one, cf. Spark MLlib RowMatrix
  * computeCovariance): ONE pass over the vectors accumulates per-partition
  * moments (n, Σx, ΣxxᵀT as a packed upper triangle) — a few KB per
  * partition regardless of row count — which the driver combines in
  * partition order (deterministic) and eigendecomposes locally with cyclic
  * Jacobi. d×d eigenwork for d ≤ a few hundred is microseconds; the data
  * never moves. The projection back over the corpus is the codegen'd
  * [[graft.functions.VectorFunctions.pcaProject]] — row-local, shuffle-free,
  * so it fuses into whatever scan consumes it.
  *
  * Two consumers with different centering:
  *  - dimensionality REDUCTION (`project`): y = V_r·(x − μ) — the variance
  *    statement only holds centered;
  *  - the PQ ROTATION (`rotationForPq`): y = R·x with NO centering, because
  *    the repo's search tiers rank by inner product and ⟨Rx, Rq⟩ = ⟨x, q⟩
  *    exactly (R orthonormal) while centering would add a per-vector bias
  *    ⟨x, μ⟩ that reorders IP ranking. R is the PCA basis with rows
  *    permuted by OPQ eigenvalue allocation (Ge et al., CVPR 2013, the
  *    parametric variant): components are dealt to the m subspaces so the
  *    per-subspace variance products balance, instead of the raw layout
  *    where adjacent correlated dims concentrate energy in few subspaces
  *    and starve the rest of their code budget.
  */
final case class PcaModel(mean: Array[Float], basis: Array[Array[Float]],
                          eigs: Array[Double]) {
  val d: Int = mean.length

  /** Top-r projection of the centered vectors (dimensionality reduction). */
  def project(emb: DataFrame, r: Int): DataFrame = {
    require(r >= 1 && r <= d, s"pca: r $r outside [1,$d]")
    emb.select(col("vec_id"),
      pcaProject(col("embedding"), mean, basis.take(r)).as("embedding"),
      col("label"))
  }

  /** Per-component explained variance — the scree table. */
  def explained(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val total = eigs.sum
    val rows = eigs.zipWithIndex.scanLeft((0, 0.0, 0.0)) {
      case ((_, _, cum), (ev, i)) => (i, ev, cum + ev)
    }.drop(1).map { case (i, ev, cum) =>
      (i, math.rint(ev * 1e6) / 1e6,
        math.rint(ev / total * 1e6) / 1e6, math.rint(cum / total * 1e6) / 1e6)
    }
    rows.toSeq.toDF("component", "eigenvalue", "var_ratio", "cum_ratio")
  }

  /** OPQ eigenvalue allocation: deal components (desc eigenvalue) to the
    * subspace with the smallest log-product of assigned eigenvalues that
    * still has room — returns the component order whose m consecutive
    * dsub-blocks are the balanced subspaces. Deterministic (stable
    * min-by-index tie-break). */
  def opqOrder(m: Int): Array[Int] = {
    require(d % m == 0, s"pca: d $d not divisible by m=$m")
    val dsub = d / m
    val buckets = Array.fill(m)(List.empty[Int])
    val logSum = new Array[Double](m)
    for (c <- eigs.indices) {
      var best = -1
      for (b <- 0 until m)
        if (buckets(b).length < dsub && (best < 0 || logSum(b) < logSum(best)))
          best = b
      buckets(best) = c :: buckets(best)
      // floor far below any real eigenvalue keeps zero/negative-rounded
      // eigenvalues from collapsing the log-product
      logSum(best) += math.log(math.max(eigs(c), 1e-12))
    }
    buckets.flatMap(_.reverse)
  }

  /** The IP-preserving OPQ rotation matrix: permuted basis, no centering. */
  def rotationForPq(m: Int): Array[Array[Float]] = opqOrder(m).map(basis)

  /** Rotate a corpus for the PQ tier (full-d, no centering). */
  def rotateForPq(emb: DataFrame, m: Int): DataFrame =
    emb.select(col("vec_id"),
      pcaProject(col("embedding"), new Array[Float](d),
        rotationForPq(m)).as("embedding"),
      col("label"))

  /** Rotate one query vector the same way (driver math). */
  def rotateQuery(q: Array[Float], m: Int): Array[Float] =
    rotationForPq(m).map { row =>
      var acc = 0.0; var i = 0
      while (i < d) { acc += q(i).toDouble * row(i); i += 1 }
      acc.toFloat
    }
}

object Pca {

  /** Additive sufficient statistics for PCA — (n, Σx, packed-upper-tri
    * Σxxᵀ). Moments ADD, so incremental maintenance is exact: absorbing a
    * batch then building equals building on the union (up to summation
    * order ulps) — the ivf/pq `append` symmetry for the rotation tier,
    * and the streaming shape (a foreachBatch absorb is one bounded
    * aggregate per micro-batch; state is d(d+3)/2 doubles forever). */
  final case class PcaState(n: Long, sum: Array[Double], gram: Array[Double]) {
    def d: Int = sum.length

    /** Absorb another corpus' moments (one pass over it, KBs collected). */
    def absorb(emb: DataFrame): PcaState = {
      val o = moments(emb)
      require(o.d == d, s"pca: dimension ${o.d} != $d")
      val s2 = sum.clone(); val g2 = gram.clone()
      var i = 0
      while (i < d) { s2(i) += o.sum(i); i += 1 }
      i = 0
      while (i < gram.length) { g2(i) += o.gram(i); i += 1 }
      PcaState(n + o.n, s2, g2)
    }

    /** Eigendecompose the accumulated moments into a model. */
    def toModel: PcaModel = Pca.fromMoments(this)
  }

  /** ONE pass over the vectors: per-partition packed moments (a few KB
    * per partition regardless of rows), combined in partition order. */
  def moments(emb: DataFrame): PcaState = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col("embedding")).as[Array[Float]]
    val parts = vecs.rdd.mapPartitionsWithIndex { (pi, it) =>
      var n = 0L
      var sum: Array[Double] = null
      var gram: Array[Double] = null
      while (it.hasNext) {
        val v = it.next()
        if (sum == null) {
          sum = new Array[Double](v.length)
          gram = new Array[Double](v.length * (v.length + 1) / 2)
        }
        var i = 0
        var t = 0
        while (i < v.length) {
          val vi = v(i).toDouble
          sum(i) += vi
          var j = i
          while (j < v.length) { gram(t) += vi * v(j); j += 1; t += 1 }
          i += 1
        }
        n += 1
      }
      if (n == 0) Iterator.empty else Iterator.single((pi, n, sum, gram))
    }.collect().sortBy(_._1)
    require(parts.nonEmpty, "pca: empty corpus")
    val d = parts.head._3.length
    val sum = new Array[Double](d)
    val gram = new Array[Double](d * (d + 1) / 2)
    var n = 0L
    parts.foreach { case (_, pn, ps, pg) =>
      n += pn
      var i = 0
      while (i < d) { sum(i) += ps(i); i += 1 }
      i = 0
      while (i < gram.length) { gram(i) += pg(i); i += 1 }
    }
    PcaState(n, sum, gram)
  }

  /** One pass for the moments, driver Jacobi for the eigenpairs. */
  def build(emb: DataFrame): PcaModel = fromMoments(moments(emb))

  private[search] def fromMoments(st: PcaState): PcaModel = {
    val d = st.d
    val n = st.n
    val sum = st.sum
    val gram = st.gram
    val mean = sum.map(x => (x / n).toFloat)
    // population covariance C = G/n − μμᵀ, unpacked to full symmetric
    val cov = Array.ofDim[Double](d, d)
    var t = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = gram(t) / n - (sum(i) / n) * (sum(j) / n)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val (eigs, vects) = jacobiEigen(cov)
    // desc eigenvalue order; deterministic sign (largest-|coord| positive)
    val order = eigs.indices.sortBy(k => (-eigs(k), k))
    val basis = order.map { k =>
      val v = vects.map(_(k))
      val mi = v.indices.maxBy(idx => (math.abs(v(idx)), -idx))
      val sgn = if (v(mi) < 0) -1.0 else 1.0
      v.map(x => (x * sgn).toFloat)
    }.toArray
    PcaModel(mean, basis, order.map(k => math.max(eigs(k), 0.0)).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — returns
    * (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS).
    * Textbook kernel (Golub & Van Loan §8.5); deterministic sweep order,
    * converges quadratically — d ≤ a few hundred finishes in ms. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val eps = 1e-11 * math.max(1.0, a0.indices.map(i => math.abs(a0(i)(i))).sum)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > eps) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          off += math.abs(a(p)(q))
          if (math.abs(a(p)(q)) > eps / (d * d)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val tSgn = if (theta >= 0) 1.0 else -1.0
            val tTan = tSgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tTan * tTan + 1.0)
            val s = tTan * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
