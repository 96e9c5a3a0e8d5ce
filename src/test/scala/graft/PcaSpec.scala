package graft

import graft.search._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PCA / OPQ-rotation contracts: the Jacobi kernel's eigen residual, basis
  * orthonormality, variance conservation (Σλ = trace C), descending
  * eigenvalue order, inner-product preservation under the OPQ rotation
  * (the property that makes rotated-space search exact), eigenvalue
  * allocation validity, and the rotated-PQ recall floor vs raw PQ.
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, sf)
  private val q0 = QueryVectors.qvec(0)
  private lazy val model = Pca.build(emb)
  private val d = 64

  test("jacobi solves a known symmetric system: A·v = λ·v, VᵀV = I") {
    val rng = new scala.util.Random(7)
    val n = 12
    val m = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i until n) {
      val x = rng.nextDouble() * 2 - 1
      m(i)(j) = x; m(j)(i) = x
    }
    val (eigs, v) = Pca.jacobiEigen(m)
    // residual ‖A·vk − λk·vk‖ per eigenpair
    for (k <- 0 until n) {
      val av = Array.tabulate(n)(i => (0 until n).map(j => m(i)(j) * v(j)(k)).sum)
      val res = math.sqrt((0 until n).map(i => math.pow(av(i) - eigs(k) * v(i)(k), 2)).sum)
      assert(res < 1e-8, s"eigenpair $k residual $res")
    }
    // orthonormal columns
    for (a <- 0 until n; b <- a until n) {
      val dot = (0 until n).map(i => v(i)(a) * v(i)(b)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"VᵀV[$a][$b] = $dot")
    }
  }

  test("basis is orthonormal and eigenvalues are descending, non-negative") {
    assert(model.d == d)
    assert(model.basis.length == d)
    for (a <- model.basis.indices; b <- a until d) {
      val dot = (0 until d).map(i => model.basis(a)(i).toDouble * model.basis(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-5, s"basis[$a]·basis[$b] = $dot")
    }
    assert(model.eigs.forall(_ >= 0.0))
    assert(model.eigs.zip(model.eigs.tail).forall { case (a, b) => a >= b - 1e-12 })
  }

  test("variance is conserved: Σλ equals the trace of the covariance") {
    val vecs = emb.select(col("embedding")).as[Array[Float]].collect()
    val n = vecs.length
    val mean = Array.tabulate(d)(i => vecs.map(_(i).toDouble).sum / n)
    val trace = (0 until d).map(i =>
      vecs.map(v => math.pow(v(i) - mean(i), 2)).sum / n).sum
    val sumEig = model.eigs.sum
    assert(math.abs(sumEig - trace) / trace < 1e-6,
      s"Σλ $sumEig vs trace $trace")
  }

  test("scree table: ratios in [0,1], cumulative monotone to 1") {
    val rows = model.explained(spark).orderBy("component")
      .select("var_ratio", "cum_ratio").as[(Double, Double)].collect()
    assert(rows.length == d)
    assert(rows.forall { case (v, c) => v >= 0 && v <= 1 && c >= 0 && c <= 1.0 + 1e-9 })
    assert(rows.zip(rows.tail).forall { case ((_, c1), (_, c2)) => c2 >= c1 - 1e-12 })
    assert(math.abs(rows.last._2 - 1.0) < 2e-6)
  }

  test("OPQ rotation preserves inner products (so exact ranks are unchanged)") {
    val m = Pq.pickM(d)
    val rot = model.rotationForPq(m)
    val qr = model.rotateQuery(q0, m)
    val pairs = emb.limit(20).select(col("embedding")).as[Array[Float]].collect()
    pairs.foreach { x =>
      val xr = rot.map { row =>
        (0 until d).map(i => x(i).toDouble * row(i)).sum.toFloat
      }
      val raw = (0 until d).map(i => x(i).toDouble * q0(i)).sum
      val rotated = (0 until d).map(i => xr(i).toDouble * qr(i)).sum
      assert(math.abs(raw - rotated) < 1e-3, s"IP drift: $raw vs $rotated")
    }
  }

  test("eigenvalue allocation is a permutation with balanced subspaces") {
    val m = Pq.pickM(d)
    val order = model.opqOrder(m)
    assert(order.sorted.sameElements(0 until d))
    // each dsub-block's log-variance sum within the spread of one component
    // of the identity layout's worst imbalance
    val dsub = d / m
    val logs = order.grouped(dsub)
      .map(_.map(c => math.log(math.max(model.eigs(c), 1e-12))).sum).toArray
    val idLogs = (0 until d).grouped(dsub)
      .map(_.map(c => math.log(math.max(model.eigs(c), 1e-12))).sum).toArray
    assert(logs.max - logs.min <= idLogs.max - idLogs.min + 1e-9,
      s"allocation spread ${logs.max - logs.min} worse than identity ${idLogs.max - idLogs.min}")
  }

  test("incremental moments: absorb(batch) then build == build on the union (ulp tolerance)") {
    val a = emb.where(pmod(col("vec_id"), lit(2)) === 0)
    val b = emb.where(pmod(col("vec_id"), lit(2)) === 1)
    val inc = Pca.moments(a).absorb(b).toModel
    val full = Pca.build(emb)
    assert(inc.d == full.d)
    // moments are additive; only double summation ORDER differs, so the
    // eigensystem agrees far inside any meaningful tolerance
    inc.mean.zip(full.mean).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-6, s"mean drift $x vs $y") }
    // eigenvalues are perturbation-stable (Weyl); eigenVECTORS under
    // near-degenerate eigenvalues are not, so the basis is compared via
    // the rounded scree table, not elementwise
    inc.eigs.zip(full.eigs).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)), s"eig drift $x vs $y") }
    val a6 = inc.explained(spark).orderBy("component").collect().map(_.toSeq)
    val b6 = full.explained(spark).orderBy("component").collect().map(_.toSeq)
    assert(a6.sameElements(b6), "scree tables differ at 6 dp")
  }

  test("deterministic: two builds agree exactly") {
    val again = Pca.build(emb)
    assert(again.mean.sameElements(model.mean))
    assert(again.eigs.sameElements(model.eigs))
    assert(again.basis.zip(model.basis).forall { case (a, b) => a.sameElements(b) })
  }

  test("rotated-PQ (OPQ) search with refine hits the recall floor; no-refine recall >= raw PQ - eps") {
    val m = Pq.pickM(d)
    val rotated = model.rotateForPq(emb, m)
    val opq = Pq.build(rotated, m = m)
    val raw = Pq.build(emb, m = m)
    val qr = model.rotateQuery(q0, m)
    val k = 10
    val exact = VectorSearch.topK(emb, q0, k)
      .select(lit(0L).as("qid"), col("vec_id"))
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      VectorSearch.recallAtK(df.select(lit(0L).as("qid"), col("vec_id")), exact, k)
        .select("recall").as[Double].first()
    val rOpq = recall(opq.search(qr, k, shortlist = 100))
    val rOpqNoRefine = recall(opq.searchNoRefine(qr, k))
    val rRawNoRefine = recall(raw.searchNoRefine(q0, k))
    info(s"recall@10 — opq+refine $rOpq, opq-adc $rOpqNoRefine, raw-adc $rRawNoRefine")
    assert(rOpq >= 0.8, s"opq+refine recall $rOpq below floor")
    // the balanced quantizer should never be materially WORSE than raw
    assert(rOpqNoRefine >= rRawNoRefine - 0.21,
      s"opq adc recall $rOpqNoRefine far below raw $rRawNoRefine")
  }
}
