package graft

import graft.dedup.SemDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for dedup_semantic (SURVEY §2 #157): planted-geometry
  * exactness, the SemDeDup keep rule (least-centroid-similar member
  * survives), singleton safety, and determinism.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def unit(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  /** Planted corpus in 8-d: four well-separated anchor directions; the
    * first two anchors carry near-duplicate groups (copies with a tiny
    * rotation toward a fixed off-axis direction), the rest are
    * singletons. */
  private def planted(): Seq[(Long, Array[Float])] = {
    def axis(i: Int): Array[Float] = {
      val a = Array.fill(8)(0f); a(i) = 1f; a
    }
    def jitter(base: Array[Float], j: Int, eps: Float): Array[Float] =
      unit(base.zipWithIndex.map { case (x, idx) =>
        if (idx == 7) x + eps * (j + 1) else x })
    val g0 = (0 until 3).map(j => (j.toLong, jitter(axis(0), j, 0.02f)))
    val g1 = (0 until 2).map(j => (10L + j, jitter(axis(1), j, 0.02f)))
    val singles = Seq(20L -> axis(2), 21L -> axis(3))
    g0 ++ g1 ++ singles.map { case (id, v) => (id, unit(v)) }
  }

  private def df(rows: Seq[(Long, Array[Float])]) =
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

  test("planted groups each keep exactly one; singletons survive") {
    val out = SemDedup.semanticDedup(df(planted()), tau = 0.99, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    val byGroup = out.groupBy(_._2)
    // group of ids {0,1,2} and {10,11} resolve to min-id labels
    assert(byGroup(0L).map(_._1).toSet == Set(0L, 1L, 2L))
    assert(byGroup(10L).map(_._1).toSet == Set(10L, 11L))
    assert(byGroup(0L).count(_._3) == 1, "one representative in group 0")
    assert(byGroup(10L).count(_._3) == 1, "one representative in group 10")
    Seq(20L, 21L).foreach { id =>
      assert(byGroup(id).map(_._1).toSeq == Seq(id) && byGroup(id).head._3,
        s"singleton $id kept")
    }
  }

  test("keep rule: the kept member has the group-min (centroid_cos, vec_id)") {
    val out = SemDedup.semanticDedup(df(planted()), tau = 0.99, k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(3), r.getBoolean(4)))
    out.groupBy(_._3).values.foreach { grp =>
      val kept = grp.filter(_._4)
      assert(kept.length == 1)
      val expect = grp.minBy(g => (g._2, g._1))
      assert(kept.head._1 == expect._1,
        s"group ${grp.head._3}: kept ${kept.head._1}, expected ${expect._1}")
    }
  }

  test("verdict covers every vector exactly once and is deterministic") {
    val rows = planted()
    val a = SemDedup.semanticDedup(df(rows), tau = 0.99, k = 4).collect()
    val b = SemDedup.semanticDedup(df(rows), tau = 0.99, k = 4).collect()
    assert(a.map(_.getLong(0)).toSeq.sorted == rows.map(_._1).sorted)
    assert(a.map(_.toSeq) sameElements b.map(_.toSeq))
  }

  test("tau below inter-anchor cosine merges nothing across anchors") {
    // anchors are orthogonal: even tau=0.5 must not cross groups
    val out = SemDedup.semanticDedup(df(planted()), tau = 0.5, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    val groups = out.groupBy(_._2).map { case (g, m) => g -> m.map(_._1).toSet }
    assert(groups.values.forall(s =>
      s.subsetOf(Set(0L, 1L, 2L)) || s.subsetOf(Set(10L, 11L)) ||
      s == Set(20L) || s == Set(21L)))
  }

  test("appendVerdict == frozen-model full run over the union") {
    import graft.search.Ivf
    val all = planted()
    val (batch, resident) = all.partition(_._1 % 10 == 1) // ids 1, 11, 21
    val model = Ivf.build(df(resident), nlist = 4)
    val residentVerdict = SemDedup.verdictFor(
      SemDedup.assignWith(model, df(resident)), tau = 0.99)
    val inc = SemDedup.appendVerdict(model, df(resident), residentVerdict,
      df(batch), tau = 0.99)
      .orderBy("vec_id").collect().map(_.toSeq)
    val full = SemDedup.verdictFor(
      SemDedup.assignWith(model, df(all)), tau = 0.99)
      .orderBy("vec_id").collect().map(_.toSeq)
    assert(inc.toSeq == full.toSeq)
  }

  test("appendVerdict can revoke a resident's kept status in a touched cluster") {
    import graft.search.Ivf
    // resident: two far anchors (both kept as singletons); batch adds a
    // near-dup of anchor 0 that sits FARTHER from the centroid, so the
    // SemDeDup rule transfers kept to the newcomer
    val anchor0 = unit(Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f))
    val anchor1 = unit(Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f))
    val resident = Seq(0L -> anchor0, 1L -> anchor1)
    val newcomer = unit(Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0.2f))
    val model = Ivf.build(df(resident), nlist = 2)
    val rv = SemDedup.verdictFor(SemDedup.assignWith(model, df(resident)), 0.9)
    assert(rv.collect().forall(_.getBoolean(4)), "both residents start kept")
    val out = SemDedup.appendVerdict(model, df(resident), rv,
      df(Seq(5L -> newcomer)), tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out(5L), "farther-from-centroid newcomer takes the slot")
    assert(!out(0L), "prior representative revoked in the touched cluster")
    assert(out(1L), "untouched cluster passes through")
  }

  test("runs on the testdata embeddings table with full coverage") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count()
    val out = SemDedup.semanticDedup(emb, tau = 0.4)
    assert(out.count() == n)
    assert(out.where(col("kept")).count() >= 1)
  }

  test("balancedKeep: water-filling cap law, minimal cap, deterministic") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
    val a = graft.queries.DedupQueries.sampleClusterBalance(spark, sf)
      .as[(Long, Int, Boolean)].collect()
    val b = graft.queries.DedupQueries.sampleClusterBalance(spark, sf)
      .as[(Long, Int, Boolean)].collect()
    assert(a.toSeq == b.toSeq) // md5 rule + seeded kmeans: no drift
    val n = emb.count()
    assert(a.length == n, "every vector gets a verdict exactly once")
    val budget = math.ceil(n * graft.queries.DedupQueries.BalanceBudgetFrac).toLong
    val kept = a.count(_._3).toLong
    assert(kept >= budget, s"kept $kept below budget $budget")
    // per-cluster kept counts obey min(size, cap) for ONE shared cap,
    // and that cap is minimal (cap-1 would miss the budget)
    val byCluster = a.groupBy(_._2).map { case (c, rs) =>
      c -> (rs.length.toLong, rs.count(_._3).toLong)
    }
    val cap = byCluster.values.map(_._2).max
    byCluster.foreach { case (c, (size, k)) =>
      assert(k == math.min(size, cap), s"cluster $c: kept $k of $size at cap $cap")
    }
    val keptAtCapMinus1 = byCluster.values.map { case (s, _) =>
      math.min(s, cap - 1)
    }.sum
    assert(keptAtCapMinus1 < budget, s"cap $cap not minimal")
  }

  // ---- #301 dedup_semantic_portable (the #157 hash-pass witness) -------

  test("portable twin pins #157's gate-scale cluster geometry: k == pickK(gate N)") {
    val n = Tables.rowCount(spark, "/root/testdata/sf0.01", "embeddings")
    assert(graft.queries.DedupQueries.SemPortableK == SemDedup.pickK(n),
      s"SemPortableK must track pickK($n) so the twin certifies #157's " +
        "machinery under exactly the gate-scale cluster geometry")
  }

  test("portable twin: fully independent driver-side replay matches bit-for-bit") {
    import graft.search.VecMath.round6
    val sf = "/root/testdata/sf0.001"
    val tau = graft.queries.DedupQueries.CosineTau
    val out = graft.queries.DedupQueries.dedupSemanticPortable(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))
    // naive replay: same raw/unit centroid arrays, double accumulation in
    // index order, strict-max earliest-index argmax — no Spark machinery
    val cents = graft.queries.DedupQueries.semPortableCentroids
    val unitC = SemDedup.unitCentroids(graft.search.IvfModel(cents, null))
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val assigned = emb.map { case (id, v) =>
      var best = -1; var bs = Double.NegativeInfinity
      var i = 0
      while (i < cents.length) {
        val d = dot(v, cents(i)); if (d > bs) { bs = d; best = i }; i += 1
      }
      (id, v, best, round6(dot(v, unitC(best))))
    }
    val pairs = for {
      i <- assigned.indices
      j <- (i + 1) until assigned.length
      if assigned(i)._3 == assigned(j)._3 &&
        round6(dot(assigned(i)._2, assigned(j)._2)) >= tau
    } yield (assigned(i)._1, assigned(j)._1)
    // min-label components via union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra); parent(hi) = lo }
    }
    val expected = assigned.map { case (id, _, lid, ccos) =>
      (id, lid, ccos, find(id))
    }
    val keptOf = expected.groupBy(_._4).map { case (g, ms) =>
      g -> ms.minBy(m => (m._3, m._1))._1
    }
    val want = expected.map { case (id, lid, ccos, g) =>
      (id, lid, ccos, g, keptOf(g) == id)
    }
    assert(out.length == want.length)
    out.zip(want).foreach { case (o, w) => assert(o == w, s"mismatch: $o vs $w") }
  }

  test("balance twin (#306): independent local replay matches bit-for-bit") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.DedupQueries.sampleBalancePortable(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    val cents = graft.queries.DedupQueries.semPortableCentroids
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val assigned = emb.map { case (id, v) =>
      var best = -1; var bs = Double.NegativeInfinity; var i = 0
      while (i < cents.length) {
        val d = dot(v, cents(i)); if (d > bs) { bs = d; best = i }; i += 1
      }
      (id, best)
    }
    val sizes = assigned.groupBy(_._2).map { case (l, m) => l -> m.length.toLong }
    val budget =
      math.ceil(assigned.length * graft.queries.DedupQueries.BalanceBudgetFrac).toLong
    def keptAt(c: Long) = sizes.values.map(math.min(_, c)).sum
    val cap = (1L to sizes.values.max).find(keptAt(_) >= budget).get
    def md5hex(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val keptIds = assigned.groupBy(_._2).values.flatMap { grp =>
      grp.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(cap.toInt)
    }.toSet
    val want = assigned.map { case (id, l) => (id, l, keptIds(id)) }
    assert(out.toSeq == want.toSeq)
  }
}
