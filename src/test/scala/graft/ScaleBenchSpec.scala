package graft

import graft.tools.ScaleBench
import org.scalatest.funsuite.AnyFunSuite

/** The scale-probe's per-replica token bijections: the linear-pair-growth
  * argument in BASELINE.md §3b rests on every replica getting a DISTINCT
  * permutation (a repeat makes two replicas exact text duplicates and
  * re-introduces the quadratic candidate blowup the scheme exists to
  * avoid), and on replica 0 staying byte-identical to the base corpus.
  */
class ScaleBenchSpec extends AnyFunSuite {

  private val Alphabet = "abcdefghijklmnopqrstuvwxyz"

  test("perm(0) is the identity bijection") {
    assert(ScaleBench.perm(0) == Alphabet)
  }

  test("permutations are pairwise distinct over a 500-replica range") {
    val ps = (0 until 500).map(ScaleBench.perm)
    assert(ps.distinct.length == ps.length, "bijection repeated — replicas would be exact dups")
  }

  test("every permutation is a bijection over the full lowercase alphabet") {
    (0 until 500).foreach { i =>
      assert(ScaleBench.perm(i).sorted == Alphabet, s"perm($i) not a permutation")
    }
  }

  test("short function words are NOT invariant (the 9-letter scheme's failure)") {
    // an invariant blocking token lands in the same block in every
    // replica and grows candidate pairs ~R²; with the full alphabet no
    // letter survives perm(i) for typical words
    (1 until 50).foreach { i =>
      val p = ScaleBench.perm(i)
      def tr(w: String) = w.map(c => p(Alphabet.indexOf(c)))
      assert(tr("by") != "by" || tr("my") != "my" || tr("the") != "the",
        s"perm($i) leaves short words invariant")
    }
  }

  test("negative indices are rejected") {
    intercept[IllegalArgumentException](ScaleBench.perm(-1))
    intercept[IllegalArgumentException](ScaleBench.rot(-1, 384))
  }

  test("resolveQuery: registered names, probe-only names, unknown rejected") {
    assert(ScaleBench.resolveQuery("dedup_incremental") ne null)
    assert(ScaleBench.resolveQuery("dedup_incremental_fixed") ne null)
    assert(ScaleBench.resolveQuery("dedup_minhash_bucketed_fixed") ne null)
    intercept[NoSuchElementException](ScaleBench.resolveQuery("no_such_probe"))
  }

  test("fixed-batch probes ≡ their registered queries at 1× (all ids below the offset)") {
    // the r17 verdict-#1 probes differ from #102/#302 ONLY by capping the
    // batch at replica 0's id space; on an unreplicated dir the cap is a
    // no-op, so the probe pair must return the production rows exactly —
    // pinning that the probe measures the production plan, not a variant
    val s = SparkTest.session
    val d = "/root/testdata/sf0.001"
    def rows(q: String) =
      ScaleBench.resolveQuery(q)(s, d).collect().map(_.toString).sorted.toSeq
    assert(rows("dedup_incremental_fixed") == rows("dedup_incremental"))
    assert(rows("dedup_minhash_bucketed_fixed") == rows("dedup_minhash_bucketed"))
  }

  test("uniformGeoMeta de-aliases replicas and keeps the completeness band") {
    // the production embeddingsMeta aliases under the 10M replica offset:
    // 7·10M ≡ 0 (mod 320) pins every replica to the SAME longitudes and
    // 10M mod 180 = 100 (gcd 20) leaves 9 latitude shifts — the r19 geo
    // probes measured that degeneracy. The hash-derived probe meta must
    // (a) place replica copies of one point at DIFFERENT positions, and
    // (b) stay inside |lat| ≤ 62° where a 0.5° lon cell ≥ the 25 km
    // radius (the 3×3-neighborhood completeness contract).
    val s = SparkTest.session
    import org.apache.spark.sql.functions.col
    val offset = 10000000L
    val ids = (0 until 64).flatMap(r => (0L until 50L).map(_ + r * offset))
    val meta = ScaleBench.uniformGeoMeta(
      s.createDataFrame(ids.map(Tuple1(_))).toDF("vec_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    meta.foreach { case (id, lat, lon) =>
      assert(lat >= -62.0 && lat <= 61.75, s"$id lat $lat outside band")
      assert(lon >= -120.0 && lon <= 119.75, s"$id lon $lon outside band")
    }
    // replica copies of base id 0..49 (id + r·10M) must NOT stack on the
    // base point's position: across 64 replicas each base id's positions
    // are nearly all distinct (hash-uniform over 496·960 ≈ 476k slots;
    // the aliasing failure mode is ≤9 distinct positions)
    (0L until 50L).foreach { base =>
      val pos = meta.filter(_._1 % offset == base).map(t => (t._2, t._3)).distinct
      assert(pos.length > 32, s"base $base collapsed to ${pos.length} positions")
    }
    // and longitudes are NOT pinned: the production failure mode was one
    // shared longitude set across all replicas
    val lonsPerReplica = meta.groupBy(_._1 / offset)
      .map { case (_, ts) => ts.map(_._3).toSet }
    assert(lonsPerReplica.toSeq.distinct.length > 32,
      "replica longitude sets repeat — still aliased")
  }

  test("geo probe queries resolve; candidate count matches a local recompute") {
    val s = SparkTest.session
    val d = "/root/testdata/sf0.001"
    assert(ScaleBench.resolveQuery("geo_pairs_u") ne null)
    assert(ScaleBench.resolveQuery("geo_knn_u") ne null)
    val cand = ScaleBench.resolveQuery("geo_cand_u")(s, d)
      .collect().head.getLong(0)
    // local oracle: exact pair count of points whose 0.5° cells are within
    // one cell in both axes, id_a ≠ id_b (ordered pairs — the probe side
    // explodes, the build side is the home cell)
    val pts = ScaleBench.uniformGeoMeta(graft.Tables.embeddings(s, d))
      .collect().map(r => (math.floor(r.getDouble(1) / 0.5).toLong,
        math.floor(r.getDouble(2) / 0.5).toLong))
    val want = (for {
      a <- pts; b <- pts
      if math.abs(a._1 - b._1) <= 1 && math.abs(a._2 - b._2) <= 1
    } yield 1L).sum - pts.length
    assert(cand == want, s"probe $cand vs local $want")
  }

  test("embedding rotations: identity at 0, pairwise distinct below dim") {
    // a repeated shift makes two embedding replicas exact vector dups —
    // SemDeDup/embedding-dedup candidate pairs would grow ~R² in every
    // cluster the copies share, the degeneracy the rotation exists to kill
    assert(ScaleBench.rot(0, 384) == 0, "replica 0 must stay byte-identical")
    val shifts = (0 until 384).map(ScaleBench.rot(_, 384))
    assert(shifts.distinct.length == shifts.length,
      "rotation shift repeated — two replicas would be exact vector dups")
    assert(shifts.forall(s => s >= 0 && s < 384))
  }
}
