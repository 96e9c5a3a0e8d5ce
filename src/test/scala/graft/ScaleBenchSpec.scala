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
