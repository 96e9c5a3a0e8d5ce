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

  test("perm(0) is the identity bijection") {
    assert(ScaleBench.perm(0) == "aeiousnrt")
  }

  test("permutations are pairwise distinct well past the old 10-replica cycle") {
    val ps = (0 until 120).map(ScaleBench.perm)
    assert(ps.distinct.length == ps.length, "bijection repeated — replicas would be exact dups")
  }

  test("every permutation is a bijection over the same nine letters") {
    (0 until 120).foreach { i =>
      assert(ScaleBench.perm(i).sorted == "aeiousnrt".sorted, s"perm($i) not a permutation")
    }
  }

  test("indices outside [0, 9!) are rejected") {
    intercept[IllegalArgumentException](ScaleBench.perm(-1))
    intercept[IllegalArgumentException](ScaleBench.perm(362880))
  }
}
