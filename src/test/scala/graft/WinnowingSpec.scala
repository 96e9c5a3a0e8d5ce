package graft

import org.apache.spark.sql.graft.WinnowFingerprints
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing contracts (Schleimer et al. SIGMOD'03): the guarantee (any
  * shared run of k+w-1 chars yields a shared fingerprint), the density
  * bound, the rightmost-tie rule, and Spark-path == compiled-loop parity.
  */
class WinnowingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val K = 8
  private val W = 4

  /** Naive reference: all windows, rightmost argmin, global distinct. */
  private def naive(s: String, k: Int, w: Int): Seq[(Long, Long)] = {
    val cp = s.codePoints().toArray
    val m = cp.length - k + 1
    if (m < w) return Seq.empty
    val h = (0 until m).map { i =>
      (0 until k).foldLeft(0L)((acc, j) => (acc * 31 + cp(i + j)) % 4294967296L)
    }
    (0 to m - w).map { j =>
      val win = (j until j + w)
      val mn = win.map(h).min
      val pos = win.filter(p => h(p) == mn).max
      (pos.toLong, h(pos))
    }.distinct
  }

  private def unpack(packed: Array[Long]): Seq[(Long, Long)] =
    packed.toSeq.map(p => (p >> 32, p & 0xFFFFFFFFL))

  test("compiled selection equals the naive reference on varied strings") {
    val cases = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaa",            // all-tie stress: rightmost rule
      "abcabcabcabcabcabcabc",              // periodic
      "ab", "", "exactly11ch",              // short / boundary
      "x" * 7 + "y",                        // m == 1 < w -> empty
      (0 until 500).map(i => ('a' + i % 26).toChar).mkString)
    cases.foreach { s =>
      assert(unpack(WinnowFingerprints.select(s, K, W)) == naive(s, K, W), s"'$s'")
    }
  }

  test("guarantee: a shared substring of length k+w-1 shares a fingerprint") {
    val shared = "GUARANTEED-RUN-XYZ" // length 18 >= k+w-1 = 11
    val a = "prefix one blah " + shared + " suffix alpha"
    val b = "totally different beginning " + shared + " and end"
    val fa = unpack(WinnowFingerprints.select(a, K, W)).map(_._2).toSet
    val fb = unpack(WinnowFingerprints.select(b, K, W)).map(_._2).toSet
    assert((fa & fb).nonEmpty, "no shared fingerprint for shared run")
  }

  test("density is near 2/(w+1) on random-ish text") {
    val rnd = new scala.util.Random(7)
    val s = (0 until 5000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val picks = WinnowFingerprints.select(s, K, W).length.toDouble
    val windows = s.length - K + 1
    val density = picks / windows
    assert(density > 1.0 / W - 0.05 && density < 2.0 / (W + 1) + 0.1,
      s"density $density")
  }

  test("rightmost tie: constant string picks the last position of each window") {
    // all hashes equal -> every window picks its rightmost index; distinct
    // over sliding windows = every position from w-1 on
    val s = "a" * 20 // m = 13 windows of hashes, w = 4
    val got = unpack(WinnowFingerprints.select(s, K, W)).map(_._1)
    assert(got == (W - 1 until s.length - K + 1).map(_.toLong))
  }

  test("Spark path (explode + unpack) matches the compiled loop per doc") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = graft.queries.TextQueries.textWinnowing(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val local = docs.select("doc_id", "text").as[(Long, String)].collect()
    local.foreach { case (id, text) =>
      val want = unpack(WinnowFingerprints.select(text, K, W))
      val have = got.getOrElse(id, Array.empty).toSeq.map(t => (t._2, t._3))
      assert(have == want, s"doc $id")
    }
  }
}
