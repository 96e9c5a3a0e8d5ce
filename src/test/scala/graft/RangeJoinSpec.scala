package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Point-in-interval range join contracts: randomized parity against a
  * local brute-force oracle (every qualifying pair exactly once, no
  * dups from the interval explosion), width-independence, and the
  * degenerate edges (empty intervals, inverted bounds, heavy tails).
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def brute(points: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (pid, p) <- points
      (iid, lo, hi) <- ivs
      if lo <= p && p <= hi
    } yield (pid, iid)).toSet

  private def run(points: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long)],
                  width: Long = 0L): Set[(Long, Long)] =
    RangeJoin.pointInInterval(
        points.toDF("pid", "p"), "p",
        ivs.toDF("iid", "lo", "hi"), "lo", "hi", width)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("randomized parity with brute force, auto width") {
    val rng = new scala.util.Random(7L)
    for (_ <- 1 to 5) {
      val points = Seq.tabulate(200)(i => (i.toLong, rng.nextLong(1000)))
      val ivs = Seq.tabulate(100) { i =>
        val lo = rng.nextLong(1000)
        (i.toLong, lo, lo + rng.nextLong(80))
      }
      assert(run(points, ivs) == brute(points, ivs))
    }
  }

  test("result is width-independent (1, mean, huge)") {
    val rng = new scala.util.Random(11L)
    val points = Seq.tabulate(150)(i => (i.toLong, rng.nextLong(500)))
    val ivs = Seq.tabulate(60) { i =>
      val lo = rng.nextLong(500)
      (i.toLong, lo, lo + rng.nextLong(200))
    }
    val want = brute(points, ivs)
    for (w <- Seq(1L, 0L, 5000L)) assert(run(points, ivs, w) == want, s"width $w")
  }

  test("each qualifying pair appears exactly once despite bin explosion") {
    // long intervals span many narrow bins; a point still matches each
    // interval once because the point has exactly one bin
    val points = Seq((1L, 50L), (2L, 100L))
    val ivs = Seq((10L, 0L, 400L), (11L, 60L, 70L))
    val rows = RangeJoin.pointInInterval(
        points.toDF("pid", "p"), "p",
        ivs.toDF("iid", "lo", "hi"), "lo", "hi", binWidth = 3L)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(rows.size == rows.toSet.size, s"dup pairs: $rows")
    assert(rows.toSet == Set((1L, 10L), (2L, 10L)))
  }

  test("inverted intervals (hi < lo) are dropped; negative domains work") {
    val points = Seq((1L, -5L), (2L, 0L))
    val ivs = Seq((10L, -10L, -1L), (11L, 5L, 2L))
    assert(run(points, ivs) == Set((1L, 10L)))
  }

  test("no intervals at all: empty result, no width-probe crash") {
    assert(run(Seq((1L, 3L)), Seq.empty) == Set.empty)
  }

  test("heavy-tailed lengths: mean-width banding stays correct") {
    val rng = new scala.util.Random(13L)
    val points = Seq.tabulate(100)(i => (i.toLong, rng.nextLong(10000)))
    // 95 tiny intervals + 5 spanning most of the domain
    val ivs = Seq.tabulate(95) { i =>
      val lo = rng.nextLong(10000); (i.toLong, lo, lo + rng.nextLong(10))
    } ++ Seq.tabulate(5)(i => ((95 + i).toLong, rng.nextLong(100), 9000L + rng.nextLong(1000)))
    assert(run(points, ivs) == brute(points, ivs))
  }
}
