package graft

import graft.operators.Quantiles
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the shared rank-selection percentile operator
  * against a direct driver replay of the interpolation formula — across
  * group shapes hand tests don't reach: singleton groups, all-equal
  * values, duplicated values at the rank boundary, fractions 0 and 1,
  * groups of co-prime sizes. Fixed-seed generators (deterministic CI). */
class QuantilesPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val groupedGen: Gen[List[(String, Double)]] = for {
    nGroups <- Gen.chooseNum(1, 5)
    rows <- Gen.listOfN(nGroups, for {
      n <- Gen.chooseNum(1, 120)
      // draw from a SMALL value set so rank-boundary duplicates are common
      vs <- Gen.listOfN(n, Gen.chooseNum(0, 20).map(_ * 0.5))
    } yield vs)
  } yield rows.zipWithIndex.flatMap { case (vs, g) => vs.map(v => (s"g$g", v)) }

  private def interp(sorted: Vector[Double], p: Double): Double = {
    val idx = p * (sorted.length - 1)
    val lo = math.floor(idx).toInt
    val hi = math.ceil(idx).toInt
    val v = sorted(lo) + (sorted(hi) - sorted(lo)) * (idx - lo)
    math.rint(v * 1e6) / 1e6
  }

  test("25 random draws: perGroup equals the driver interpolation replay") {
    (1 to 25).foreach { i =>
      val rows = sample(groupedGen, 4000L + i)
      val ps = sample(Gen.someOf(Seq(0.0, 0.1, 0.25, 0.5, 0.9, 1.0))
        .map(_.toList.sorted).suchThat(_.nonEmpty), 600L + i)
      val df = spark.sparkContext.parallelize(rows, 5).toDF("g", "v")
      val got = Quantiles.perGroup(df, "g", "v", ps)
        .as[(String, Double, Double)].collect().toSet
      val want = rows.groupBy(_._1).flatMap { case (g, vs) =>
        val sorted = vs.map(_._2).sorted.toVector
        ps.map(p => (g, p, interp(sorted, p)))
      }.toSet
      assert(got == want, s"draw $i: ps=$ps groups=${rows.map(_._1).distinct}")
    }
  }
}
