package graft

import graft.operators.HeavyHitters
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the sketch-then-verify heavy hitters: EXACTNESS
  * is unconditional (certified path or fallback — the caller can never
  * tell the difference from the result), across distribution shapes hand
  * tests don't reach: uniform, zipf-ish, constant, single-value spikes,
  * capacities straddling the cardinality, k larger than the distinct
  * count. Fixed-seed generators (deterministic CI), the
  * FilterDslPropertySpec convention. */
class HeavyHittersPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // value streams with tunable skew: draw a cardinality, then rows whose
  // value is floor(card * u^skew) — skew 1 uniform, skew 3 spiky
  private val streamGen: Gen[List[Long]] = for {
    card <- Gen.chooseNum(1, 300)
    skew <- Gen.oneOf(1, 2, 3)
    n <- Gen.chooseNum(1, 3000)
    vs <- Gen.listOfN(n, Gen.chooseNum(0.0, 1.0)
      .map(u => (card * math.pow(u, skew)).toLong.min(card - 1L)))
  } yield vs

  private def exactTopK(rows: Seq[Long], k: Int): Seq[(Long, Long)] =
    rows.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (v, c) => (-c, v) }.take(k)

  test("40 random draws: result always equals the exact top-k, any capacity") {
    (1 to 40).foreach { i =>
      val rows = sample(streamGen, 9000L + i)
      val k = sample(Gen.chooseNum(1, 25), 500L + i)
      val cap = sample(Gen.chooseNum(math.max(1, k), 512), 700L + i)
      val df = spark.sparkContext.parallelize(rows, 7).toDF("v")
      val got = HeavyHitters.topK(df, "v", k, cap)
        .select("value", "n").as[(Long, Long)].collect().toSeq
      val want = exactTopK(rows, k)
      assert(got == want,
        s"draw $i: k=$k cap=$cap n=${rows.length} distinct=${rows.distinct.length}")
    }
  }
}
