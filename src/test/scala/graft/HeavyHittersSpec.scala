package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HeavyHitters contracts: exactness equals the full GROUP BY on every
  * path — certified (skewed data, bound separates), exact-summary
  * (cardinality ≤ capacity, MG never decrements), and fallback (uniform
  * data the bound cannot certify) — plus rank/tie determinism.
  */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def exactTopK(df: org.apache.spark.sql.DataFrame, c: String, k: Int) =
    df.select(col(c).cast("long").as("value"))
      .groupBy("value").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("value")).limit(k)
      .as[(Long, Long)].collect().toSeq

  private def got(df: org.apache.spark.sql.DataFrame, c: String, k: Int, cap: Int) =
    HeavyHitters.topK(df, c, k, cap)
      .select("value", "n").as[(Long, Long)].collect().toSeq

  test("skewed data certifies: matches full aggregation with capacity << cardinality") {
    // zipf-ish: value v appears ~50000/v times; cardinality 5000 >> cap 64
    val rows = (1 to 300).flatMap(v => Seq.fill(3000 / v)(v.toLong)) ++
      (10000L until 15000L) // long uniform tail, one hit each
    val df = spark.sparkContext.parallelize(rows, 16).toDF("v")
    val want = exactTopK(df, "v", 10)
    val have = got(df, "v", 10, cap = 256)
    assert(have == want)
    // sanity: the bound genuinely certifies here (10th count > n/cap)
    val n = rows.length.toDouble
    assert(want.last._2 > n / 256)
  }

  test("cardinality <= capacity: summaries are exact, result matches") {
    val rows = (0 until 5000).map(i => (i % 37).toLong)
    val df = spark.sparkContext.parallelize(rows, 8).toDF("v")
    assert(got(df, "v", 5, cap = 64) == exactTopK(df, "v", 5))
  }

  test("uniform high-cardinality data falls back and still matches") {
    // 4000 distinct values, ~2 hits each, cap 64: bound n/64 ≈ 125 can
    // never certify a 10th count of ~3 — fallback path must fire and be
    // exact anyway
    val rows = (0 until 8000).map(i => (i % 4000).toLong) ++ Seq(7L, 7L, 7L)
    val df = spark.sparkContext.parallelize(rows, 8).toDF("v")
    assert(got(df, "v", 10, cap = 64) == exactTopK(df, "v", 10))
  }

  test("null values are excluded identically on sketch and fallback paths") {
    // nulls outnumber everything — if any path kept a null group (or NPE'd
    // decoding it) the result would diverge; both capacities must agree
    // with the non-null exact aggregate
    val rows: Seq[java.lang.Long] =
      Seq.fill(50)(null.asInstanceOf[java.lang.Long]) ++
        (0 until 300).map(i => java.lang.Long.valueOf((i % 7).toLong)) ++
        (1000L until 1200L).map(java.lang.Long.valueOf)
    val df = spark.sparkContext.parallelize(rows, 4).toDF("v")
    val want = exactTopK(df.where(col("v").isNotNull), "v", 5)
    assert(got(df, "v", 5, cap = 512) == want)      // certified/sketch path
    assert(got(df, "v", 5, cap = 5) == want)        // fallback path
  }

  test("ranks are 1..k and ties break by value") {
    val rows = Seq(5L, 5L, 3L, 3L, 9L, 9L, 1L)
    val df = spark.sparkContext.parallelize(rows, 2).toDF("v")
    val out = HeavyHitters.topK(df, "v", 3, 64)
      .select("value", "n", "rk").as[(Long, Long, Int)].collect().toSeq
    assert(out == Seq((3L, 2L, 1), (5L, 2L, 2), (9L, 2L, 3)))
  }
}
