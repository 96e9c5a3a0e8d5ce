package graft

import graft.queries.QualityQueries
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the round-14 data-quality/feature widening: blocked fuzzy
  * entity resolution (hand-counted pairs and edit distances), the column
  * profiler (hand-computed stats on a 4-row frame), the feature/label
  * matrix (leak-free point-in-time semantics on a planted order history),
  * and the SCD2 interval build (island compression + day-last-event wins).
  */
class QualityQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("er_fuzzy_parts: blocking, edit-distance bands, and pair counts") {
    // block "red": "red widget" ×3 (exact dup ⇒ C(3,2)=3 record pairs),
    //   "red widgets" ×1 (dist 1 to "red widget", sim 1-1/11≈0.909091),
    //   "red bolt" ×1 (dist to "red widget" = 6, sim 1-6/10=0.4 ⇒ cut)
    // block "blue": "blue bolt" ×1 alone ⇒ nothing
    val part = Seq(
      (1L, "red widget"), (2L, "RED WIDGET"), (3L, "red widget"),
      (4L, "red widgets"), (5L, "red bolt"), (6L, "blue bolt")
    ).toDF("p_partkey", "p_name")
    val got = QualityQueries.erFuzzyPartsOf(part)
      .as[(String, String, Long, Double, Double)].collect()
    assert(got.length == 2)
    val (n0, n1, d0, s0, p0) = got(0)   // exact dup sorts first (sim 1.0)
    assert(n0 == "red widget" && n1 == "red widget" && d0 == 0L && s0 == 1.0 && p0 == 3.0)
    val (m0, m1, d1, s1, p1) = got(1)
    assert(m0 == "red widget" && m1 == "red widgets" && d1 == 1L && p1 == 3.0)
    assert(math.abs(s1 - (1.0 - 1.0 / 11)) < 1e-6)
  }

  test("er_fuzzy_parts: name-grain collapse keeps the quadratic step off records") {
    // 100 records, 2 distinct names in one block: the cross join must see
    // 1 candidate name pair, not ~2500 record pairs.
    val part = (1L to 100L).map(i =>
      (i, if (i % 2 == 0) "hot gear" else "hot bear")).toDF("p_partkey", "p_name")
    val got = QualityQueries.erFuzzyPartsOf(part).collect()
    // cross pair (bear, gear): dist 1, sim 1-1/8=0.875, 50*50 record pairs
    // plus two exact-dup rows of C(50,2)=1225 each
    assert(got.length == 3)
    val cross = got.find(r => r.getString(0) != r.getString(1)).get
    assert(cross.getDouble(4) == 2500.0)
    assert(got.count(r => r.getDouble(4) == 1225.0) == 2)
  }

  test("table_profile: hand-computed stats, one row per column") {
    val li = Seq(
      (1L, 10L, 100L, 1, 5.0, 1000.00, 0.05, 0.02, "N", "O", ts(0)),
      (1L, 11L, 100L, 2, 3.0, 500.50, 0.00, 0.02, "R", "F", ts(60 * 24)),
      (2L, 10L, 101L, 1, 5.0, 250.25, 0.10, 0.00, "A", "F", ts(60 * 48)),
      (2L, 12L, 101L, 2, 7.0, 100.00, 0.05, 0.08, "N", "O", ts(60 * 72))
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
      "l_shipdate")
    val rows = QualityQueries.tableProfileOf(li).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 11)
    val q = rows("l_quantity")
    assert(q.getLong(1) == 0L && q.getLong(2) == 3L)            // nulls, distinct
    assert(q.getDouble(3) == 3.0 && q.getDouble(4) == 7.0)      // min, max
    assert(q.getDouble(5) == 5.0)                               // exact mean
    val f = rows("l_returnflag")
    assert(f.getLong(2) == 3L && f.getString(6) == "A" && f.getString(7) == "R")
    assert(f.isNullAt(3) && f.isNullAt(5))
    val d = rows("l_shipdate")
    assert(d.getString(6) == "2023-11-14" && d.getString(7) == "2023-11-17")
    val e = rows("l_extendedprice")
    assert(e.getDouble(5) == (1000.00 + 500.50 + 250.25 + 100.00) / 4)
  }

  test("table_profile_approx: schema-identical, ≤5% distinct error, other stats exact") {
    val dir = "/root/testdata/sf0.001"
    val exact = QualityQueries.tableProfile(spark, dir)
    val approx = QualityQueries.tableProfileApprox(spark, dir)
    // the swap contract: identical schema, so a consumer flips between
    // the exact and sketch profiles without a downstream change
    assert(approx.schema.map(f => (f.name, f.dataType)) ==
      exact.schema.map(f => (f.name, f.dataType)))
    val ex = exact.collect().map(r => r.getString(0) -> r).toMap
    val ap = approx.collect().map(r => r.getString(0) -> r).toMap
    assert(ap.keySet == ex.keySet && ap.size == 11)
    ex.foreach { case (c, e) =>
      val a = ap(c)
      // HLL++ at rsd 0.02: ≤5% per-column error (the verdict-#4 contract)
      val (de, da) = (e.getLong(2).toDouble, a.getLong(2).toDouble)
      assert(math.abs(da - de) / de <= 0.05, s"$c distinct: exact $de approx $da")
      // every non-sketch cell is computed by the same arithmetic — exact
      Seq(1, 3, 4, 5, 6, 7).foreach { i =>
        assert((e.isNullAt(i) && a.isNullAt(i)) ||
          (!a.isNullAt(i) && e.get(i) == a.get(i)), s"$c col $i")
      }
    }
  }

  test("feat_customer_orders: point-in-time features and next-gap label") {
    // customer 7: orders on day 0, 10, 40 (prices 100, 50, 30)
    val day0 = ts(0)
    val orders = Seq(
      (101L, 7L, day0, 100.0),
      (102L, 7L, ts(60 * 24 * 10), 50.0),
      (103L, 7L, ts(60 * 24 * 40), 30.0),
      (201L, 8L, day0, 9.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val got = QualityQueries.featCustomerOrdersOf(orders)
      .filter($"o_custkey" === 7L).collect()
    assert(got.length == 3)
    val r1 = got(0); val r2 = got(1); val r3 = got(2)
    assert(r1.getLong(3) == 1L && r1.isNullAt(4))               // first: no prev gap
    assert(r1.getLong(7) == 10L)                                // label: next in 10d
    assert(r2.getLong(4) == 10L && r2.getLong(7) == 30L)
    assert(r2.getDouble(5) == 150.0)                            // cum spend
    assert(r2.getDouble(6) == 10.0)                             // avg gap so far
    assert(r3.getLong(4) == 30L && r3.isNullAt(7))              // censored last
    assert(r3.getDouble(5) == 180.0 && r3.getDouble(6) == 20.0) // (10+30)/2
  }

  test("scd2_events: islands compress, day-last event wins, is_current marks the open row") {
    // user 1: day0 k=10 (tier 0), day1 two events — k=80 then k=30 LATER
    //   in the day (tier 1 wins), day2 k=40 (tier 1 ⇒ extends island),
    //   day3 k=99 (tier 3) ⇒ 3 intervals, last is_current
    def ev(id: Long, day: Int, minInDay: Long, u: Long, k: Int) =
      (id, ts(day * 60L * 24 + minInDay), u, "click", 1.0, s"""{"k": $k}""")
    val events = Seq(
      ev(1, 0, 0, 1L, 10),
      ev(2, 1, 5, 1L, 80), ev(3, 1, 20, 1L, 30),
      ev(4, 2, 0, 1L, 40),
      ev(5, 3, 0, 1L, 99)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = QualityQueries.scd2EventsOf(events).collect()
    assert(got.length == 3)
    assert(got.map(_.getLong(1)).toSeq == Seq(0L, 1L, 3L))      // tiers
    assert(got.map(_.getLong(4)).toSeq == Seq(1L, 2L, 1L))      // n_days
    assert(got.map(_.getBoolean(5)).toSeq == Seq(false, false, true))
    // the two-day tier-1 island spans exactly day1..day2
    assert(got(1).getDate(3).toLocalDate ==
      got(1).getDate(2).toLocalDate.plusDays(1))
  }
}
