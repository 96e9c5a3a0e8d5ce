package graft

import graft.queries.QualityQueries2
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the second round-14 widening batch: cohort LTV triangle
  * arithmetic on a planted two-cohort book, the skew audit's share/rank
  * math on a hand-skewed key set, and the Holt fold against a local
  * recursion replay.
  */
class QualityQueries2Spec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def ts(day: Int) = new Timestamp(1700000000000L + day * 86400000L)

  test("orders_cohort_ltv: triangle counts, decimal-exact cumulative LTV") {
    // cohort Jan (custs 1, 2): Jan rev 100+50, Feb cust 1 returns rev 30
    // cohort Feb (cust 3): Feb rev 10
    def d(y: Int, m: Int) = Timestamp.valueOf(f"$y-$m%02d-15 00:00:00")
    val orders = Seq(
      (1L, 1L, d(2024, 1), 100.0), (2L, 2L, d(2024, 1), 50.0),
      (3L, 1L, d(2024, 2), 30.0), (4L, 3L, d(2024, 2), 10.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val got = QualityQueries2.ordersCohortLtvOf(orders).collect()
    assert(got.length == 3)
    val r0 = got(0) // (2024-01, offset 0)
    assert(r0.getString(0) == "2024-01" && r0.getLong(1) == 0L)
    assert(r0.getLong(2) == 2L && r0.getLong(3) == 2L)        // size, active
    assert(r0.getDouble(4) == 150.0 && r0.getDouble(6) == 75.0)
    val r1 = got(1) // (2024-01, offset 1): cust 1 only
    assert(r1.getLong(3) == 1L && r1.getDouble(4) == 30.0)
    assert(r1.getDouble(5) == 180.0 && r1.getDouble(6) == 90.0)
    val r2 = got(2) // (2024-02, offset 0)
    assert(r2.getString(0) == "2024-02" && r2.getLong(2) == 1L
      && r2.getDouble(6) == 10.0)
  }

  test("join_skew_audit: top keys, shares, and skew ratio vs the mean load") {
    // key 7 -> 6 rows, key 8 -> 3, keys 1..3 -> 1 each; total 12, 5 keys
    val rows = Seq.fill(6)(7L) ++ Seq.fill(3)(8L) ++ Seq(1L, 2L, 3L)
    val li = rows.map(k => (k, 1.0)).toDF("l_partkey", "l_quantity")
    val got = QualityQueries2.joinSkewAuditOf(li).collect()
    assert(got.length == 5)
    val top = got(0)
    assert(top.getLong(0) == 1L && top.getLong(1) == 7L && top.getLong(2) == 6L)
    assert(top.getDouble(3) == 0.5)                           // 6/12
    assert(top.getDouble(5) == 2.5)                           // 6 / (12/5)
    assert(got(1).getLong(1) == 8L && got(1).getDouble(4) == 0.75)
    // ties on cnt=1 break by key: 1, 2, 3
    assert(got.drop(2).map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(got(4).getDouble(4) == 1.0)                        // full mass covered
  }

  test("events_holt: fold equals a local Holt recursion, silent days zero-filled") {
    // one type, days 0..4 with counts 2, 4, 3, 0 (silent day 3!), 5
    val ev = Seq(
      (1L, ts(0), 1L, "click", 1.0, "{}"), (2L, ts(0), 2L, "click", 1.0, "{}"),
      (3L, ts(1), 1L, "click", 1.0, "{}"), (4L, ts(1), 2L, "click", 1.0, "{}"),
      (5L, ts(1), 3L, "click", 1.0, "{}"), (6L, ts(1), 4L, "click", 1.0, "{}"),
      (7L, ts(2), 1L, "click", 1.0, "{}"), (8L, ts(2), 2L, "click", 1.0, "{}"),
      (9L, ts(2), 3L, "click", 1.0, "{}"),
      (10L, ts(4), 1L, "click", 1.0, "{}"), (11L, ts(4), 2L, "click", 1.0, "{}"),
      (12L, ts(4), 3L, "click", 1.0, "{}"), (13L, ts(4), 4L, "click", 1.0, "{}"),
      (14L, ts(4), 5L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = QualityQueries2.eventsHoltOf(ev).collect()
    assert(got.length == 7)
    // local replay: y = [2,4,3,0,5], lvl=2, tr=2; consume y(2)..y(5)
    var (lvl, tr, ae) = (2.0, 2.0, 0.0); var n = 0
    for (y <- Seq(4.0, 3.0, 0.0, 5.0)) {
      val fit = lvl + tr; ae += math.abs(y - fit)
      val lvl2 = 0.3 * y + 0.7 * fit
      tr = 0.1 * (lvl2 - lvl) + 0.9 * tr; lvl = lvl2; n += 1
    }
    val r1 = got(0)
    assert(r1.getLong(1) == 1L)
    assert(math.abs(r1.getDouble(2) - lvl) < 1e-6)
    assert(math.abs(r1.getDouble(3) - tr) < 1e-6)
    assert(math.abs(r1.getDouble(4) - ae / n) < 1e-6)
    assert(math.abs(r1.getDouble(5) - (lvl + tr)) < 1e-6)     // h=1
    val r7 = got(6)
    assert(r7.getLong(1) == 7L
      && math.abs(r7.getDouble(5) - (lvl + 7 * tr)) < 1e-6)
  }

  test("events_holt_winters: fold equals a local seasonal recursion") {
    // one type, 10 days: init week [3,1,4,1,5,9,2], then 6, 5, 3
    val counts = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3)
    val ev = counts.zipWithIndex.flatMap { case (c, d) =>
      (1 to c).map(j => ((d * 100 + j).toLong, ts(d), j.toLong, "click", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = QualityQueries2.eventsHoltWintersOf(ev).collect()
    assert(got.length == 7)
    // local replay (α=.3, β=.1, γ=.2, L=7)
    val ys = counts.map(_.toDouble)
    var lvl = ys.take(7).sum / 7.0; var tr = 0.0
    val s = ys.take(7).map(_ - lvl).toArray
    var ae = 0.0; var cnt = 0
    for (t <- 7 until ys.length) {
      val slot = cnt % 7
      val fitted = lvl + tr + s(slot)
      ae += math.abs(ys(t) - fitted)
      val lvl2 = 0.3 * (ys(t) - s(slot)) + 0.7 * (lvl + tr)
      tr = 0.1 * (lvl2 - lvl) + 0.9 * tr
      s(slot) = 0.2 * (ys(t) - lvl2) + 0.8 * s(slot)
      lvl = lvl2; cnt += 1
    }
    for (h <- 1 to 7) {
      val r = got(h - 1)
      assert(r.getLong(1) == h)
      assert(math.abs(r.getDouble(2) - lvl) < 1e-6)
      assert(math.abs(r.getDouble(3) - tr) < 1e-6)
      assert(math.abs(r.getDouble(4) - ae / cnt) < 1e-6)
      val want = lvl + h * tr + s((ys.length + h - 8) % 7)
      assert(math.abs(r.getDouble(5) - want) < 1e-6, s"h=$h")
    }
  }

  test("events_holt_winters: a 7-day spine has no recursion step and drops") {
    val ev = (0 until 7).map(d =>
      ((d + 1).toLong, ts(d), 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(QualityQueries2.eventsHoltWintersOf(ev).collect().isEmpty)
  }

  test("events_forecast_ensemble: model columns equal the standalone smoothers; blend is convex") {
    // irregular 16-day series so all three models disagree
    val counts = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3)
    val ev = counts.zipWithIndex.flatMap { case (c, d) =>
      (1 to c).map(j => ((d * 100 + j).toLong, ts(d), j.toLong, "click", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ens = QualityQueries2.eventsForecastEnsembleOf(ev).collect()
    val holt = QualityQueries2.eventsHoltOf(ev).collect()
      .map(r => r.getLong(1) -> r.getDouble(5)).toMap
    val hw = QualityQueries2.eventsHoltWintersOf(ev).collect()
      .map(r => r.getLong(1) -> r.getDouble(5)).toMap
    assert(ens.length == 7)
    ens.foreach { r =>
      val h = r.getLong(1)
      assert(r.getDouble(6) == holt(h), s"f_holt at h=$h")  // shared fold
      assert(r.getDouble(7) == hw(h), s"f_hw at h=$h")
      // naive = the count 7 days before the forecast day
      assert(r.getDouble(5) == counts(counts.length - 7 + h.toInt - 1).toDouble)
      // convex: the blend sits inside the model range
      val fs = Seq(r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(r.getDouble(8) >= fs.min - 1e-6 && r.getDouble(8) <= fs.max + 1e-6)
    }
  }

  test("split_signoff: verdict rows equal the standalone audits; pass logic holds") {
    import graft.queries.PipelineQueries
    val dir = "/root/testdata/sf0.001"
    val got = QualityQueries2.splitSignoff(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("balance", "ks", "leakage", "runs"))
    val z = PipelineQueries.splitRunsTest(spark, dir).collect()(0).getDouble(3)
    assert(got("runs").getDouble(1) == math.rint(math.abs(z) * 1e6) / 1e6)
    val ks = PipelineQueries.splitKs(spark, dir).collect()(0)
    assert(got("ks").getDouble(1) == ks.getDouble(2))
    val chi2 = PipelineQueries.splitBalance(spark, dir).collect()
      .map(r => BigDecimal(r.getDouble(4))).sum.toDouble
    assert(math.abs(got("balance").getDouble(1) - chi2) < 1e-6)
    got.values.foreach { r =>
      assert(r.getBoolean(3) == (r.getDouble(1) <= r.getDouble(2)))
    }
  }

  test("events_experiment_report: composition equals its parts; SRM blocks") {
    // balanced variants (users 1..20), variant 1 (odd) far more active in
    // the experiment window -> a real lift readout. Pre-period activity
    // VARIES across users (balanced across variants) so var(x) > 0 and
    // the CUPED-sharpened z_adj path is the one the decision reads —
    // ts() takes DAYS: last day = 42, y-window = days 15..42, x-window
    // = days 0..14
    val ev = (1L to 20L).flatMap { u =>
      val nY = if (u % 2 == 1) 12 else 2       // experiment-window activity
      val nX = if (u % 4 < 2) 2 else 5         // varying pre-period
      (1 to nX).map(j => (u * 1000 + j, ts(j % 3), u, "click", 1.0, "{}")) ++
        (1 to nY).map(j => (u * 1000 + 100 + j, ts(40 + j % 3), u, "click", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val report = QualityQueries2.eventsExperimentReportOf(ev).collect()(0)
    val srm = graft.queries.EventQueries.eventsSrmOf(ev).collect()(0)
    val cuped = graft.queries.EventQueries.eventsCupedOf(ev).collect()(0)
    // the composed row IS its parts
    assert(report.getLong(0) == srm.getLong(0) && report.getLong(1) == srm.getLong(1))
    assert(report.getDouble(2) == srm.getDouble(2)
      && report.getInt(3) == srm.getInt(3))
    assert(report.getDouble(4) == cuped.getAs[Double]("mean_y0")
      && report.getDouble(5) == cuped.getAs[Double]("mean_y1"))
    // balanced split: not blocked; planted lift: decision from the read z
    assert(report.getInt(3) == 0)
    // the varying pre-period makes CUPED non-degenerate: the decision
    // must flow through z_adj, not the raw fallback
    assert(report.getAs[java.lang.Double]("z_adj") != null)
    val z = Option(report.getAs[java.lang.Double]("z_adj"))
      .orElse(Option(report.getAs[java.lang.Double]("z_raw"))).map(_.toDouble)
    val want =
      if (z.exists(_ >= 1.96)) "ship"
      else if (z.exists(_ <= -1.96)) "regressive" else "inconclusive"
    assert(report.getString(12) == want)
    assert(want == "ship") // the planted 12-vs-2 shift must clear 1.96

    // a one-sided enrollment trips the guardrail and blocks the readout
    // regardless of any metric movement (12 one-sided users: chi2 = 12 >
    // 10.83; CUPED's empty-variant metrics go NULL, not divide-by-zero)
    val broken = (2L to 24L by 2).map(u =>
      (u, ts(40), u, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val blocked = QualityQueries2.eventsExperimentReportOf(broken).collect()(0)
    assert(blocked.getInt(3) == 1 && blocked.getString(12) == "blocked_srm")
  }

  test("events_holt: every type steps through the SAME global spine") {
    // type b is absent on the global last day — its series must still
    // include that day as an explicit zero (5 days -> 4 fold steps)
    val ev = Seq(
      (1L, ts(0), 1L, "a", 1.0, "{}"), (2L, ts(4), 1L, "a", 1.0, "{}"),
      (3L, ts(0), 1L, "b", 1.0, "{}"), (4L, ts(2), 1L, "b", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = QualityQueries2.eventsHoltOf(ev)
      .filter($"event_type" === "b" && $"h" === 1).collect()
    // replay for b: y = [1,0,1,0,0], lvl=1, tr=-1
    var (lvl, tr) = (1.0, -1.0)
    for (y <- Seq(0.0, 1.0, 0.0, 0.0)) {
      val fit = lvl + tr
      val lvl2 = 0.3 * y + 0.7 * fit
      tr = 0.1 * (lvl2 - lvl) + 0.9 * tr; lvl = lvl2
    }
    assert(math.abs(got(0).getDouble(5) - (lvl + tr)) < 1e-6)
  }
}
