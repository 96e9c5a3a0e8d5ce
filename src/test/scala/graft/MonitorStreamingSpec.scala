package graft

import graft.queries.{EventQueries, PipelineQueries}
import graft.streaming.{StreamingDrift, StreamingEwma}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-incrementality contracts for the monitoring streaming twins:
  * absorbing micro-batches must reproduce the batch operator over the
  * union BIT-FOR-BIT (additive sufficient statistics — counts), including
  * late-arriving rows for already-seen categories/days.
  */
class MonitorStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streaming drift: batched absorption == corpus_drift over the union") {
    val docs = Tables.documents(spark, sf)
    val sd = new StreamingDrift
    // three uneven batches, split by doc_id ranges (order irrelevant)
    Seq(docs.where(col("doc_id") % 3 === 2), docs.where(col("doc_id") % 3 === 0),
      docs.where(col("doc_id") % 3 === 1)).foreach(sd.processBatch)
    val want = PipelineQueries.corpusDriftOf(docs)
      .as[(String, String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(sd.report() == want)
  }

  test("streaming manifest: batched absorption == corpus_manifest over the union") {
    val docs = Tables.documents(spark, sf)
    val sm = new graft.streaming.StreamingManifest
    Seq(docs.where(col("doc_id") % 3 === 1), docs.where(col("doc_id") % 3 === 0),
      docs.where(col("doc_id") % 3 === 2)).foreach(sm.processBatch)
    val want = PipelineQueries.corpusManifestOf(docs)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(sm.report() == want)
  }

  test("streaming wau: per-day sketch unions track the exact windowed count") {
    val ev = Tables.events(spark, sf)
    val sw = new graft.streaming.StreamingWau
    // batch 2 delivers LATE rows for days batch 1 already saw
    Seq(ev.where(col("event_id") % 2 === 0), ev.where(col("event_id") % 2 === 1))
      .foreach(sw.processBatch)
    val exact = graft.queries.EventQueries.eventsDauOf(ev)
      .select("day", "wau").as[(java.sql.Date, Long)].collect()
      .map { case (d, w) => d.toString -> w }.toMap
    val got = sw.report().map { case (d, e) => d.toString -> e }.toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (d, est) =>
      val ex = exact(d).toDouble
      assert(math.abs(est - ex) / ex <= 0.05, s"$d est=$est exact=$ex")
    }
  }

  test("streaming ewma: batched absorption == events_ewma over the union, late rows exact") {
    val ev = Tables.events(spark, sf)
    val se = new StreamingEwma
    // batch 2 delivers LATE rows for days batch 1 already saw — the
    // additive state absorbs them exactly, no approximation
    Seq(ev.where(col("event_id") % 2 === 0), ev.where(col("event_id") % 2 === 1))
      .foreach(se.processBatch)
    val want = EventQueries.eventsEwmaOf(ev)
      .as[(String, java.sql.Date, Long, Long, Double)].collect().toSeq
    assert(se.report() == want)
  }

  test("streaming hourly: batched absorption == events_hourly over the union") {
    val ev = Tables.events(spark, sf)
    val sh = new graft.streaming.StreamingHourly
    Seq(ev.where(col("event_id") % 3 === 2), ev.where(col("event_id") % 3 === 0),
      ev.where(col("event_id") % 3 === 1)).foreach(sh.processBatch)
    val want = EventQueries.eventsHourlyOf(ev)
      .as[(Int, Int, Long, Double)].collect().toSeq
    assert(sh.report() == want)
  }

  test("streaming burstiness: batched absorption == events_burstiness, late rows exact") {
    val ev = Tables.events(spark, sf)
    val sb = new graft.streaming.StreamingBurstiness
    // late-arrival shape: the middle batch revisits days the first touched
    Seq(ev.where(col("event_id") % 3 === 0), ev.where(col("event_id") % 3 === 1),
      ev.where(col("event_id") % 3 === 2)).foreach(sb.processBatch)
    val want = EventQueries.eventsBurstinessOf(ev)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(sb.report() == want)
  }

  test("streaming changepoint: batched absorption == events_changepoint, late rows exact") {
    val ev = Tables.events(spark, sf)
    val sc = new graft.streaming.StreamingChangepoint
    // batch 2/3 deliver LATE rows for days batch 1 already saw — daily
    // counts are the additive sufficient statistic, absorption is exact
    Seq(ev.where(col("event_id") % 3 === 2), ev.where(col("event_id") % 3 === 0),
      ev.where(col("event_id") % 3 === 1)).foreach(sc.processBatch)
    val want = EventQueries.eventsChangepointOf(ev)
      .as[(String, java.sql.Date, Double, Double, Option[Double])].collect().toSeq
    assert(sc.report() == want)
  }

  test("streaming backtest: batched absorption == events_backtest, late rows exact") {
    val ev = Tables.events(spark, sf)
    val sb = new graft.streaming.StreamingBacktest
    Seq(ev.where(col("event_id") % 3 === 1), ev.where(col("event_id") % 3 === 2),
      ev.where(col("event_id") % 3 === 0)).foreach(sb.processBatch)
    val want = EventQueries.eventsBacktestOf(ev)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(sb.report() == want)
  }

  test("streaming root-cause: absorption == events_root_cause, incl. horizon-shifting late rows") {
    val ev = Tables.events(spark, sf)
    val sr = new graft.streaming.StreamingRootCause
    // the LAST batch delivers the newest rows: until it arrives the
    // report's 28-day windows sit on an EARLIER horizon — the late batch
    // shifts both windows, and absorption must still equal batch
    val lastDay = ev.agg(max(to_date(col("ts")))).first().getDate(0)
    val cut = java.sql.Date.valueOf(lastDay.toLocalDate.minusDays(7))
    Seq(ev.where(to_date(col("ts")) <= cut && col("event_id") % 2 === 0),
      ev.where(to_date(col("ts")) <= cut && col("event_id") % 2 === 1),
      ev.where(to_date(col("ts")) > cut)).foreach(sr.processBatch)
    val want = EventQueries.eventsRootCauseOf(ev)
      .as[(String, String, Long, Long, Long, Option[Double], Double)].collect().toSeq
    assert(sr.report() == want)
  }

  test("wau window arithmetic is DST-safe (the round-12 advice fix)") {
    // In a DST zone, local midnights 7 calendar days apart across the
    // spring-forward are 167h apart: millis/86400000 floors to 6 and
    // would wrongly admit the 8th day into a trailing-7 window. The
    // calendar-day arithmetic the fix switched to gives 7.
    val tz = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("America/New_York"))
      val before = java.sql.Date.valueOf("2024-03-04") // 7 days pre  2024-03-11
      val after = java.sql.Date.valueOf("2024-03-11")  // DST jump on 03-10
      assert((after.getTime - before.getTime) / 86400000L == 6) // the trap
      assert(java.time.temporal.ChronoUnit.DAYS.between(
        before.toLocalDate, after.toLocalDate) == 7)            // the fix
    } finally java.util.TimeZone.setDefault(tz)
  }
}
