package graft

import graft.queries.QualityQueries2
import graft.streaming.StreamingForecast
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The forecast-ensemble streaming twin's absorption contract: batched and
  * late delivery replays to exactly the batch operator — including a late
  * batch that EXTENDS the horizon and thereby moves every model's training
  * window and seasonal phase.
  */
class ForecastStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def batchWant(df: org.apache.spark.sql.DataFrame) =
    QualityQueries2.eventsForecastEnsembleOf(df)
      .as[(String, Long, Double, Double, Double, Double, Double, Double, Double)]
      .collect().toSeq

  test("streaming forecast: batched absorption == events_forecast_ensemble") {
    val ev = Tables.events(spark, sf)
    val sfc = new StreamingForecast
    Seq(ev.where(col("event_id") % 3 === 2), ev.where(col("event_id") % 3 === 0),
      ev.where(col("event_id") % 3 === 1)).foreach(sfc.processBatch)
    assert(sfc.report() == batchWant(ev))
  }

  test("streaming forecast: a horizon-extending late batch re-forecasts exactly") {
    val ev = Tables.events(spark, sf)
    val lastDay = ev.agg(max(to_date(col("ts")))).first().getDate(0)
    val cut = java.sql.Date.valueOf(lastDay.toLocalDate.minusDays(5))
    val early = ev.where(to_date(col("ts")) <= cut)
    val late = ev.where(to_date(col("ts")) > cut)
    val sfc = new StreamingForecast
    sfc.processBatch(early)
    // before the late batch, the report forecasts from the SHORTER horizon
    assert(sfc.report() == batchWant(early))
    sfc.processBatch(late)
    // the late batch shifts every window and seasonal phase; absorption
    // still equals batch bit-for-bit
    assert(sfc.report() == batchWant(ev))
  }

  test("streaming forecast: spine walk is DST-safe (the round-14 advice fix)") {
    // Under a DST-observing default TZ, java.sql.Date local midnights are
    // not uniformly 24h apart: stepping epoch millis in fixed 86400000L
    // increments drifts off midnight after the 2024-03-10 spring-forward,
    // so a millis-keyed lookup zero-fills real days. The fix keys state by
    // LocalDate and walks the spine in epoch DAYS. First pin the raw trap,
    // then the functional contract across the transition.
    val tz = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("America/New_York"))
      val pre = java.sql.Date.valueOf("2024-03-09")
      val post = java.sql.Date.valueOf("2024-03-11")
      // the trap: +2 millis-days from 03-09 00:00 EST lands at 03-10 23:00
      // EDT, NOT 03-11 00:00 — millis-equality lookup misses the real day
      assert(new java.sql.Date(pre.getTime + 2 * 86400000L) != post)
      assert(java.time.temporal.ChronoUnit.DAYS.between(
        pre.toLocalDate, post.toLocalDate) == 2) // the fix's arithmetic
      // functional: 15 days straddling the spring-forward, varying counts
      val rows = for {
        d <- 0 until 15
        ti <- 0 until 2
        _ <- 0 until ((d * 7 + ti * 3) % 5 + 1)
      } yield (s"t$ti", new java.sql.Timestamp(
        java.time.Instant.parse("2024-03-01T12:00:00Z")
          .plus(java.time.Duration.ofDays(d)).toEpochMilli))
      val ev = rows.toDF("event_type", "ts")
      val sfc = new StreamingForecast
      sfc.processBatch(ev.where(col("ts") < lit("2024-03-10")))
      sfc.processBatch(ev.where(col("ts") >= lit("2024-03-10")))
      assert(sfc.report() == batchWant(ev))
    } finally java.util.TimeZone.setDefault(tz)
  }
}
