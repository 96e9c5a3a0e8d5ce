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
}
