package graft

import graft.queries.QualityQueries
import graft.streaming.StreamingScd2
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SCD2 streaming twin's absorption contract: batched/late/duplicate
  * delivery replays to exactly the batch operator's intervals — including
  * a late row that retroactively flips an already-reported day's tier.
  */
class Scd2StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def batchWant(df: org.apache.spark.sql.DataFrame) =
    QualityQueries.scd2EventsOf(df)
      .as[(Long, Long, java.sql.Date, java.sql.Date, Long, Boolean)]
      .collect().toSeq

  test("streaming scd2: batched absorption == scd2_events, late rows exact") {
    val ev = Tables.events(spark, sf)
    val sc = new StreamingScd2
    // batches 2/3 deliver LATE rows for days batch 1 already saw; the
    // merge is idempotent, so re-delivering batch 2 must change nothing
    val b2 = ev.where(col("event_id") % 3 === 0)
    Seq(ev.where(col("event_id") % 3 === 2), b2,
      ev.where(col("event_id") % 3 === 1), b2).foreach(sc.processBatch)
    assert(sc.report() == batchWant(ev))
  }

  test("streaming scd2: a late row retroactively flips a day's tier and re-islands") {
    def ts(day: Int, min: Int) =
      new Timestamp(1700000000000L + day * 86400000L + min * 60000L)
    def row(id: Long, day: Int, min: Int, k: Int) =
      (id, ts(day, min), 1L, "click", 1.0, s"""{"k": $k}""")
    // batch 1: days 0..2 all tier 0 -> one island
    val b1 = Seq(row(1, 0, 0, 5), row(2, 1, 0, 7), row(3, 2, 0, 9))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // batch 2 (late): a LATER event on day 1 with tier 3 — the day-1
    // winner flips, splitting the island into three intervals
    val b2 = Seq(row(4, 1, 30, 80))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val sc = new StreamingScd2
    sc.processBatch(b1)
    assert(sc.report().map(_._2) == Seq(0L))          // one tier-0 island
    sc.processBatch(b2)
    val got = sc.report()
    assert(got.map(_._2) == Seq(0L, 3L, 0L))          // split
    assert(got.map(_._6) == Seq(false, false, true))
    assert(got == batchWant(b1.unionByName(b2)))
  }

  test("streaming scd2: (ts, event_id) ties break on tier, arrival-order-proof") {
    // duplicate delivery with mutated props: same (ts, event_id), different
    // tier. The batch operator's max(struct(ts, event_id, tier)) keeps the
    // HIGHER tier; the driver merge must compare the full triple (the
    // round-14 advice fix), not keep first-seen, so either arrival order
    // converges to the batch answer.
    def ts(day: Int) = new Timestamp(1700000000000L + day * 86400000L)
    def mk(k: Int) = Seq((1L, ts(0), 1L, "click", 1.0, s"""{"k": $k}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val (lo, hi) = (mk(5), mk(80)) // tier 0 vs tier 3, identical (ts, id)
    val want = batchWant(lo.unionByName(hi))
    assert(want.map(_._2) == Seq(3L)) // batch keeps the tier-3 winner
    for ((order, i) <- Seq(Seq(lo, hi), Seq(hi, lo)).zipWithIndex) {
      val sc = new StreamingScd2
      order.foreach(sc.processBatch)
      assert(sc.report() == want, s"arrival order #$i")
    }
  }
}
