package graft

import graft.operators.AsOfJoin
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Backward as-of join contracts: latest at-or-before match, inclusive
  * ties, left-outer NULLs, struct-carried payloads (a genuinely-NULL
  * payload field must not be overwritten by an older match), and parity
  * with a brute-force per-row maximum on real data.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks the latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-01 11:00:00"))
    ).toDF("k", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), "a"),
      (1L, ts("2024-01-01 11:30:00"), "b"),
      (2L, ts("2024-01-01 11:00:00"), "c"), // exact tie: inclusive
      (2L, ts("2024-01-01 11:30:00"), "d")  // after left: excluded
    ).toDF("k", "rts", "tag")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("tag"))
      .orderBy("k", "ts").as[(Long, Timestamp, String)].collect().toSeq
    assert(got.map(_._3) == Seq("a", "b", "c"))
  }

  test("left rows with no prior right row get NULL payloads (left-outer)") {
    val left = Seq((1L, ts("2024-01-01 08:00:00"))).toDF("k", "ts")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 5.0)).toDF("k", "rts", "v")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("v"))
    assert(got.count() == 1 && got.where(col("v").isNull).count() == 1)
  }

  test("NULL payload field in the matching row survives (not replaced by older match)") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("k", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Option(7.0)),
      (1L, ts("2024-01-01 11:00:00"), Option.empty[Double]) // newest match, NULL v
    ).toDF("k", "rts", "v")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("rts", "v"))
      .as[(Long, Timestamp, Timestamp, Option[Double])].collect().head
    assert(got._3 == ts("2024-01-01 11:00:00") && got._4.isEmpty)
  }

  test("events purchases↔clicks matches a brute-force max-prior-ts oracle") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val p = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val c = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("click_ts"))
      .agg(count(lit(1)).as("n"))
      .select("user_id", "click_ts")
    val got = AsOfJoin
      .backward(p, c, Seq("user_id"), "ts", "click_ts", Seq("click_ts"))
      .as[(Long, Long, Timestamp, Option[Timestamp])]
      .collect().map(r => (r._1, r._4)).toMap
    val clicks = c.as[(Long, Timestamp)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val want = p.as[(Long, Long, Timestamp)].collect().map { case (id, u, t) =>
      id -> clicks.getOrElse(u, Array.empty[Timestamp])
        .filter(ct => !ct.after(t)).sorted(Ordering[Timestamp].reverse).headOption
    }.toMap
    assert(got == want)
  }
}
