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

  test("toleranceUs: a stale match degrades to NULL, an in-window one survives") {
    val left = Seq(
      (1L, ts("2024-01-01 12:00:00")),  // match 2h old → out of 1h window
      (2L, ts("2024-01-01 12:00:00"))   // match 30min old → in window
    ).toDF("k", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), "stale"),
      (2L, ts("2024-01-01 11:30:00"), "fresh")
    ).toDF("k", "rts", "tag")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("tag"),
        toleranceUs = Some(3600L * 1000000))
      .orderBy("k").as[(Long, Timestamp, Option[String])].collect().toSeq
    assert(got.map(_._3) == Seq(None, Some("fresh")))
  }

  test("forward picks the EARLIEST right row at-or-after, NULL when none follows") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 13:00:00"))   // nothing at-or-after
    ).toDF("k", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), "past"),
      (1L, ts("2024-01-01 10:00:00"), "now"),   // exact tie: inclusive
      (1L, ts("2024-01-01 11:00:00"), "later")
    ).toDF("k", "rts", "tag")
    val got = AsOfJoin.forward(left, right, Seq("k"), "ts", "rts", Seq("tag"))
      .orderBy("ts").as[(Long, Timestamp, Option[String])].collect().toSeq
    assert(got.map(_._3) == Seq(Some("now"), None))
  }

  test("randomized parity with a brute-force oracle (both directions, tolerance)") {
    val rng = new scala.util.Random(7)
    val leftRows = Seq.tabulate(200)(i =>
      (i.toLong, rng.nextInt(5).toLong, ts("2024-01-01 00:00:00").getTime + rng.nextInt(100000) * 1000L))
    val rightRows = Seq.tabulate(150)(i =>
      (rng.nextInt(5).toLong, ts("2024-01-01 00:00:00").getTime + rng.nextInt(100000) * 1000L, i.toDouble))
      .distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (k, ts)
    val left = leftRows.map { case (id, k, ms) => (id, k, new Timestamp(ms)) }.toDF("id", "k", "ts")
    val right = rightRows.map { case (k, ms, v) => (k, new Timestamp(ms), v) }.toDF("k", "rts", "v")
    val tol = 30000L * 1000 // 30 s in µs
    def oracle(fwd: Boolean): Map[Long, Option[Double]] = {
      val byKey = rightRows.groupBy(_._1)
      leftRows.map { case (id, k, ms) =>
        val cands = byKey.getOrElse(k, Seq.empty)
          .filter(r => if (fwd) r._2 >= ms else r._2 <= ms)
          .filter(r => math.abs(r._2 - ms) * 1000 <= tol)
        id -> (if (cands.isEmpty) None
               else Some((if (fwd) cands.minBy(_._2) else cands.maxBy(_._2))._3))
      }.toMap
    }
    def run(fwd: Boolean): Map[Long, Option[Double]] = {
      val df = if (fwd) AsOfJoin.forward(left, right, Seq("k"), "ts", "rts", Seq("v"), Some(tol))
               else AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("v"), Some(tol))
      df.select("id", "v").as[(Long, Option[Double])].collect().toMap
    }
    assert(run(fwd = false) == oracle(fwd = false))
    assert(run(fwd = true) == oracle(fwd = true))
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
