package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2 #34–35: event-stream analytics in batch form — the exact
  * twins of the Structured Streaming versions in graft.streaming (same
  * window / gap semantics), so streaming results can be validated against
  * these oracle-checked batch plans.
  */
object EventQueries {

  private def dec6(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")

  /** #34 tumbling 1-hour window counts/sums per event type. Uses Spark's
    * `window()` — the same operator the streaming twin uses — and one
    * map-side-combined aggregate. */
  def eventsWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec6(col("value"))).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  val eventsWindowSql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** #35 gap-based sessionization (30-min inactivity): lag + running sum
    * assigns session ids, then one aggregate to session grain. The only
    * shuffle is the hash partition by user_id the window needs; gap
    * comparison is exact integer microseconds on both engines. */
  def eventsSession(s: SparkSession, d: String): DataFrame = {
    val GapUs = 30L * 60 * 1000000
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > GapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(dec6(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("sid"))
  }

  val eventsSessionSql: String =
    """WITH x AS (
      |  SELECT user_id, event_id, ts, value,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |  FROM events),
      |y AS (
      |  SELECT *, CASE WHEN prev_us IS NULL
      |                   OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM x),
      |z AS (
      |  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM y)
      |SELECT user_id, sid, min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM z GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin

  /** #53 ordered conversion funnel: per user, first view → first click
    * within 24h at-or-after that view → first purchase within 24h
    * at-or-after that click; one summary row of stage counts. Each stage
    * is a filter + aggregate + equi-join on user_id — the SAME shuffle
    * key reused stage to stage, so at scale the exchanges line up; no
    * window sort, no per-user event-sequence materialization (the
    * classic funnel shape that survives billions of events/user-day).
    * Window comparison is exact integer microseconds on both engines. */
  def eventsFunnel(s: SparkSession, d: String): DataFrame = {
    val WinUs = 24L * 3600 * 1000000
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val c = ev.where(col("event_type") === "click").join(v, "user_id")
      .where(col("ts") >= col("t_view") &&
        unix_micros(col("ts")) - unix_micros(col("t_view")) <= WinUs)
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val p = ev.where(col("event_type") === "purchase").join(c, "user_id")
      .where(col("ts") >= col("t_click") &&
        unix_micros(col("ts")) - unix_micros(col("t_click")) <= WinUs)
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    v.agg(count(lit(1)).as("viewers"))
      .crossJoin(c.agg(count(lit(1)).as("clickers_24h")))
      .crossJoin(p.agg(count(lit(1)).as("buyers_24h")))
  }

  val eventsFunnelSql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t_click FROM events e
      |  JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts >= v.t_view
      |    AND epoch_us(e.ts) - epoch_us(v.t_view) <= 86400000000
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
      |  JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
      |    AND epoch_us(e.ts) - epoch_us(c.t_click) <= 86400000000
      |  GROUP BY e.user_id)
      |SELECT (SELECT count(*) FROM v) AS viewers,
      |       (SELECT count(*) FROM c) AS clickers_24h,
      |       (SELECT count(*) FROM p) AS buyers_24h""".stripMargin

  /** #64 D1 retention cohorts: per first-seen day, how many users came
    * back the NEXT day. Shuffle shape: one distinct on (user, day), one
    * aggregate + self-join on user_id (the reused key), then tiny
    * cohort-grain aggregates — no per-user event sequences, no window
    * sort; exact timestamp arithmetic on both engines. */
  def eventsRetention(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .distinct()
    val first = ud.groupBy("user_id").agg(min("day").as("cohort"))
    val returned = first.join(ud, "user_id")
      .where(col("day") === col("cohort") + expr("INTERVAL 1 DAY"))
      .groupBy("cohort").agg(count_distinct(col("user_id")).as("d1_returned"))
    first.groupBy("cohort").agg(count(lit(1)).as("cohort_users"))
      .join(returned, Seq("cohort"), "left")
      .select(col("cohort"), col("cohort_users"),
        coalesce(col("d1_returned"), lit(0L)).as("d1_returned"),
        round(coalesce(col("d1_returned"), lit(0L)) / col("cohort_users").cast("double"), 6)
          .as("d1_rate"))
      .orderBy("cohort")
  }

  val eventsRetentionSql: String =
    """WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
      |f AS (SELECT user_id, min(day) AS cohort FROM ud GROUP BY user_id),
      |r AS (SELECT f.cohort, count(DISTINCT ud.user_id) AS d1_returned
      |      FROM f JOIN ud ON f.user_id = ud.user_id
      |                    AND ud.day = f.cohort + INTERVAL 1 DAY
      |      GROUP BY f.cohort),
      |c AS (SELECT cohort, count(*) AS cohort_users FROM f GROUP BY cohort)
      |SELECT c.cohort, c.cohort_users,
      |  CAST(coalesce(r.d1_returned, 0) AS BIGINT) AS d1_returned,
      |  round(coalesce(r.d1_returned, 0) / CAST(c.cohort_users AS DOUBLE), 6) AS d1_rate
      |FROM c LEFT JOIN r USING (cohort) ORDER BY cohort""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_window" -> (eventsWindow _),
    "events_session" -> (eventsSession _),
    "events_funnel" -> (eventsFunnel _),
    "events_retention" -> (eventsRetention _)
  )

  val oracles: Map[String, String] = Map(
    "events_window" -> eventsWindowSql,
    "events_session" -> eventsSessionSql,
    "events_funnel" -> eventsFunnelSql,
    "events_retention" -> eventsRetentionSql
  )
}
