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

  /** #66 as-of attribution join: every purchase matched to the latest
    * click at-or-before it by the same user (graft.operators.AsOfJoin —
    * one key shuffle + sort, no pair explosion; DuckDB ASOF JOIN is the
    * oracle). Clicks are pre-aggregated to one row per (user, ts) so the
    * same-ts winner is well-defined in both engines. */
  def eventsAsof(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("click_ts"))
      .agg(max(col("value")).as("click_value"))
    graft.operators.AsOfJoin
      .backward(purchases, clicks, Seq("user_id"), "ts", "click_ts",
        Seq("click_ts", "click_value"))
      .orderBy("event_id")
  }

  val eventsAsofSql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, ts, value FROM events
      |  WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, ts AS click_ts, max(value) AS click_value
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT p.event_id, p.user_id, p.ts, p.value, c.click_ts, c.click_value
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
      |ORDER BY p.event_id""".stripMargin

  /** #67 rolling 7-day window per event type: range frame over integer
    * day numbers (exact on both engines), on top of a day-grain
    * pre-aggregate — the window input is |types|×|days| rows however
    * large the raw stream is, so the sort inside each type partition is
    * trivial at any scale. DECIMAL sums through the frame. */
  def eventsRolling(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"), sum(dec6(col("value"))).as("sv"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy("event_type").orderBy("day_num").rangeBetween(-6, 0)
    daily
      .withColumn("roll_events", sum(col("n_events")).over(w))
      .withColumn("roll_value", sum(col("sv")).over(w).cast("double"))
      .select(col("day"), col("event_type"), col("n_events"),
        col("sv").cast("double").as("sum_value"), col("roll_events"), col("roll_value"))
      .orderBy("day", "event_type")
  }

  val eventsRollingSql: String =
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n_events,
      |    sum(CAST(value AS DECIMAL(18,6))) AS sv
      |  FROM events GROUP BY 1, 2)
      |SELECT day, event_type, n_events, CAST(sv AS DOUBLE) AS sum_value,
      |  CAST(sum(n_events) OVER w AS BIGINT) AS roll_events,
      |  CAST(sum(sv) OVER w AS DOUBLE) AS roll_value
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type
      |  ORDER BY date_diff('day', DATE '1970-01-01', CAST(day AS DATE))
      |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY day, event_type""".stripMargin

  /** #68 day × event-type count matrix via the pivot operator (explicit
    * value list — no extra distinct pass; one shuffle on the day key). */
  def eventsPivot(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = Tables.events(s, d)
      .groupBy(date_trunc("DAY", col("ts")).as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    types.foldLeft(p)((df, t) =>
        df.withColumn(s"n_$t", coalesce(col(t), lit(0L))).drop(t))
      .orderBy("day")
  }

  val eventsPivotSql: String =
    """SELECT date_trunc('day', ts) AS day,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  /** #69 DAU/WAU: exact distinct users per day, and per 7-day trailing
    * window. WAU is NOT window-decomposable (distinct doesn't sum), so
    * the scalable exact shape is contribution expansion: each (user, day)
    * contributes to the 7 days it covers, then one distinct count per
    * day — shuffle volume 7×|user-days|, never a range self-join. The
    * HLL sketch alternative (approx_count_distinct within 5%) is asserted
    * in RelationalQueriesSpec, not here (its estimate is engine-specific
    * so it can't face a DuckDB oracle). */
  def eventsUniques(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .distinct()
    val bounds = ud.agg(max("day").as("hi"))
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .withColumn("d", explode(sequence(
        col("day"), col("day") + expr("INTERVAL 6 DAY"), expr("INTERVAL 1 DAY"))))
      .crossJoin(broadcast(bounds))
      .where(col("d") <= col("hi"))
      .groupBy(col("d").as("day"))
      .agg(count_distinct(col("user_id")).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"))
      .orderBy("day")
  }

  val eventsUniquesSql: String =
    """WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
      |b AS (SELECT max(day) AS hi FROM ud),
      |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
      |w AS (
      |  SELECT user_id, unnest(generate_series(day, day + INTERVAL 6 DAY,
      |    INTERVAL 1 DAY)) AS d
      |  FROM ud),
      |wau AS (
      |  SELECT d AS day, count(DISTINCT user_id) AS wau FROM w, b
      |  WHERE d <= b.hi GROUP BY d)
      |SELECT day, dau, CAST(wau AS BIGINT) AS wau
      |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin

  /** #73 volume-anomaly days: per event type, days whose daily count is
    * ≥2 sample standard deviations from that type's mean. Moments are
    * EXACT integer sums (n, Σx, Σx²) so both engines derive the identical
    * doubles — stddev_samp's engine-specific summation order never enters.
    * Shape: day-grain pre-agg, one tiny per-type aggregate, broadcast
    * join back — raw events are touched once. */
  def eventsAnomaly(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("n_events")).as("s1"),
        sum(col("n_events") * col("n_events")).as("s2"))
      .where(col("n_days") > 1)
      .select(col("event_type"),
        (col("s1").cast("double") / col("n_days")).as("mean_n"),
        sqrt((col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("n_days"))
          / (col("n_days") - 1)).as("sd_n"))
    daily.join(broadcast(stats), "event_type")
      .withColumn("z", round((col("n_events") - col("mean_n")) / col("sd_n"), 6))
      .where(abs(col("z")) >= 2.0)
      .select(col("event_type"), col("day"), col("n_events"), col("z"))
      .orderBy("event_type", "day")
  }

  val eventsAnomalySql: String =
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type,
      |    CAST(sum(n_events) AS DOUBLE) / count(*) AS mean_n,
      |    sqrt((CAST(sum(n_events * n_events) AS DOUBLE)
      |          - CAST(sum(n_events) AS DOUBLE) * sum(n_events) / count(*))
      |         / (count(*) - 1)) AS sd_n
      |  FROM daily GROUP BY event_type HAVING count(*) > 1)
      |SELECT d.event_type, d.day, d.n_events,
      |  round((d.n_events - s.mean_n) / s.sd_n, 6) AS z
      |FROM daily d JOIN stats s USING (event_type)
      |WHERE abs(round((d.n_events - s.mean_n) / s.sd_n, 6)) >= 2.0
      |ORDER BY event_type, day""".stripMargin

  /** #80 top 3-step behavioral paths: each user's event stream (totally
    * ordered by ts with event_id as the unique tie-break) yields one
    * overlapping trigram per event via two lead() windows — no sequence
    * materialization, no self-join; state per partition is two rows of
    * lookahead. One user_id shuffle + a map-side-combined count, then
    * TakeOrdered top-20. The sequence-mining shape that scales: windows
    * over (user, time), never collect_list of a user's history. */
  def eventsPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .where(col("event_type").isNotNull)
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .where(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("path"))
      .limit(20)
  }

  val eventsPathsSql: String =
    """WITH t AS (
      |  SELECT event_type,
      |    lead(event_type, 1) OVER w AS e2,
      |    lead(event_type, 2) OVER w AS e3
      |  FROM events WHERE event_type IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
      |FROM t WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin

  /** #86 value histogram per event type: fixed-width bins (width 50) via
    * a pure projection (`floor(value/width)`) + one map-side-combined
    * count — the profiling primitive for numeric columns. No
    * value-range discovery pass: the bin function is data-independent,
    * so one scan + one small shuffle at any scale. min/max per bin ride
    * in the same aggregate (order-insensitive, no summation drift). */
  def eventsHistogram(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .where(col("value").isNotNull)
      .select(col("event_type"), floor(col("value") / 50.0).cast("long").as("bin"), col("value"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"),
           min(col("value")).as("min_v"),
           max(col("value")).as("max_v"))
      .select(col("event_type"), col("bin"), (col("bin") * 50.0).as("bin_lo"),
        col("n"), col("min_v"), col("max_v"))
      .orderBy(col("event_type"), col("bin"))

  val eventsHistogramSql: String =
    """SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS bin,
      |  CAST(floor(value / 50.0) AS BIGINT) * 50.0 AS bin_lo,
      |  count(*) AS n, min(value) AS min_v, max(value) AS max_v
      |FROM events WHERE value IS NOT NULL
      |GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin

  /** #121 events_markov: first-order transition matrix over per-user
    * event streams — the behavioral-model primitive behind events_paths'
    * raw path counts: P(next | current) per ordered pair. Shapes: ONE
    * lead() window over the (ts, event_id)-ordered user partition (the
    * events_paths shuffle), one map-side-combined pair count, and the
    * per-source normalization as a window over the SMALL (types²) count
    * table — never a second pass over events. Counts are exact integers;
    * the probability is one rounded division, so the compare is exact. */
  def eventsMarkov(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, d)
      .where(col("event_type").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .where(col("dst").isNotNull)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy("src")), 6))
      .orderBy(col("src"), col("dst"))
  }

  val eventsMarkovSql: String =
    """WITH t AS (
      |  SELECT event_type AS src,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      |  FROM events WHERE event_type IS NOT NULL),
      |c AS (SELECT src, dst, count(*) AS n FROM t WHERE dst IS NOT NULL
      |      GROUP BY src, dst)
      |SELECT src, dst, n,
      |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src), 6) AS p
      |FROM c ORDER BY src, dst""".stripMargin

  /** #134 events_quantiles: EXACT interpolated percentiles (p50/p90/p99 of
    * `value` per event type) by distributed rank selection — the shape that
    * survives 100 TB. Spark's `percentile` aggregate buffers every value of
    * a group in one aggregation buffer (fine at sf0.01, OOM at a trillion
    * rows); here the only state is a sort within the hash partition: ONE
    * row_number window ranks each group, each requested p needs just the
    * rows at ranks floor/ceil of p·(n−1), and the interpolation
    * vlo + (vhi−vlo)·frac is a single rounded expression — verified
    * bit-identical to DuckDB's quantile_cont at 6 decimals. The 3-row
    * quantile list is broadcast; the post-window filter keeps ≤ 6 rows per
    * group, so the second aggregate is negligible. Skewed event types cost
    * a big sorted partition, exactly what a range-partitioned sort absorbs
    * on a real cluster. */
  def eventsQuantiles(s: SparkSession, d: String): DataFrame =
    graft.operators.Quantiles.perGroup(
      Tables.events(s, d).select(col("event_type"), col("value")),
      "event_type", "value", Seq(0.5, 0.9, 0.99))

  /** quantile_cont demands a constant fraction, hence the UNION ALL. */
  val eventsQuantilesSql: String =
    Seq(0.5, 0.9, 0.99).map(p =>
      s"""SELECT event_type, CAST($p AS DOUBLE) AS p, round(quantile_cont(value, $p), 6) AS q
         |FROM events WHERE value IS NOT NULL GROUP BY event_type""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY event_type, p")

  /** #140 events_heavy: exact top-20 users by event count through the
    * Misra–Gries candidates → exact-recount → certify pipeline
    * (HeavyHitters doc) — the shape that ranks the top of a
    * billion-cardinality key space while shuffling only O(partitions ×
    * capacity) sketch rows plus a broadcast-pruned recount. The result is
    * exact by construction (certified or fallback), so it faces a plain
    * GROUP BY oracle. */
  def eventsHeavy(s: SparkSession, d: String): DataFrame =
    graft.operators.HeavyHitters.topK(
      Tables.events(s, d), "user_id", k = 20)
      .select(col("value").as("user_id"), col("n").as("n_events"), col("rk"))

  val eventsHeavySql: String =
    """WITH c AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
      |r AS (SELECT *, CAST(row_number() OVER (ORDER BY n_events DESC, user_id) AS INT) AS rk
      |      FROM c)
      |SELECT user_id, n_events, rk FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin

  /** #142 events_anomaly_mad: the ROBUST twin of #73 — modified z-score
    * 0.6745·(x−median)/MAD (Iglewicz–Hoaglin), which a single extreme day
    * cannot distort the way it inflates a stddev (the classic failure of
    * z-score anomaly detection: the outlier masks itself). Shape: the
    * same single day-grain pre-agg; median and MAD are percentile
    * aggregates over the SMALL per-type day table (days-per-type grain —
    * bounded state, unlike value-grain percentile at corpus scale, where
    * events_quantiles' rank-selection is the shape), broadcast back.
    * Interpolated medians are engine-identical (events_quantiles parity),
    * so the compare is exact at 6 dp. MAD=0 types (>half the days at the
    * median count) are excluded — the standard MAD caveat, made explicit. */
  def eventsAnomalyMad(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val med = daily.groupBy("event_type")
      .agg(expr("percentile(n, 0.5)").as("med"))
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("delta", col("n") - col("med"))
      .withColumn("adev", abs(col("delta")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .where(col("mad") > 0)
      .withColumn("rz", round(lit(0.6745) * col("delta") / col("mad"), 6))
      .where(abs(col("rz")) >= 2.0)
      .select(col("event_type"), col("day"), col("n"), col("rz"))
      .orderBy("event_type", "day")
  }

  val eventsAnomalyMadSql: String =
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |med AS (SELECT event_type, quantile_cont(n, 0.5) AS med FROM daily GROUP BY 1),
      |dev AS (
      |  SELECT d.event_type, d.day, d.n, d.n - m.med AS delta, abs(d.n - m.med) AS adev
      |  FROM daily d JOIN med m USING (event_type)),
      |mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1)
      |SELECT v.event_type, v.day, v.n, round(0.6745 * v.delta / m.mad, 6) AS rz
      |FROM dev v JOIN mad m USING (event_type)
      |WHERE m.mad > 0 AND abs(round(0.6745 * v.delta / m.mad, 6)) >= 2.0
      |ORDER BY event_type, day""".stripMargin

  /** #145 events_uniques_approx: the HLL sketch path of #69 registered as
    * a first-class query — at 100 TB the exact WAU contribution-expansion
    * shuffle (7×|user-days|) is the cost you pay for exactness;
    * approx_count_distinct's HyperLogLog++ sketch aggregates in O(sketch)
    * per group with NO distinct shuffle, the standard trade for
    * dashboard-grade uniques. Reports exact next to approx with the
    * relative error, so the trade is visible in the result itself.
    * Rows-only (the HLL estimate is engine-specific by nature); the ≤5%
    * rsd=0.02 contract is spec-asserted in RelationalQueriesSpec. */
  def eventsUniquesApprox(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(count_distinct(col("user_id")).as("dau_exact"),
        approx_count_distinct(col("user_id"), 0.02).as("dau_approx"))
      .withColumn("rel_err", round(
        abs(col("dau_approx") - col("dau_exact")) / col("dau_exact"), 6))
      .orderBy("day")

  /** #160 events_quantiles_approx: the SKETCH path of #134 registered
    * first-class next to the exact answer (the events_uniques_approx
    * symmetry for quantiles): percentile_approx (Spark's space-bounded
    * rank sketch, accuracy 1e4 → rank error ≤ 1/1e4) per event type with
    * the absolute error IN the result. At 100 TB the sketch carries O(1/ε)
    * state per group through a map-side-combined aggregate — no per-group
    * sort, the dashboard trade made visible. Rows-only by nature
    * (sketch is engine-specific); error-bound contract spec-pinned. */
  def eventsQuantilesApprox(s: SparkSession, d: String): DataFrame = {
    val ps = Seq(0.5, 0.9, 0.99)
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("value"))
      .where(col("value").isNotNull)
    val approx = ev.groupBy("event_type")
      .agg(percentile_approx(col("value"), typedlit(ps), lit(10000)).as("qa"))
      .select(col("event_type"), posexplode(col("qa")).as(Seq("i", "q_approx")))
      .withColumn("p", element_at(typedlit(ps), col("i") + 1))
      .drop("i")
    graft.operators.Quantiles.perGroup(ev, "event_type", "value", ps)
      .withColumnRenamed("q", "q_exact")
      .join(approx, Seq("event_type", "p"))
      .withColumn("q_approx", round(col("q_approx"), 6))
      .withColumn("abs_err", round(abs(col("q_approx") - col("q_exact")), 6))
      .select("event_type", "p", "q_exact", "q_approx", "abs_err")
      .orderBy("event_type", "p")
  }

  /** #147 events_cohort_revenue: the LTV cohort triangle — revenue per
    * (cohort day, age-in-days) with the running cumulative per cohort:
    * the table every growth team reads (how much has each acquisition
    * cohort produced by age N). Shape: one first-touch aggregate (the
    * retention cohort assignment), broadcast back to the event grain,
    * day-grain revenue pre-agg, and the cumulative as a window over the
    * SMALL (cohorts × ages) triangle — raw events are touched once.
    * Revenue sums in decimal micro-exact form (dec6) so the compare is
    * exact at 6 dp. */
  def eventsCohortRevenue(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"),
        coalesce(col("value"), lit(0.0)).as("value"))
    val first = ev.groupBy("user_id").agg(min("day").as("cohort"))
    val tri = ev.join(broadcast(first), "user_id")
      .withColumn("age", datediff(col("day"), col("cohort")))
      .groupBy(col("cohort"), col("age"))
      .agg(sum(dec6(col("value"))).cast("double").as("revenue"),
        count(lit(1)).as("n_events"))
    val w = Window.partitionBy("cohort").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tri
      .withColumn("cum_revenue",
        round(sum(dec6(col("revenue"))).over(w).cast("double"), 6))
      .select(col("cohort"), col("age"), round(col("revenue"), 6).as("revenue"),
        col("n_events"), col("cum_revenue"))
      .orderBy("cohort", "age")
  }

  val eventsCohortRevenueSql: String =
    """WITH ev AS (
      |  SELECT user_id, date_trunc('day', ts) AS day, coalesce(value, 0.0) AS value
      |  FROM events),
      |f AS (SELECT user_id, min(day) AS cohort FROM ev GROUP BY user_id),
      |tri AS (
      |  SELECT f.cohort, CAST(date_diff('day', f.cohort, ev.day) AS INT) AS age,
      |    CAST(sum(CAST(ev.value AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |    count(*) AS n_events
      |  FROM ev JOIN f USING (user_id)
      |  GROUP BY f.cohort, CAST(date_diff('day', f.cohort, ev.day) AS INT))
      |SELECT cohort, age, round(revenue, 6) AS revenue, n_events,
      |  round(CAST(sum(CAST(revenue AS DECIMAL(18,6)))
      |    OVER (PARTITION BY cohort ORDER BY age
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
      |    AS cum_revenue
      |FROM tri ORDER BY cohort, age""".stripMargin

  /** #149 events_gap_quantiles: p50/p90 of the inter-event gap (seconds
    * since the same user's previous event) per event type — the
    * arrival-process statistic that CALIBRATES the sessionization gap
    * threshold (#35's 30-min cut should sit in the valley between
    * within-session and between-session gap modes; this query is how an
    * operator finds that valley). Shape: ONE lag window over the
    * (ts, event_id)-ordered user partition (the events_paths shuffle),
    * then the rank-selection percentile machinery per event type (#134).
    * Gaps are exact integer microseconds / 1e6, so both engines derive
    * identical doubles. */
  def eventsGapQuantiles(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("gap_s",
        ((unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser))
          .cast("double") / 1e6))
      .select(col("event_type"), col("gap_s"))
    graft.operators.Quantiles.perGroup(gaps, "event_type", "gap_s", Seq(0.5, 0.9))
  }

  val eventsGapQuantilesSql: String = {
    val inner = Seq(0.5, 0.9).map(p =>
      s"""SELECT event_type, CAST($p AS DOUBLE) AS p,
         |  round(quantile_cont(gap_s, $p), 6) AS q
         |FROM g WHERE gap_s IS NOT NULL GROUP BY event_type""".stripMargin)
      .mkString("", "\nUNION ALL\n", "")
    s"""WITH g AS (
       |  SELECT event_type,
       |    (epoch_us(ts) - lag(epoch_us(ts))
       |       OVER (PARTITION BY user_id ORDER BY ts, event_id)) / 1000000.0 AS gap_s
       |  FROM events)
       |$inner
       |ORDER BY event_type, p""".stripMargin
  }

  /** #167 events_pagerank: the stationary distribution of the session
    * transition graph — where sessions actually SPEND their time, the
    * product-analytics completion of events_markov (which emits the
    * per-step transition probabilities; this emits their fixed point).
    * PageRank with damping 0.85, 20 synchronous iterations, dangling
    * mass redistributed uniformly.
    *
    * Shapes: the DATA pass is events_markov's (one user-partition lag
    * window + one (src,dst) aggregate — linear, the only corpus touch);
    * the iteration then runs on the COLLECTED transition table, bounded
    * by |event types|² rows (the BPE-histogram / corpus_mix bounded-
    * driver discipline — event-type cardinality is a schema property,
    * not a data volume). Engine parity by round-before-branch at every
    * step: transitions rounded 6 dp, each iterate 8 dp (half-up, both
    * engines), final 6 dp — the oracle UNROLLS the same 20 iterations
    * as generated MATERIALIZED CTEs and hash-matches. */
  val PagerankIters = 20
  val PagerankDamping = 0.85

  /** The synchronous iteration, exposed for unit tests: transitions are
    * (src, dst, p) with p already 6 dp; returns node → rank (6 dp). */
  private[graft] def pagerankOf(trans: Seq[(String, String, Double)],
                                nodes: Seq[String]): Map[String, Double] = {
    def rnd(x: Double, dp: Int): Double = {
      val f = math.pow(10, dp)
      math.floor(x * f + 0.5) / f
    }
    val n = nodes.length.toDouble
    val srcs = trans.map(_._1).toSet
    var r = nodes.map(_ -> 1.0 / n).toMap
    var it = 1
    while (it <= PagerankIters) {
      val dangling = nodes.filterNot(srcs).map(r).sum
      val in = scala.collection.mutable.Map(nodes.map(_ -> 0.0): _*)
      trans.foreach { case (s0, d0, p) => in(d0) += r(s0) * p }
      val dp = if (it == PagerankIters) 6 else 8
      r = nodes.map(v => v -> rnd((1 - PagerankDamping) / n +
        PagerankDamping * (in(v) + dangling / n), dp)).toMap
      it += 1
    }
    r
  }

  def eventsPagerank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val trans = eventsMarkov(s, d).select("src", "dst", "p")
      .as[(String, String, Double)].collect().toSeq
    val nodes = Tables.events(s, d).where(col("event_type").isNotNull)
      .select(col("event_type")).distinct().as[String].collect().toSeq.sorted
    val r = pagerankOf(trans, nodes)
    nodes.map(v => (v, r(v))).toDF("node", "pagerank").orderBy("node")
  }

  /** Generated oracle: the SAME 20 iterations unrolled as MATERIALIZED
    * CTEs (un-materialized CTEs re-expand the two references per level —
    * 2²⁰ scans). */
  val eventsPagerankSql: String = {
    val iters = PagerankIters
    val ctes = (1 to iters).map { i =>
      val prev = s"r${i - 1}"
      val dp = if (i == iters) 6 else 8
      s"""r$i AS MATERIALIZED (
         |  SELECT n.node, round(0.15 / (SELECT cnt FROM nc)
         |    + 0.85 * (coalesce(m.s, 0.0)
         |      + (SELECT coalesce(sum(r), 0.0) FROM $prev
         |         WHERE node NOT IN (SELECT src FROM tr)) / (SELECT cnt FROM nc)), $dp) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT tr.dst AS node, sum(p0.r * tr.p) AS s
         |    FROM $prev p0 JOIN tr ON p0.node = tr.src GROUP BY tr.dst) m
         |  ON n.node = m.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (
       |  SELECT event_type AS src,
       |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
       |  FROM events WHERE event_type IS NOT NULL),
       |c AS (SELECT src, dst, count(*) AS n FROM t WHERE dst IS NOT NULL GROUP BY 1, 2),
       |tr AS MATERIALIZED (
       |  SELECT src, dst, round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src), 6) AS p
       |  FROM c),
       |nodes AS MATERIALIZED (
       |  SELECT DISTINCT event_type AS node FROM events WHERE event_type IS NOT NULL),
       |nc AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM nodes),
       |r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT cnt FROM nc) AS r FROM nodes),
       |$ctes
       |SELECT node, r AS pagerank FROM r$iters ORDER BY node""".stripMargin
  }

  /** #173 events_attribution: multi-touch marketing attribution — for each
    * purchase, credit its value to the user's touch events (view/click)
    * in the 7 days at-or-before the purchase, under the three standard
    * models at once: last-touch (full value to the latest touch),
    * first-touch (earliest), and linear (value split evenly). The join is
    * a plain equi-join on user_id (both sides hash-partitioned once; the
    * time predicate is a post-join filter Catalyst pushes into the join
    * condition), and the per-purchase ranking windows partition by the
    * purchase's event_id — bounded by one user's touches in a 7-day
    * window, never a global sort. Per-touch credits are rounded to 6 dp
    * and summed as DECIMAL so both engines aggregate order-independently.
    * At 100 TB this is the standard shape: shuffle keyed on user_id
    * (bounded per-user fan-out), purchase-grain windows bounded by
    * per-user activity. */
  def eventsAttribution(s: SparkSession, d: String): DataFrame =
    eventsAttributionOf(Tables.events(s, d))

  def eventsAttributionOf(ev: DataFrame): DataFrame = {
    val WinUs = 7L * 24 * 3600 * 1000000
    val touches = ev.where(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_type").as("touch_type"),
        col("ts").as("touch_ts"), col("event_id").as("touch_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
        col("ts").as("p_ts"), col("value"))
    val joined = purchases.join(touches, "user_id")
      .where(col("touch_ts") <= col("p_ts") &&
        unix_micros(col("p_ts")) - unix_micros(col("touch_ts")) <= WinUs)
    val byPid = Window.partitionBy("pid")
    val lastW = byPid.orderBy(col("touch_ts").desc, col("touch_id").desc)
    val firstW = byPid.orderBy(col("touch_ts").asc, col("touch_id").asc)
    joined
      .withColumn("n_t", count(lit(1)).over(byPid))
      .withColumn("rk_last", row_number().over(lastW))
      .withColumn("rk_first", row_number().over(firstW))
      .withColumn("c_linear", dec6(round(col("value") / col("n_t"), 6)))
      .withColumn("c_last", dec6(when(col("rk_last") === 1, col("value")).otherwise(0.0)))
      .withColumn("c_first", dec6(when(col("rk_first") === 1, col("value")).otherwise(0.0)))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("pid")).as("n_purchases"),
        sum(col("c_linear")).cast("double").as("rev_linear"),
        sum(col("c_last")).cast("double").as("rev_last"),
        sum(col("c_first")).cast("double").as("rev_first"))
      .orderBy(col("touch_type"))
  }

  val eventsAttributionSql: String =
    """WITH t AS (
      |  SELECT user_id, event_type AS touch_type, ts AS touch_ts,
      |         event_id AS touch_id
      |  FROM events WHERE event_type IN ('view', 'click')),
      |p AS (
      |  SELECT user_id, event_id AS pid, ts AS p_ts, value
      |  FROM events WHERE event_type = 'purchase'),
      |j AS (
      |  SELECT p.pid, p.value, t.touch_type, t.touch_ts, t.touch_id
      |  FROM p JOIN t ON p.user_id = t.user_id
      |  WHERE t.touch_ts <= p.p_ts
      |    AND epoch_us(p.p_ts) - epoch_us(t.touch_ts) <= 604800000000),
      |r AS (
      |  SELECT *,
      |    count(*) OVER (PARTITION BY pid) AS n_t,
      |    row_number() OVER (PARTITION BY pid ORDER BY touch_ts DESC, touch_id DESC) AS rk_last,
      |    row_number() OVER (PARTITION BY pid ORDER BY touch_ts ASC, touch_id ASC) AS rk_first
      |  FROM j)
      |SELECT touch_type, count(*) AS n_touches,
      |  count(DISTINCT pid) AS n_purchases,
      |  CAST(sum(CAST(round(value / n_t, 6) AS DECIMAL(18,6))) AS DOUBLE) AS rev_linear,
      |  CAST(sum(CAST(CASE WHEN rk_last = 1 THEN value ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS rev_last,
      |  CAST(sum(CAST(CASE WHEN rk_first = 1 THEN value ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS rev_first
      |FROM r GROUP BY touch_type ORDER BY touch_type""".stripMargin

  /** #175 events_ab: experiment readout — users deterministically split
    * into two variants (user_id mod 2, the hash-bucket assignment shape),
    * then per-variant user counts, converter counts (≥1 purchase), ARPU,
    * conversion rates, relative lift, and the pooled two-proportion
    * z-score, all in one row. Plan: ONE shuffle keyed (variant, user_id)
    * to user grain (map-side combined), then a singleton aggregate —
    * per-user dedup is the only data-sized stage, so the shape survives
    * any corpus size. All derived doubles follow round-before-compare:
    * identical association order in both engines, 6 dp. */
  /** The CUPED post-aggregate arithmetic as layered SELECT expressions —
    * ONE source of truth evaluated by Spark (selectExpr chain) AND
    * rendered into the DuckDB oracle (nested subqueries), so the two
    * engines cannot drift on a single double operation. Everything
    * upstream is an exact integer/decimal moment; everything here is a
    * deterministic post-aggregate expression on identical values. */
  private[graft] val CupedLayers: Seq[Seq[String]] = Seq(
    Seq("n0", "n1",
      "CAST(n AS DOUBLE) AS nd",
      "CAST(sx AS DOUBLE) AS sxd", "CAST(sy AS DOUBLE) AS syd",
      "CAST(sxx AS DOUBLE) AS sxxd", "CAST(syy AS DOUBLE) AS syyd",
      "CAST(sxy AS DOUBLE) AS sxyd",
      "CAST(n0 AS DOUBLE) AS n0d", "CAST(n1 AS DOUBLE) AS n1d",
      "CAST(sx0 AS DOUBLE) AS sx0d", "CAST(sx1 AS DOUBLE) AS sx1d",
      "CAST(sy0 AS DOUBLE) AS sy0d", "CAST(sy1 AS DOUBLE) AS sy1d"),
    // nullif-guarded divisors: an EMPTY variant (the SRM-broken case the
    // experiment-report composition must still report on) yields NULL
    // metrics instead of an ANSI divide-by-zero; identical rendering in
    // DuckDB, and a no-op when both variants enroll
    Seq("n0", "n1", "nd", "n0d", "n1d",
      "nd * sxyd - sxd * syd AS cn",
      "nd * sxxd - sxd * sxd AS cd",
      "nd * syyd - syd * syd AS vy",
      "sxd / nullif(nd, 0.0) AS xbar",
      "sx0d / nullif(n0d, 0.0) AS xbar0", "sx1d / nullif(n1d, 0.0) AS xbar1",
      "sy0d / nullif(n0d, 0.0) AS ybar0", "sy1d / nullif(n1d, 0.0) AS ybar1"),
    Seq("n0", "n1", "nd", "n0d", "n1d", "cn", "cd", "vy",
      "xbar", "xbar0", "xbar1", "ybar0", "ybar1",
      "CASE WHEN cd > 0 THEN round(cn / cd, 6) END AS thetar"),
    Seq("n0", "n1",
      "round(ybar0, 6) AS mean_y0",
      "round(ybar1, 6) AS mean_y1",
      "thetar AS theta",
      "CASE WHEN thetar IS NOT NULL THEN round(ybar0 - thetar * (xbar0 - xbar), 6) END AS adj0",
      "CASE WHEN thetar IS NOT NULL THEN round(ybar1 - thetar * (xbar1 - xbar), 6) END AS adj1",
      "CASE WHEN cd > 0 AND vy > 0 THEN round(cn * cn / (cd * vy), 6) END AS var_reduction",
      "CASE WHEN vy > 0 THEN round((ybar1 - ybar0) / sqrt((vy / (nd * nd)) * (1.0 / nullif(n0d, 0.0) + 1.0 / nullif(n1d, 0.0))), 6) END AS z_raw",
      "CASE WHEN cd > 0 AND vy > 0 AND cn * cn / (cd * vy) < 1.0 THEN " +
        "round(((ybar1 - thetar * (xbar1 - xbar)) - (ybar0 - thetar * (xbar0 - xbar))) / " +
        "sqrt((vy / (nd * nd)) * (1.0 - cn * cn / (cd * vy)) * (1.0 / nullif(n0d, 0.0) + 1.0 / nullif(n1d, 0.0))), 6) END AS z_adj"))

  /** #276 events_cuped: CUPED variance reduction (Deng et al., WSDM'13 —
    * the experimentation-platform staple): each enrolled user's
    * experiment-window activity count y (last 28 observed days) is
    * adjusted by its OWN pre-period count x (the 28 days before) through
    * the pooled regression θ = cov(x,y)/var(x), shrinking metric
    * variance by ρ² and sharpening the A/B z — the reason every mature
    * platform runs CUPED before reading an experiment. Variant = the
    * events_ab user_id%2 assignment. Exactness: per-user counts are
    * integers; ALL moments (Σx, Σy, Σx², Σy², Σxy, per-variant splits)
    * accumulate exactly (order-independent); every double operation
    * after the aggregate lives in [[CupedLayers]], evaluated by BOTH
    * engines from the same strings. Scale shape: one (user, day)
    * dedup-free rollup → ONE map-side-combined moments aggregate →
    * a 1-row driver-free projection chain. */
  def eventsCuped(s: SparkSession, d: String): DataFrame =
    eventsCupedOf(Tables.events(s, d))

  def eventsCupedOf(ev: DataFrame): DataFrame = {
    val lastD = ev.agg(max(to_date(col("ts"))).as("last_day"))
    val perUser = ev.select(col("user_id"), to_date(col("ts")).as("day"))
      .crossJoin(broadcast(lastD))
      .withColumn("w",
        when(col("day") > date_sub(col("last_day"), 28), "y")
          .when(col("day") > date_sub(col("last_day"), 56), "x"))
      .where(col("w").isNotNull)
      .groupBy("user_id")
      .agg(sum(when(col("w") === "x", 1L).otherwise(0L)).as("x"),
        sum(when(col("w") === "y", 1L).otherwise(0L)).as("y"))
      .withColumn("variant", pmod(col("user_id"), lit(2L)))
    val moments = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x").cast("decimal(18,0)") * col("x").cast("decimal(18,0)")).as("sxx"),
      sum(col("y").cast("decimal(18,0)") * col("y").cast("decimal(18,0)")).as("syy"),
      sum(col("x").cast("decimal(18,0)") * col("y").cast("decimal(18,0)")).as("sxy"),
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("variant") === 0, col("x")).otherwise(0L)).as("sx0"),
      sum(when(col("variant") === 1, col("x")).otherwise(0L)).as("sx1"),
      sum(when(col("variant") === 0, col("y")).otherwise(0L)).as("sy0"),
      sum(when(col("variant") === 1, col("y")).otherwise(0L)).as("sy1"))
    CupedLayers.foldLeft(moments)((df, layer) => df.selectExpr(layer: _*))
  }

  val eventsCupedSql: String = {
    val layered = CupedLayers.foldLeft("m") { (inner, layer) =>
      s"(SELECT ${layer.mkString(", ")} FROM $inner)"
    }
    s"""WITH ud AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
       |gl AS (SELECT max(day) AS last_day FROM ud),
       |w AS (
       |  SELECT user_id,
       |    CASE WHEN day > last_day - 28 THEN 'y'
       |         WHEN day > last_day - 56 THEN 'x' END AS w
       |  FROM ud, gl WHERE day > last_day - 56),
       |pu AS (
       |  SELECT user_id, user_id % 2 AS variant,
       |    CAST(sum(CASE WHEN w = 'x' THEN 1 ELSE 0 END) AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN w = 'y' THEN 1 ELSE 0 END) AS BIGINT) AS y
       |  FROM w GROUP BY user_id),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy,
       |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
       |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN variant = 0 THEN x ELSE 0 END) AS BIGINT) AS sx0,
       |    CAST(sum(CASE WHEN variant = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
       |    CAST(sum(CASE WHEN variant = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0,
       |    CAST(sum(CASE WHEN variant = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1
       |  FROM pu)
       |SELECT * FROM $layered""".stripMargin
  }

  /** #277 events_srm: the SAMPLE-RATIO-MISMATCH guardrail — the check
    * every experimentation platform runs BEFORE reading any A/B result
    * (a variant split that deviates from its design invalidates
    * events_ab/events_cuped downstream): enrolled users per variant over
    * the cuped 56-day horizon vs the designed 50/50, scored by the
    * one-degree chi-square (n0−n1)²/(n0+n1) and flagged past 10.83 (the
    * p<0.001 critical value — the industry SRM alarm threshold).
    * Integer counts, ONE double division, an exact threshold compare on
    * the 6-dp-rounded statistic. One (user) distinct pass, a 1-row
    * aggregate. */
  def eventsSrm(s: SparkSession, d: String): DataFrame =
    eventsSrmOf(Tables.events(s, d))

  def eventsSrmOf(ev: DataFrame): DataFrame = {
    val lastD = ev.agg(max(to_date(col("ts"))).as("last_day"))
    ev.select(col("user_id"), to_date(col("ts")).as("day"))
      .crossJoin(broadcast(lastD))
      .where(col("day") > date_sub(col("last_day"), 56))
      .select(col("user_id")).distinct()
      .agg(
        sum(when(pmod(col("user_id"), lit(2L)) === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(pmod(col("user_id"), lit(2L)) === 1, 1L).otherwise(0L)).as("n1"))
      .withColumn("chi2", round(
        (col("n0") - col("n1")).cast("double") * (col("n0") - col("n1")).cast("double")
          / (col("n0") + col("n1")).cast("double"), 6))
      .withColumn("srm_flag", when(col("chi2") > 10.83, 1).otherwise(0))
      .select(col("n0"), col("n1"), col("chi2"), col("srm_flag"))
  }

  val eventsSrmSql: String =
    """WITH ud AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |gl AS (SELECT max(day) AS last_day FROM ud),
      |u AS (
      |  SELECT DISTINCT user_id FROM ud, gl WHERE day > last_day - 56),
      |c AS (
      |  SELECT
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      |  FROM u)
      |SELECT n0, n1,
      |  round(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n1 AS DOUBLE)
      |        / CAST(n0 + n1 AS DOUBLE), 6) AS chi2,
      |  CAST(CASE WHEN round(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n1 AS DOUBLE)
      |                 / CAST(n0 + n1 AS DOUBLE), 6) > 10.83
      |       THEN 1 ELSE 0 END AS INT) AS srm_flag
      |FROM c""".stripMargin

  def eventsAb(s: SparkSession, d: String): DataFrame =
    eventsAbOf(Tables.events(s, d))

  def eventsAbOf(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id"), col("event_type"), col("value"))
      .withColumn("variant", pmod(col("user_id"), lit(2L)))
    // conversion = a HIGH-VALUE purchase (value ≥ 90): on a dense event
    // stream "any purchase" saturates to rate 1.0 for every user, which
    // degenerates the pooled variance to 0 — the value-threshold form is
    // both the realistic readout and statistically non-degenerate
    val perUser = ev.groupBy("variant", "user_id")
      .agg(max(when(col("event_type") === "purchase" && col("value") >= 90, 1L)
        .otherwise(0L)).as("converted"),
        sum(when(col("event_type") === "purchase", dec6(col("value")))).as("pv"))
    perUser.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("variant") === 0, col("converted")).otherwise(0L)).as("c0"),
      sum(when(col("variant") === 1, col("converted")).otherwise(0L)).as("c1"),
      sum(when(col("variant") === 0, col("pv"))).as("v0"),
      sum(when(col("variant") === 1, col("pv"))).as("v1"))
      .selectExpr("n0", "n1", "c0", "c1",
        "round(CAST(v0 AS DOUBLE) / n0, 6) AS arpu0",
        "round(CAST(v1 AS DOUBLE) / n1, 6) AS arpu1",
        "round(CAST(c0 AS DOUBLE) / n0, 6) AS rate0",
        "round(CAST(c1 AS DOUBLE) / n1, 6) AS rate1",
        "CASE WHEN c0 = 0 THEN CAST(NULL AS DOUBLE) ELSE " +
          "round(CAST(c1 AS DOUBLE) / n1 / (CAST(c0 AS DOUBLE) / n0) - CAST(1 AS DOUBLE), 6) END AS lift",
        "CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN CAST(NULL AS DOUBLE) ELSE " +
          "round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0) / " +
          "sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) * (CAST(1 AS DOUBLE) - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) * " +
          "(CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1)), 6) END AS z")
  }

  val eventsAbSql: String =
    """WITH pu AS (
      |  SELECT user_id % 2 AS variant, user_id,
      |    max(CASE WHEN event_type = 'purchase' AND value >= 90 THEN 1 ELSE 0 END) AS converted,
      |    sum(CASE WHEN event_type = 'purchase'
      |             THEN CAST(value AS DECIMAL(18,6)) END) AS pv
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT
      |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS c0,
      |    CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS c1,
      |    sum(CASE WHEN variant = 0 THEN pv END) AS v0,
      |    sum(CASE WHEN variant = 1 THEN pv END) AS v1
      |  FROM pu)
      |SELECT n0, n1, c0, c1,
      |  round(CAST(v0 AS DOUBLE) / n0, 6) AS arpu0,
      |  round(CAST(v1 AS DOUBLE) / n1, 6) AS arpu1,
      |  round(CAST(c0 AS DOUBLE) / n0, 6) AS rate0,
      |  round(CAST(c1 AS DOUBLE) / n1, 6) AS rate1,
      |  CASE WHEN c0 = 0 THEN CAST(NULL AS DOUBLE) ELSE
      |    round(CAST(c1 AS DOUBLE) / n1 / (CAST(c0 AS DOUBLE) / n0) - CAST(1 AS DOUBLE), 6) END AS lift,
      |  CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN CAST(NULL AS DOUBLE) ELSE
      |    round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0) /
      |    sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) * (CAST(1 AS DOUBLE) - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
      |    (CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1)), 6) END AS z
      |FROM t""".stripMargin

  /** #181 events_ewma: exponentially-weighted moving average of daily
    * event volume per type (α = 0.3, adjust=true: s_t = Σᵢ r^(t-i)·xᵢ /
    * Σᵢ r^(t-i), r = 1−α) — the monitoring baseline behind volume
    * anomaly alerts, next to the MAD detector (#143). The corpus is
    * touched ONCE (the daily count aggregate); the smoothing then runs
    * on the calendar-bounded series via a per-type triangle join (D²
    * rows where D = observed days — a calendar property, not a data
    * volume; the pagerank bounded-work discipline). Engine parity is
    * EXACT, not ulp-tolerant: weights are rounded to 12 dp and cast
    * DECIMAL before multiplying integer counts, so both numerator and
    * denominator are order-independent exact decimal sums; only the
    * final ratio is a double, rounded 6 dp. */
  val EwmaAlpha = 0.3

  def eventsEwma(s: SparkSession, d: String): DataFrame =
    eventsEwmaOf(Tables.events(s, d))

  def eventsEwmaOf(ev: DataFrame): DataFrame = {
    val r = 1.0 - EwmaAlpha
    val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val byType = Window.partitionBy("event_type").orderBy("day")
    val idx = daily.withColumn("t", (row_number().over(byType) - 1).cast("long"))
    val cur = idx.select(col("event_type"), col("day"), col("t"), col("x"))
    val past = idx.select(col("event_type").as("et2"), col("t").as("i"),
      col("x").as("xi"))
    val weight = round(pow(lit(r), col("t") - col("i")), 12).cast("decimal(18,12)")
    cur.join(past, col("event_type") === col("et2") && col("i") <= col("t"))
      .groupBy(col("event_type"), col("day"), col("t"), col("x"))
      .agg(sum(weight * col("xi").cast("decimal(18,0)")).as("num"),
        sum(weight).as("den"))
      .select(col("event_type"), col("day"), col("t"), col("x"),
        round(col("num").cast("double") / col("den").cast("double"), 6).as("ewma"))
      .orderBy("event_type", "day")
  }

  val eventsEwmaSql: String = {
    val r = 1.0 - EwmaAlpha
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
       |  FROM events GROUP BY 1, 2),
       |idx AS (
       |  SELECT event_type, day, x,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) - 1 AS BIGINT) AS t
       |  FROM daily),
       |tri AS (
       |  SELECT a.event_type, a.day, a.t, a.x,
       |    CAST(round(pow(CAST($r AS DOUBLE), a.t - b.t), 12) AS DECIMAL(18,12)) AS w,
       |    b.x AS xi
       |  FROM idx a JOIN idx b
       |    ON a.event_type = b.event_type AND b.t <= a.t)
       |SELECT event_type, day, t, x,
       |  round(CAST(sum(w * CAST(xi AS DECIMAL(18,0))) AS DOUBLE) /
       |        CAST(sum(w) AS DOUBLE), 6) AS ewma
       |FROM tri GROUP BY event_type, day, t, x
       |ORDER BY event_type, day""".stripMargin
  }

  /** #185 events_dau: the engagement dashboard readout — daily active
    * users, trailing-7-day weekly actives, and the DAU/WAU stickiness
    * ratio per day. The distinct-over-a-sliding-window trap (a window
    * frame cannot dedup) is avoided by the CONTRIBUTION rewrite: dedup
    * once to (user, day) grain, then each user-day row fans out
    * ROW-LOCALLY to the ≤7 window-end days it contributes to and one
    * distinct aggregate per grain does the rest — every stage is an
    * equi-shuffle on (day, user), no range join, no nested-loop. At
    * 100 TB the user-day table is the only data-sized stage and the ×7
    * fan-out is constant. Inner join restricts output to OBSERVED days
    * (phantom trailing window-ends drop). */
  def eventsDau(s: SparkSession, d: String): DataFrame =
    eventsDauOf(Tables.events(s, d))

  def eventsDauOf(ev: DataFrame): DataFrame = {
    val ud = ev.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val contrib = ud
      .select(explode(expr("sequence(day, date_add(day, 6), interval 1 day)")).as("day"),
        col("user_id"))
      .distinct()
    val wau = contrib.groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .withColumn("stickiness", round(col("dau").cast("double") / col("wau"), 6))
      .orderBy("day")
  }

  val eventsDauSql: String =
    """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
      |c0 AS (
      |  SELECT user_id,
      |    unnest(generate_series(CAST(day AS TIMESTAMP),
      |                           CAST(day AS TIMESTAMP) + INTERVAL 6 DAY,
      |                           INTERVAL 1 DAY)) AS dts
      |  FROM ud),
      |contrib AS (SELECT DISTINCT CAST(dts AS DATE) AS day, user_id FROM c0),
      |wau AS (SELECT day, count(*) AS wau FROM contrib GROUP BY day)
      |SELECT d.day, d.dau, w.wau,
      |  round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
      |FROM dau d JOIN wau w USING (day) ORDER BY day""".stripMargin

  /** #188 events_wau_sketch: the MERGEABLE-SKETCH scale path for #185's
    * trailing-window distinct (the events_uniques_approx symmetry, window
    * flavor): one Datasketches HLL per day (hll_sketch_agg, lgK=14 →
    * ~1.6% rsd), then each WINDOW's count is the estimate of the UNION
    * of its 7 daily sketches (hll_union_agg) — the property
    * approx_count_distinct's opaque aggregate cannot offer. Why it
    * matters at 100 TB: the exact contribution rewrite shuffles
    * 7×|user-days| rows; this ships 7 KB-sized sketches per window-end
    * REGARDLESS of user count — per-day sketches build once and serve
    * every overlapping window (and any 30/90-day variant, free).
    * Reports the exact WAU next to the estimate with the relative
    * error (the trade visible in the result); rows-only by nature
    * (sketch estimates are engine-specific); ≤5% error + day-count
    * parity contracts spec-pinned (AnalyticsOpsSpec). */
  def eventsWauSketch(s: SparkSession, d: String): DataFrame =
    eventsWauSketchOf(Tables.events(s, d))

  def eventsWauSketchOf(ev: DataFrame): DataFrame = {
    val daily = ev.select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day").agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
    val contrib = daily.select(
      explode(expr("sequence(day, date_add(day, 6), interval 1 day)")).as("day"),
      col("sk"))
    val est = contrib.groupBy("day")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("wau_est"))
    eventsDauOf(ev).select(col("day"), col("wau").as("wau_exact"))
      .join(est, "day")
      .withColumn("rel_err", round(
        abs(col("wau_est") - col("wau_exact")).cast("double") / col("wau_exact"), 6))
      .orderBy("day")
  }

  /** #192 events_cohort_matrix: the D0–D7 retention triangle — #64's
    * single-offset D1 readout generalized to the matrix every growth
    * dashboard actually renders: per (first-seen cohort day, day offset
    * 0..7), how many cohort users were active and what fraction of the
    * cohort that is. Shapes: one per-user min(day) aggregate + one
    * user-keyed equi-join of the deduped user-day table (both shuffles
    * on user_id — the key reuse discipline), then everything is
    * (cohort × 8)-bounded; rates join the offset-0 row back on the tiny
    * cohort table. Rates are exact integer ratios rounded 6 dp. */
  def eventsCohortMatrix(s: SparkSession, d: String): DataFrame =
    eventsCohortMatrixOf(Tables.events(s, d))

  def eventsCohortMatrixOf(ev: DataFrame): DataFrame = {
    val ud = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val first = ud.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    val cells = ud.join(first, "user_id")
      .withColumn("offset", datediff(col("day"), col("cohort_day")))
      .where(col("offset") <= 7)
      .groupBy("cohort_day", "offset").agg(count(lit(1)).as("n_active"))
    val sizes = cells.where(col("offset") === 0)
      .select(col("cohort_day"), col("n_active").as("n_cohort"))
    cells.join(sizes, "cohort_day")
      .withColumn("rate", round(col("n_active").cast("double") / col("n_cohort"), 6))
      .select(col("cohort_day"), col("offset"), col("n_active"), col("n_cohort"), col("rate"))
      .orderBy("cohort_day", "offset")
  }

  val eventsCohortMatrixSql: String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |f AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id),
      |cells AS (
      |  SELECT f.cohort_day, CAST(ud.day - f.cohort_day AS INT) AS "offset",
      |         count(*) AS n_active
      |  FROM ud JOIN f ON ud.user_id = f.user_id
      |  WHERE ud.day - f.cohort_day <= 7
      |  GROUP BY 1, 2),
      |sz AS (SELECT cohort_day, n_active AS n_cohort FROM cells WHERE "offset" = 0)
      |SELECT c.cohort_day, c."offset", c.n_active, s.n_cohort,
      |  round(CAST(c.n_active AS DOUBLE) / s.n_cohort, 6) AS rate
      |FROM cells c JOIN sz s USING (cohort_day)
      |ORDER BY cohort_day, "offset"""".stripMargin

  /** #194 events_props_agg: schema-on-read over the semi-structured
    * `props` JSON column — the shape every event pipeline needs when
    * payloads carry ad-hoc fields the table schema doesn't: `from_json`
    * with an explicit schema projects the field INSIDE the scan stage
    * (one pass, codegen'd Jackson parse, no shuffle beyond the per-type
    * aggregate; malformed or missing keys degrade to NULL, never an
    * error), then exact integer aggregates per event type with the mean
    * derived as exact-sum / count (round 6). The oracle extracts the
    * same path with DuckDB's JSON reader — parser-independence of the
    * VALUES is what the hash compare proves. */
  def eventsPropsAgg(s: SparkSession, d: String): DataFrame =
    eventsPropsAggOf(Tables.events(s, d))

  def eventsPropsAggOf(ev: DataFrame): DataFrame =
    ev.select(col("event_type"),
      from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        round(sum(col("k")).cast("double") / count(col("k")), 6).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val eventsPropsAggSql: String =
    """WITH x AS (
      |  SELECT event_type,
      |    CASE WHEN json_valid(props)
      |         THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k
      |  FROM events)
      |SELECT event_type, count(*) AS n, count(k) AS n_with_k,
      |  CAST(sum(k) AS BIGINT) AS sum_k,
      |  round(CAST(sum(k) AS DOUBLE) / count(k), 6) AS avg_k,
      |  min(k) AS min_k, max(k) AS max_k
      |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin

  /** #197 events_overlap_matrix: audience overlap between event types —
    * |users(A)∩users(B)|, and the Jaccard of the two audiences, for every
    * unordered type pair: the readout behind "do clickers also buy"
    * segmentation questions. Shapes: dedup to (user, type) grain (one
    * shuffle), then a SELF-JOIN ON user_id whose fan-out is bounded by
    * the type cardinality per user (≤ T, so ≤ T² pair rows per user —
    * a schema property, not a data volume), one bounded pair aggregate,
    * and broadcast audience sizes. Exact integer Jaccard rounded 6 dp. */
  def eventsOverlapMatrix(s: SparkSession, d: String): DataFrame =
    eventsOverlapMatrixOf(Tables.events(s, d))

  def eventsOverlapMatrixOf(ev: DataFrame): DataFrame = {
    val ut = ev.select(col("user_id"), col("event_type")).distinct()
    val pairs = ut.select(col("user_id"), col("event_type").as("type_a"))
      .join(ut.select(col("user_id"), col("event_type").as("type_b")), "user_id")
      .where(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_both"))
    val sizes = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    pairs
      .join(broadcast(sizes.select(col("event_type").as("type_a"), col("n").as("n_a"))), "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"), col("n").as("n_b"))), "type_b")
      .withColumn("jaccard", round(
        col("n_both").cast("double") / (col("n_a") + col("n_b") - col("n_both")), 6))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"), col("jaccard"))
      .orderBy("type_a", "type_b")
  }

  val eventsOverlapMatrixSql: String =
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      |p AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_both
      |  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2),
      |sz AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1)
      |SELECT p.type_a, p.type_b, sa.n AS n_a, sb.n AS n_b, p.n_both,
      |  round(CAST(p.n_both AS DOUBLE) / (sa.n + sb.n - p.n_both), 6) AS jaccard
      |FROM p
      |JOIN sz sa ON p.type_a = sa.event_type
      |JOIN sz sb ON p.type_b = sb.event_type
      |ORDER BY type_a, type_b""".stripMargin


  /** #205 events_dedup_window: throttle-style event deduplication — drop
    * any event that lands within 5 minutes of the PREVIOUS event of the
    * same (user, type), keep the rest (the at-least-once ingest cleanup
    * every event pipeline runs before analytics). lag() against the raw
    * predecessor (not the last KEPT row) keeps the operator a single
    * stateless window pass: ONE shuffle on the (user, type) key, no
    * sequential chain dependency, so it scales as a plain keyed window.
    * Exact µs arithmetic (unix_micros — the sessionize discipline), and
    * the kept set is PROVEN content-wise to the oracle via a per-type
    * bit_xor of kept event_ids, not just counts. */
  def eventsDedupWindow(s: SparkSession, d: String): DataFrame =
    eventsDedupWindowOf(Tables.events(s, d))

  def eventsDedupWindowOf(ev: DataFrame): DataFrame = {
    val WinUs = 5L * 60 * 1000000
    val byKey = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    ev.withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byKey))
      .withColumn("keep",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") >= WinUs, 1L).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_total"),
        sum(col("keep")).as("n_kept"),
        (count(lit(1)) - sum(col("keep"))).as("n_dropped"),
        expr("bit_xor(CASE WHEN keep = 1 THEN event_id END)").as("kept_xor"))
      .orderBy("event_type")
  }

  val eventsDedupWindowSql: String =
    """WITH k AS (
      |  SELECT event_type, event_id,
      |    CASE WHEN lag(epoch_us(ts)) OVER
      |           (PARTITION BY user_id, event_type ORDER BY ts, event_id) IS NULL
      |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER
      |           (PARTITION BY user_id, event_type ORDER BY ts, event_id) >= 300000000
      |         THEN 1 ELSE 0 END AS keep
      |  FROM events)
      |SELECT event_type, count(*) AS n_total,
      |  CAST(sum(keep) AS BIGINT) AS n_kept,
      |  CAST(count(*) - sum(keep) AS BIGINT) AS n_dropped,
      |  bit_xor(CASE WHEN keep = 1 THEN event_id END) AS kept_xor
      |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin


  /** #211 events_hourly: the hour-of-day x day-of-week load matrix — the
    * capacity-planning heatmap (when do users act, when to schedule
    * compaction). One scan, one map-side-combined aggregate on a 7x24-
    * bounded key; value sums decimal-exact. weekday()+1 here == DuckDB's
    * isodow (Mon=1..Sun=7) — pinned explicitly rather than relying on
    * either engine's dayofweek convention. */
  def eventsHourly(s: SparkSession, d: String): DataFrame =
    eventsHourlyOf(Tables.events(s, d))

  def eventsHourlyOf(ev: DataFrame): DataFrame =
    ev.groupBy((weekday(col("ts")) + 1).as("dow"), hour(col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("dow", "hour")

  val eventsHourlySql: String =
    """SELECT CAST(isodow(ts) AS INT) AS dow, CAST(hour(ts) AS INT) AS hour,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY dow, hour""".stripMargin


  /** #213 events_burstiness: the Fano factor (variance/mean of daily
    * event counts) per type — the dispersion monitor that separates
    * steady traffic (~Poisson, fano ~1) from bursty incident-driven
    * patterns (fano >> 1). All moments are EXACT integer sums (the
    * events_anomaly discipline): the only doubles are three final
    * single-step divisions of exact integers, identical in both engines
    * — no summation-order drift possible. One day-grain pre-aggregate,
    * one bounded per-type rollup. */
  def eventsBurstiness(s: SparkSession, d: String): DataFrame =
    eventsBurstinessOf(Tables.events(s, d))

  def eventsBurstinessOf(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("n")).as("s1"),
        sum(col("n") * col("n")).as("s2"))
      .where(col("n_days") > 1)
      .select(col("event_type"), col("n_days"), col("s1").as("n_events"),
        round(col("s1").cast("double") / col("n_days"), 6).as("mean_daily"),
        round((col("n_days") * col("s2") - col("s1") * col("s1")).cast("double") /
          (col("n_days") * (col("n_days") - 1)), 6).as("var_daily"),
        round((col("n_days") * col("s2") - col("s1") * col("s1")).cast("double") /
          ((col("n_days") - 1) * col("s1")), 6).as("fano"))
      .orderBy("event_type")

  val eventsBurstinessSql: String =
    """WITH d AS (
      |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, count(*) AS n_days,
      |    CAST(sum(n) AS BIGINT) AS s1, CAST(sum(n * n) AS BIGINT) AS s2
      |  FROM d GROUP BY 1)
      |SELECT event_type, n_days, s1 AS n_events,
      |  round(CAST(s1 AS DOUBLE) / n_days, 6) AS mean_daily,
      |  round(CAST(n_days * s2 - s1 * s1 AS DOUBLE)
      |    / (n_days * (n_days - 1)), 6) AS var_daily,
      |  round(CAST(n_days * s2 - s1 * s1 AS DOUBLE)
      |    / ((n_days - 1) * s1), 6) AS fano
      |FROM m WHERE n_days > 1 ORDER BY event_type""".stripMargin


  /** #218 events_autocorr: lag-k autocorrelation (k = 1..7) of the daily
    * count series per event type — the weekly-seasonality detector next
    * to events_burstiness (a strong r at k=7 says weekly rhythm; r~0
    * everywhere says memoryless traffic). Pearson r over the (x_t,
    * x_{t-k}) aligned pairs with EVERY moment an exact integer sum (lag
    * window over the calendar-bounded daily series, partitioned by
    * type); doubles enter only in the final sqrt and one division —
    * engine-identical (the events_burstiness discipline). NULL r when a
    * side is constant (zero variance). */
  def eventsAutocorr(s: SparkSession, d: String): DataFrame =
    eventsAutocorrOf(Tables.events(s, d))

  def eventsAutocorrOf(ev: DataFrame): DataFrame = {
    val daily = ev.groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val lags = (1 to 7).map(k =>
      daily.withColumn("y", lag(col("x"), k).over(w)).withColumn("k", lit(k)))
    lags.reduce(_ unionAll _)
      .where(col("y").isNotNull)
      .groupBy(col("event_type"), col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("__d", ((col("n_pairs") * col("sxx") - col("sx") * col("sx")) *
        (col("n_pairs") * col("syy") - col("sy") * col("sy"))).cast("double"))
      // constant series -> NULL r (DuckDB double-div-by-zero semantics;
      // Spark ANSI would throw on the division)
      .select(col("event_type"), col("k"), col("n_pairs"),
        when(col("__d") > 0,
          round((col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt(col("__d")), 6)).as("r"))
      .orderBy("event_type", "k")
  }

  val eventsAutocorrSql: String =
    """WITH d AS (
      |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT event_type, k.k, x,
      |    lag(x, k.k) OVER (PARTITION BY event_type, k.k ORDER BY day) AS y
      |  FROM d, (SELECT unnest(range(1, 8)) AS k) k),
      |m AS (
      |  SELECT event_type, CAST(k AS INT) AS k, count(*) AS n_pairs,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM l WHERE y IS NOT NULL GROUP BY 1, 2)
      |SELECT event_type, k, n_pairs,
      |  CASE WHEN CAST((n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy) AS DOUBLE) > 0
      |    THEN round(CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
      |      sqrt(CAST((n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy) AS DOUBLE)), 6)
      |  END AS r
      |FROM m ORDER BY event_type, k""".stripMargin


  /** #220 events_conv_time: view->purchase conversion latency quantiles
    * per A/B variant (the events_ab assignment rule: user_id parity) —
    * the experiment readout after the z-test says WHETHER variants
    * differ: HOW LONG users take to convert. Per user: first view, first
    * purchase AT-OR-AFTER it (one user_id-keyed join, no pair
    * explosion), exact microsecond latency; quantiles by the shared
    * exact rank-selection operator (Quantiles.perGroup — engine-
    * identical linear interpolation, the events_quantiles discipline).
    */
  def eventsConvTime(s: SparkSession, d: String): DataFrame =
    eventsConvTimeOf(Tables.events(s, d))

  private val ConvPs = Seq(0.25, 0.5, 0.75, 0.9)

  def eventsConvTimeOf(ev: DataFrame): DataFrame = {
    val firstView = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("t_view"))
    val conv = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("t_p"))
      .join(firstView, "user_id")
      .where(col("t_p") >= col("t_view"))
      .groupBy(col("user_id"), col("t_view"))
      .agg(min(col("t_p")).as("t_purchase"))
      .select(col("user_id"),
        ((col("t_purchase") - col("t_view")).cast("double") / 1e6).as("latency_s"))
      .withColumn("variant",
        when(pmod(col("user_id"), lit(2L)) === 0, "A").otherwise("B"))
    val counts = conv.groupBy(col("variant")).agg(count(lit(1)).as("n_conversions"))
    graft.operators.Quantiles.perGroup(conv, "variant", "latency_s", ConvPs)
      .join(broadcast(counts), "variant")
      .select(col("variant"), col("p"), col("q"), col("n_conversions"))
      .orderBy("variant", "p")
  }

  val eventsConvTimeSql: String = {
    val inner = ConvPs.map(p =>
      s"""SELECT variant, CAST($p AS DOUBLE) AS p,
         |  round(quantile_cont(latency_s, $p), 6) AS q
         |FROM conv GROUP BY variant""".stripMargin)
      .mkString("", "\nUNION ALL\n", "")
    s"""WITH fv AS (
       |  SELECT user_id, min(epoch_us(ts)) AS t_view
       |  FROM events WHERE event_type = 'view' GROUP BY 1),
       |conv AS (
       |  SELECT e.user_id,
       |    (min(epoch_us(e.ts)) - fv.t_view) / 1000000.0 AS latency_s,
       |    CASE WHEN e.user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
       |  FROM events e JOIN fv ON e.user_id = fv.user_id
       |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.t_view
       |  GROUP BY e.user_id, fv.t_view),
       |q AS ($inner),
       |c AS (SELECT variant, count(*) AS n_conversions FROM conv GROUP BY 1)
       |SELECT q.variant, q.p, q.q, c.n_conversions
       |FROM q JOIN c ON q.variant = c.variant
       |ORDER BY q.variant, p""".stripMargin
  }


  /** #225 events_streaks: longest consecutive-day activity streak per
    * user, read out as a histogram — the gaps-and-islands operator every
    * engagement dashboard runs. The islands trick keeps it ONE window
    * pass: epoch_day - row_number is constant exactly within a
    * consecutive run, so streaks fall out of a (user, diff) aggregate —
    * no self-join, no recursion; the histogram key is bounded by the
    * calendar. */
  def eventsStreaks(s: SparkSession, d: String): DataFrame =
    eventsStreaksOf(Tables.events(s, d))

  def eventsStreaksOf(ev: DataFrame): DataFrame = {
    val ud = ev.select(col("user_id"),
      datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).cast("long").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val streaks = ud.withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp")).agg(count(lit(1)).as("len"))
    streaks.groupBy(col("user_id")).agg(max(col("len")).as("max_streak"))
      .groupBy(col("max_streak")).agg(count(lit(1)).as("n_users"))
      .orderBy("max_streak")
  }

  val eventsStreaksSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
      |  FROM events),
      |st AS (
      |  SELECT user_id,
      |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM ud),
      |ln AS (
      |  SELECT user_id, count(*) AS len FROM st GROUP BY user_id, grp),
      |mx AS (
      |  SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak FROM ln GROUP BY 1)
      |SELECT max_streak, count(*) AS n_users
      |FROM mx GROUP BY 1 ORDER BY max_streak""".stripMargin

  /** #226 events_growth: daily growth accounting — every active user-day
    * classified new / retained (active yesterday) / resurrected (seen
    * before, not yesterday), churn attributed to the day AFTER the last
    * consecutive active day: the new+retained+resurrected−churned
    * decomposition that explains a DAU curve's movement. One user-day
    * dedup shuffle, one lag/lead window per user, one calendar-bounded
    * day aggregate; exact integer counts — full hash-pass. */
  def eventsGrowth(s: SparkSession, d: String): DataFrame =
    eventsGrowthOf(Tables.events(s, d))

  def eventsGrowthOf(ev: DataFrame): DataFrame = {
    val ud = ev.select(col("user_id"),
      datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).cast("long").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val tagged = ud
      .withColumn("prev", lag(col("day"), 1).over(w))
      .withColumn("next", lead(col("day"), 1).over(w))
      .withColumn("status",
        when(col("prev").isNull, "new")
          .when(col("day") - col("prev") === 1, "retained")
          .otherwise("resurrected"))
    val active = tagged.groupBy(col("day"))
      .agg(sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("status") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"))
    val churned = tagged
      .where(col("next").isNull || col("next") > col("day") + 1)
      .select((col("day") + 1).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_churned"))
    active.join(churned, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .orderBy("day")
  }

  val eventsGrowthSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
      |  FROM events),
      |tg AS (
      |  SELECT user_id, day,
      |    lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev,
      |    lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next
      |  FROM ud),
      |act AS (
      |  SELECT day,
      |    CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |    CAST(sum(CASE WHEN day - prev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
      |    CAST(sum(CASE WHEN prev IS NOT NULL AND day - prev > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      |  FROM tg GROUP BY 1),
      |ch AS (
      |  SELECT day + 1 AS day, count(*) AS n_churned
      |  FROM tg WHERE next IS NULL OR next > day + 1 GROUP BY 1)
      |SELECT coalesce(act.day, ch.day) AS day,
      |  coalesce(n_new, 0) AS n_new,
      |  coalesce(n_retained, 0) AS n_retained,
      |  coalesce(n_resurrected, 0) AS n_resurrected,
      |  coalesce(n_churned, 0) AS n_churned
      |FROM act FULL OUTER JOIN ch ON act.day = ch.day
      |ORDER BY day""".stripMargin


  /** #228 events_spine: the date-spine gap fill — every (event_type,
    * calendar day) cell over the corpus' full date range, zero-filled
    * where nothing happened, with days-since-last-activity carried
    * forward (the dbt date-spine / AS OF dashboard substrate: real
    * series have holes, BI queries must not). Shapes: the spine is a
    * row-local sequence() explode of types x broadcast bounds (bounded
    * by calendar x type cardinality, NEVER a corpus-sized operation),
    * one left join against the daily pre-aggregate, carry-forward as a
    * max-over-monotone-day window (identical trick in both engines).
    */
  def eventsSpine(s: SparkSession, d: String): DataFrame =
    eventsSpineOf(Tables.events(s, d))

  def eventsSpineOf(ev: DataFrame): DataFrame = {
    val daily = ev.select(col("event_type"),
      datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).cast("long").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
    val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val spine = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(expr("sequence(lo, hi)")).as("day"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("event_type", "day"), "left")
      .withColumn("n_events", coalesce(col("n"), lit(0L)))
      .withColumn("days_since_active",
        col("day") - max(when(col("n_events") > 0, col("day"))).over(w))
      .select(col("event_type"), col("day"), col("n_events"), col("days_since_active"))
      .orderBy("event_type", "day")
  }

  val eventsSpineSql: String =
    """WITH daily AS (
      |  SELECT event_type, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
      |spine AS (
      |  SELECT t.event_type, d.day
      |  FROM (SELECT DISTINCT event_type FROM daily) t,
      |    (SELECT unnest(range(lo, hi + 1)) AS day FROM b) d)
      |SELECT s.event_type, s.day,
      |  CAST(coalesce(daily.n, 0) AS BIGINT) AS n_events,
      |  s.day - max(CASE WHEN coalesce(daily.n, 0) > 0 THEN s.day END)
      |    OVER (PARTITION BY s.event_type ORDER BY s.day
      |          ROWS UNBOUNDED PRECEDING) AS days_since_active
      |FROM spine s LEFT JOIN daily ON s.event_type = daily.event_type AND s.day = daily.day
      |ORDER BY s.event_type, s.day""".stripMargin


  /** #233 events_dow_index: the day-of-week seasonal index per event
    * type — mean count on each weekday over the type's overall daily
    * mean (index 1.0 = no weekly rhythm; the multiplicative-seasonality
    * readout events_autocorr detects and this one QUANTIFIES, per dow).
    * Exact arithmetic: per-(type, dow) counts and day tallies are
    * integers, the index is (sum_dow * n_days) / (n_dow * total) — ONE
    * division of exact integer products (the market_hhi discipline).
    * Day-grain pre-aggregate, 7-bounded rollup. */
  def eventsDowIndex(s: SparkSession, d: String): DataFrame =
    eventsDowIndexOf(Tables.events(s, d))

  def eventsDowIndexOf(ev: DataFrame): DataFrame = {
    val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", (weekday(col("day")) + 1).cast("int"))
    val perDow = daily.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("n")).as("s"), count(lit(1)).as("n_days_dow"))
    val tot = daily.groupBy(col("event_type"))
      .agg(sum(col("n")).as("total"), count(lit(1)).as("n_days"))
    perDow.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("dow"), col("s").as("n_events"),
        col("n_days_dow"),
        round((col("s") * col("n_days")).cast("double") /
          (col("n_days_dow") * col("total")), 6).as("dow_index"))
      .orderBy("event_type", "dow")
  }

  val eventsDowIndexSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |d2 AS (SELECT event_type, CAST(isodow(day) AS INT) AS dow, n FROM daily),
      |pd AS (
      |  SELECT event_type, dow, CAST(sum(n) AS BIGINT) AS n_events,
      |    count(*) AS n_days_dow
      |  FROM d2 GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, CAST(sum(n) AS BIGINT) AS total, count(*) AS n_days
      |  FROM daily GROUP BY 1)
      |SELECT pd.event_type, dow, n_events, n_days_dow,
      |  round(CAST(n_events * n_days AS DOUBLE) / (n_days_dow * total), 6) AS dow_index
      |FROM pd JOIN t ON pd.event_type = t.event_type
      |ORDER BY pd.event_type, dow""".stripMargin

  /** #234 events_activity_quantiles: the events-per-user distribution
    * per type (p50/p90/p99 of user activity — the whale-vs-casual
    * engagement readout, and the skew diagnostic that predicts which
    * keys need salting downstream). One (type, user) aggregate, then
    * the shared exact rank-selection quantile operator. */
  def eventsActivityQuantiles(s: SparkSession, d: String): DataFrame =
    eventsActivityQuantilesOf(Tables.events(s, d))

  def eventsActivityQuantilesOf(ev: DataFrame): DataFrame = {
    val perUser = ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).cast("double").as("n"))
    graft.operators.Quantiles.perGroup(perUser, "event_type", "n", ActivityPs)
  }

  private val ActivityPs = Seq(0.5, 0.9, 0.99)

  val eventsActivityQuantilesSql: String = {
    val inner = ActivityPs.map(p =>
      s"""SELECT event_type, CAST($p AS DOUBLE) AS p,
         |  round(quantile_cont(n, $p), 6) AS q
         |FROM pu GROUP BY event_type""".stripMargin)
      .mkString("", "\nUNION ALL\n", "")
    s"""WITH pu AS (
       |  SELECT event_type, user_id, CAST(count(*) AS DOUBLE) AS n
       |  FROM events GROUP BY 1, 2)
       |$inner
       |ORDER BY event_type, p""".stripMargin
  }


  /** #240 events_velocity: week-over-week volume growth per type — the
    * monitoring readout between the daily EWMA and the monthly
    * seasonality: weekly counts on the epoch-week grain (engine-portable
    * integer week = epoch_day DIV 7 — no ISO-week-boundary ambiguity),
    * previous week attached by a calendar-bounded lag window, growth as
    * ONE division of exact integers. NULL growth for a type's first
    * week or after a silent week (prev_week gap). */
  def eventsVelocity(s: SparkSession, d: String): DataFrame =
    eventsVelocityOf(Tables.events(s, d))

  def eventsVelocityOf(ev: DataFrame): DataFrame = {
    val weekly = ev.select(col("event_type"),
      (datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).cast("long") / 7)
        .cast("long").as("week"))
      .groupBy("event_type", "week").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("week")
    weekly
      .withColumn("prev_week", lag(col("week"), 1).over(w))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("wow_growth",
        when(col("prev_week") === col("week") - 1,
          round((col("n") - col("prev_n")).cast("double") / col("prev_n"), 6)))
      .select(col("event_type"), col("week"), col("n"), col("wow_growth"))
      .orderBy("event_type", "week")
  }

  val eventsVelocitySql: String =
    """WITH wk AS (
      |  SELECT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS week,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT event_type, week, n,
      |    lag(week) OVER (PARTITION BY event_type ORDER BY week) AS prev_week,
      |    lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
      |  FROM wk)
      |SELECT event_type, week, n,
      |  CASE WHEN prev_week = week - 1
      |    THEN round(CAST(n - prev_n AS DOUBLE) / prev_n, 6) END AS wow_growth
      |FROM l ORDER BY event_type, week""".stripMargin

  /** #242 events_changepoint: single most likely level-shift day per
    * event type by the CUSUM statistic — cusum_k = Σ_{i≤k}(n_i − mean)
    * over the observed daily counts, changepoint at argmax |cusum|.
    * The float trap is removed by comparing the EXACT integer numerator
    * D·prefix_k − k·total (cusum_k = that / D): argmax and its
    * earliest-day tie-break are integer decisions, so the two engines
    * cannot drift on near-ties. Fact rows cross only the daily-rollup
    * exchange (map-side combined); the windows re-shuffle the
    * calendar-bounded cells, and every window partition is bounded by
    * distinct days (~2.5k), not fact rows. */
  def eventsChangepoint(s: SparkSession, d: String): DataFrame =
    eventsChangepointOf(Tables.events(s, d))

  def eventsChangepointOf(ev: DataFrame): DataFrame = {
    val daily = ev.select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
    val wOrd = Window.partitionBy("event_type").orderBy("day")
    val wAll = Window.partitionBy("event_type")
    daily
      .withColumn("k", row_number().over(wOrd).cast("long"))
      .withColumn("pre", sum(col("n")).over(wOrd))
      .withColumn("tot", sum(col("n")).over(wAll))
      .withColumn("nd", count(lit(1)).over(wAll))
      .withColumn("cs", col("nd") * col("pre") - col("k") * col("tot"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(abs(col("cs")).desc, col("day"))))
      .where(col("rk") === 1)
      .select(col("event_type"), col("day").as("cp_day"),
        round(abs(col("cs")).cast("double") / col("nd"), 6).as("max_cusum"),
        round(col("pre").cast("double") / col("k"), 6).as("mean_before"),
        when(col("nd") > col("k"),
          round((col("tot") - col("pre")).cast("double") / (col("nd") - col("k")), 6))
          .as("mean_after"))
      .orderBy("event_type")
  }

  val eventsChangepointSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, day,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS k,
      |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS pre,
      |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd
      |  FROM daily),
      |x AS (
      |  SELECT event_type, day, k, pre, tot, nd, nd * pre - k * tot AS cs FROM c),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY abs(cs) DESC, day) AS rk FROM x)
      |SELECT event_type, day AS cp_day,
      |  round(CAST(abs(cs) AS DOUBLE) / nd, 6) AS max_cusum,
      |  round(CAST(pre AS DOUBLE) / k, 6) AS mean_before,
      |  CASE WHEN nd > k
      |    THEN round(CAST(tot - pre AS DOUBLE) / (nd - k), 6) END AS mean_after
      |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin

  /** #243 events_mau: the monthly active-user rollout — MAU, average DAU
    * over the month's OBSERVED days, and monthly stickiness avg_dau/MAU
    * (the daily 7-day variant lives in events_dau). Everything is
    * integer until the two final divisions: one distinct pass over
    * (day, user) feeds both the daily counts and (re-deduped to month
    * grain) the MAU counts, so the heavy distinct shuffle happens
    * once on the finest grain and the month rollups are cheap. */
  def eventsMau(s: SparkSession, d: String): DataFrame =
    eventsMauOf(Tables.events(s, d))

  def eventsMauOf(ev: DataFrame): DataFrame = {
    val du = ev.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .withColumn("month", date_format(col("day"), "yyyy-MM"))
    val dau = du.groupBy("month", "day").agg(count(lit(1)).as("dau"))
      .groupBy("month").agg(sum(col("dau")).as("sum_dau"), count(lit(1)).as("n_days"))
    val mau = du.select("month", "user_id").distinct()
      .groupBy("month").agg(count(lit(1)).as("mau"))
    dau.join(mau, "month")
      .select(col("month"),
        round(col("sum_dau").cast("double") / col("n_days"), 6).as("avg_dau"),
        col("mau"),
        round(col("sum_dau").cast("double") / (col("n_days") * col("mau")), 6)
          .as("stickiness"))
      .orderBy("month")
  }

  val eventsMauSql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |wm AS (SELECT strftime(day, '%Y-%m') AS month, day, user_id FROM du),
      |d AS (SELECT month, day, count(*) AS dau FROM wm GROUP BY 1, 2),
      |dm AS (SELECT month, CAST(sum(dau) AS BIGINT) AS sum_dau,
      |         CAST(count(*) AS BIGINT) AS n_days FROM d GROUP BY 1),
      |m AS (SELECT month, count(*) AS mau
      |      FROM (SELECT DISTINCT month, user_id FROM wm) GROUP BY 1)
      |SELECT dm.month,
      |  round(CAST(sum_dau AS DOUBLE) / n_days, 6) AS avg_dau, mau,
      |  round(CAST(sum_dau AS DOUBLE) / (n_days * mau), 6) AS stickiness
      |FROM dm JOIN m ON dm.month = m.month ORDER BY 1""".stripMargin

  /** #248 events_survival: Kaplan–Meier user-lifetime curve — the
    * survival-analysis staple with right-censoring: lifetime = last −
    * first active day; users still active in the corpus' final 7 days
    * are CENSORED (they leave the at-risk set without counting as
    * churn). At-risk n_t = total − Σ_{s<t}(d_s + c_s) from one
    * cumulative window over the day-grain rollup (bounded by the
    * calendar, the splitKs discipline); the product-limit estimate is
    * exp(Σ ln(1 − d/n)) with the SAME ordered summation in both
    * engines, and the everyone-dies day (d = n) is handled by an
    * explicit zero flag rather than ln(0) (Spark NULLs it, DuckDB
    * gives −inf — the one place the engines disagree). One user-grain
    * shuffle total. */
  def eventsSurvival(s: SparkSession, d: String): DataFrame =
    eventsSurvivalOf(Tables.events(s, d))

  def eventsSurvivalOf(ev: DataFrame): DataFrame = {
    val ul = ev.select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("user_id").agg(min(col("day")).as("fd"), max(col("day")).as("ld"))
    val end = ul.agg(max(col("ld")).as("obs_end"), count(lit(1)).as("n_users"))
    val byT = ul.crossJoin(broadcast(end))
      .withColumn("t", datediff(col("ld"), col("fd")).cast("long"))
      .withColumn("cens",
        when(col("ld") > date_sub(col("obs_end"), 7), 1L).otherwise(0L))
      .groupBy("t", "n_users")
      .agg(sum(lit(1L) - col("cens")).as("d"), sum(col("cens")).as("c"))
    val wOrd = graft.operators.BoundedWindow.keyed(col("t")).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = graft.operators.BoundedWindow.keyed(col("t")).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    byT
      .withColumn("n_risk",
        col("n_users") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
      .withColumn("f",
        when(col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast("double") / col("n_risk"))))
      .withColumn("dead", max(when(col("d") >= col("n_risk"), 1L).otherwise(0L))
        .over(wOrd))
      .select(col("t"), col("n_risk"), col("d"), col("c"),
        when(col("dead") === 1L, lit(0.0))
          .otherwise(round(exp(sum(col("f")).over(wOrd)), 6)).as("survival"))
      .orderBy("t")
  }

  val eventsSurvivalSql: String =
    """WITH ul AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS fd, max(CAST(ts AS DATE)) AS ld
      |  FROM events GROUP BY 1),
      |e AS (SELECT max(ld) AS obs_end, CAST(count(*) AS BIGINT) AS n_users FROM ul),
      |bt AS (
      |  SELECT date_diff('day', fd, ld) AS t, n_users,
      |    CAST(sum(CASE WHEN ld > obs_end - 7 THEN 0 ELSE 1 END) AS BIGINT) AS d,
      |    CAST(sum(CASE WHEN ld > obs_end - 7 THEN 1 ELSE 0 END) AS BIGINT) AS c
      |  FROM ul, e GROUP BY 1, 2),
      |r AS (
      |  SELECT t, d, c,
      |    n_users - COALESCE(CAST(sum(d + c) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
      |      AS n_risk
      |  FROM bt),
      |f AS (
      |  SELECT t, n_risk, d, c,
      |    CASE WHEN d < n_risk THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk) END AS f,
      |    CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS died
      |  FROM r)
      |SELECT t, n_risk, d, c,
      |  CASE WHEN max(died) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 THEN 0.0
      |    ELSE round(exp(sum(f) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
      |  END AS survival
      |FROM f ORDER BY t""".stripMargin

  /** #250 events_backtest: seasonal-naive forecast backtest per type —
    * the forecasting-eval staple: predict each day's count by the count
    * exactly 7 calendar days earlier (a self-join on (type, day−7), not
    * a 7-rows-back lag — silent weeks must not shift the season), then
    * score MAE and WAPE (Σ|n−f| / Σf — the weighted-percentage form
    * whose numerator and denominator are EXACT integers; per-day sMAPE
    * would sum doubles in engine-dependent order). One daily rollup
    * shuffle; the self-join runs on the calendar-bounded frame. */
  def eventsBacktest(s: SparkSession, d: String): DataFrame =
    eventsBacktestOf(Tables.events(s, d))

  def eventsBacktestOf(ev: DataFrame): DataFrame = {
    val daily = ev.select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
    val f = daily.select(col("event_type"),
      date_add(col("day"), 7).as("day"), col("n").as("fc"))
    daily.join(f, Seq("event_type", "day"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("n") - col("fc"))).as("sad"), sum(col("fc")).as("sf"))
      .select(col("event_type"), col("n_days"),
        round(col("sad").cast("double") / col("n_days"), 6).as("mae"),
        round(col("sad").cast("double") / col("sf"), 6).as("wape"))
      .orderBy("event_type")
  }

  val eventsBacktestSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |j AS (
      |  SELECT d.event_type, d.n, f.n AS fc
      |  FROM daily d JOIN daily f
      |    ON d.event_type = f.event_type AND d.day = f.day + 7)
      |SELECT event_type, count(*) AS n_days,
      |  round(CAST(sum(abs(n - fc)) AS DOUBLE) / count(*), 6) AS mae,
      |  round(CAST(sum(abs(n - fc)) AS DOUBLE) / sum(fc), 6) AS wape
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  /** #269 pipeline_monitor: the on-call MORNING REPORT as one gate row —
    * the events-side composition (the pipeline_e2e symmetry turned toward
    * observability): ONE daily rollup feeds four readouts per event type,
    * joined into the single bounded frame a rotation reads at 9am:
    * volume (n_days, total), TODAY'S health (the latest observed day's
    * count scored by the events_anomaly_mad robust z — median/MAD over
    * the type's full daily history, flag at |rz| ≥ 2), the most likely
    * LEVEL-SHIFT day (the events_changepoint exact-integer CUSUM), and
    * forecastability (the events_backtest seasonal-naive MAE/WAPE).
    * Composes three proven detectors under ONE hash compare — and pins
    * their interaction (shared rollup grain, per-type joins, NULL
    * conventions: MAD=0 types report no rz, types absent on the latest
    * day score a 0 count, types with no day−7 overlap report no error).
    * Scale shape: fact rows cross only the map-side-combined daily
    * rollup; everything after is (types × days)-bounded — the windows,
    * percentile aggregates and five joins all run on calendar-grain
    * frames, broadcast-joined. */
  def pipelineMonitor(s: SparkSession, d: String): DataFrame =
    pipelineMonitorOf(Tables.events(s, d))

  def pipelineMonitorOf(ev: DataFrame): DataFrame = {
    val daily = ev.select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
    val base = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("total_events"))
    val med = daily.groupBy("event_type")
      .agg(expr("percentile(n, 0.5)").as("med"))
    val mad = daily.join(broadcast(med), "event_type")
      .groupBy("event_type").agg(expr("percentile(abs(n - med), 0.5)").as("mad"))
    val lastDay = daily.agg(max(col("day")).as("last_day"))
    val latest = daily.join(broadcast(lastDay), col("day") === col("last_day"))
      .select(col("event_type"), col("n").as("latest_n"))
    // the events_changepoint exact-integer CUSUM (argmax on nd·pre − k·tot)
    val wOrd = Window.partitionBy("event_type").orderBy("day")
    val wAll = Window.partitionBy("event_type")
    val cp = daily
      .withColumn("k", row_number().over(wOrd).cast("long"))
      .withColumn("pre", sum(col("n")).over(wOrd))
      .withColumn("tot", sum(col("n")).over(wAll))
      .withColumn("nd", count(lit(1)).over(wAll))
      .withColumn("cs", col("nd") * col("pre") - col("k") * col("tot"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(abs(col("cs")).desc, col("day"))))
      .where(col("rk") === 1)
      .select(col("event_type"), col("day").as("cp_day"),
        round(abs(col("cs")).cast("double") / col("nd"), 6).as("max_cusum"))
    // the events_backtest seasonal-naive error (exact-integer sums)
    val f = daily.select(col("event_type"),
      date_add(col("day"), 7).as("day"), col("n").as("fc"))
    val bt = daily.join(f, Seq("event_type", "day"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("bt_days"),
        sum(abs(col("n") - col("fc"))).as("sad"), sum(col("fc")).as("sf"))
      .select(col("event_type"),
        round(col("sad").cast("double") / col("bt_days"), 6).as("mae"),
        round(col("sad").cast("double") / col("sf"), 6).as("wape"))
    base
      .join(broadcast(med), "event_type")
      .join(broadcast(mad), "event_type")
      .join(broadcast(latest), Seq("event_type"), "left")
      .join(broadcast(cp), "event_type")
      .join(broadcast(bt), Seq("event_type"), "left")
      .withColumn("latest_n", coalesce(col("latest_n"), lit(0L)))
      .withColumn("latest_rz", when(col("mad") > 0,
        round(lit(0.6745) * (col("latest_n").cast("double") - col("med")) / col("mad"), 6)))
      .withColumn("anomaly",
        when(col("mad") > 0 && abs(col("latest_rz")) >= 2.0, 1).otherwise(0))
      .select(col("event_type"), col("n_days"), col("total_events"),
        col("latest_n"), col("latest_rz"), col("anomaly"),
        col("cp_day"), col("max_cusum"), col("mae"), col("wape"))
      .orderBy("event_type")
  }

  val pipelineMonitorSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |gl AS (SELECT max(day) AS last_day FROM daily),
      |base AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |         CAST(sum(n) AS BIGINT) AS total_events
      |  FROM daily GROUP BY 1),
      |med AS (SELECT event_type, quantile_cont(n, 0.5) AS med FROM daily GROUP BY 1),
      |mad AS (
      |  SELECT d.event_type, quantile_cont(abs(d.n - m.med), 0.5) AS mad
      |  FROM daily d JOIN med m USING (event_type) GROUP BY 1),
      |latest AS (
      |  SELECT d.event_type, d.n AS latest_n FROM daily d, gl
      |  WHERE d.day = gl.last_day),
      |c AS (
      |  SELECT event_type, day,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS k,
      |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS pre,
      |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd
      |  FROM daily),
      |x AS (SELECT event_type, day, nd, nd * pre - k * tot AS cs FROM c),
      |cp AS (
      |  SELECT event_type, day AS cp_day,
      |         round(CAST(abs(cs) AS DOUBLE) / nd, 6) AS max_cusum
      |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
      |          ORDER BY abs(cs) DESC, day) AS rk FROM x)
      |  WHERE rk = 1),
      |bt AS (
      |  SELECT d.event_type, CAST(count(*) AS BIGINT) AS bt_days,
      |    CAST(sum(abs(d.n - f.n)) AS BIGINT) AS sad,
      |    CAST(sum(f.n) AS BIGINT) AS sf
      |  FROM daily d JOIN daily f
      |    ON d.event_type = f.event_type AND d.day = f.day + 7
      |  GROUP BY 1),
      |m2 AS (
      |  SELECT b.event_type, b.n_days, b.total_events,
      |    CAST(COALESCE(l.latest_n, 0) AS BIGINT) AS latest_n, med.med, mad.mad,
      |    cp.cp_day, cp.max_cusum,
      |    round(CAST(bt.sad AS DOUBLE) / bt.bt_days, 6) AS mae,
      |    round(CAST(bt.sad AS DOUBLE) / bt.sf, 6) AS wape
      |  FROM base b
      |  JOIN med USING (event_type)
      |  JOIN mad USING (event_type)
      |  LEFT JOIN latest l USING (event_type)
      |  JOIN cp USING (event_type)
      |  LEFT JOIN bt USING (event_type))
      |SELECT event_type, n_days, total_events, latest_n,
      |  CASE WHEN mad > 0
      |    THEN round(0.6745 * (CAST(latest_n AS DOUBLE) - med) / mad, 6) END AS latest_rz,
      |  CAST(CASE WHEN mad > 0 AND abs(round(0.6745 * (CAST(latest_n AS DOUBLE) - med) / mad, 6)) >= 2.0
      |       THEN 1 ELSE 0 END AS INT) AS anomaly,
      |  cp_day, max_cusum, mae, wape
      |FROM m2 ORDER BY event_type""".stripMargin

  /** #272 events_root_cause: WHY did the volume move — the Adtributor
    * contribution analysis (Bhagwan et al., NSDI'14) over a two-period
    * comparison: the last 28 observed days vs the 28 before, explained
    * along FOUR dimensions (event_type, day-of-week, hour band, props.k
    * quartile bucket — relational, calendar, and semi-structured
    * dimensions in one pass). Per (dimension, value): both period
    * counts, the delta, EXPLANATORY POWER (this value's share of the
    * total change — one division of exact integers, NULL when the metric
    * didn't move) and SURPRISE (the Jensen-Shannon term between the
    * value's share of each period — the Adtributor ranking signal that
    * separates "big because the dimension is big" from "big because it
    * CHANGED"). The ln parity rides the BM25/KM precedent (identical
    * double expressions, 6-dp round). Scale shape: rows fan out
    * row-locally to 4 (dim, value) pairs inside the scan stage; ONE
    * map-side-combined aggregate on the bounded (dim, value) key space
    * (≈5+7+4+5 values); totals re-derive from the counts themselves. */
  def eventsRootCause(s: SparkSession, d: String): DataFrame =
    eventsRootCauseOf(Tables.events(s, d))

  /** Per-row projection of the json k field + calendar day — shared by
    * the batch operator and the streaming twin so the two can never
    * drift on dimension derivation. Requires ts/event_type/props. */
  private[graft] def rootCauseFeatures(ev: DataFrame): DataFrame =
    ev.select(col("ts"), col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .withColumn("day", to_date(col("ts")))

  /** Row-local fan-out to the four (dim, value) pairs, carrying the given
    * columns through (batch carries `period`; the twin carries `day`). */
  private[graft] def rootCauseFanout(df: DataFrame, carry: String*): DataFrame =
    df.select(explode(array(
        struct(lit("event_type").as("dim"), col("event_type").as("value")),
        struct(lit("dow").as("dim"),
          dayofweek(col("day")).cast("string").as("value")),
        struct(lit("hour_band").as("dim"),
          floor(hour(col("ts")) / 6).cast("string").as("value")),
        struct(lit("k_bucket").as("dim"),
          coalesce(floor(col("k") / 25).cast("string"), lit("na")).as("value"))
      )).as("dv") +: carry.map(col): _*)
      .select(Seq(col("dv.dim").as("dim"), col("dv.value").as("value"))
        ++ carry.map(col): _*)

  def eventsRootCauseOf(ev: DataFrame): DataFrame = {
    val lastD = ev.agg(max(to_date(col("ts"))).as("last_day"))
    val rows = rootCauseFanout(
      rootCauseFeatures(ev)
        .crossJoin(broadcast(lastD))
        .withColumn("period",
          when(col("day") > date_sub(col("last_day"), 28), "cur")
            .when(col("day") > date_sub(col("last_day"), 56), "base"))
        .where(col("period").isNotNull),
      "period")
    val counts = rows.groupBy("dim", "value").agg(
      sum(when(col("period") === "base", 1L).otherwise(0L)).as("base_n"),
      sum(when(col("period") === "cur", 1L).otherwise(0L)).as("cur_n"))
    val tots = counts.groupBy("dim")
      .agg(sum(col("base_n")).as("tb"), sum(col("cur_n")).as("tc"))
    val p = col("base_n").cast("double") / col("tb").cast("double")
    val q = col("cur_n").cast("double") / col("tc").cast("double")
    def jsTerm(x: org.apache.spark.sql.Column,
               y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(x > 0, x * log(lit(2.0) * x / (x + y))).otherwise(lit(0.0))
    counts.join(broadcast(tots), "dim")
      .withColumn("delta", col("cur_n") - col("base_n"))
      .withColumn("ep", when(col("tc") =!= col("tb"),
        round(col("delta").cast("double") / (col("tc") - col("tb")).cast("double"), 6)))
      .withColumn("surprise",
        round(lit(0.5) * (jsTerm(p, q) + jsTerm(q, p)), 6))
      .select(col("dim").as("dimension"), col("value"), col("base_n"),
        col("cur_n"), col("delta"), col("ep"), col("surprise"))
      .orderBy("dimension", "value")
  }

  val eventsRootCauseSql: String =
    """WITH gl AS (SELECT max(CAST(ts AS DATE)) AS last_day FROM events),
      |r AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, hour(ts) AS hr,
      |    CASE WHEN json_valid(props)
      |         THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k,
      |    CASE WHEN CAST(ts AS DATE) > last_day - 28 THEN 'cur'
      |         WHEN CAST(ts AS DATE) > last_day - 56 THEN 'base' END AS period
      |  FROM events, gl),
      |p AS (SELECT * FROM r WHERE period IS NOT NULL),
      |dv AS (
      |  SELECT 'event_type' AS dim, event_type AS value, period FROM p
      |  UNION ALL
      |  SELECT 'dow', CAST(dayofweek(day) + 1 AS VARCHAR), period FROM p
      |  UNION ALL
      |  SELECT 'hour_band', CAST(hr // 6 AS VARCHAR), period FROM p
      |  UNION ALL
      |  SELECT 'k_bucket',
      |         CASE WHEN k IS NULL THEN 'na' ELSE CAST(k // 25 AS VARCHAR) END,
      |         period FROM p),
      |counts AS (
      |  SELECT dim, value,
      |    CAST(sum(CASE WHEN period = 'base' THEN 1 ELSE 0 END) AS BIGINT) AS base_n,
      |    CAST(sum(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cur_n
      |  FROM dv GROUP BY 1, 2),
      |tots AS (
      |  SELECT dim, CAST(sum(base_n) AS BIGINT) AS tb,
      |         CAST(sum(cur_n) AS BIGINT) AS tc
      |  FROM counts GROUP BY 1)
      |SELECT c.dim AS dimension, c.value, c.base_n, c.cur_n,
      |  c.cur_n - c.base_n AS delta,
      |  CASE WHEN t.tc <> t.tb
      |    THEN round(CAST(c.cur_n - c.base_n AS DOUBLE)
      |               / CAST(t.tc - t.tb AS DOUBLE), 6) END AS ep,
      |  round(0.5 * (
      |    CASE WHEN CAST(c.base_n AS DOUBLE) / CAST(t.tb AS DOUBLE) > 0
      |      THEN (CAST(c.base_n AS DOUBLE) / CAST(t.tb AS DOUBLE))
      |        * ln(2.0 * (CAST(c.base_n AS DOUBLE) / CAST(t.tb AS DOUBLE))
      |             / ((CAST(c.base_n AS DOUBLE) / CAST(t.tb AS DOUBLE))
      |               + (CAST(c.cur_n AS DOUBLE) / CAST(t.tc AS DOUBLE))))
      |      ELSE 0 END
      |    + CASE WHEN CAST(c.cur_n AS DOUBLE) / CAST(t.tc AS DOUBLE) > 0
      |      THEN (CAST(c.cur_n AS DOUBLE) / CAST(t.tc AS DOUBLE))
      |        * ln(2.0 * (CAST(c.cur_n AS DOUBLE) / CAST(t.tc AS DOUBLE))
      |             / ((CAST(c.base_n AS DOUBLE) / CAST(t.tb AS DOUBLE))
      |               + (CAST(c.cur_n AS DOUBLE) / CAST(t.tc AS DOUBLE))))
      |      ELSE 0 END), 6) AS surprise
      |FROM counts c JOIN tots t USING (dim)
      |ORDER BY dimension, value""".stripMargin

  /** #255 events_seasonal_strength: how much of each type's daily-count
    * variance the weekly rhythm explains — the one-number seasonality
    * R² = SSB/SST over the day-of-week grouping (events_dow_index shows
    * the profile; this scores it). Cross-multiplied integer numerators:
    * SSB·D² = Σ_w (S_w·D − T·c_w)²/c_w (each dow term ONE division of
    * exact DECIMAL(38,0) integers) and SST·D² = D·(Q·D − T²) exactly;
    * the ≤7 dow terms combine through an ORDERED running window (the KM
    * discipline — both engines accumulate doubles in the identical dow
    * order), so the engines cannot drift. Day-grain rollup, then
    * everything is (type × 7)-bounded. */
  def eventsSeasonalStrength(s: SparkSession, d: String): DataFrame =
    eventsSeasonalStrengthOf(Tables.events(s, d))

  def eventsSeasonalStrengthOf(ev: DataFrame): DataFrame = {
    val daily = ev.select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .withColumn("dow", dayofweek(col("day")).cast("long"))
    val byDow = daily.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("c"), sum(col("n")).as("sw"),
        sum(col("n") * col("n")).as("q"))
    val tot = byDow.groupBy("event_type")
      .agg(sum(col("c")).as("d_days"), sum(col("sw")).as("t"),
        sum(col("q")).as("qq"))
    // num ≤ ~5e15: exact in DECIMAL(25,0) AND as a double (< 2^53), so
    // the squaring happens in DOUBLE on the identical exact value in
    // both engines (DuckDB cannot multiply DECIMAL(38,0)s — p1+p2 ≤ 38)
    val terms = byDow.join(tot, "event_type")
      .withColumn("num",
        (col("sw").cast("decimal(18,0)") * col("d_days").cast("decimal(6,0)") -
          col("t").cast("decimal(18,0)") * col("c").cast("decimal(6,0)"))
          .cast("double"))
      .withColumn("term", col("num") * col("num") / col("c"))
    val w = Window.partitionBy("event_type").orderBy("dow")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    terms
      .withColumn("ssb_d2", sum(col("term")).over(w))
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(col("dow").desc)))
      .where(col("rk") === 1)
      .withColumn("sst_num",
        col("qq").cast("decimal(25,0)") * col("d_days").cast("decimal(6,0)") -
          col("t").cast("decimal(15,0)") * col("t").cast("decimal(15,0)"))
      .select(col("event_type"), col("d_days").as("n_days"),
        when(col("sst_num") > 0,
          round(col("ssb_d2") /
            (col("sst_num").cast("double") * col("d_days").cast("double")), 6))
          .as("strength"))
      .orderBy("event_type")
  }

  val eventsSeasonalStrengthSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |dd AS (
      |  SELECT event_type, dayofweek(day) + 1 AS dow, n FROM daily),
      |bd AS (
      |  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS c,
      |    CAST(sum(n) AS BIGINT) AS sw, CAST(sum(n * n) AS BIGINT) AS q
      |  FROM dd GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, CAST(sum(c) AS BIGINT) AS d_days,
      |    CAST(sum(sw) AS BIGINT) AS t, CAST(sum(q) AS BIGINT) AS qq
      |  FROM bd GROUP BY 1),
      |terms AS (
      |  SELECT bd.event_type, dow, c, d_days, t.t, qq,
      |    CAST(CAST(sw AS DECIMAL(18,0)) * CAST(d_days AS DECIMAL(6,0))
      |      - CAST(t.t AS DECIMAL(18,0)) * CAST(c AS DECIMAL(6,0))
      |      AS DOUBLE) AS num
      |  FROM bd JOIN t USING (event_type)),
      |s AS (
      |  SELECT event_type, d_days, t, qq,
      |    sum(num * num / c) OVER (PARTITION BY event_type ORDER BY dow
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ssb_d2,
      |    row_number() OVER (PARTITION BY event_type ORDER BY dow DESC) AS rk
      |  FROM terms)
      |SELECT event_type, d_days AS n_days,
      |  CASE WHEN CAST(qq AS DECIMAL(25,0)) * CAST(d_days AS DECIMAL(6,0))
      |         - CAST(t AS DECIMAL(15,0)) * CAST(t AS DECIMAL(15,0)) > 0 THEN
      |    round(ssb_d2 / (CAST(CAST(qq AS DECIMAL(25,0))
      |        * CAST(d_days AS DECIMAL(6,0))
      |      - CAST(t AS DECIMAL(15,0)) * CAST(t AS DECIMAL(15,0)) AS DOUBLE)
      |      * d_days), 6)
      |  END AS strength
      |FROM s WHERE rk = 1 ORDER BY event_type""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_seasonal_strength" -> (eventsSeasonalStrength _),
    "events_backtest" -> (eventsBacktest _),
    "events_survival" -> (eventsSurvival _),
    "events_changepoint" -> (eventsChangepoint _),
    "pipeline_monitor" -> (pipelineMonitor _),
    "events_root_cause" -> (eventsRootCause _),
    "events_cuped" -> (eventsCuped _),
    "events_srm" -> (eventsSrm _),
    "events_mau" -> (eventsMau _),
    "events_overlap_matrix" -> (eventsOverlapMatrix _),
    "events_hourly" -> (eventsHourly _),
    "events_burstiness" -> (eventsBurstiness _),
    "events_autocorr" -> (eventsAutocorr _),
    "events_conv_time" -> (eventsConvTime _),
    "events_streaks" -> (eventsStreaks _),
    "events_growth" -> (eventsGrowth _),
    "events_spine" -> (eventsSpine _),
    "events_dow_index" -> (eventsDowIndex _),
    "events_velocity" -> (eventsVelocity _),
    "events_activity_quantiles" -> (eventsActivityQuantiles _),
    "events_dedup_window" -> (eventsDedupWindow _),
    "events_props_agg" -> (eventsPropsAgg _),
    "events_cohort_matrix" -> (eventsCohortMatrix _),
    "events_wau_sketch" -> (eventsWauSketch _),
    "events_dau" -> (eventsDau _),
    "events_ewma" -> (eventsEwma _),
    "events_ab" -> (eventsAb _),
    "events_attribution" -> (eventsAttribution _),
    "events_pagerank" -> (eventsPagerank _),
    "events_gap_quantiles" -> (eventsGapQuantiles _),
    "events_cohort_revenue" -> (eventsCohortRevenue _),
    "events_uniques_approx" -> (eventsUniquesApprox _),
    "events_quantiles_approx" -> (eventsQuantilesApprox _),
    "events_anomaly_mad" -> (eventsAnomalyMad _),
    "events_heavy" -> (eventsHeavy _),
    "events_quantiles" -> (eventsQuantiles _),
    "events_markov" -> (eventsMarkov _),
    "events_histogram" -> (eventsHistogram _),
    "events_paths" -> (eventsPaths _),
    "events_window" -> (eventsWindow _),
    "events_session" -> (eventsSession _),
    "events_funnel" -> (eventsFunnel _),
    "events_retention" -> (eventsRetention _),
    "events_asof" -> (eventsAsof _),
    "events_rolling" -> (eventsRolling _),
    "events_pivot" -> (eventsPivot _),
    "events_uniques" -> (eventsUniques _),
    "events_anomaly" -> (eventsAnomaly _)
  )

  val oracles: Map[String, String] = Map(
    "events_seasonal_strength" -> eventsSeasonalStrengthSql,
    "events_backtest" -> eventsBacktestSql,
    "events_survival" -> eventsSurvivalSql,
    "events_changepoint" -> eventsChangepointSql,
    "pipeline_monitor" -> pipelineMonitorSql,
    "events_root_cause" -> eventsRootCauseSql,
    "events_cuped" -> eventsCupedSql,
    "events_srm" -> eventsSrmSql,
    "events_mau" -> eventsMauSql,
    "events_overlap_matrix" -> eventsOverlapMatrixSql,
    "events_hourly" -> eventsHourlySql,
    "events_burstiness" -> eventsBurstinessSql,
    "events_autocorr" -> eventsAutocorrSql,
    "events_conv_time" -> eventsConvTimeSql,
    "events_streaks" -> eventsStreaksSql,
    "events_growth" -> eventsGrowthSql,
    "events_spine" -> eventsSpineSql,
    "events_dow_index" -> eventsDowIndexSql,
    "events_velocity" -> eventsVelocitySql,
    "events_activity_quantiles" -> eventsActivityQuantilesSql,
    "events_dedup_window" -> eventsDedupWindowSql,
    "events_props_agg" -> eventsPropsAggSql,
    "events_cohort_matrix" -> eventsCohortMatrixSql,
    "events_dau" -> eventsDauSql,
    "events_ewma" -> eventsEwmaSql,
    "events_ab" -> eventsAbSql,
    "events_attribution" -> eventsAttributionSql,
    "events_pagerank" -> eventsPagerankSql,
    "events_gap_quantiles" -> eventsGapQuantilesSql,
    "events_cohort_revenue" -> eventsCohortRevenueSql,
    "events_anomaly_mad" -> eventsAnomalyMadSql,
    "events_heavy" -> eventsHeavySql,
    "events_quantiles" -> eventsQuantilesSql,
    "events_markov" -> eventsMarkovSql,
    "events_histogram" -> eventsHistogramSql,
    "events_paths" -> eventsPathsSql,
    "events_window" -> eventsWindowSql,
    "events_session" -> eventsSessionSql,
    "events_funnel" -> eventsFunnelSql,
    "events_retention" -> eventsRetentionSql,
    "events_asof" -> eventsAsofSql,
    "events_rolling" -> eventsRollingSql,
    "events_pivot" -> eventsPivotSql,
    "events_uniques" -> eventsUniquesSql,
    "events_anomaly" -> eventsAnomalySql
  )
}
