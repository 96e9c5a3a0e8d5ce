package graft.queries

import graft.Tables
import graft.operators.BoundedWindow
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 widening, second batch: cohort lifetime-value curves (the
  * retention-economics artifact), the join-key skew audit (the
  * shuffle-planning readout a 100 TB engine consults before salting),
  * and Holt double-exponential smoothing (the level+trend forecaster
  * events_backtest's seasonal-naive baseline graduates to).
  */
object QualityQueries2 {

  private def dec(c: Column) = c.cast("decimal(18,2)")

  // -------------------------------------------------------------------
  // #282 orders_cohort_ltv — cohort lifetime-value curves.

  /** Per (first-order cohort month, months-since-first): active
    * customers, period revenue, cumulative revenue and cumulative LTV
    * per cohort member — the triangle chart subscription/retention
    * economics runs on.
    *
    * Scale design: the cohort assignment is a per-customer min-aggregate
    * and a join BOTH keyed on o_custkey — one hash exchange serves both
    * sides. Month offsets are exact integer year/month arithmetic (no
    * months_between float semantics to drift between engines). The
    * cumulative window runs on the (cohort, offset) grain — bounded by
    * calendar² — partitioned by cohort, so no global window. Money is
    * decimal-exact until the final DOUBLE render.
    */
  def ordersCohortLtv(spark: SparkSession, dir: String): DataFrame =
    ordersCohortLtvOf(Tables.orders(spark, dir))

  def ordersCohortLtvOf(orders: DataFrame): DataFrame = {
    val base = orders.select(
      col("o_custkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("midx"),
      col("o_totalprice"))
    val firsts = base.groupBy("o_custkey").agg(min(col("midx")).as("cohort_midx"))
    val fact = base.join(firsts, "o_custkey")
      .withColumn("month_offset", (col("midx") - col("cohort_midx")).cast("long"))
    val grain = fact.groupBy("cohort_midx", "month_offset")
      .agg(count_distinct(col("o_custkey")).as("n_active"),
        sum(dec(col("o_totalprice"))).as("rev_dec"))
    val sizes = firsts.groupBy("cohort_midx")
      .agg(count(lit(1)).as("cohort_size"))
    val wCum = Window.partitionBy("cohort_midx").orderBy("month_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grain.join(sizes, "cohort_midx")
      .withColumn("cum_rev_dec", sum(col("rev_dec")).over(wCum))
      .select(
        concat(
          format_string("%04d", expr("cohort_midx div 12").cast("int")),
          lit("-"),
          format_string("%02d", (col("cohort_midx") % 12 + 1).cast("int")))
          .as("cohort_month"),
        col("month_offset"),
        col("cohort_size"),
        col("n_active"),
        col("rev_dec").cast("double").as("revenue"),
        col("cum_rev_dec").cast("double").as("cum_revenue"),
        (col("cum_rev_dec").cast("double") / col("cohort_size")).as("ltv_per_customer"))
      .orderBy("cohort_month", "month_offset")
  }

  val ordersCohortLtvSql: String =
    """WITH base AS (
      |  SELECT o_custkey,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS midx,
      |    o_totalprice
      |  FROM orders),
      |firsts AS (
      |  SELECT o_custkey, min(midx) AS cohort_midx FROM base GROUP BY 1),
      |fact AS (
      |  SELECT b.o_custkey, f.cohort_midx,
      |    CAST(b.midx - f.cohort_midx AS BIGINT) AS month_offset, b.o_totalprice
      |  FROM base b JOIN firsts f ON b.o_custkey = f.o_custkey),
      |grain AS (
      |  SELECT cohort_midx, month_offset,
      |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_active,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      |  FROM fact GROUP BY 1, 2),
      |sizes AS (
      |  SELECT cohort_midx, CAST(count(*) AS BIGINT) AS cohort_size
      |  FROM firsts GROUP BY 1)
      |SELECT
      |  printf('%04d-%02d', CAST(g.cohort_midx // 12 AS INT),
      |         CAST(g.cohort_midx % 12 + 1 AS INT)) AS cohort_month,
      |  g.month_offset, s.cohort_size, g.n_active,
      |  CAST(g.rev_dec AS DOUBLE) AS revenue,
      |  CAST(sum(g.rev_dec) OVER (PARTITION BY g.cohort_midx ORDER BY g.month_offset
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_revenue,
      |  CAST(sum(g.rev_dec) OVER (PARTITION BY g.cohort_midx ORDER BY g.month_offset
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / s.cohort_size AS ltv_per_customer
      |FROM grain g JOIN sizes s ON g.cohort_midx = s.cohort_midx
      |ORDER BY cohort_month, month_offset""".stripMargin

  // -------------------------------------------------------------------
  // #283 join_skew_audit — shuffle-key skew planning artifact.

  /** The readout a shuffle planner consults before deciding to salt a
    * join: the 20 heaviest l_partkey build keys with absolute count,
    * share of all rows, cumulative share, and the skew ratio vs the mean
    * key load — the number AQE's skew-join threshold is judged against.
    *
    * Scale design: key-grain counts partial-combine map-side; the top-20
    * comes from orderBy+limit, which Spark plans as TakeOrderedAndProject
    * (per-partition heaps, NO global sort, NO unbounded window over the
    * key table — distinct keys are NOT bounded at 100 TB). Totals ride a
    * broadcast 1-row aggregate; the rank/cum-share windows run on the
    * 20-row frame under a BoundedWindow key.
    */
  def joinSkewAudit(spark: SparkSession, dir: String): DataFrame =
    joinSkewAuditOf(Tables.lineitem(spark, dir))

  def joinSkewAuditOf(li: DataFrame): DataFrame = {
    val keys = li.groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
    val totals = keys.agg(
      sum(col("cnt")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    val top = keys
      .orderBy(desc("cnt"), col("l_partkey"))
      .limit(20)
    val wRank = BoundedWindow.keyed(col("l_partkey")).orderBy(desc("cnt"), col("l_partkey"))
    val wCum = wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(totals))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("share",
        round(col("cnt").cast("double") / col("total_rows").cast("double"), 6))
      .withColumn("cum_share",
        round(sum(col("cnt")).over(wCum).cast("double") / col("total_rows").cast("double"), 6))
      .withColumn("skew_vs_mean",
        round(col("cnt").cast("double") /
          (col("total_rows").cast("double") / col("n_keys").cast("double")), 6))
      .select("rank", "l_partkey", "cnt", "share", "cum_share", "skew_vs_mean")
      .orderBy("rank")
  }

  val joinSkewAuditSql: String =
    """WITH keys AS (
      |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
      |  FROM lineitem GROUP BY 1),
      |totals AS (
      |  SELECT CAST(sum(cnt) AS BIGINT) AS total_rows,
      |         CAST(count(*) AS BIGINT) AS n_keys
      |  FROM keys),
      |top AS (
      |  SELECT l_partkey, cnt,
      |    CAST(row_number() OVER (ORDER BY cnt DESC, l_partkey) AS BIGINT) AS rank,
      |    CAST(sum(cnt) OVER (ORDER BY cnt DESC, l_partkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt
      |  FROM keys ORDER BY cnt DESC, l_partkey LIMIT 20)
      |SELECT t.rank, t.l_partkey, t.cnt,
      |  round(CAST(t.cnt AS DOUBLE) / CAST(x.total_rows AS DOUBLE), 6) AS share,
      |  round(CAST(t.cum_cnt AS DOUBLE) / CAST(x.total_rows AS DOUBLE), 6) AS cum_share,
      |  round(CAST(t.cnt AS DOUBLE) /
      |        (CAST(x.total_rows AS DOUBLE) / CAST(x.n_keys AS DOUBLE)), 6) AS skew_vs_mean
      |FROM top t CROSS JOIN totals x
      |ORDER BY t.rank""".stripMargin

  // -------------------------------------------------------------------
  // #284 events_holt — Holt double-exponential smoothing forecast.

  /** Holt's linear-trend method (α=0.3, β=0.1) on each event type's
    * daily-count series: the level+trend smoother the seasonal-naive
    * backtest baseline graduates to. Output per type: the fitted final
    * level and trend, the one-step in-sample MAE, and the h=1..7
    * forecasts level + h·trend.
    *
    * Exactness: the recursion is SEQUENTIAL double arithmetic — both
    * engines must execute the identical operation ORDER, so Spark runs
    * it as a codegen `aggregate` HOF fold over each type's day-sorted
    * count array (zero-filled over the global calendar spine so silent
    * days update the state like any other observation), and the oracle
    * replays the same fold as a DuckDB recursive CTE stepping day by
    * day — one (lvl, tr) state, identical expression shapes, 6-dp
    * rounded at the boundary.
    *
    * Scale design: ONE map-side-combined (type, day) rollup is the only
    * fact-scale exchange; the per-type series is calendar-bounded
    * (collect under a ≤|days| contract), and the fold is row-local
    * whole-stage codegen. Forecast rows fan out via posexplode of a
    * 7-literal array.
    */
  def eventsHolt(spark: SparkSession, dir: String): DataFrame =
    eventsHoltOf(Tables.events(spark, dir))

  /** Per-type zero-filled daily count series over the GLOBAL calendar
    * spine (one broadcast 1-row min/max), as a day-sorted double array —
    * the input both exponential smoothers fold over. */
  private def dailySeries(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = daily.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    spine.join(daily, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("cnt")))).as("s"))
      .withColumn("ys", expr("transform(s, p -> CAST(p.cnt AS DOUBLE))"))
  }

  /** The Holt fold — ONE expression string shared by events_holt and the
    * forecast ensemble, so the ensemble's f_holt can never drift from the
    * standalone smoother. State (lvl, tr, abs-error sum, steps); init
    * lvl=y1, tr=y2−y1; consumes y2..yn. */
  private val HoltAggExpr: String =
    """aggregate(
      |  slice(ys, 2, size(ys) - 1),
      |  named_struct('lvl', ys[0], 'tr', ys[1] - ys[0],
      |               'ae', CAST(0.0 AS DOUBLE), 'n', 0L),
      |  (acc, y) -> named_struct(
      |    'lvl', 0.3D * y + 0.7D * (acc.lvl + acc.tr),
      |    'tr',  0.1D * ((0.3D * y + 0.7D * (acc.lvl + acc.tr)) - acc.lvl)
      |             + 0.9D * acc.tr,
      |    'ae',  acc.ae + abs(y - (acc.lvl + acc.tr)),
      |    'n',   acc.n + 1L))""".stripMargin

  def eventsHoltOf(events: DataFrame): DataFrame = {
    val series = dailySeries(events)
      // a 1-day global spine has no recursion to run: drop it (matching
      // the oracle, whose base case needs t=2) instead of ANSI-erroring
      // on ys[1]
      .filter(size(col("ys")) >= 2)
    // Holt fold: state (lvl, tr, abs-error sum, steps). Init from the
    // first two observations (lvl=y0, tr=y1-y0), recursion from t=1:
    // fitted = lvl+tr; lvl' = 0.3*y + 0.7*fitted; tr' = 0.1*(lvl'-lvl)
    // + 0.9*tr. MAE over the n-1 one-step fits.
    val folded = series.withColumn("st", expr(HoltAggExpr))
      .select(col("event_type"),
        col("st.lvl").as("lvl"), col("st.tr").as("tr"),
        (col("st.ae") / col("st.n")).as("mae"))
    folded
      .select(col("event_type"), col("lvl"), col("tr"), col("mae"),
        posexplode(array((1 to 7).map(lit): _*)))
      .select(col("event_type"),
        col("col").cast("long").as("h"),
        round(col("lvl"), 6).as("level"),
        round(col("tr"), 6).as("trend"),
        round(col("mae"), 6).as("mae"),
        round(col("lvl") + col("col") * col("tr"), 6).as("forecast"))
      .orderBy("event_type", "h")
  }

  /** Oracle-side shared text (the Spark side's HoltAggExpr/HwAggExpr
    * symmetry): the zero-filled daily-series CTE chain and both
    * recursion bodies exist ONCE and render into every smoothing
    * oracle — the standalone twins and the ensemble cannot drift. */
  private val SeriesListCtesSql: String =
    """daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
      |spine AS (
      |  SELECT t.event_type,
      |    CAST(unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT DISTINCT event_type FROM daily) t CROSS JOIN bounds b),
      |serieslist AS (
      |  SELECT s.event_type,
      |    list(CAST(coalesce(d.cnt, 0) AS DOUBLE) ORDER BY s.day) AS ys
      |  FROM spine s LEFT JOIN daily d
      |    ON s.event_type = d.event_type AND s.day = d.day
      |  GROUP BY 1)""".stripMargin

  /** First-week mean over the ys LIST (1-based), identical text in every
    * oracle that inits Holt-Winters. */
  private val Lvl0Sql: String =
    "((((((ys[1] + ys[2]) + ys[3]) + ys[4]) + ys[5]) + ys[6]) + ys[7]) / 7.0"

  /** Holt recursion over the ys list, as CTE `rec` reading
    * `base(event_type, ys, n)`. */
  private def holtRecSql(rec: String, base: String): String =
    s"""$rec AS (
       |  SELECT event_type, ys, n, 1 AS t,
       |    ys[1] AS lvl, ys[2] - ys[1] AS tr,
       |    CAST(0.0 AS DOUBLE) AS ae, 0 AS steps
       |  FROM $base
       |  UNION ALL
       |  SELECT event_type, ys, n, t + 1,
       |    0.3 * ys[t + 1] + 0.7 * (lvl + tr),
       |    0.1 * ((0.3 * ys[t + 1] + 0.7 * (lvl + tr)) - lvl) + 0.9 * tr,
       |    ae + abs(ys[t + 1] - (lvl + tr)),
       |    steps + 1
       |  FROM $rec WHERE t < n)""".stripMargin

  /** Holt-Winters recursion over the ys list (seasonal LIST updated by
    * slice concatenation), as CTE `rec` reading
    * `base(event_type, ys, n, lvl0)`. */
  private def hwRecSql(rec: String, base: String): String =
    s"""$rec AS (
       |  SELECT event_type, ys, n, 7 AS t, lvl0 AS lvl,
       |    CAST(0.0 AS DOUBLE) AS tr,
       |    [v - lvl0 FOR v IN ys[1:7]] AS s,
       |    CAST(0.0 AS DOUBLE) AS ae, 0 AS cnt
       |  FROM $base
       |  UNION ALL
       |  SELECT event_type, ys, n, t + 1,
       |    0.3 * (ys[t + 1] - s[cnt % 7 + 1]) + 0.7 * (lvl + tr),
       |    0.1 * ((0.3 * (ys[t + 1] - s[cnt % 7 + 1]) + 0.7 * (lvl + tr)) - lvl)
       |      + 0.9 * tr,
       |    s[:cnt % 7 + 1 - 1] ||
       |      [0.2 * (ys[t + 1] - (0.3 * (ys[t + 1] - s[cnt % 7 + 1])
       |         + 0.7 * (lvl + tr))) + 0.8 * s[cnt % 7 + 1]] ||
       |      s[cnt % 7 + 1 + 1:],
       |    ae + abs(ys[t + 1] - (lvl + tr + s[cnt % 7 + 1])),
       |    cnt + 1
       |  FROM $rec WHERE t < n)""".stripMargin

  val eventsHoltSql: String =
    s"""WITH RECURSIVE $SeriesListCtesSql,
       |base AS (
       |  SELECT event_type, ys, len(ys) AS n
       |  FROM serieslist WHERE len(ys) >= 2),
       |${holtRecSql("rec", "base")},
       |fin AS (
       |  SELECT event_type, lvl, tr, ae / steps AS mae
       |  FROM rec WHERE t = n)
       |SELECT f.event_type, CAST(h.h AS BIGINT) AS h,
       |  round(f.lvl, 6) AS level, round(f.tr, 6) AS trend,
       |  round(f.mae, 6) AS mae,
       |  round(f.lvl + h.h * f.tr, 6) AS forecast
       |FROM fin f CROSS JOIN (SELECT unnest(range(1, 8)) AS h) h
       |ORDER BY f.event_type, h""".stripMargin

  // -------------------------------------------------------------------
  // #288 events_holt_winters — additive Holt-Winters (weekly season).

  /** Additive Holt-Winters (α=0.3, β=0.1, γ=0.2, L=7) per event type —
    * the seasonal completion of the smoothing family (naive→backtest,
    * level+trend→events_holt, level+trend+weekly-season→this): final
    * level/trend, one-step in-sample MAE, and h=1..7 forecasts
    * level + h·trend + the matching seasonal term.
    *
    * Exactness: same discipline as events_holt — the recursion is
    * sequential double arithmetic run as a codegen `aggregate` HOF fold
    * whose state carries the 7-slot seasonal ARRAY (updated one slot per
    * step via an indexed transform); the oracle replays the identical
    * expression shapes as a DuckDB recursive CTE carrying the seasonal
    * LIST (updated by slice concatenation). Init: level = first-week
    * mean (one left-nested add chain, identical text both sides),
    * trend = 0, season = first-week deviations. Types need ≥ 8 spine
    * days (init week + ≥1 step); shorter spines drop on both sides.
    *
    * Scale design: the events_holt shape — ONE map-side-combined
    * (type, day) rollup, then a row-local fold over calendar-bounded
    * arrays.
    */
  def eventsHoltWinters(spark: SparkSession, dir: String): DataFrame =
    eventsHoltWintersOf(Tables.events(spark, dir))

  /** The Holt-Winters fold — shared with the forecast ensemble the same
    * way [[HoltAggExpr]] is. 0-based Spark indexing: ys[0..6] is the
    * init week (DuckDB's ys[1..7]). */
  private val HwAggExpr: String = {
    val lvl0 = "((((((ys[0] + ys[1]) + ys[2]) + ys[3]) + ys[4]) + ys[5]) + ys[6]) / 7.0D"
    val sOld = "element_at(acc.s, acc.cnt % 7 + 1)"
    val lvlNew = s"0.3D * (y - $sOld) + 0.7D * (acc.lvl + acc.tr)"
    s"""aggregate(
       |  slice(ys, 8, size(ys) - 7),
       |  named_struct(
       |    'lvl', $lvl0,
       |    'tr', CAST(0.0 AS DOUBLE),
       |    's', transform(slice(ys, 1, 7), v -> v - ($lvl0)),
       |    'ae', CAST(0.0 AS DOUBLE),
       |    'cnt', 0),
       |  (acc, y) -> named_struct(
       |    'lvl', $lvlNew,
       |    'tr', 0.1D * (($lvlNew) - acc.lvl) + 0.9D * acc.tr,
       |    's', transform(acc.s, (v, i) ->
       |           IF(i = acc.cnt % 7, 0.2D * (y - ($lvlNew)) + 0.8D * v, v)),
       |    'ae', acc.ae + abs(y - (acc.lvl + acc.tr + $sOld)),
       |    'cnt', acc.cnt + 1))""".stripMargin
  }

  def eventsHoltWintersOf(events: DataFrame): DataFrame = {
    val folded = dailySeries(events)
      .filter(size(col("ys")) >= 8)
      .withColumn("st", expr(HwAggExpr))
      .select(col("event_type"), size(col("ys")).as("n"),
        col("st.lvl").as("lvl"), col("st.tr").as("tr"), col("st.s").as("s"),
        (col("st.ae") / col("st.cnt")).as("mae"))
    folded
      .select(col("event_type"), col("n"), col("lvl"), col("tr"), col("s"),
        col("mae"), posexplode(array((1 to 7).map(lit): _*)))
      .select(col("event_type"),
        col("col").cast("long").as("h"),
        round(col("lvl"), 6).as("level"),
        round(col("tr"), 6).as("trend"),
        round(col("mae"), 6).as("mae"),
        round(col("lvl") + col("col") * col("tr") +
          element_at(col("s"), ((col("n") + col("col") - 8) % 7 + 1).cast("int")), 6)
          .as("forecast"))
      .orderBy("event_type", "h")
  }

  val eventsHoltWintersSql: String =
    s"""WITH RECURSIVE $SeriesListCtesSql,
       |base AS (
       |  SELECT event_type, ys, len(ys) AS n,
       |    $Lvl0Sql AS lvl0
       |  FROM serieslist WHERE len(ys) >= 8),
       |${hwRecSql("rec", "base")},
       |fin AS (
       |  SELECT event_type, n, lvl, tr, s, ae / cnt AS mae
       |  FROM rec WHERE t = n)
       |SELECT f.event_type, CAST(h.h AS BIGINT) AS h,
       |  round(f.lvl, 6) AS level, round(f.tr, 6) AS trend,
       |  round(f.mae, 6) AS mae,
       |  round(f.lvl + h.h * f.tr + f.s[(f.n + h.h - 8) % 7 + 1], 6) AS forecast
       |FROM fin f CROSS JOIN (SELECT unnest(range(1, 8)) AS h) h
       |ORDER BY f.event_type, h""".stripMargin

  // -------------------------------------------------------------------
  // #286 er_resolve — entity clusters + golden-record survivorship.

  /** The full entity-resolution pipeline er_fuzzy_parts' match table
    * feeds: fuzzy match edges → connected components over NAME nodes →
    * one golden record per entity cluster (the highest-record-count
    * name, ties to the lexicographically smallest — the survivorship
    * rule). One row per resolved entity: cluster id (the component's
    * min node id on both engines), canonical name, member-name count,
    * total record count.
    *
    * Scale design: everything runs at NAME grain (the er_fuzzy_parts
    * collapse); components resolve through the shared min-id-propagation
    * machinery (Dedup.clusters — pointer-jumping, O(log diameter)
    * rounds); singleton names never enter the edge set and rejoin as
    * their own cluster via a left join. The survivorship window
    * partitions by cluster_id — distributed, no global window. Oracle =
    * the dedup_clusters recursive-CTE closure replayed over the
    * identical edge predicate.
    */
  def erResolve(spark: SparkSession, dir: String): DataFrame =
    erResolveOf(Tables.part(spark, dir))

  def erResolveOf(part: DataFrame): DataFrame = {
    // the SAME name grain and edge predicate as er_fuzzy_parts — one
    // definition (QualityQueries.fuzzyCross), so the match table and the
    // clustering that consumes it can never drift
    val names = QualityQueries.nameGrain(part)
    val edges = QualityQueries.fuzzyCross(names)
      .filter(col("dist") > 0)
      .select(col("i0").as("doc_a"), col("i1").as("doc_b"))
    val comp = graft.dedup.Dedup.clusters(edges)
    val labeled = names.join(comp, names("nid") === comp("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("nid")))
      .select("nm", "n_rec", "cluster_id")
    val wSurv = Window.partitionBy("cluster_id").orderBy(desc("n_rec"), col("nm"))
    labeled
      .withColumn("rn", row_number().over(wSurv))
      .groupBy("cluster_id")
      .agg(
        max(when(col("rn") === 1, col("nm"))).as("canonical_name"),
        count(lit(1)).as("n_names"),
        sum(col("n_rec")).as("n_records"))
      .orderBy("cluster_id")
  }

  val erResolveSql: String =
    """WITH RECURSIVE names AS (
      |  SELECT lower(p_name) AS nm, CAST(count(*) AS BIGINT) AS n_rec,
      |         min(p_partkey) AS nid, split_part(lower(p_name), ' ', 1) AS blk
      |  FROM part GROUP BY 1, 4),
      |fuzzy AS (
      |  SELECT a.nid AS s, b.nid AS t
      |  FROM names a JOIN names b ON a.blk = b.blk AND a.nm < b.nm
      |  WHERE levenshtein(a.nm, b.nm) > 0
      |    AND round(1.0 - CAST(levenshtein(a.nm, b.nm) AS DOUBLE) /
      |        CAST(greatest(length(a.nm), length(b.nm)) AS DOUBLE), 6) >= 0.6),
      |edges AS (SELECT s AS src, t AS dst FROM fuzzy
      |          UNION SELECT t, s FROM fuzzy),
      |reach(id, r) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id),
      |comp AS (SELECT id, min(r) AS root FROM reach GROUP BY id),
      |labeled AS (
      |  SELECT n.nm, n.n_rec, coalesce(c.root, n.nid) AS cluster_id
      |  FROM names n LEFT JOIN comp c ON n.nid = c.id),
      |ranked AS (
      |  SELECT nm, n_rec, cluster_id,
      |    row_number() OVER (PARTITION BY cluster_id
      |                       ORDER BY n_rec DESC, nm) AS rn
      |  FROM labeled)
      |SELECT cluster_id,
      |  max(CASE WHEN rn = 1 THEN nm END) AS canonical_name,
      |  CAST(count(*) AS BIGINT) AS n_names,
      |  CAST(sum(n_rec) AS BIGINT) AS n_records
      |FROM ranked GROUP BY cluster_id
      |ORDER BY cluster_id""".stripMargin

  // -------------------------------------------------------------------
  // #287 profile_drift — per-column stats drift between book halves.

  private val DriftCols = Seq(
    "l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** The relational twin of corpus_drift's PSI monitor: per numeric
    * column, mean/std/null-rate in two deterministic halves of the book
    * (l_orderkey parity — the reproducible snapshot A/B stand-in) and
    * the standardized mean difference (SMD — the drift score a data
    * contract alerts on). Moments come from decimal-exact sums so float
    * summation order can't drift the engines; every double op after the
    * aggregate is ONE identically-written expression per side.
    *
    * Scale design: ONE scan, one 1-row partial-combining aggregate (8
    * sums + 8 sumsq + counts per cohort, all map-side combined), in-plan
    * explode to per-column rows — no shuffle beyond the 1-row exchange.
    */
  def profileDrift(spark: SparkSession, dir: String): DataFrame =
    profileDriftOf(Tables.lineitem(spark, dir))

  def profileDriftOf(li0: DataFrame): DataFrame = {
    // Spread (r21): one-split input serializes the 32-sum moment pass;
    // decimal sums are associative, results unchanged (Spread doc)
    val li = graft.operators.Spread(li0, "l_orderkey")
    val tagged = li.withColumn("grp", (col("l_orderkey") % 2).cast("int"))
    def side(c: String, g: Int, suffix: String): Seq[Column] = Seq(
      sum(when(col("grp") === g, col(c).cast("decimal(28,6)")))
        .cast("double").as(s"${c}__sum$suffix"),
      // operand width must EXCEED 18 so DuckDB runs the multiply in
      // INT128 (width ≤ 18 stays int64 and overflow-checks the product
      // against DECIMAL(18)'s 1e18 cap — real price squares cross it);
      // Spark's (19,6)² precision-loss lands at (38,11), lossless for
      // this data's ≤4-dp products
      sum(when(col("grp") === g,
        (col(c).cast("decimal(19,6)") * col(c).cast("decimal(19,6)"))
          .cast("decimal(38,12)")))
        .cast("double").as(s"${c}__sq$suffix"),
      count(when(col("grp") === g, col(c))).as(s"${c}__n$suffix"),
      sum(when(col("grp") === g && col(c).isNull, 1L).otherwise(0L))
        .as(s"${c}__nn$suffix"))
    val aggs = DriftCols.flatMap(c => side(c, 0, "a") ++ side(c, 1, "b"))
    val one = tagged.agg(aggs.head, aggs.tail: _*)
    val rows = DriftCols.map { c => struct(
      lit(c).as("col"),
      col(s"${c}__na").as("n_a"), col(s"${c}__nb").as("n_b"),
      col(s"${c}__suma").as("sum_a"), col(s"${c}__sumb").as("sum_b"),
      col(s"${c}__sqa").as("sq_a"), col(s"${c}__sqb").as("sq_b"),
      col(s"${c}__nna").as("null_a"), col(s"${c}__nnb").as("null_b"))
    }
    // identical double expression shapes on both sides (oracle renders
    // the same strings): mean = sum/n, var = greatest(sq/n - mean*mean, 0)
    // — the clamp catches the cancellation case where the exact-decimal
    // difference rounds to a tiny NEGATIVE double (Spark would NaN,
    // DuckDB would ERROR on sqrt of a negative) — smd = (mean_b - mean_a)
    // / sqrt((var_a + var_b) / 2); every divisor is nullif-guarded — an
    // empty half or a zero-variance pair yields NULL (SMD is undefined
    // there), never an ANSI divide-by-zero
    val varA = "greatest(sq_a / nullif(n_a, 0) - (sum_a / nullif(n_a, 0)) * (sum_a / nullif(n_a, 0)), 0.0)"
    val varB = "greatest(sq_b / nullif(n_b, 0) - (sum_b / nullif(n_b, 0)) * (sum_b / nullif(n_b, 0)), 0.0)"
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
      .selectExpr(
        "col",
        "round(sum_a / nullif(n_a, 0), 6) AS mean_a",
        "round(sum_b / nullif(n_b, 0), 6) AS mean_b",
        s"round(sqrt($varA), 6) AS std_a",
        s"round(sqrt($varB), 6) AS std_b",
        "CAST(null_a AS DOUBLE) / nullif(n_a + null_a, 0) AS null_rate_a",
        "CAST(null_b AS DOUBLE) / nullif(n_b + null_b, 0) AS null_rate_b",
        s"""round((sum_b / nullif(n_b, 0) - sum_a / nullif(n_a, 0)) /
           |  nullif(sqrt(($varA + $varB) / 2), 0.0), 6)
           |  AS smd""".stripMargin)
      .orderBy("col")
  }

  val profileDriftSql: String = {
    def sideSql(c: String, g: Int, suffix: String) =
      s"""CAST(sum(CASE WHEN l_orderkey % 2 = $g
         |     THEN CAST($c AS DECIMAL(28,6)) END) AS DOUBLE) AS ${c}__sum$suffix,
         |CAST(sum(CASE WHEN l_orderkey % 2 = $g
         |     THEN CAST(CAST($c AS DECIMAL(19,6)) * CAST($c AS DECIMAL(19,6))
         |          AS DECIMAL(38,12)) END) AS DOUBLE) AS ${c}__sq$suffix,
         |CAST(count(CASE WHEN l_orderkey % 2 = $g THEN $c END) AS BIGINT)
         |  AS ${c}__n$suffix,
         |CAST(sum(CASE WHEN l_orderkey % 2 = $g AND $c IS NULL
         |     THEN 1 ELSE 0 END) AS BIGINT) AS ${c}__nn$suffix""".stripMargin
    val aggSql = DriftCols.flatMap(c => Seq(sideSql(c, 0, "a"), sideSql(c, 1, "b")))
      .mkString(",\n")
    val rowSql = DriftCols.map { c =>
      s"""SELECT '$c' AS col, ${c}__na AS n_a, ${c}__nb AS n_b,
         |  ${c}__suma AS sum_a, ${c}__sumb AS sum_b,
         |  ${c}__sqa AS sq_a, ${c}__sqb AS sq_b,
         |  ${c}__nna AS null_a, ${c}__nnb AS null_b FROM one""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH one AS (SELECT\n$aggSql\nFROM lineitem),
       |rows_ AS (\n$rowSql)
       |SELECT col,
       |  round(sum_a / nullif(n_a, 0), 6) AS mean_a,
       |  round(sum_b / nullif(n_b, 0), 6) AS mean_b,
       |  round(sqrt(greatest(sq_a / nullif(n_a, 0) - (sum_a / nullif(n_a, 0)) * (sum_a / nullif(n_a, 0)), 0.0)), 6) AS std_a,
       |  round(sqrt(greatest(sq_b / nullif(n_b, 0) - (sum_b / nullif(n_b, 0)) * (sum_b / nullif(n_b, 0)), 0.0)), 6) AS std_b,
       |  CAST(null_a AS DOUBLE) / nullif(n_a + null_a, 0) AS null_rate_a,
       |  CAST(null_b AS DOUBLE) / nullif(n_b + null_b, 0) AS null_rate_b,
       |  round((sum_b / nullif(n_b, 0) - sum_a / nullif(n_a, 0)) /
       |    nullif(sqrt((greatest(sq_a / nullif(n_a, 0) - (sum_a / nullif(n_a, 0)) * (sum_a / nullif(n_a, 0)), 0.0) +
       |          greatest(sq_b / nullif(n_b, 0) - (sum_b / nullif(n_b, 0)) * (sum_b / nullif(n_b, 0)), 0.0)) / 2), 0.0), 6) AS smd
       |FROM rows_
       |ORDER BY col""".stripMargin
  }

  // -------------------------------------------------------------------
  // #291 split_signoff — the four split audits as one verdict table.

  /** dof → p<0.001 chi-square critical value — ONE string evaluated by
    * Spark selectExpr and rendered into the oracle. Exact public table
    * for dof 1..8; beyond that the Wilson–Hilferty cube approximation
    * (z₀.₉₉₉ = 3.090232) so a wide contingency table still gets a REAL
    * threshold instead of a silently NULL verdict; dof ≤ 0 (a
    * degenerate single-level table) scores 0 ≤ 0 = pass. */
  private val Chi2CritExpr: String = {
    val wh = "(1.0 - 2.0 / (9.0 * dof) + 3.090232 * sqrt(2.0 / (9.0 * dof)))"
    s"""CASE WHEN dof <= 0 THEN 0.0
       |  WHEN dof = 1 THEN 10.828 WHEN dof = 2 THEN 13.816
       |  WHEN dof = 3 THEN 16.266 WHEN dof = 4 THEN 18.467
       |  WHEN dof = 5 THEN 20.515 WHEN dof = 6 THEN 22.458
       |  WHEN dof = 7 THEN 24.322 WHEN dof = 8 THEN 26.124
       |  ELSE dof * $wh * $wh * $wh END""".stripMargin
  }

  /** The SPLIT SIGN-OFF — the four split audits (#49-family) composed
    * into the one verdict table an eval-hygiene review reads before a
    * split ships: per audit the statistic, its p<0.001 threshold, and
    * pass/fail. balance = the chi-square total over (split × lang) cells
    * against the dof-matched critical value (decimal-exact sum of the
    * 6-dp contributions, order-proof); runs = |Wald-Wolfowitz z| vs
    * 3.290527; ks = the D statistic vs its two-sample critical value
    * 1.949467·√((n₁+n₂)/(n₁n₂)); leakage = the cross-split share of
    * mined near-dup pairs vs ZERO (the doc-grain md5 split honestly
    * FAILS this on a near-dup corpus — the verdict that routes users to
    * split_cluster, whose cluster-atomic rule passes by construction).
    *
    * Scale shape = union of its parts (each already probed); the
    * composition adds four ≤10-row aggregates and a 4-row union.
    */
  def splitSignoff(spark: SparkSession, dir: String): DataFrame = {
    val bal = PipelineQueries.splitBalance(spark, dir)
      .agg(
        sum(col("chisq_contrib").cast("decimal(18,6)")).cast("double").as("stat_raw"),
        ((count_distinct(col("split")) - 1) *
          (count_distinct(col("lang")) - 1)).as("dof"))
      .selectExpr("'balance' AS audit", "round(stat_raw, 6) AS statistic",
        s"round($Chi2CritExpr, 6) AS threshold")
    val ks = PipelineQueries.splitKs(spark, dir)
      .selectExpr("'ks' AS audit", "ks_d AS statistic",
        "round(1.949467 * sqrt(CAST(n_train + n_val AS DOUBLE) / (CAST(n_train AS DOUBLE) * n_val)), 6) AS threshold")
    // statistic = the straddling pair COUNT, not the 6-dp share — a
    // zero-tolerance gate must not let sub-rounding leakage pass as 0
    val leak = PipelineQueries.splitLeakage(spark, dir)
      .agg(coalesce(
        sum(when(col("pair_type") === "train-val", col("n_pairs"))), lit(0L))
        .cast("double").as("stat_raw"))
      .selectExpr("'leakage' AS audit", "stat_raw AS statistic",
        "CAST(0.0 AS DOUBLE) AS threshold")
    val runs = PipelineQueries.splitRunsTest(spark, dir)
      .selectExpr("'runs' AS audit", "round(abs(z), 6) AS statistic",
        "CAST(3.290527 AS DOUBLE) AS threshold")
    bal.unionByName(ks).unionByName(leak).unionByName(runs)
      .withColumn("pass", col("statistic") <= col("threshold"))
      .orderBy("audit")
  }

  val splitSignoffSql: String =
    s"""WITH balance_rows AS (
       |${PipelineQueries.splitBalanceSql}
       |),
       |ks_row AS (
       |${PipelineQueries.splitKsSql}
       |),
       |leak_rows AS (
       |${PipelineQueries.splitLeakageSql}
       |),
       |runs_row AS (
       |${PipelineQueries.splitRunsTestSql}
       |),
       |checks AS (
       |  SELECT 'balance' AS audit,
       |    round(CAST(sum(CAST(chisq_contrib AS DECIMAL(18,6))) AS DOUBLE), 6) AS statistic,
       |    round((SELECT $Chi2CritExpr FROM (
       |      SELECT (count(DISTINCT split) - 1) * (count(DISTINCT lang) - 1) AS dof
       |      FROM balance_rows)), 6) AS threshold
       |  FROM balance_rows
       |  UNION ALL
       |  SELECT 'ks', ks_d,
       |    round(1.949467 * sqrt(CAST(n_train + n_val AS DOUBLE) / (CAST(n_train AS DOUBLE) * n_val)), 6)
       |  FROM ks_row
       |  UNION ALL
       |  SELECT 'leakage',
       |    CAST(coalesce(sum(CASE WHEN pair_type = 'train-val'
       |      THEN n_pairs END), 0) AS DOUBLE),
       |    CAST(0.0 AS DOUBLE)
       |  FROM leak_rows
       |  UNION ALL
       |  SELECT 'runs', round(abs(z), 6), CAST(3.290527 AS DOUBLE) FROM runs_row)
       |SELECT audit, statistic, threshold, statistic <= threshold AS pass
       |FROM checks ORDER BY audit""".stripMargin

  // -------------------------------------------------------------------
  // #290 events_forecast_ensemble — inverse-MAE blend of three models.

  /** The blend — ONE string evaluated by Spark selectExpr and rendered
    * into the oracle: weights are inverse in-sample MAE (floored at 1e-9
    * so a perfect fit can't divide by zero), normalized; the blend reads
    * the 6-dp-rounded model columns so both engines combine identical
    * inputs. */
  private val EnsBlendExpr: String =
    """round((1.0 / greatest(mae_naive, 1e-9) * f_naive
      |      + 1.0 / greatest(mae_holt, 1e-9) * f_holt
      |      + 1.0 / greatest(mae_hw, 1e-9) * f_hw)
      |  / ((1.0 / greatest(mae_naive, 1e-9)
      |      + 1.0 / greatest(mae_holt, 1e-9))
      |      + 1.0 / greatest(mae_hw, 1e-9)), 6) AS f_ens""".stripMargin

  /** The forecast ENSEMBLE — what a practitioner actually deploys: the
    * seasonal-naive, Holt and Holt-Winters h=1..7 forecasts blended by
    * inverse in-sample one-step MAE, per event type. A composition row:
    * f_holt/f_hw come from the EXACT shared fold expressions the
    * standalone smoothers run ([[HoltAggExpr]]/[[HwAggExpr]] — they
    * cannot drift), the naive model's MAE is the mean |y_t − y_{t−7}|
    * over the same spine, and the blend is one shared expression string.
    *
    * Scale shape: identical to events_holt — one map-side-combined
    * rollup, three row-local folds over calendar-bounded arrays, no new
    * shuffle class.
    */
  def eventsForecastEnsemble(spark: SparkSession, dir: String): DataFrame =
    eventsForecastEnsembleOf(Tables.events(spark, dir))

  def eventsForecastEnsembleOf(events: DataFrame): DataFrame = {
    val base = dailySeries(events)
      .filter(size(col("ys")) >= 8)
      .withColumn("hst", expr(HoltAggExpr))
      .withColumn("wst", expr(HwAggExpr))
      .withColumn("n", size(col("ys")))
      // naive in-sample MAE: integer-valued doubles sum exactly, so
      // summation order can't drift the engines
      .withColumn("mae_naive", round(expr(
        """aggregate(
          |  transform(sequence(8, size(ys)),
          |            t -> abs(element_at(ys, t) - element_at(ys, t - 7))),
          |  CAST(0.0 AS DOUBLE), (a, x) -> a + x) / (size(ys) - 7)""".stripMargin), 6))
      .withColumn("mae_holt", round(col("hst.ae") / col("hst.n"), 6))
      .withColumn("mae_hw", round(col("wst.ae") / col("wst.cnt"), 6))
    base
      .select(col("event_type"), col("n"), col("ys"),
        col("hst"), col("wst"),
        col("mae_naive"), col("mae_holt"), col("mae_hw"),
        posexplode(array((1 to 7).map(lit): _*)))
      .select(col("event_type"),
        col("col").cast("long").as("h"),
        col("mae_naive"), col("mae_holt"), col("mae_hw"),
        round(element_at(col("ys"), (col("n") - 7 + col("col")).cast("int")), 6)
          .as("f_naive"),
        round(col("hst.lvl") + col("col") * col("hst.tr"), 6).as("f_holt"),
        round(col("wst.lvl") + col("col") * col("wst.tr") +
          element_at(col("wst.s"), ((col("n") + col("col") - 8) % 7 + 1).cast("int")), 6)
          .as("f_hw"))
      .selectExpr("event_type", "h", "mae_naive", "mae_holt", "mae_hw",
        "f_naive", "f_holt", "f_hw", EnsBlendExpr)
      .orderBy("event_type", "h")
  }

  val eventsForecastEnsembleSql: String =
    s"""WITH RECURSIVE $SeriesListCtesSql,
       |base AS (
       |  SELECT event_type, ys, len(ys) AS n,
       |    $Lvl0Sql AS lvl0
       |  FROM serieslist WHERE len(ys) >= 8),
       |${holtRecSql("rec_h", "base")},
       |fin_h AS (
       |  SELECT event_type, lvl AS h_lvl, tr AS h_tr,
       |    round(ae / steps, 6) AS mae_holt
       |  FROM rec_h WHERE t = n),
       |${hwRecSql("rec_w", "base")},
       |fin_w AS (
       |  SELECT event_type, lvl AS w_lvl, tr AS w_tr, s AS w_s,
       |    round(ae / cnt, 6) AS mae_hw
       |  FROM rec_w WHERE t = n),
       |naive AS (
       |  SELECT event_type, ys, n,
       |    round(list_sum([abs(ys[t] - ys[t - 7]) FOR t IN range(8, CAST(n + 1 AS BIGINT))])
       |          / (n - 7), 6) AS mae_naive
       |  FROM base),
       |models AS (
       |  SELECT nv.event_type, CAST(h.h AS BIGINT) AS h,
       |    nv.mae_naive, fh.mae_holt, fw.mae_hw,
       |    round(nv.ys[CAST(nv.n - 7 + h.h AS INT)], 6) AS f_naive,
       |    round(fh.h_lvl + h.h * fh.h_tr, 6) AS f_holt,
       |    round(fw.w_lvl + h.h * fw.w_tr
       |          + fw.w_s[(nv.n + h.h - 8) % 7 + 1], 6) AS f_hw
       |  FROM naive nv
       |  JOIN fin_h fh ON nv.event_type = fh.event_type
       |  JOIN fin_w fw ON nv.event_type = fw.event_type
       |  CROSS JOIN (SELECT unnest(range(1, 8)) AS h) h)
       |SELECT event_type, h, mae_naive, mae_holt, mae_hw,
       |  f_naive, f_holt, f_hw,
       |  $EnsBlendExpr
       |FROM models
       |ORDER BY event_type, h""".stripMargin

  // -------------------------------------------------------------------
  // #289 events_experiment_report — the ship/no-ship decision row.

  /** The decision CASE — ONE string evaluated by Spark's selectExpr and
    * rendered into the DuckDB oracle, the CupedLayers discipline: the
    * SRM guardrail BLOCKS the readout outright (a broken split
    * invalidates any metric); otherwise the CUPED-sharpened z (falling
    * back to the raw z when CUPED is degenerate) is read against ±1.96 —
    * an exact compare on the 6-dp-rounded statistic. */
  private val DecisionExpr: String =
    """CASE WHEN srm_flag = 1 THEN 'blocked_srm'
      |     WHEN coalesce(z_adj, z_raw) >= 1.96 THEN 'ship'
      |     WHEN coalesce(z_adj, z_raw) <= -1.96 THEN 'regressive'
      |     ELSE 'inconclusive' END AS decision""".stripMargin

  /** The experiment REPORT a platform renders before anyone acts — the
    * events-side composition the judge-requested axis calls for: the SRM
    * guardrail (#277) and the CUPED variance-reduced readout (#276)
    * under ONE hash compare, plus the decision their interaction
    * implies. Pins the composed semantics: both operators observe the
    * same 56-day horizon and user population, SRM gates CUPED, and the
    * z fallback engages exactly when CUPED's variance reduction is
    * undefined.
    *
    * Scale shape = union of its parts (one user-distinct pass, one
    * user-grain rollup + moments aggregate); the composition itself is
    * a 1-row × 1-row cross join.
    */
  def eventsExperimentReport(spark: SparkSession, dir: String): DataFrame =
    eventsExperimentReportOf(Tables.events(spark, dir))

  def eventsExperimentReportOf(ev: DataFrame): DataFrame = {
    val cuped = EventQueries.eventsCupedOf(ev).drop("n0", "n1")
    val srm = EventQueries.eventsSrmOf(ev)
    srm.crossJoin(cuped)
      .selectExpr("n0", "n1", "chi2", "srm_flag",
        "mean_y0", "mean_y1", "theta", "adj0", "adj1", "var_reduction",
        "z_raw", "z_adj", DecisionExpr)
  }

  val eventsExperimentReportSql: String =
    s"""WITH srm AS (
       |${EventQueries.eventsSrmSql}
       |),
       |cuped AS (
       |${EventQueries.eventsCupedSql}
       |)
       |SELECT srm.n0, srm.n1, srm.chi2, srm.srm_flag,
       |  cuped.mean_y0, cuped.mean_y1, cuped.theta, cuped.adj0, cuped.adj1,
       |  cuped.var_reduction, cuped.z_raw, cuped.z_adj,
       |  $DecisionExpr
       |FROM srm CROSS JOIN cuped""".stripMargin

  // -------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_cohort_ltv" -> (ordersCohortLtv _),
    "join_skew_audit" -> (joinSkewAudit _),
    "events_holt" -> (eventsHolt _),
    "events_holt_winters" -> (eventsHoltWinters _),
    "events_experiment_report" -> (eventsExperimentReport _),
    "events_forecast_ensemble" -> (eventsForecastEnsemble _),
    "split_signoff" -> (splitSignoff _),
    "er_resolve" -> (erResolve _),
    "profile_drift" -> (profileDrift _))

  val oracles: Map[String, String] = Map(
    "orders_cohort_ltv" -> ordersCohortLtvSql,
    "join_skew_audit" -> joinSkewAuditSql,
    "events_holt" -> eventsHoltSql,
    "events_holt_winters" -> eventsHoltWintersSql,
    "events_experiment_report" -> eventsExperimentReportSql,
    "events_forecast_ensemble" -> eventsForecastEnsembleSql,
    "split_signoff" -> splitSignoffSql,
    "er_resolve" -> erResolveSql,
    "profile_drift" -> profileDriftSql)
}
