package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 data-quality and feature-engineering widening: the four
  * pipeline staples the inventory still lacked — fuzzy entity resolution
  * (blocked edit-distance matching), a one-pass column profiler (the
  * Deequ-style table audit), ML feature/label matrix generation, and an
  * SCD2 (slowly-changing-dimension type-2) interval build from event
  * snapshots. Same oracle-parity discipline as AnalyticsQueries:
  * decimal-exact money math cast to DOUBLE at the boundary, counts as
  * BIGINT, total ordering by a unique key.
  */
object QualityQueries {

  private def dec(c: Column) = c.cast("decimal(18,2)")

  // -------------------------------------------------------------------
  // #278 er_fuzzy_parts — blocked fuzzy entity resolution over part names.

  /** Entity resolution with blocking: the record-linkage modality the
    * dedup suite lacked (exact/MinHash/SimHash/embedding cover documents;
    * this covers short entity STRINGS via edit distance).
    *
    * Scale design: records collapse to NAME grain FIRST (one map-side-
    * combined groupBy), so the quadratic step runs over distinct entity
    * names, not records — at 100 TB the name table is orders of magnitude
    * smaller than the record table, and record-pair counts come back by
    * multiplying per-name record counts (counted in DOUBLE so huge-corpus
    * products cannot wrap, the basket_pairs lesson). Candidate pairs come
    * from a self-join on the blocking key (first token), scored row-local
    * with codegen `levenshtein`; exact duplicates (same name, >=2 records)
    * are emitted arithmetically without ever joining. Production blocking
    * would add a second key (length band / sorted-neighborhood) to bound
    * block size; the single-key block keeps the oracle twin exact.
    */
  def erFuzzyParts(spark: SparkSession, dir: String): DataFrame =
    erFuzzyPartsOf(Tables.part(spark, dir))

  /** Match-similarity floor shared by er_fuzzy_parts and er_resolve. */
  private[queries] val SimTau = 0.6

  /** Name-grain collapse: one map-side-combined groupBy; `nid` (the
    * name's min record key) is the node id er_resolve clusters on. */
  private[queries] def nameGrain(part: DataFrame): DataFrame =
    part.groupBy(lower(col("p_name")).as("nm"))
      .agg(count(lit(1)).as("n_rec"), min(col("p_partkey")).as("nid"))
      .withColumn("blk", substring_index(col("nm"), " ", 1))

  /** Blocked fuzzy cross pairs (name0 < name1) scored with levenshtein
    * similarity ≥ SimTau — ONE definition of the edge predicate, so the
    * match table (er_fuzzy_parts) and the clustering that consumes it
    * (er_resolve) can never drift. */
  private[queries] def fuzzyCross(names: DataFrame): DataFrame = {
    val a = names.select(col("nm").as("name0"), col("n_rec").as("r0"),
      col("nid").as("i0"), col("blk"))
    val b = names.select(col("nm").as("name1"), col("n_rec").as("r1"),
      col("nid").as("i1"), col("blk"))
    a.join(b, Seq("blk"))
      .filter(col("name0") < col("name1"))
      .withColumn("dist", levenshtein(col("name0"), col("name1")).cast("long"))
      .withColumn("sim", round(
        lit(1.0) - col("dist").cast("double") /
          greatest(length(col("name0")), length(col("name1"))).cast("double"), 6))
      .filter(col("sim") >= SimTau)
  }

  def erFuzzyPartsOf(part: DataFrame): DataFrame = {
    val names = nameGrain(part)
    val cross = fuzzyCross(names)
      .select(col("name0"), col("name1"), col("dist"), col("sim"),
        (col("r0").cast("double") * col("r1").cast("double")).as("n_rec_pairs"))
    val exact = names.filter(col("n_rec") >= 2)
      .select(col("nm").as("name0"), col("nm").as("name1"),
        lit(0L).as("dist"), lit(1.0).as("sim"),
        (col("n_rec").cast("double") * (col("n_rec") - 1).cast("double") / 2.0)
          .as("n_rec_pairs"))
    cross.unionByName(exact)
      .orderBy(desc("sim"), col("name0"), col("name1"))
  }

  val erFuzzyPartsSql: String =
    """WITH names AS (
      |  SELECT lower(p_name) AS nm, CAST(count(*) AS BIGINT) AS n_rec,
      |         split_part(lower(p_name), ' ', 1) AS blk
      |  FROM part GROUP BY 1, 3),
      |cross_pairs AS (
      |  SELECT a.nm AS name0, b.nm AS name1,
      |         CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist,
      |         round(1.0 - CAST(levenshtein(a.nm, b.nm) AS DOUBLE) /
      |               CAST(greatest(length(a.nm), length(b.nm)) AS DOUBLE), 6) AS sim,
      |         CAST(a.n_rec AS DOUBLE) * CAST(b.n_rec AS DOUBLE) AS n_rec_pairs
      |  FROM names a JOIN names b ON a.blk = b.blk AND a.nm < b.nm),
      |exact_pairs AS (
      |  SELECT nm AS name0, nm AS name1, CAST(0 AS BIGINT) AS dist,
      |         CAST(1.0 AS DOUBLE) AS sim,
      |         CAST(n_rec AS DOUBLE) * CAST(n_rec - 1 AS DOUBLE) / 2.0 AS n_rec_pairs
      |  FROM names WHERE n_rec >= 2)
      |SELECT * FROM (
      |  SELECT * FROM cross_pairs WHERE sim >= 0.6
      |  UNION ALL SELECT * FROM exact_pairs)
      |ORDER BY sim DESC, name0, name1""".stripMargin

  // -------------------------------------------------------------------
  // #279 table_profile — one-pass Deequ-style column profiler.

  // private[graft]: the streaming twin (StreamingProfile) profiles the
  // SAME column set, so the lists must have one owner or the twins drift
  private[graft] val ProfileNumCols = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private[graft] val ProfileStrCols = Seq("l_returnflag", "l_linestatus")

  /** Per-column data-quality profile of lineitem: null count, exact
    * distinct count, numeric min/max/mean (decimal-exact mean so float
    * summation order can't drift the oracle), lexicographic min/max for
    * strings, ISO-rendered min/max for the date column.
    *
    * Scale design: TWO scans, both whole-stage codegen. The STATS pass
    * (nulls/min/max/decimal mean) is one partial-combining hash aggregate
    * to a single row, unpacked to per-column rows with an in-plan explode
    * — no driver collect. The DISTINCT pass must NOT ride the same
    * aggregate: 11 count-distincts in one agg make Spark key the Expand
    * by ALL columns at once (a 12-column SortAggregate over 11× the fact
    * rows with 49 aggregates — measured 51 s at sf0.1). Instead the
    * columns stack to narrow (col, rendered-value) pairs — any injective
    * per-column rendering preserves the distinct COUNT — and ONE
    * single-distinct groupBy(col) hash-aggregates them: map-side partial
    * dedup, shuffle = the sum of per-column distinct cardinalities — the
    * information-theoretic floor for exact profiling (production swaps in
    * approx_count_distinct to stay sketch-sized; exact keeps the oracle
    * twin checkable). Measured 51 s → ~3 s at sf0.1. The two 11-row
    * results broadcast-join on the column name.
    */
  def tableProfile(spark: SparkSession, dir: String): DataFrame =
    tableProfileOf(Tables.lineitem(spark, dir))

  def tableProfileOf(li0: DataFrame): DataFrame = {
    // Spread (r21): the driver testdata is one parquet split, so both the
    // stats pass and the 11-way stacked-distinct explode otherwise run
    // their map side on ONE core; the two passes sit in one final plan,
    // so the repartition exchange is computed once and reused by both
    // branches. Skipped at scale (Spread doc).
    val li = graft.operators.Spread(li0, "l_orderkey")
    def nNull(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn")
    val aggs: Seq[Column] =
      ProfileNumCols.flatMap { c => Seq(
        nNull(c),
        min(col(c)).cast("double").as(s"${c}__mn"),
        max(col(c)).cast("double").as(s"${c}__mx"),
        (sum(col(c).cast("decimal(28,6)")).cast("double") /
          nullif(count(col(c)), lit(0L))).as(s"${c}__av"))
      } ++ ProfileStrCols.flatMap { c => Seq(
        nNull(c),
        min(col(c)).as(s"${c}__mns"), max(col(c)).as(s"${c}__mxs"))
      } ++ Seq(
        nNull("l_shipdate"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("l_shipdate__mns"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("l_shipdate__mxs"))
    val one = li.agg(aggs.head, aggs.tail: _*)
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val rows: Seq[Column] =
      ProfileNumCols.map { c => struct(
        lit(c).as("col"), col(s"${c}__nn").as("n_null"),
        col(s"${c}__mn").as("min_num"), col(s"${c}__mx").as("max_num"),
        col(s"${c}__av").as("avg_num"), nullS.as("min_str"), nullS.as("max_str"))
      } ++ (ProfileStrCols :+ "l_shipdate").map { c => struct(
        lit(c).as("col"), col(s"${c}__nn").as("n_null"),
        nullD.as("min_num"), nullD.as("max_num"), nullD.as("avg_num"),
        col(s"${c}__mns").as("min_str"), col(s"${c}__mxs").as("max_str"))
      }
    val stats = one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
    // distinct pass: stack to (col, injectively-rendered value), one
    // single-distinct hash aggregate (timestamps render as unix micros —
    // string-of-timestamp would be zone-dependent)
    val stacked = li.select(explode(array(
      (ProfileNumCols ++ ProfileStrCols).map(c =>
        struct(lit(c).as("col"), col(c).cast("string").as("v"))) :+
      struct(lit("l_shipdate").as("col"),
        unix_micros(col("l_shipdate").cast("timestamp")).cast("string").as("v")): _*))
      .as("p"))
      .select(col("p.*"))
    val distincts = stacked.groupBy("col").agg(count_distinct(col("v")).as("n_distinct"))
    stats.join(broadcast(distincts), Seq("col"), "left")
      .select("col", "n_null", "n_distinct", "min_num", "max_num", "avg_num",
        "min_str", "max_str")
      .orderBy("col")
  }

  val tableProfileSql: String = {
    def numSel(c: String) =
      s"""SELECT '$c' AS col,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
         |  CAST(sum(CAST($c AS DECIMAL(28,6))) AS DOUBLE) / nullif(count($c), 0) AS avg_num,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM lineitem""".stripMargin
    def strSel(c: String, minX: String, maxX: String) =
      s"""SELECT '$c' AS col,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         |  CAST(NULL AS DOUBLE) AS avg_num,
         |  $minX AS min_str, $maxX AS max_str
         |FROM lineitem""".stripMargin
    val parts =
      ProfileNumCols.map(numSel) ++
      ProfileStrCols.map(c => strSel(c, s"min($c)", s"max($c)")) :+
      strSel("l_shipdate",
        "strftime(min(l_shipdate), '%Y-%m-%d')",
        "strftime(max(l_shipdate), '%Y-%m-%d')")
    parts.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col")
  }

  /** #293 table_profile_approx: the SKETCH-SIZED production variant of
    * #279 (r14 verdict #4 — the #145/#160 symmetry: the approx path
    * registered beside the exact answer). Same output schema, but
    * n_distinct comes from approx_count_distinct (HLL++, rsd 2%) — and
    * because HLL sketches compose inside an ordinary hash aggregate
    * (unlike count_distinct, which Expands the input per distinct
    * column), the WHOLE profile collapses to ONE scan: one
    * partial-combining aggregate to a single row carrying
    * nulls/min/max/mean AND the 11 distinct sketches, unpacked in-plan.
    * Shuffle = one row of sketches, the term that at 100× grew 15.7× in
    * the exact profile (its distinct shuffle is the information-theoretic
    * floor; this is the documented swap, now a first-class gate row).
    * Rows-only by design: HLL estimates are engine-specific; the ≤5%
    * per-column accuracy contract vs the exact profile is spec-pinned
    * (QualityQueriesSpec). */
  def tableProfileApprox(spark: SparkSession, dir: String): DataFrame =
    tableProfileApproxOf(Tables.lineitem(spark, dir))

  def tableProfileApproxOf(li0: DataFrame): DataFrame = {
    // Spread (r21): one-split input serializes the sketch build — HLL
    // register merges are order-independent, results unchanged
    val li = graft.operators.Spread(li0, "l_orderkey")
    def nNull(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn")
    def nDist(c: String) = approx_count_distinct(col(c), 0.02).as(s"${c}__nd")
    val aggs: Seq[Column] =
      ProfileNumCols.flatMap { c => Seq(
        nNull(c), nDist(c),
        min(col(c)).cast("double").as(s"${c}__mn"),
        max(col(c)).cast("double").as(s"${c}__mx"),
        (sum(col(c).cast("decimal(28,6)")).cast("double") /
          nullif(count(col(c)), lit(0L))).as(s"${c}__av"))
      } ++ ProfileStrCols.flatMap { c => Seq(
        nNull(c), nDist(c),
        min(col(c)).as(s"${c}__mns"), max(col(c)).as(s"${c}__mxs"))
      } ++ Seq(
        nNull("l_shipdate"), nDist("l_shipdate"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("l_shipdate__mns"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("l_shipdate__mxs"))
    val one = li.agg(aggs.head, aggs.tail: _*)
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val rows: Seq[Column] =
      ProfileNumCols.map { c => struct(
        lit(c).as("col"), col(s"${c}__nn").as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_num"), col(s"${c}__mx").as("max_num"),
        col(s"${c}__av").as("avg_num"), nullS.as("min_str"), nullS.as("max_str"))
      } ++ (ProfileStrCols :+ "l_shipdate").map { c => struct(
        lit(c).as("col"), col(s"${c}__nn").as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        nullD.as("min_num"), nullD.as("max_num"), nullD.as("avg_num"),
        col(s"${c}__mns").as("min_str"), col(s"${c}__mxs").as("max_str"))
      }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
      .orderBy("col")
  }

  // -------------------------------------------------------------------
  // #280 feat_customer_orders — ML feature/label matrix generation.

  /** Per-order training rows for a next-purchase model: leak-free
    * point-in-time features (gap since previous order, orders/spend so
    * far, mean inter-order gap so far) and the supervised label (days to
    * the NEXT order, NULL on the censored last order). The feature-matrix
    * op every training pipeline runs before handing data to a learner.
    *
    * Scale design: ONE hash shuffle on o_custkey; every window (lag, lead,
    * cumulative sums/counts) shares that partitioning, so Spark plans one
    * exchange + one sort and evaluates all frames in a single WindowExec
    * pass per sort order. Cumulative money is decimal-exact then cast;
    * mean gap is an exact integer sum over an exact count, divided in
    * DOUBLE — no float accumulation order anywhere.
    */
  def featCustomerOrders(spark: SparkSession, dir: String): DataFrame =
    featCustomerOrdersOf(Tables.orders(spark, dir))

  def featCustomerOrdersOf(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("order_date"), col("o_orderkey"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = orders.select(
      col("o_custkey"), col("o_orderkey"),
      to_date(col("o_orderdate")).as("order_date"),
      col("o_totalprice"))
    val gapped = base
      .withColumn("ord_idx", row_number().over(w).cast("long"))
      .withColumn("gap_prev",
        datediff(col("order_date"), lag(col("order_date"), 1).over(w)).cast("long"))
      .withColumn("gap_next",
        datediff(lead(col("order_date"), 1).over(w), col("order_date")).cast("long"))
    gapped
      .withColumn("spend_so_far", sum(dec(col("o_totalprice"))).over(wCum).cast("double"))
      .withColumn("avg_gap_so_far",
        sum(col("gap_prev")).over(wCum).cast("double") /
          nullif(count(col("gap_prev")).over(wCum), lit(0L)))
      .select("o_custkey", "o_orderkey", "order_date", "ord_idx", "gap_prev",
        "spend_so_far", "avg_gap_so_far", "gap_next")
      .orderBy("o_custkey", "ord_idx")
  }

  val featCustomerOrdersSql: String =
    """WITH base AS (
      |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      |         o_totalprice
      |  FROM orders),
      |gapped AS (
      |  SELECT o_custkey, o_orderkey, order_date, o_totalprice,
      |    CAST(row_number() OVER w AS BIGINT) AS ord_idx,
      |    CAST(date_diff('day', lag(order_date, 1) OVER w, order_date) AS BIGINT) AS gap_prev,
      |    CAST(date_diff('day', order_date, lead(order_date, 1) OVER w) AS BIGINT) AS gap_next
      |  FROM base
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY order_date, o_orderkey))
      |SELECT o_custkey, o_orderkey, order_date, ord_idx, gap_prev,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER wc AS DOUBLE) AS spend_so_far,
      |  CAST(sum(gap_prev) OVER wc AS DOUBLE) / nullif(count(gap_prev) OVER wc, 0) AS avg_gap_so_far,
      |  gap_next
      |FROM gapped
      |WINDOW wc AS (PARTITION BY o_custkey ORDER BY order_date, o_orderkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, ord_idx""".stripMargin

  // -------------------------------------------------------------------
  // #281 scd2_events — SCD2 interval build from event snapshots.

  /** Slowly-changing-dimension type-2 history: per user, the day-grain
    * tier (props.k div 25) collapses into [valid_from, valid_to] validity
    * intervals — the gaps-and-islands compression every warehouse runs to
    * turn mutation streams into versioned dimensions. `is_current` marks
    * each user's open interval.
    *
    * Scale design: the fact scan reduces to (user, day) grain in the
    * FIRST step via an AGGREGATE day-dedup — max(struct(ts, event_id,
    * tier)) partial-combines map-side, so only day-winners reach the
    * exchange (a per-(user, day) row_number window would shuffle every
    * fact row; the streaming twin's state merge is this same max). The
    * day-last event wins deterministically on (ts, event_id) so engine
    * tie-order can't drift the result. The islands windows (lag flag,
    * running sum, per-user max day) share one hash exchange on user_id
    * over the day-grain rows. Interval count is bounded by the number of
    * VALUE CHANGES, not days or events.
    */
  def scd2Events(spark: SparkSession, dir: String): DataFrame =
    scd2EventsOf(Tables.events(spark, dir))

  /** ANSI-null-safe tier derivation (the events_props_agg from_json
    * convention — a non-numeric k yields NULL, never a CAST error),
    * shared with the streaming twin so the two can't drift. */
  private[graft] def scd2Tier: Column =
    floor(from_json(col("props"),
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
      .getField("k") / 25).cast("long")

  def scd2EventsOf(events: DataFrame): DataFrame = {
    val wUser = Window.partitionBy("user_id").orderBy("day")
    val wCum = wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val days = events
      .select(col("user_id"), to_date(col("ts")).as("day"), col("ts"), col("event_id"),
        scd2Tier.as("tier"))
      .filter(col("tier").isNotNull)
      .groupBy("user_id", "day")
      .agg(max(struct(col("ts"), col("event_id"), col("tier"))).as("w"))
      .select(col("user_id"), col("day"), col("w.tier").as("tier"))
    val islands = days
      .withColumn("chg",
        when(lag(col("tier"), 1).over(wUser).isNull
          || lag(col("tier"), 1).over(wUser) =!= col("tier"), 1L).otherwise(0L))
      .withColumn("isl", sum(col("chg")).over(wCum))
    val intervals = islands.groupBy("user_id", "isl", "tier")
      .agg(min(col("day")).as("valid_from"), max(col("day")).as("valid_to"),
        count(lit(1)).as("n_days"))
    intervals
      .withColumn("is_current",
        col("valid_to") === max(col("valid_to")).over(Window.partitionBy("user_id")))
      .select("user_id", "tier", "valid_from", "valid_to", "n_days", "is_current")
      .orderBy("user_id", "valid_from")
  }

  val scd2EventsSql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
      |    CAST(floor(CASE WHEN json_valid(props)
      |         THEN CAST(json_extract(props, '$.k') AS BIGINT) END / 25.0) AS BIGINT) AS tier
      |  FROM events),
      |d AS (
      |  SELECT user_id, day, tier FROM (
      |    SELECT user_id, day, tier,
      |      row_number() OVER (PARTITION BY user_id, day
      |                         ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM e WHERE tier IS NOT NULL)
      |  WHERE rn = 1),
      |flagged AS (
      |  SELECT user_id, day, tier,
      |    CASE WHEN lag(tier, 1) OVER w IS NULL
      |           OR lag(tier, 1) OVER w <> tier THEN 1 ELSE 0 END AS chg
      |  FROM d WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      |islands AS (
      |  SELECT user_id, day, tier,
      |    sum(chg) OVER (PARTITION BY user_id ORDER BY day
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
      |  FROM flagged),
      |intervals AS (
      |  SELECT user_id, isl, tier, min(day) AS valid_from, max(day) AS valid_to,
      |    CAST(count(*) AS BIGINT) AS n_days
      |  FROM islands GROUP BY 1, 2, 3)
      |SELECT user_id, tier, valid_from, valid_to, n_days,
      |  valid_to = max(valid_to) OVER (PARTITION BY user_id) AS is_current
      |FROM intervals
      |ORDER BY user_id, valid_from""".stripMargin

  // -------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er_fuzzy_parts" -> (erFuzzyParts _),
    "table_profile" -> (tableProfile _),
    "table_profile_approx" -> (tableProfileApprox _),
    "feat_customer_orders" -> (featCustomerOrders _),
    "scd2_events" -> (scd2Events _))

  val oracles: Map[String, String] = Map(
    "er_fuzzy_parts" -> erFuzzyPartsSql,
    "table_profile" -> tableProfileSql,
    "feat_customer_orders" -> featCustomerOrdersSql,
    "scd2_events" -> scd2EventsSql)
}
