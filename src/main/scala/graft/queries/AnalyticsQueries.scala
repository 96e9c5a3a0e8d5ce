package graft.queries

import graft.operators.Pin.PinOps
import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 analytics additions over the TPC-H-ish substrate: CUBE
  * grouping sets, RFM segmentation, the skyline (Pareto-frontier)
  * operator, and a referential-integrity audit. Same oracle-parity rules
  * as RelationalQueries (decimal-exact money math, total ordering by a
  * unique key).
  */
object AnalyticsQueries {

  private def dec(c: Column) = c.cast("decimal(18,2)")

  // -------------------------------------------------------------------
  // #201 q1_cube — Q1 pricing summary over GROUP BY CUBE.

  /** One-pass CUBE over (returnflag, linestatus): like q1_rollup, the
    * grouping-set expansion happens in a single Expand node feeding ONE
    * shuffled aggregate (4 group-sets × group-key cardinality rows —
    * the Expand multiplies rows map-side but partial aggregation
    * collapses them before the exchange, so shuffle volume is bounded by
    * the tiny result cardinality, not the fact table). Subtotal rows
    * surface as 'ALL' (the data's flags are never NULL, so the coalesce
    * is unambiguous). */
  def q1Cube(spark: SparkSession, dir: String): DataFrame =
    q1CubeOf(Tables.lineitem(spark, dir))

  def q1CubeOf(li0: DataFrame): DataFrame = {
    // Spread (r21): the CUBE's 4x Expand multiplies the fact rows BEFORE
    // the partial aggregate, and a one-split input runs that whole
    // expansion on a single core (Spread doc; skipped at scale)
    val li = graft.operators.Spread(li0, "l_orderkey")
    q1CubeSpread(li)
  }

  private def q1CubeSpread(li: DataFrame): DataFrame =
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("count_order"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("count_order"), col("sum_qty"), col("sum_base_price"))
      .orderBy("returnflag", "linestatus")

  val q1CubeSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  count(*) AS count_order,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  // -------------------------------------------------------------------
  // #202 orders_rfm — recency/frequency/monetary quintile segmentation.

  /** Scale-safe global row_number: range-partition on the sort key,
    * per-shard local row_number, broadcast per-shard offsets (the
    * customer_pareto machinery in reusable form). localCheckpoint pins
    * ONE materialized partitioning so the offsets aggregate and the
    * ranked rows observe identical partition boundaries — without it a
    * plan change could silently re-sample the range boundaries between
    * the two subtrees and mis-rank. */
  private[graft] def globalRowNumber(df: DataFrame, out: String,
                                       sortCols: Column*): DataFrame = {
    val parted = df.repartitionByRange(32, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .pin()
    val shard = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val local = parted.withColumn("__lrk", row_number().over(shard).cast("long"))
    val offW = graft.operators.BoundedWindow.keyed(col("__pid")).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(offW), lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offsets), "__pid")
      .withColumn(out, col("__off") + col("__lrk"))
      .drop("__pid", "__lrk", "__off")
  }

  /** Per-GROUP scale-safe row_number (the CCNet-bucket shape: rank within
    * language over billions of docs): range-partition on (group, sort
    * key) so a big group spans many partitions, per-shard local
    * row_number restarting per group, offsets per (shard, group) rolled
    * up per group — the offsets table is |shards|x|groups| rows, tiny by
    * construction. Same localCheckpoint pinning as the global form. */
  private[graft] def groupedRowNumber(df: DataFrame, out: String,
                                      groupCol: Column,
                                      sortCols: Column*): DataFrame = {
    val parted = df.repartitionByRange(32, (groupCol.asc +: sortCols): _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__grp", groupCol)
      .pin()
    val shard = Window.partitionBy("__pid", "__grp").orderBy(sortCols: _*)
    val local = parted.withColumn("__lrk", row_number().over(shard).cast("long"))
    val offW = Window.partitionBy("__grp").orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy("__pid", "__grp").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(offW), lit(0L)))
      .select("__pid", "__grp", "__off")
    local.join(broadcast(offsets), Seq("__pid", "__grp"))
      .withColumn(out, col("__off") + col("__lrk"))
      .drop("__pid", "__grp", "__lrk", "__off")
  }

  /** SQL ntile(B) replayed from an explicit global rank: the first
    * n%B buckets take floor(n/B)+1 rows, the rest floor(n/B). Rendered
    * as the SAME arithmetic in both engines (rather than each engine's
    * ntile builtin) so bucket assignment is parity by construction.
    * n<B degenerates to bucket=rank, like ntile. */
  private[graft] def ntileExpr(rk: String, n: String, b: Int): String =
    s"""CAST(CASE WHEN $n DIV $b = 0 THEN $rk
       | WHEN $rk <= ($n % $b) * ($n DIV $b + 1)
       |   THEN ($rk - 1) DIV ($n DIV $b + 1) + 1
       | ELSE ($n % $b) + ($rk - ($n % $b) * ($n DIV $b + 1) - 1) DIV ($n DIV $b) + 1
       |END AS INT)""".stripMargin.replaceAll("\n", " ")

  private[graft] def ntileSqlExpr(rk: String, n: String, b: Int): String =
    s"""CAST(CASE WHEN $n // $b = 0 THEN $rk
       | WHEN $rk <= ($n % $b) * ($n // $b + 1)
       |   THEN ($rk - 1) // ($n // $b + 1) + 1
       | ELSE ($n % $b) + ($rk - ($n % $b) * ($n // $b + 1) - 1) // ($n // $b) + 1
       |END AS INT)""".stripMargin.replaceAll("\n", " ")

  /** Per-customer RFM segmentation — the classic mailing-list readout and
    * the canonical "three global ranks over one aggregate" shape. One
    * orders aggregate to customer grain, then THREE scale-safe global
    * ranks (recency asc / frequency desc / monetary desc, custkey
    * tiebreak) via range-partition + broadcast offsets — no
    * single-partition window anywhere — and quintile buckets derived
    * from (rank, n) arithmetic replayed identically in the oracle. */
  def ordersRfm(spark: SparkSession, dir: String): DataFrame =
    ordersRfmOf(Tables.orders(spark, dir))

  def ordersRfmOf(orders: DataFrame): DataFrame = {
    val mx = orders.agg(max(col("o_orderdate")).as("__mxd"))
    val base = orders.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("__last"),
        count(lit(1)).as("frequency"),
        sum(dec(col("o_totalprice"))).as("__mon"))
      .crossJoin(broadcast(mx))
      .withColumn("recency_days", datediff(col("__mxd"), col("__last")).cast("long"))
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("__mon"))
    val nRow = base.agg(count(lit(1)).as("__n"))
    val ranked = globalRowNumber(
      globalRowNumber(
        globalRowNumber(base, "__rrk", col("recency_days").asc, col("o_custkey").asc),
        "__frk", col("frequency").desc, col("o_custkey").asc),
      "__mrk", col("__mon").desc, col("o_custkey").asc)
      .crossJoin(broadcast(nRow))
    ranked
      .withColumn("r", expr(ntileExpr("__rrk", "__n", 5)))
      .withColumn("f", expr(ntileExpr("__frk", "__n", 5)))
      .withColumn("m", expr(ntileExpr("__mrk", "__n", 5)))
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("__mon").cast("double").as("monetary"),
        col("r"), col("f"), col("m"),
        concat(col("r"), col("f"), col("m")).as("segment"))
      .orderBy("o_custkey")
  }

  val ordersRfmSql: String = {
    val r = ntileSqlExpr("r_rk", "n", 5)
    val f = ntileSqlExpr("f_rk", "n", 5)
    val m = ntileSqlExpr("m_rk", "n", 5)
    s"""WITH base AS (
       |  SELECT o_custkey,
       |    date_diff('day', CAST(max(o_orderdate) AS DATE),
       |      CAST((SELECT max(o_orderdate) FROM orders) AS DATE)) AS recency_days,
       |    count(*) AS frequency,
       |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
       |  FROM orders GROUP BY 1),
       |rk AS (
       |  SELECT base.*,
       |    CAST(row_number() OVER (ORDER BY recency_days, o_custkey) AS BIGINT) AS r_rk,
       |    CAST(row_number() OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f_rk,
       |    CAST(row_number() OVER (ORDER BY mon DESC, o_custkey) AS BIGINT) AS m_rk,
       |    (SELECT count(*) FROM base) AS n
       |  FROM base)
       |SELECT o_custkey, recency_days, frequency,
       |  CAST(mon AS DOUBLE) AS monetary,
       |  $r AS r, $f AS f, $m AS m,
       |  CAST($r AS VARCHAR) || CAST($f AS VARCHAR) || CAST($m AS VARCHAR) AS segment
       |FROM rk ORDER BY o_custkey""".stripMargin
  }

  // -------------------------------------------------------------------
  // #203 part_skyline — the 2-D skyline (Pareto frontier) operator.

  /** Skyline of parts minimizing p_retailprice and maximizing p_size:
    * a part is dominated iff some part has price ≤ AND size ≥ with at
    * least one strict. The naive operator is the O(n²) dominance
    * self-join; this plan is O(n) + bounded driver state instead:
    *  1. bucket prices into ≤256 fixed-width bins (one broadcast min/max),
    *  2. aggregate to (bucket, price) grain with the per-price max size,
    *  3. per-bucket running max over prior DISTINCT prices (bounded
    *     window partitions — never a global sort),
    *  4. per-bucket max collected to the driver (≤256 rows, bounded by
    *     construction) → prefix max over LOWER buckets, broadcast back.
    * A row is dominated iff max-size-at-strictly-lower-price ≥ its size,
    * or a same-price part has strictly larger size. The same-bucket
    * window gives the in-bucket lower-price term; the prefix map gives
    * the cross-bucket term (floor-bucketing ⇒ every lower bucket holds
    * strictly lower prices). The oracle is the O(n²) NOT EXISTS replay —
    * affordable at gate scale, which is exactly the point of having the
    * linear plan. */
  def partSkyline(spark: SparkSession, dir: String): DataFrame =
    partSkylineOf(Tables.part(spark, dir))

  def partSkylineOf(part: DataFrame): DataFrame = {
    val nb = 256
    val b = part.agg(min(col("p_retailprice")).as("lo"), max(col("p_retailprice")).as("hi"))
      .first()
    // Empty input: min/max are NULL — return the (empty) frame directly
    // instead of NPE-ing on getDouble.
    if (b.isNullAt(0))
      return part.select(col("p_partkey"), col("p_name"),
        col("p_retailprice"), col("p_size")).orderBy("p_partkey")
    val lo = b.getDouble(0)
    val width = math.max((b.getDouble(1) - lo) / nb, 1e-9)
    val bucketed = part.withColumn("__b",
      least(lit(nb - 1), floor((col("p_retailprice") - lit(lo)) / lit(width))).cast("int"))
    val perPrice = bucketed.groupBy(col("__b"), col("p_retailprice"))
      .agg(max(col("p_size")).as("__gmax"))
    val w = Window.partitionBy("__b").orderBy("p_retailprice")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withPrev = perPrice.withColumn("__inb", max(col("__gmax")).over(w))
    // ≤256 per-bucket maxima: bounded driver hop by construction
    val bm = perPrice.groupBy("__b").agg(max(col("__gmax")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val prefix = (0 until nb).scanLeft(Int.MinValue) { (acc, i) =>
      math.max(acc, bm.getOrElse(i, Int.MinValue))
    } // prefix(i) = max over buckets < i
    val spark = part.sparkSession
    val prefixDf = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize((0 until nb).map(i => org.apache.spark.sql.Row(i, prefix(i))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__b", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("__pfx", org.apache.spark.sql.types.IntegerType)))))
    bucketed
      .join(withPrev, Seq("__b", "p_retailprice"))
      .join(prefixDf, Seq("__b"))
      .withColumn("__mlt", greatest(coalesce(col("__inb"), lit(Int.MinValue)), col("__pfx")))
      .where(!(col("__mlt") >= col("p_size") || col("__gmax") > col("p_size")))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"), col("p_size"))
      .orderBy("p_partkey")
  }

  val partSkylineSql: String =
    """SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      |ORDER BY p.p_partkey""".stripMargin

  // -------------------------------------------------------------------
  // #204 fk_audit — the referential-integrity / domain-constraint audit.

  /** The data-quality gate a 100 TB warehouse runs before publishing a
    * snapshot: orphan-key counts (every FK edge of the star schema) and
    * domain-constraint violations, one row per check. Join checks are
    * LEFT ANTI — dim-sided ones broadcast, the fact-fact
    * lineitem→orders edge shuffles on the join key exactly like any
    * production semi-join; AQE picks broadcast when the right side fits.
    * Domain checks for a table fold into ONE conditional-sum aggregate
    * pass, not one scan per predicate. */
  def fkAudit(spark: SparkSession, dir: String): DataFrame =
    fkAuditOf(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.part(spark, dir),
      Tables.supplier(spark, dir))

  def fkAuditOf(li: DataFrame, ord: DataFrame, cust: DataFrame,
                part: DataFrame, supp: DataFrame): DataFrame = {
    def checkRow(name: String, checked: Column, violations: Column): Column =
      struct(lit(name).as("check_name"), checked.as("n_checked"), violations.as("n_violations"))

    // one aggregate pass for all lineitem domain checks
    val liDomain = li.agg(
      count(lit(1)).as("n"),
      sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("bad_qty"),
      sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("bad_price"),
      sum(when(col("l_orderkey").isNull || col("l_partkey").isNull ||
               col("l_suppkey").isNull, 1L).otherwise(0L)).as("null_keys"))
      .select(explode(array(
        checkRow("lineitem_nonpositive_price", col("n"), col("bad_price")),
        checkRow("lineitem_nonpositive_qty", col("n"), col("bad_qty")),
        checkRow("lineitem_null_keys", col("n"), col("null_keys")))).as("r"))
    val ordDomain = ord.agg(
      count(lit(1)).as("n"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("bad_total"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_keys"))
      .select(explode(array(
        checkRow("orders_nonpositive_total", col("n"), col("bad_total")),
        checkRow("orders_null_keys", col("n"), col("null_keys")))).as("r"))

    // Orphan semantics pinned NULL-SAFE in BOTH engines: a NULL FK is
    // counted by the *_null_keys domain check, NOT as an orphan — the
    // Spark side excludes NULL keys before the anti join, and the oracle
    // adds the same IS NOT NULL guard (its NOT IN would otherwise return
    // zero orphans for every row the moment one NULL key exists). Totals
    // ride a broadcast scalar aggregate, not an eager driver count() —
    // no construction-time jobs, no redundant fact scans.
    def orphans(name: String, fact: DataFrame, factKey: String,
                dim: DataFrame, dimKey: String, bcast: Boolean): DataFrame = {
      val d = dim.select(col(dimKey))
      val joined = fact.where(col(factKey).isNotNull)
        .join(if (bcast) broadcast(d) else d,
          col(factKey) === col(dimKey), "left_anti")
      val total = fact.agg(count(lit(1)).as("__t"))
      joined.agg(count(lit(1)).as("v"))
        .crossJoin(broadcast(total))
        .select(checkRow(name, col("__t"), col("v")).as("r"))
    }

    val checks = Seq(
      liDomain, ordDomain,
      orphans("lineitem_orphan_order", li, "l_orderkey", ord, "o_orderkey", bcast = false),
      orphans("lineitem_orphan_part", li, "l_partkey", part, "p_partkey", bcast = true),
      orphans("lineitem_orphan_supplier", li, "l_suppkey", supp, "s_suppkey", bcast = true),
      orphans("orders_orphan_customer", ord, "o_custkey", cust, "c_custkey", bcast = true))
    checks.reduce(_ unionAll _)
      .select(col("r.check_name").as("check_name"), col("r.n_checked").as("n_checked"),
        col("r.n_violations").as("n_violations"))
      .orderBy("check_name")
  }

  val fkAuditSql: String =
    """SELECT * FROM (
      |  SELECT 'lineitem_nonpositive_price' AS check_name, count(*) AS n_checked,
      |    CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_nonpositive_qty', count(*),
      |    CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_null_keys', count(*),
      |    CAST(sum(CASE WHEN l_orderkey IS NULL OR l_partkey IS NULL
      |             OR l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'orders_nonpositive_total', count(*),
      |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'orders_null_keys', count(*),
      |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'lineitem_orphan_order', (SELECT count(*) FROM lineitem),
      |    count(*) FROM lineitem WHERE l_orderkey IS NOT NULL
      |      AND l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)
      |  UNION ALL
      |  SELECT 'lineitem_orphan_part', (SELECT count(*) FROM lineitem),
      |    count(*) FROM lineitem WHERE l_partkey IS NOT NULL
      |      AND l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_partkey IS NOT NULL)
      |  UNION ALL
      |  SELECT 'lineitem_orphan_supplier', (SELECT count(*) FROM lineitem),
      |    count(*) FROM lineitem WHERE l_suppkey IS NOT NULL
      |      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey IS NOT NULL)
      |  UNION ALL
      |  SELECT 'orders_orphan_customer', (SELECT count(*) FROM orders),
      |    count(*) FROM orders WHERE o_custkey IS NOT NULL
      |      AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)
      |) ORDER BY check_name""".stripMargin


  // -------------------------------------------------------------------
  // #209 basket_pairs — brand co-occurrence (association) mining.

  /** Market-basket pair mining over orders: for every unordered brand
    * pair, the number of orders containing both, the support share, and
    * the lift vs independence — the association-rule readout. Shapes:
    * lineitem x broadcast part dim, dedup to (order, brand) grain (ONE
    * shuffle), then a self-join ON the order key whose fan-out is
    * bounded by brands-per-order (a schema-bounded constant squared per
    * order, not a data-volume blowup — the events_overlap_matrix
    * discipline), one bounded pair aggregate, broadcast brand
    * frequencies. Exact integer counts; two rounded divisions. */
  def basketPairs(spark: SparkSession, dir: String): DataFrame =
    basketPairsOf(Tables.lineitem(spark, dir), Tables.part(spark, dir))

  def basketPairsOf(li: DataFrame, part: DataFrame): DataFrame = {
    val ob = li.join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand")).distinct()
    val nOrders = ob.select(col("ok")).distinct().agg(count(lit(1)).as("__no"))
    val sizes = ob.groupBy(col("p_brand")).agg(count(lit(1)).as("__nb"))
    val pairs = ob.select(col("ok"), col("p_brand").as("brand_a"))
      .join(ob.select(col("ok"), col("p_brand").as("brand_b")), "ok")
      .where(col("brand_a") < col("brand_b"))
      .groupBy("brand_a", "brand_b").agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(sizes.select(col("p_brand").as("brand_a"), col("__nb").as("n_a"))), "brand_a")
      .join(broadcast(sizes.select(col("p_brand").as("brand_b"), col("__nb").as("n_b"))), "brand_b")
      .crossJoin(broadcast(nOrders))
      .select(col("brand_a"), col("brand_b"), col("n_a"), col("n_b"), col("n_both"),
        round(col("n_both").cast("double") / col("__no"), 6).as("support"),
        // denominator in double: BIGINT n_a*n_b can wrap past ~3e9 counts
        // at 100 TB while DuckDB's HUGEINT would not — keep engines aligned
        round(col("n_both").cast("double") * col("__no") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6).as("lift"))
      .orderBy("brand_a", "brand_b")
  }

  val basketPairsSql: String =
    """WITH ob AS (
      |  SELECT DISTINCT l_orderkey AS ok, p_brand
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |no AS (SELECT count(DISTINCT ok) AS n FROM ob),
      |sz AS (SELECT p_brand, count(*) AS nb FROM ob GROUP BY 1),
      |p AS (
      |  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_both
      |  FROM ob a JOIN ob b ON a.ok = b.ok AND a.p_brand < b.p_brand
      |  GROUP BY 1, 2)
      |SELECT brand_a, brand_b, sa.nb AS n_a, sb.nb AS n_b, n_both,
      |  round(CAST(n_both AS DOUBLE) / no.n, 6) AS support,
      |  round(CAST(n_both AS DOUBLE) * no.n
      |    / (CAST(sa.nb AS DOUBLE) * CAST(sb.nb AS DOUBLE)), 6) AS lift
      |FROM p
      |JOIN sz sa ON p.brand_a = sa.p_brand
      |JOIN sz sb ON p.brand_b = sb.p_brand
      |CROSS JOIN no
      |ORDER BY brand_a, brand_b""".stripMargin


  // -------------------------------------------------------------------
  // #223 market_hhi — exact-integer Herfindahl concentration index.

  /** Revenue-concentration (HHI) per brand market: how concentrated is
    * each brand's revenue across suppliers — the antitrust/market-power
    * readout, and the dedup of the float-summation trap: HHI is
    * Σ share_i², which naively sums squared DOUBLE shares in engine-
    * dependent order. Here every term is EXACT — revenue in integer
    * cents, Σ rev_i² and (Σ rev_i)² as DECIMAL(38,0), and the index is
    * ONE division of exact integers (HHI = Σr²/ (Σr)²) — so both
    * engines derive the identical double. Shapes: one broadcast dim
    * join, one (brand, supplier) aggregate, one bounded per-brand
    * rollup. */
  def marketHhi(spark: SparkSession, dir: String): DataFrame =
    marketHhiOf(Tables.lineitem(spark, dir), Tables.part(spark, dir))

  def marketHhiOf(li: DataFrame, part: DataFrame): DataFrame =
    li.join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_suppkey"))
      .agg(sum((dec(col("l_extendedprice")) * 100).cast("decimal(38,0)")).as("rc"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("rc")).as("tot"),
        sum(col("rc") * col("rc")).as("sq"))
      .select(col("p_brand"), col("n_suppliers"),
        (col("tot").cast("double") / 100).as("revenue"),
        round(col("sq").cast("double") / (col("tot").cast("double") * col("tot").cast("double")), 6).as("hhi"))
      .orderBy("p_brand")

  val marketHhiSql: String =
    """WITH r AS (
      |  SELECT p_brand, l_suppkey,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS rc
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2)
      |SELECT p_brand, count(*) AS n_suppliers,
      |  CAST(sum(rc) AS DOUBLE) / 100 AS revenue,
      |  round(CAST(sum(rc * rc) AS DOUBLE)
      |    / (CAST(sum(rc) AS DOUBLE) * CAST(sum(rc) AS DOUBLE)), 6) AS hhi
      |FROM r GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // -------------------------------------------------------------------
  // #224 supplier_otd — on-time-delivery ranked by the Wilson lower bound.

  /** Supplier on-time-delivery scorecard ranked by the WILSON LOWER
    * BOUND (z = 1.96), not the raw share — the canonical
    * small-sample-ranking correction (a 3/3 supplier must NOT outrank a
    * 95/100 one). On-time = shipped within 90 days of the order (the q12
    * rule). The bound's sqrt/divisions run the SAME IEEE expression tree
    * on exact integer inputs in both engines, then round 6 dp. One
    * fact-fact key join + one supplier aggregate; top-25 via TakeOrdered.
    */
  def supplierOtd(spark: SparkSession, dir: String): DataFrame =
    supplierOtdOf(Tables.lineitem(spark, dir), Tables.orders(spark, dir))

  def supplierOtdOf(li: DataFrame, ord: DataFrame): DataFrame = {
    val z2 = "3.8415999999999997"  // 1.96^2 pinned to the exact double literal
    val agg = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("ontime",
        when(col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAY"), 1L)
          .otherwise(0L))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_ship"), sum(col("ontime")).as("n_ontime"))
    agg
      .withColumn("share", round(col("n_ontime").cast("double") / col("n_ship"), 6))
      .withColumn("wilson_lb", round(expr(
        s"""((n_ontime / CAST(n_ship AS DOUBLE)) + $z2 / (2 * n_ship)
           | - 1.96 * sqrt((n_ontime / CAST(n_ship AS DOUBLE)) * (1 - n_ontime / CAST(n_ship AS DOUBLE)) / n_ship
           |   + $z2 / (4 * CAST(n_ship AS DOUBLE) * n_ship)))
           | / (1 + $z2 / n_ship)""".stripMargin.replaceAll("\n", " ")), 6))
      .orderBy(desc("wilson_lb"), col("l_suppkey"))
      .limit(25)
  }

  val supplierOtdSql: String = {
    val z2 = "3.8415999999999997"
    s"""WITH a AS (
       |  SELECT l_suppkey, count(*) AS n_ship,
       |    CAST(sum(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY
       |             THEN 1 ELSE 0 END) AS BIGINT) AS n_ontime
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1)
       |SELECT l_suppkey, n_ship, n_ontime,
       |  round(CAST(n_ontime AS DOUBLE) / n_ship, 6) AS share,
       |  round(((n_ontime / CAST(n_ship AS DOUBLE)) + $z2 / (2 * n_ship)
       |    - 1.96 * sqrt((n_ontime / CAST(n_ship AS DOUBLE)) * (1 - n_ontime / CAST(n_ship AS DOUBLE)) / n_ship
       |      + $z2 / (4 * CAST(n_ship AS DOUBLE) * n_ship)))
       |    / (1 + $z2 / n_ship), 6) AS wilson_lb
       |FROM a ORDER BY wilson_lb DESC, l_suppkey LIMIT 25""".stripMargin
  }


  // -------------------------------------------------------------------
  // #231 part_corr — exact-moment Pearson correlation per brand.

  /** Pearson correlation of p_size vs p_retailprice per brand — the
    * correlation-matrix staple with the float trap removed: price in
    * integer cents, size integer, EVERY moment (Σx, Σy, Σx², Σy², Σxy)
    * an exact DECIMAL(38,0) sum, doubles entering only in the final
    * sqrt and one division (the events_autocorr discipline — engines
    * cannot drift). One map-side-combined aggregate on the bounded
    * brand key; NULL r for degenerate (constant) sides. */
  def partCorr(spark: SparkSession, dir: String): DataFrame =
    partCorrOf(Tables.part(spark, dir))

  def partCorrOf(part: DataFrame): DataFrame = {
    val x = col("p_size").cast("decimal(38,0)")
    val y = (col("p_retailprice").cast("decimal(18,2)") * 100).cast("decimal(38,0)")
    part.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
      .withColumn("__d", ((col("n") * col("sxx") - col("sx") * col("sx")) *
        (col("n") * col("syy") - col("sy") * col("sy"))).cast("double"))
      // degenerate (constant) side -> NULL, matching DuckDB's
      // double-div-by-zero semantics (Spark ANSI would throw)
      .select(col("p_brand"), col("n"),
        when(col("__d") > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt(col("__d")), 6)).as("r"))
      .orderBy("p_brand")
  }

  val partCorrSql: String =
    """WITH m AS (
      |  SELECT p_brand, count(*) AS n,
      |    sum(CAST(p_size AS DECIMAL(38,0))) AS sx,
      |    sum(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS sy,
      |    sum(CAST(p_size AS DECIMAL(38,0)) * CAST(p_size AS DECIMAL(38,0))) AS sxx,
      |    sum(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))
      |      * CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS syy,
      |    sum(CAST(p_size AS DECIMAL(38,0))
      |      * CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS sxy
      |  FROM part GROUP BY 1)
      |SELECT p_brand, n,
      |  CASE WHEN CAST((n * sxx - sx * sx) * (n * syy - sy * sy) AS DOUBLE) > 0
      |    THEN round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |      sqrt(CAST((n * sxx - sx * sx) * (n * syy - sy * sy) AS DOUBLE)), 6)
      |  END AS r
      |FROM m ORDER BY p_brand""".stripMargin


  // -------------------------------------------------------------------
  // #236 orders_aging — the open-order aging (AR-aging) report.

  /** Open orders bucketed by age band as of the book's newest order date
    * — the receivables-aging shape every finance close runs: per
    * (status, band) counts and decimal-exact value, open = status P/O
    * (F is filled). The as-of date is a broadcast one-row aggregate and
    * the band is a row-local CASE — one scan, one bounded aggregate;
    * band edges land on the SAME datediff arithmetic in both engines. */
  def ordersAging(spark: SparkSession, dir: String): DataFrame =
    ordersAgingOf(Tables.orders(spark, dir))

  def ordersAgingOf(orders: DataFrame): DataFrame = {
    val asOf = orders.agg(max(col("o_orderdate")).as("__asof"))
    orders.where(col("o_orderstatus") =!= "F")
      .crossJoin(broadcast(asOf))
      .withColumn("__age", datediff(col("__asof"), col("o_orderdate")))
      .withColumn("age_band",
        when(col("__age") < 30, "a_0_29")
          .when(col("__age") < 90, "b_30_89")
          .when(col("__age") < 180, "c_90_179")
          .when(col("__age") < 365, "d_180_364")
          .otherwise("e_365_plus"))
      .groupBy(col("o_orderstatus"), col("age_band"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_value"))
      .orderBy("o_orderstatus", "age_band")
  }

  val ordersAgingSql: String =
    """WITH a AS (SELECT CAST(max(o_orderdate) AS DATE) AS cutoff FROM orders)
      |SELECT o_orderstatus,
      |  CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), cutoff) < 30 THEN 'a_0_29'
      |       WHEN date_diff('day', CAST(o_orderdate AS DATE), cutoff) < 90 THEN 'b_30_89'
      |       WHEN date_diff('day', CAST(o_orderdate AS DATE), cutoff) < 180 THEN 'c_90_179'
      |       WHEN date_diff('day', CAST(o_orderdate AS DATE), cutoff) < 365 THEN 'd_180_364'
      |       ELSE 'e_365_plus' END AS age_band,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM orders, a WHERE o_orderstatus <> 'F'
      |GROUP BY 1, 2 ORDER BY o_orderstatus, age_band""".stripMargin


  // -------------------------------------------------------------------
  // #238 orders_ship_lag — order-to-ship latency quantiles per priority.

  /** Fulfillment-latency distribution per order priority: p50/p90/p99 of
    * order-date -> ship-date days, per o_orderpriority — the SLA readout
    * that tells whether URGENT orders actually ship faster. One key join
    * to attach the priority, exact day lags, then the shared exact
    * rank-selection quantile operator. */
  def ordersShipLag(spark: SparkSession, dir: String): DataFrame =
    ordersShipLagOf(Tables.lineitem(spark, dir), Tables.orders(spark, dir))

  private val ShipLagPs = Seq(0.5, 0.9, 0.99)

  def ordersShipLagOf(li: DataFrame, ord: DataFrame): DataFrame = {
    val lags = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("double").as("lag_days"))
    graft.operators.Quantiles.perGroup(lags, "o_orderpriority", "lag_days", ShipLagPs)
  }

  val ordersShipLagSql: String = {
    val inner = ShipLagPs.map(p =>
      s"""SELECT o_orderpriority, CAST($p AS DOUBLE) AS p,
         |  round(quantile_cont(lag_days, $p), 6) AS q
         |FROM lg GROUP BY o_orderpriority""".stripMargin)
      .mkString("", "\nUNION ALL\n", "")
    s"""WITH lg AS (
       |  SELECT o_orderpriority,
       |    CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS DOUBLE) AS lag_days
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
       |$inner
       |ORDER BY o_orderpriority, p""".stripMargin
  }

  // -------------------------------------------------------------------
  // #241 supplier_concurrency — peak simultaneously-in-transit lineitems.

  /** Interval-stabbing via the classic sweep: each lineitem is "open"
    * over [o_orderdate, l_shipdate] (order placed → shipped); emit +1 at
    * the start day and −1 the day AFTER the end (closed interval), sum
    * deltas per (supplier, day), and a per-supplier running sum over
    * days is the number of concurrently open items. The fact-scale rows
    * cross ONE exchange — the (supplier, day) rollup, collapsed by
    * map-side partial aggregation wherever the fact table is
    * date-clustered (the usual layout); the windows re-shuffle only the
    * calendar-bounded cells (≤ suppliers × ~2.5k days — deliberately a
    * SECOND tiny exchange rather than pre-hashing raw rows on the
    * supplier key, which would skip the combine and skew). Top 25 by
    * peak (suppkey tie-break; one row per supplier keeps the order
    * total). */
  def supplierConcurrency(spark: SparkSession, dir: String): DataFrame =
    supplierConcurrencyOf(Tables.lineitem(spark, dir), Tables.orders(spark, dir))

  def supplierConcurrencyOf(li: DataFrame, ord: DataFrame): DataFrame = {
    val iv = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), to_date(col("o_orderdate")).as("s"),
        date_add(to_date(col("l_shipdate")), 1).as("e"))
    val deltas = iv.select(col("l_suppkey"), col("s").as("day"), lit(1L).as("delta"))
      .unionAll(iv.select(col("l_suppkey"), col("e").as("day"), lit(-1L).as("delta")))
      .groupBy("l_suppkey", "day").agg(sum(col("delta")).as("d"))
    val wRun = Window.partitionBy("l_suppkey").orderBy("day")
    val wAll = Window.partitionBy("l_suppkey")
    deltas
      .withColumn("n_open", sum(col("d")).over(wRun))
      .withColumn("peak", max(col("n_open")).over(wAll))
      .where(col("n_open") === col("peak"))
      .groupBy(col("l_suppkey"), col("peak"))
      .agg(min(col("day")).as("peak_day"))
      .orderBy(desc("peak"), col("l_suppkey")).limit(25)
      .select(col("l_suppkey"), col("peak"), col("peak_day"))
  }

  val supplierConcurrencySql: String =
    """WITH iv AS (
      |  SELECT l_suppkey, CAST(o_orderdate AS DATE) AS s,
      |         CAST(l_shipdate AS DATE) + 1 AS e
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |d AS (
      |  SELECT l_suppkey, day, CAST(sum(delta) AS BIGINT) AS d FROM (
      |    SELECT l_suppkey, s AS day, 1 AS delta FROM iv
      |    UNION ALL
      |    SELECT l_suppkey, e AS day, -1 AS delta FROM iv) u
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT l_suppkey, day,
      |    CAST(sum(d) OVER (PARTITION BY l_suppkey ORDER BY day) AS BIGINT) AS n_open
      |  FROM d),
      |p AS (
      |  SELECT l_suppkey, day, n_open,
      |    max(n_open) OVER (PARTITION BY l_suppkey) AS peak
      |  FROM r)
      |SELECT l_suppkey, peak, min(day) AS peak_day
      |FROM p WHERE n_open = peak GROUP BY 1, 2
      |ORDER BY peak DESC, l_suppkey LIMIT 25""".stripMargin

  // -------------------------------------------------------------------
  // #245 supplier_triangles — triangle census of the co-order graph.

  /** Triangle counting over the supplier co-occurrence graph (edge =
    * two suppliers REPEATEDLY sharing orders — RELATIVE min-support
    * max(5, n_orders/30000) co-orders, the frequent-itemset
    * discipline: a low-cardinality key set makes the raw co-occurrence
    * graph near-complete (sf0.1: 454k of 499.5k possible pairs), and
    * only a support floor that scales WITH the corpus keeps it sparse
    * under growth — a fixed absolute floor re-densifies as soon as the
    * corpus grows past it (measured: ratio 8.91 with 5 GB spill at 10×
    * under the fixed floor, 47k stable edges under the relative one);
    * noise pairs stay Poisson-thin relative to volume, recurring
    * partnerships survive). Edge
    * enumeration is bounded by order size (≤ ~7 lineitems ⇒ ≤ 21 pairs
    * per order, never a global cross product). Spark counts triangles
    * with the DEGREE-ORIENTED wedge join — every undirected edge is
    * directed from its (degree, id)-smaller endpoint, so a hub of
    * degree d contributes O(√m) out-wedges instead of O(d²), the
    * standard arboricity bound that keeps the wedge fan-out flat at
    * 100 TB; the oracle counts the same triangles with the naive a<b
    * orientation (count is orientation-invariant, so the hash compare
    * proves the oriented rewrite exact). Output: one census row —
    * nodes, edges, triangles, and the global clustering coefficient
    * 3·tri/wedges as ONE guarded division of exact integers. */
  def supplierTriangles(spark: SparkSession, dir: String): DataFrame =
    supplierTrianglesOf(Tables.lineitem(spark, dir))

  val TriangleMinSupport = 5
  val TriangleSupportDiv = 30000L

  def supplierTrianglesOf(li: DataFrame,
      minSupport: Int = TriangleMinSupport): DataFrame = {
    // Pair stage, spill-free by construction (100×-probe-attributed):
    //  1. `.distinct()` on the raw projection ran a MAP-SIDE partial
    //     aggregate over each 2M-row input split — per-task dedup maps
    //     were the probe's whole 4.75 GB spill (SMJ vs SHJ join choice
    //     didn't move it; a collect_set shape halved it but paid its own
    //     sort fallback). Pre-shuffling on the key FIRST (AQE-sized
    //     REPARTITION_BY_COL) makes the dedup run post-exchange on small
    //     partitions, and (ok,s) dedup barely compresses lineitem anyway,
    //     so the partial pass saved no shuffle volume.
    //  2. The self-join then finds both sides already hash-partitioned on
    //     ok (ONE reused exchange) and runs as a SHUFFLED HASH join — the
    //     build is one small partition of order keys; SMJ's sorts and
    //     their spill never happen. Per-order fan-out stays bounded
    //     (≤ ~7 suppliers/order ⇒ ≤21 pairs).
    val os = li.select(col("l_orderkey").as("ok"), col("l_suppkey").as("s"))
      .repartition(col("ok"))
      .dropDuplicates("ok", "s")
    val nOrd = os.agg(countDistinct(col("ok")).as("n_ok"))
    // the support-floored edge list is SMALL by construction (the
    // relative floor keeps it sparse at any scale — doc above) and is
    // read ~15× through deg/eo/tri below; pin it so the fact-scale pair
    // stage runs ONCE instead of once per wedge branch (r21 — the
    // un-pinned plan re-derived it into 100+ scan branches)
    val e = os.as("x").join(os.as("y").hint("SHUFFLE_HASH"),
        col("x.ok") === col("y.ok") && col("x.s") < col("y.s"))
      .groupBy(col("x.s").as("a"), col("y.s").as("b"))
      .agg(count(lit(1)).as("w"))
      .crossJoin(broadcast(nOrd))
      .where(col("w") >= greatest(lit(minSupport.toLong),
        expr(s"n_ok div $TriangleSupportDiv")))
      .select(col("a"), col("b"))
      .pin() // GC-cleaned, unlike per-call persist (see
                         // customerMigration's leak note)
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // orient by the (deg, v) total order; keep the head's rank key so
    // wedge endpoints order WITHOUT another degree join
    val eo = e
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst"),
            col("db").as("ddeg")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst"),
            col("da").as("ddeg"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.ddeg").as("ddeg"))
      // the wedge join reads the oriented edges three times — pin them too
      .pin()
    val tri = eo.as("w1").join(eo.as("w2"),
        col("w1.src") === col("w2.src") &&
          (col("w1.ddeg") < col("w2.ddeg") ||
            (col("w1.ddeg") === col("w2.ddeg") && col("w1.dst") < col("w2.dst"))))
      .join(eo.as("w3"),
        col("w1.dst") === col("w3.src") && col("w2.dst") === col("w3.dst"))
      .agg(count(lit(1)).as("n_triangles"))
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      expr("sum(deg) div 2").as("n_edges"),
      expr("sum(deg * (deg - 1)) div 2").as("n_wedges"))
    stats.crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        when(col("n_wedges") > 0,
          round(lit(3) * col("n_triangles").cast("double") / col("n_wedges"), 6))
          .as("clustering"))
  }

  val supplierTrianglesSql: String =
    """WITH os AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem),
      |no AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_ok FROM os),
      |p AS (
      |  SELECT x.s AS a, y.s AS b, CAST(count(*) AS BIGINT) AS w
      |  FROM os x JOIN os y ON x.ok = y.ok AND x.s < y.s
      |  GROUP BY 1, 2),
      |e AS (
      |  SELECT a, b FROM p, no
      |  WHERE w >= greatest(5, n_ok // 30000)),
      |deg AS (
      |  SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
      |    SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) u
      |  GROUP BY 1),
      |tri AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_triangles
      |  FROM e e1 JOIN e e2 ON e1.b = e2.a
      |       JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b),
      |st AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
      |    CAST(sum(deg) // 2 AS BIGINT) AS n_edges,
      |    CAST(sum(deg * (deg - 1)) // 2 AS BIGINT) AS n_wedges
      |  FROM deg)
      |SELECT n_nodes, n_edges, n_triangles,
      |  CASE WHEN n_wedges > 0
      |    THEN round(3 * CAST(n_triangles AS DOUBLE) / n_wedges, 6)
      |  END AS clustering
      |FROM st, tri""".stripMargin

  // -------------------------------------------------------------------
  // #246 orders_abc — ABC (80/15/5) revenue classification of parts.

  /** The inventory-management classic: parts ranked by revenue, class A
    * = the prefix reaching 80% of total revenue, B to 95%, C the tail
    * (a part is classed by its cumulative revenue EXCLUDING itself, so
    * the crossing part lands in the class it completes). The global
    * cumulative sum uses the customerPareto discipline — one pinned
    * (localCheckpoint) range partitioning, per-shard prefix-sum window
    * + broadcast per-shard revenue offsets — so no single-partition
    * window ever sees fact-scale rows; class membership is decided by
    * EXACT decimal comparisons ((cum−rev)·5 < tot·4, ·20 < ·19 — no
    * double thresholds to drift on). Output: three audit rows. */
  def ordersAbc(spark: SparkSession, dir: String): DataFrame =
    ordersAbcOf(Tables.lineitem(spark, dir))

  def ordersAbcOf(li: DataFrame): DataFrame = {
    val rev = li.groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_extendedprice"))).cast("decimal(18,2)").as("rev"))
    val parted = rev.repartitionByRange(32, col("rev").desc, col("l_partkey"))
      .withColumn("pid", spark_partition_id())
      .pin()
    val shard = Window.partitionBy("pid").orderBy(col("rev").desc, col("l_partkey"))
    val local = parted.withColumn("lcum", sum(col("rev")).over(shard))
    val offW = graft.operators.BoundedWindow.keyed(col("pid")).orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy("pid")
      .agg(sum(col("rev")).cast("decimal(18,2)").as("srev"))
      .withColumn("off",
        coalesce(sum(col("srev")).over(offW), lit(0).cast("decimal(18,2)")))
      .select("pid", "off")
    val tot = parted.agg(sum(col("rev")).cast("decimal(18,2)").as("tot"),
      count(lit(1)).as("np"))
    local.join(broadcast(offsets), "pid")
      .withColumn("cum", (col("off") + col("lcum")).cast("decimal(18,2)"))
      .crossJoin(broadcast(tot))
      .withColumn("cls",
        when((col("cum") - col("rev")) * 5 < col("tot") * 4, "A")
          .when((col("cum") - col("rev")) * 20 < col("tot") * 19, "B")
          .otherwise("C"))
      .groupBy("cls", "tot", "np")
      .agg(count(lit(1)).as("n_parts"),
        sum(col("rev")).cast("decimal(18,2)").as("revenue"))
      // revenue rendered as double (decimal parquet vs DuckDB float64
      // fetchdf would hash-diverge the moment a value has trailing-zero
      // cents — latent flake caught by the dtype-strict local gate)
      .select(col("cls"), col("n_parts"), col("revenue").cast("double").as("revenue"),
        round(col("revenue").cast("double") / col("tot").cast("double"), 6)
          .as("rev_share"),
        round(col("n_parts").cast("double") / col("np"), 6).as("part_share"))
      .orderBy("cls")
  }

  val ordersAbcSql: String =
    """WITH rev AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
      |  FROM lineitem GROUP BY 1),
      |c AS (
      |  SELECT l_partkey, rev,
      |    CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
      |      ROWS UNBOUNDED PRECEDING) AS DECIMAL(18,2)) AS cum
      |  FROM rev),
      |t AS (SELECT CAST(sum(rev) AS DECIMAL(18,2)) AS tot,
      |        CAST(count(*) AS BIGINT) AS np FROM rev),
      |x AS (
      |  SELECT CASE WHEN (cum - rev) * 5 < tot * 4 THEN 'A'
      |              WHEN (cum - rev) * 20 < tot * 19 THEN 'B'
      |              ELSE 'C' END AS cls, rev, tot, np
      |  FROM c, t)
      |SELECT cls, count(*) AS n_parts,
      |  CAST(CAST(sum(rev) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
      |  round(CAST(sum(rev) AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS rev_share,
      |  round(CAST(count(*) AS DOUBLE) / np, 6) AS part_share
      |FROM x GROUP BY 1, tot, np ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // #249 supplier_lead_trend — grouped OLS slope of ship lag over time.

  /** Per-supplier linear trend of fulfillment lag (days from order to
    * ship) regressed on the order month — the grouped-OLS shape: ONE
    * map-side-combined aggregate collects the exact moments (n, Σx, Σy,
    * Σxy, Σx²) per supplier with x = calendar month index
    * (year·12+month, an exact integer) and y = exact day lag, every
    * moment a DECIMAL(38,0) sum (the part_corr discipline — Σxy
    * brushes int64 at fact scale), and slope = ONE division of the
    * exact num/den, rounded before the ordering so both engines rank
    * identically. Suppliers active in a single month (den = 0) are
    * excluded. Top 10 worsening (slope desc). */
  def supplierLeadTrend(spark: SparkSession, dir: String): DataFrame =
    supplierLeadTrendOf(Tables.lineitem(spark, dir), Tables.orders(spark, dir))

  def supplierLeadTrendOf(li: DataFrame, ord: DataFrame): DataFrame = {
    val base = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("decimal(38,0)").as("x"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("decimal(38,0)").as("y"))
    base.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .withColumn("den", (col("n") * col("sxx") - col("sx") * col("sx")))
      .where(col("den") > 0)
      .select(col("l_suppkey"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          col("den").cast("double"), 6).as("slope"))
      .orderBy(desc("slope"), col("l_suppkey"))
      .limit(10)
  }

  val supplierLeadTrendSql: String =
    """WITH b AS (
      |  SELECT l_suppkey,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS DECIMAL(38,0)) AS x,
      |    CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
      |      AS DECIMAL(38,0)) AS y
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |m AS (
      |  SELECT l_suppkey, count(*) AS n,
      |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
      |  FROM b GROUP BY 1),
      |s AS (
      |  SELECT l_suppkey, n, n * sxx - sx * sx AS den,
      |    n * sxy - sx * sy AS num
      |  FROM m)
      |SELECT l_suppkey, n,
      |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS slope
      |FROM s WHERE den > 0
      |ORDER BY slope DESC, l_suppkey LIMIT 10""".stripMargin

  // -------------------------------------------------------------------
  // #251 part_rank_shift — year-over-year revenue rank movers.

  /** The "movers report": top-20 parts by latest-year revenue with
    * their prior-year rank and the rank delta. Revenue per (year,
    * part) is decimal-exact off one map-side-combined aggregate; the
    * per-year global ranks come from [[groupedRowNumber]] (range
    * partition on (year, rev desc, partkey) + per-(shard, year)
    * broadcast offsets — no single-partition fact-scale window); the
    * latest year is a broadcast one-row max. Parts absent the prior
    * year surface with NULL prior rank/delta (left join — new
    * entrants are the interesting rows). */
  def partRankShift(spark: SparkSession, dir: String): DataFrame =
    partRankShiftOf(Tables.lineitem(spark, dir))

  def partRankShiftOf(li: DataFrame): DataFrame = {
    val rev = li.select(year(col("l_shipdate")).as("yr"), col("l_partkey"),
        col("l_extendedprice"))
      .groupBy("yr", "l_partkey")
      .agg(sum(dec(col("l_extendedprice"))).cast("decimal(18,2)").as("rev"))
      // reused by the max-year probe AND the rank pass below — checkpoint
      // the (year, part) aggregate (small by construction) instead of
      // re-running the fact-scale shuffle per consumer (r21, guide §2.4;
      // localCheckpoint, not persist — the customerMigration leak note)
      .pin()
    val maxYr = rev.agg(max(col("yr")).as("y1"))
    // only the latest two years are ever read out of the ranking, and
    // within-year ranks are unaffected by dropping other years — rank the
    // two-year slice, not the whole history (r21)
    val two = rev.crossJoin(broadcast(maxYr))
      .where(col("yr") >= col("y1") - 1 && col("yr") <= col("y1"))
    val ranked = groupedRowNumber(two, "rk", col("yr"),
      col("rev").desc, col("l_partkey").asc)
    val cur = ranked
      .where(col("yr") === col("y1") && col("rk") <= 20)
      .select(col("l_partkey"), col("y1"), col("rev"), col("rk"))
    val prev = ranked
      .where(col("yr") === col("y1") - 1)
      .select(col("l_partkey"), col("rk").as("prev_rk"))
    cur.join(prev, Seq("l_partkey"), "left")
      // Rank on the exact decimal; RENDER as double — parquet decimal vs
      // DuckDB's decimal→float64 fetchdf rendering would hash-diverge.
      .select(col("l_partkey"), col("rev").cast("double").as("rev"),
        col("rk"), col("prev_rk"),
        (col("prev_rk") - col("rk")).as("rank_gain"))
      .orderBy("rk")
  }

  val partRankShiftSql: String =
    """WITH rev AS (
      |  SELECT year(l_shipdate) AS yr, l_partkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
      |  FROM lineitem GROUP BY 1, 2),
      |rk AS (
      |  SELECT yr, l_partkey, rev,
      |    CAST(row_number() OVER (PARTITION BY yr
      |      ORDER BY rev DESC, l_partkey) AS BIGINT) AS rk
      |  FROM rev),
      |y AS (SELECT max(yr) AS y1 FROM rk),
      |cur AS (
      |  SELECT l_partkey, rev, rk FROM rk, y
      |  WHERE yr = y1 AND rk <= 20),
      |prev AS (
      |  SELECT l_partkey, rk AS prev_rk FROM rk, y WHERE yr = y1 - 1)
      |SELECT c.l_partkey, CAST(c.rev AS DOUBLE) AS rev, c.rk, p.prev_rk,
      |  p.prev_rk - c.rk AS rank_gain
      |FROM cur c LEFT JOIN prev p ON c.l_partkey = p.l_partkey
      |ORDER BY c.rk""".stripMargin

  // -------------------------------------------------------------------
  // #256 brand_bridge — YoY revenue bridge (price vs volume effects).

  /** The FP&A waterfall: decompose each brand's latest-year revenue
    * change into a volume effect ((q1−q0)·p0) and a price effect
    * (rev1 − q1·p0), which sum to rev1 − rev0 BY CONSTRUCTION. Both
    * effects are written so the prior-year unit price p0 = rev0/q0 is
    * the ONLY division — one double division per term over exact
    * decimal inputs, so both engines derive identical doubles (no
    * float summation anywhere: quantities and revenues aggregate as
    * decimals). One broadcast dim join + one (year, brand) rollup;
    * the latest year is a broadcast one-row max. Brands absent either
    * year are excluded (no bridge without both endpoints). */
  def brandBridge(spark: SparkSession, dir: String): DataFrame =
    brandBridgeOf(Tables.lineitem(spark, dir), Tables.part(spark, dir))

  def brandBridgeOf(li: DataFrame, part: DataFrame): DataFrame = {
    val base = li.join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(year(col("l_shipdate")).as("yr"), col("p_brand"),
        col("l_quantity"), col("l_extendedprice"))
      .groupBy("yr", "p_brand")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)").as("qty"),
        sum(dec(col("l_extendedprice"))).cast("decimal(18,2)").as("rev"))
    val maxYr = base.agg(max(col("yr")).as("y1"))
    val cur = base.crossJoin(broadcast(maxYr)).where(col("yr") === col("y1"))
      .select(col("p_brand"), col("qty").as("q1"), col("rev").as("rev1"))
    val prev = base.crossJoin(broadcast(maxYr)).where(col("yr") === col("y1") - 1)
      .select(col("p_brand"), col("qty").as("q0"), col("rev").as("rev0"))
    cur.join(prev, "p_brand")
      .where(col("q0") > 0)
      // rev0/rev1 rendered as double (same reason as part_rank_shift):
      // exact decimal internally, one correctly-rounded cast at the edge.
      .select(col("p_brand"), col("rev0").cast("double").as("rev0"),
        col("rev1").cast("double").as("rev1"),
        round((col("q1") - col("q0")).cast("double") *
          (col("rev0").cast("double") / col("q0").cast("double")), 6)
          .as("volume_effect"),
        round(col("rev1").cast("double") - col("q1").cast("double") *
          (col("rev0").cast("double") / col("q0").cast("double")), 6)
          .as("price_effect"))
      .orderBy("p_brand")
  }

  val brandBridgeSql: String =
    """WITH b AS (
      |  SELECT year(l_shipdate) AS yr, p_brand,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS qty,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2),
      |y AS (SELECT max(yr) AS y1 FROM b),
      |cur AS (SELECT p_brand, qty AS q1, rev AS rev1 FROM b, y WHERE yr = y1),
      |prev AS (SELECT p_brand, qty AS q0, rev AS rev0 FROM b, y
      |         WHERE yr = y1 - 1)
      |SELECT c.p_brand, CAST(rev0 AS DOUBLE) AS rev0, CAST(rev1 AS DOUBLE) AS rev1,
      |  round(CAST(q1 - q0 AS DOUBLE)
      |    * (CAST(rev0 AS DOUBLE) / CAST(q0 AS DOUBLE)), 6) AS volume_effect,
      |  round(CAST(rev1 AS DOUBLE) - CAST(q1 AS DOUBLE)
      |    * (CAST(rev0 AS DOUBLE) / CAST(q0 AS DOUBLE)), 6) AS price_effect
      |FROM cur c JOIN prev p ON c.p_brand = p.p_brand
      |WHERE q0 > 0 ORDER BY c.p_brand""".stripMargin

  // -------------------------------------------------------------------
  // #257 customer_migration — monetary-quintile transition matrix.

  /** The segment-migration readout: customers quintiled by spend in the
    * FIRST half of the book (exact p50-day cutoff, the split_temporal
    * integer rule) and again in the second, with the 5×5 transition
    * matrix plus 'new' (no prior activity) and 'churned' (no latest)
    * margins — the upgrade/downgrade flow a retention team actually
    * reads. Each half gets ONE scale-safe global rank (globalRowNumber)
    * and quintiles from the shared (rank, n) ntile arithmetic — both
    * rendered identically in the oracle, so bucket edges cannot drift;
    * the matrix is a full-outer join on the customer key + a 36-cell
    * bounded rollup. */
  def customerMigration(spark: SparkSession, dir: String): DataFrame =
    customerMigrationOf(Tables.orders(spark, dir))

  def customerMigrationOf(ord: DataFrame): DataFrame = {
    val base = ord.select(to_date(col("o_orderdate")).as("day"),
      col("o_custkey"), col("o_totalprice"))
    val daily = base.groupBy("day").agg(count(lit(1)).as("n"))
    val wc = graft.operators.BoundedWindow.keyed(col("day")).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = daily.agg(sum(col("n")).as("tot"))
    val cutoff = daily.withColumn("cum", sum(col("n")).over(wc))
      .crossJoin(broadcast(tot)).where(col("cum") * 2 >= col("tot"))
      .agg(min(col("day")).as("cutoff"))
    val tagged = base.crossJoin(broadcast(cutoff))
    // ONE customer-grain aggregate carries BOTH halves (r21: the two
    // filtered groupBys each re-shuffled the full order book; a
    // conditional sum per half shuffles it once — guide §2.4). A customer
    // is in a half iff it has ≥1 order there (n0/n1 guards), exactly the
    // rows the filtered groupBys produced.
    // localCheckpoint, NOT persist: per-call persists accumulate in the
    // CacheManager (never unpersisted — measured 7.6 → 19.6 s over five
    // reps); checkpointed RDDs are GC-cleaned (the globalRowNumber
    // discipline) and the customer-grain table is small by construction
    val halves = tagged.groupBy("o_custkey").agg(
      sum(when(col("day") <= col("cutoff"), dec(col("o_totalprice"))))
        .cast("decimal(18,2)").as("mon0"),
      count(when(col("day") <= col("cutoff"), lit(1))).as("n0"),
      sum(when(col("day") > col("cutoff"), dec(col("o_totalprice"))))
        .cast("decimal(18,2)").as("mon1"),
      count(when(col("day") > col("cutoff"), lit(1))).as("n1"))
      .pin()
    def quintiles(activeN: Column, mon: Column, out: String): DataFrame = {
      val h = halves.where(activeN > 0)
        .select(col("o_custkey"), mon.as("mon"))
      val n = h.agg(count(lit(1)).as("__n"))
      globalRowNumber(h, "__mrk", col("mon").desc, col("o_custkey").asc)
        .crossJoin(broadcast(n))
        .withColumn(out, expr(ntileExpr("__mrk", "__n", 5)))
        .select(col("o_custkey"), col(out))
    }
    val p0 = quintiles(col("n0"), col("mon0"), "q0")
    val p1 = quintiles(col("n1"), col("mon1"), "q1")
    p0.join(p1, Seq("o_custkey"), "full_outer")
      .select(coalesce(col("q0").cast("string"), lit("new")).as("seg_prior"),
        coalesce(col("q1").cast("string"), lit("churned")).as("seg_latest"))
      .groupBy("seg_prior", "seg_latest").agg(count(lit(1)).as("n_customers"))
      .orderBy("seg_prior", "seg_latest")
  }

  val customerMigrationSql: String = {
    val q0 = ntileSqlExpr("m_rk", "n", 5)
    s"""WITH d AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day, o_custkey, o_totalprice
       |  FROM orders),
       |daily AS (SELECT day, count(*) AS n FROM d GROUP BY 1),
       |c AS (
       |  SELECT day,
       |    CAST(sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM daily),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM daily),
       |k AS (SELECT min(day) AS cutoff FROM c, t WHERE cum * 2 >= tot),
       |h0 AS (
       |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
       |  FROM d, k WHERE day <= cutoff GROUP BY 1),
       |h1 AS (
       |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
       |  FROM d, k WHERE day > cutoff GROUP BY 1),
       |r0 AS (
       |  SELECT o_custkey,
       |    CAST(row_number() OVER (ORDER BY mon DESC, o_custkey) AS BIGINT) AS m_rk,
       |    (SELECT count(*) FROM h0) AS n
       |  FROM h0),
       |r1 AS (
       |  SELECT o_custkey,
       |    CAST(row_number() OVER (ORDER BY mon DESC, o_custkey) AS BIGINT) AS m_rk,
       |    (SELECT count(*) FROM h1) AS n
       |  FROM h1),
       |s0 AS (SELECT o_custkey, $q0 AS q FROM r0),
       |s1 AS (SELECT o_custkey, $q0 AS q FROM r1),
       |j AS (
       |  SELECT COALESCE(CAST(s0.q AS VARCHAR), 'new') AS seg_prior,
       |         COALESCE(CAST(s1.q AS VARCHAR), 'churned') AS seg_latest
       |  FROM s0 FULL OUTER JOIN s1 ON s0.o_custkey = s1.o_custkey)
       |SELECT seg_prior, seg_latest, count(*) AS n_customers
       |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // -------------------------------------------------------------------
  // #258 supplier_scorecard — the one-pass fused composite aggregate.

  /** Everything a supplier review reads — revenue, shipment count,
    * on-time share (the supplier_otd 90-day rule), average lead days,
    * and the monthly lead-time OLS slope — computed in ONE map-side-
    * combined aggregate instead of five operator runs: the fusion
    * pattern that matters at 100 TB, where each extra pass is a full
    * fact scan. Every accumulator is exact (decimal revenue, integer
    * counts, DECIMAL(38,0) regression moments); doubles only in the
    * final per-row divisions. Top 25 by revenue (decimal-exact order,
    * suppkey tie-break). */
  def supplierScorecard(spark: SparkSession, dir: String): DataFrame =
    supplierScorecardOf(Tables.lineitem(spark, dir), Tables.orders(spark, dir))

  def supplierScorecardOf(li: DataFrame, ord: DataFrame): DataFrame = {
    val base = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"),
        dec(col("l_extendedprice")).as("rev"),
        when(col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAY"), 1L)
          .otherwise(0L).as("ontime"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("lag"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("decimal(38,0)").as("x"))
    base.groupBy(col("l_suppkey"))
      .agg(sum(col("rev")).cast("decimal(18,2)").as("revenue"),
        count(lit(1)).as("n_ship"),
        sum(col("ontime")).as("n_ontime"),
        sum(col("lag")).as("lag_sum"),
        sum(col("x")).as("sx"),
        sum(col("lag").cast("decimal(38,0)")).as("sy"),
        sum(col("x") * col("lag").cast("decimal(38,0)")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("den", col("n_ship") * col("sxx") - col("sx") * col("sx"))
      // revenue rendered as double; BOTH engines then order by the same
      // double (+ suppkey tie-break), so order cannot drift either.
      .select(col("l_suppkey"), col("revenue").cast("double").as("revenue"),
        col("n_ship"),
        round(col("n_ontime").cast("double") / col("n_ship"), 6)
          .as("ontime_share"),
        round(col("lag_sum").cast("double") / col("n_ship"), 6).as("avg_lead"),
        when(col("den") > 0,
          round((col("n_ship") * col("sxy") - col("sx") * col("sy")).cast("double") /
            col("den").cast("double"), 6)).as("lead_slope"))
      .orderBy(desc("revenue"), col("l_suppkey")).limit(25)
  }

  val supplierScorecardSql: String =
    """WITH b AS (
      |  SELECT l_suppkey,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS rev,
      |    CASE WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY
      |         THEN 1 ELSE 0 END AS ontime,
      |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lag,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS DECIMAL(38,0)) AS x
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |m AS (
      |  SELECT l_suppkey,
      |    CAST(sum(rev) AS DECIMAL(18,2)) AS revenue,
      |    count(*) AS n_ship,
      |    CAST(sum(ontime) AS BIGINT) AS n_ontime,
      |    CAST(sum(lag) AS BIGINT) AS lag_sum,
      |    sum(x) AS sx, sum(CAST(lag AS DECIMAL(38,0))) AS sy,
      |    sum(x * CAST(lag AS DECIMAL(38,0))) AS sxy, sum(x * x) AS sxx
      |  FROM b GROUP BY 1)
      |SELECT l_suppkey, CAST(revenue AS DOUBLE) AS revenue, n_ship,
      |  round(CAST(n_ontime AS DOUBLE) / n_ship, 6) AS ontime_share,
      |  round(CAST(lag_sum AS DOUBLE) / n_ship, 6) AS avg_lead,
      |  CASE WHEN n_ship * sxx - sx * sx > 0 THEN
      |    round(CAST(n_ship * sxy - sx * sy AS DOUBLE)
      |      / CAST(n_ship * sxx - sx * sx AS DOUBLE), 6)
      |  END AS lead_slope
      |FROM m ORDER BY revenue DESC, l_suppkey LIMIT 25""".stripMargin

  // -------------------------------------------------------------------
  // #259 nation_trade_balance — export vs import revenue per nation.

  /** The balance-of-trade view: revenue where the nation's SUPPLIERS
    * ship (exports) vs where its CUSTOMERS buy (imports), with the
    * decimal-exact net. Two fact aggregates (each its dimension chain
    * broadcast), full-outer joined on the ≤25-row nation key — absent
    * sides surface as 0.00 so the net is always defined. */
  def nationTradeBalance(spark: SparkSession, dir: String): DataFrame =
    nationTradeBalanceOf(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.supplier(spark, dir), Tables.customer(spark, dir),
      Tables.nation(spark, dir))

  def nationTradeBalanceOf(li: DataFrame, ord: DataFrame, sup: DataFrame,
      cust: DataFrame, nation: DataFrame): DataFrame = {
    val exp = li.join(broadcast(sup.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("nk"))
      .agg(sum(dec(col("l_extendedprice"))).cast("decimal(18,2)").as("exports"))
    val imp = li.join(ord.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"))
      .agg(sum(dec(col("l_extendedprice"))).cast("decimal(18,2)").as("imports"))
    val zero = lit(0).cast("decimal(18,2)")
    exp.join(imp, Seq("nk"), "full_outer")
      .join(broadcast(nation.select(col("n_nationkey").as("nk"), col("n_name"))), "nk")
      // net computed on exact decimals; all three money columns rendered
      // as double at the edge (decimal parquet vs DuckDB float64 fetchdf).
      .select(col("n_name"),
        coalesce(col("exports"), zero).cast("double").as("exports"),
        coalesce(col("imports"), zero).cast("double").as("imports"),
        (coalesce(col("exports"), zero) - coalesce(col("imports"), zero))
          .cast("decimal(18,2)").cast("double").as("net"))
      .orderBy("n_name")
  }

  val nationTradeBalanceSql: String =
    """WITH e AS (
      |  SELECT s_nationkey AS nk,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS exports
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1),
      |i AS (
      |  SELECT c_nationkey AS nk,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS imports
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |       JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1),
      |j AS (
      |  SELECT COALESCE(e.nk, i.nk) AS nk,
      |    COALESCE(exports, CAST(0 AS DECIMAL(18,2))) AS exports,
      |    COALESCE(imports, CAST(0 AS DECIMAL(18,2))) AS imports
      |  FROM e FULL OUTER JOIN i ON e.nk = i.nk)
      |SELECT n_name, CAST(exports AS DOUBLE) AS exports,
      |  CAST(imports AS DOUBLE) AS imports,
      |  CAST(CAST(exports - imports AS DECIMAL(18,2)) AS DOUBLE) AS net
      |FROM j JOIN nation ON nk = n_nationkey
      |ORDER BY n_name""".stripMargin

  // -------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_cube" -> (q1Cube _),
    "orders_rfm" -> (ordersRfm _),
    "part_skyline" -> (partSkyline _),
    "fk_audit" -> (fkAudit _),
    "basket_pairs" -> (basketPairs _),
    "market_hhi" -> (marketHhi _),
    "supplier_otd" -> (supplierOtd _),
    "part_corr" -> (partCorr _),
    "orders_aging" -> (ordersAging _),
    "orders_ship_lag" -> (ordersShipLag _),
    "supplier_concurrency" -> (supplierConcurrency _),
    "supplier_triangles" -> (supplierTriangles _),
    "orders_abc" -> (ordersAbc _),
    "supplier_lead_trend" -> (supplierLeadTrend _),
    "part_rank_shift" -> (partRankShift _),
    "brand_bridge" -> (brandBridge _),
    "customer_migration" -> (customerMigration _),
    "supplier_scorecard" -> (supplierScorecard _),
    "nation_trade_balance" -> (nationTradeBalance _))

  val oracles: Map[String, String] = Map(
    "q1_cube" -> q1CubeSql,
    "orders_rfm" -> ordersRfmSql,
    "part_skyline" -> partSkylineSql,
    "fk_audit" -> fkAuditSql,
    "basket_pairs" -> basketPairsSql,
    "market_hhi" -> marketHhiSql,
    "supplier_otd" -> supplierOtdSql,
    "part_corr" -> partCorrSql,
    "orders_aging" -> ordersAgingSql,
    "orders_ship_lag" -> ordersShipLagSql,
    "supplier_concurrency" -> supplierConcurrencySql,
    "supplier_triangles" -> supplierTrianglesSql,
    "orders_abc" -> ordersAbcSql,
    "supplier_lead_trend" -> supplierLeadTrendSql,
    "part_rank_shift" -> partRankShiftSql,
    "brand_bridge" -> brandBridgeSql,
    "customer_migration" -> customerMigrationSql,
    "supplier_scorecard" -> supplierScorecardSql,
    "nation_trade_balance" -> nationTradeBalanceSql)
}
