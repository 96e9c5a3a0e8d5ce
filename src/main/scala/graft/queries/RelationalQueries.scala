package graft.queries

import graft.operators.Pin.PinOps
import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OLAP substrate queries over the TPC-H-ish testdata.
  *
  * Oracle-parity rules (SURVEY.md §6): money/quantity doubles are cast to
  * DECIMAL before aggregation so sums are exact (no FP summation-order
  * drift vs DuckDB), then cast back to DOUBLE on output; every query is
  * totally ordered by a unique key.
  */
object RelationalQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** TPC-H Q1-style pricing summary. Single scan, partial agg map-side,
    * one shuffle on the 2-column group key. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1995-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1995-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style shipping priority: customer (dim, broadcast) ⋈ orders ⋈
    * lineitem (fact-fact shuffle on the join key), decimal-exact revenue,
    * TakeOrdered top-10. */
  def q3Priority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).where(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
  }

  val q3PrioritySql: String =
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5-style local-supplier revenue by nation: region/nation/supplier
    * broadcast (true dims), lineitem⋈orders and ⋈customer shuffle on their
    * keys — the shape that survives a 100× fact scale-up. */
  def q5Region(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
             col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir).where(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
                  col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  val q5RegionSql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q7 (volume shipping): revenue between two trading nations by
    * direction and ship year. The scale shape: the nation dim — pre-pruned
    * to the two nations — joins BROADCAST on both fact sides through its
    * own alias (supplier side and customer side; never a fact self-join),
    * so the pruning happens IN the joins and only the cross-orientation
    * disjunction remains as a row-local filter; the aggregate is a
    * map-side-combined 3-key groupBy over the surviving fact rows. */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val (na, nb) = ("NATION_13", "NATION_19")
    val li = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
             col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      .where(col("supp_nation").isin(na, nb))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      .where(col("cust_nation").isin(na, nb))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .where((col("supp_nation") === na && col("cust_nation") === nb) ||
             (col("supp_nation") === nb && col("cust_nation") === na))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7VolumeShippingSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE ((n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
      |    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13'))
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 3
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Top-3 customers by order revenue within each nation: one aggregate to
    * customer grain, then the custom TopKPerKey operator (bounded per-key
    * heaps — no per-nation sort of every customer), ranks over the ≤3
    * survivors per nation. */
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
    val cust = Tables.customer(spark, dir)
    val nat = Tables.nation(spark, dir)
    val joined = rev.join(cust, col("o_custkey") === col("c_custkey"))
    val top = org.apache.spark.sql.graft.TopKPerKey(
      joined, Seq(col("c_nationkey")), Seq(desc("revenue"), col("c_custkey")), 3)
    val w = Window.partitionBy("c_nationkey").orderBy(desc("revenue"), col("c_custkey"))
    top
      .withColumn("rnk", row_number().over(w))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("rnk"), col("c_custkey"), col("c_name"), col("revenue"))
      .orderBy(col("n_name"), col("rnk"))
  }

  val topCustomersSql: String =
    """WITH rev AS (
      |  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |  FROM orders GROUP BY o_custkey),
      |ranked AS (
      |  SELECT n_name, c_custkey, c_name, revenue,
      |    CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY revenue DESC, c_custkey) AS INT) AS rnk
      |  FROM rev JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey)
      |SELECT n_name, rnk, c_custkey, c_name, revenue FROM ranked
      |WHERE rnk <= 3 ORDER BY n_name, rnk""".stripMargin

  /** #70 TPC-H Q10-shaped returned-item report: top 20 customers by revenue
    * lost to returns. Fact-fact join shuffles on the order key (the
    * returnflag filter pushed into the lineitem scan first); customer is
    * the smaller agg side; nation broadcast. TakeOrdered top-20 — no
    * global sort. */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).where(col("l_returnflag") === "R")
    val rev = Tables.orders(spark, dir)
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
    rev.join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"), col("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }

  val q10ReturnsSql: String =
    """WITH rev AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  WHERE l_returnflag = 'R' GROUP BY o_custkey)
      |SELECT c_custkey, c_name, n_name, c_acctbal, revenue
      |FROM rev JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** #71 multi-level aggregate via ROLLUP (flag, status) with a grouping id —
    * Spark expands grouping sets in ONE pass (Expand + single shuffle),
    * not one job per level. NULL group keys sort first on both engines
    * (explicit NULLS FIRST in the oracle; Spark's ASC default). */
  def q1Rollup(spark: SparkSession, dir: String): DataFrame =
    // Spread (r21): the ROLLUP Expand runs pre-aggregate on the one-split
    // scan's single core otherwise (q1CubeOf doc)
    graft.operators.Spread(Tables.lineitem(spark, dir), "l_orderkey")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .select(col("gid").cast("int").as("gid"), col("l_returnflag"),
        col("l_linestatus"), col("sum_qty"), col("n"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  val q1RollupSql: String =
    """SELECT CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
      |  l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** #74 per-customer cumulative spend: running DECIMAL sum + order sequence
    * number over the customer's order history. One shuffle on o_custkey
    * (the window's partition key); the running frame is per-partition
    * state, no self-join. */
  def ordersRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        dec(col("o_totalprice")).as("p"))
      .withColumn("order_no", count(lit(1)).over(w))
      .withColumn("running_spend", sum(col("p")).over(w).cast("double"))
      .select(col("o_custkey"), col("order_no"), col("o_orderkey"),
        col("o_orderdate"), col("running_spend"))
      .orderBy(col("o_custkey"), col("order_no"))
  }

  val ordersRunningSql: String =
    """SELECT o_custkey,
      |  CAST(count(*) OVER w AS BIGINT) AS order_no, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_spend
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, order_no""".stripMargin

  /** #75 TPC-H Q4-shaped priority check: orders (in a date window) having
    * at least one returned line, counted per priority. The EXISTS becomes
    * a LEFT SEMI join — Spark never materializes the match multiplicity,
    * and the returnflag filter is pushed into the lineitem scan, so the
    * shuffle carries only returned lines' keys. */
  def q4Priority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
             col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val ret = Tables.lineitem(spark, dir).where(col("l_returnflag") === "R")
    ord.join(ret, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val q4PrioritySql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** #76 TPC-H Q16-shaped coverage report: parts never in a RECENTLY
    * returned line (returnflag R shipped on/after 2000-01-01), per brand.
    * NOT EXISTS becomes a LEFT ANTI join — the complement of the
    * semi-join, same single-shuffle shape (no distinct pass needed:
    * anti-join semantics ignore match multiplicity by construction). The
    * date window is pushed into the lineitem scan AND keeps the gate-scale
    * result non-empty at every driver SF (the unwindowed variant matched
    * every part and compared 0 = 0 rows — trivially green). */
  def q16Parts(spark: SparkSession, dir: String): DataFrame = {
    val ret = Tables.lineitem(spark, dir)
      .where(col("l_returnflag") === "R" &&
             col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("l_partkey"))
    Tables.part(spark, dir)
      .join(ret, col("p_partkey") === col("l_partkey"), "left_anti")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        sum(dec(col("p_retailprice"))).cast("double").as("total_price"))
      .orderBy(col("p_brand"))
  }

  val q16PartsSql: String =
    """SELECT p_brand, count(*) AS n_parts,
      |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_partkey = p_partkey AND l_returnflag = 'R'
      |                    AND l_shipdate >= TIMESTAMP '2000-01-01')
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** #77 TPC-H Q12-shaped lateness split: per order priority, lines shipped
    * more than 90 days after the order date vs on time. One fact-fact
    * shuffle on the order key; the flags aggregate as conditional sums in
    * the same pass (CAST to BIGINT on both engines — DuckDB's sum(int)
    * widens to HUGEINT which would hash as float64). */
  def q12Lateness(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .withColumn("late", col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
        sum(when(col("late"), 0L).otherwise(1L)).as("n_ontime"))
      .orderBy(col("o_orderpriority"))

  val q12LatenessSql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |  CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 0 ELSE 1 END) AS BIGINT) AS n_ontime
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** #78 TPC-H Q18-shaped large-order report: orders whose total quantity
    * exceeds 250, with their customer. Aggregate-then-join: lineitem is
    * reduced to order grain BEFORE any join (the HAVING filter drops
    * ~99% of orders pre-join), so the join input is tiny however large
    * the fact table; DECIMAL-exact quantity sums; TakeOrdered top-20. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame =
    q18LargeOrdersOf(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.customer(spark, dir))

  private def q18LargeOrdersOf(lineitem: DataFrame, orders: DataFrame,
                               customer: DataFrame): DataFrame = {
    val big = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("qd"))
      .where(col("qd") > 250)
    big.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("qd").cast("double").as("total_qty"))
      .orderBy(desc("total_qty"), col("o_orderkey"))
      .limit(20)
  }

  /** #314 q18_bucketed: #78's large-order report SERVED FROM the #294
    * bucketed layout (the dedup_minhash_bucketed-shadows-#102 discipline,
    * relational flavor): both fact tables come from the order-key
    * bucketed+sorted catalog tables, so the order-grain quantity
    * aggregate runs WITHOUT an Exchange (grouping key = bucket key) and
    * the big⋈orders join reads aligned bucket files with no shuffle on
    * either side — at 100 TB the 16 GB/decade order-key exchange is the
    * query's dominant cost and the layout deletes it. Production code
    * path and oracle are IDENTICAL to #78 (layout changes the plan,
    * never the answer — the #294 contract; PlanSpec pins zero Exchange
    * at/below the fact-fact join). */
  def q18Bucketed(spark: SparkSession, dir: String): DataFrame = {
    val (lt, ot) = IngestQueries.bucketedTables(spark, dir)
    q18LargeOrdersOf(spark.table(lt), spark.table(ot),
      Tables.customer(spark, dir))
  }

  val q18LargeOrdersSql: String =
    """WITH big AS (
      |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qd
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250)
      |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(qd AS DOUBLE) AS total_qty
      |FROM big JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin

  /** #79 customer balance deciles: boundaries from ONE tiny percentile
    * aggregate (9 doubles, broadcast back), assignment as a pure
    * projection counting boundaries strictly below the value. NEVER an
    * un-partitioned ntile window — that is a single-task global sort at
    * any scale, while this shape is scan + scalar-agg + scan. Boundaries
    * round to 6 dp so both engines compare identical doubles (percentile
    * and quantile_cont share linear interpolation). */
  private def decilesFrom(cust: DataFrame, qs: Seq[Column]): DataFrame = {
    val bounds = cust.agg(array(qs: _*).as("bs"))
    cust.crossJoin(broadcast(bounds))
      .select(col("c_custkey"), col("c_acctbal"),
        (aggregate(col("bs"), lit(0),
          (acc, b) => acc + when(col("c_acctbal") > b, 1).otherwise(0)) + 1)
          .cast("int").as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        sum(dec(col("c_acctbal"))).cast("double").as("total_bal"))
      .orderBy(col("decile"))
  }

  def customerDeciles(spark: SparkSession, dir: String): DataFrame =
    // exact percentile boundaries: required for the DuckDB quantile_cont
    // oracle (both engines interpolate linearly over the same doubles),
    // affordable at gate scale only — its aggregation buffer holds every
    // distinct value in ONE task. The library/scale path is
    // customerDecilesApprox below.
    decilesFrom(Tables.customer(spark, dir),
      (1 to 9).map(i => round(expr(s"percentile(c_acctbal, 0.$i)"), 6)))

  /** The 100-TB decile path: approx_percentile boundaries. Unlike exact
    * `percentile` (whose single aggregation buffer materializes the whole
    * column's value counts in one task — a memory bomb at 100× customers),
    * the sketch is fixed-size and MERGEABLE, so boundary estimation is a
    * normal map-side-combined aggregate. Everything downstream is shared
    * with the exact path. Engine-specific estimates can't face a DuckDB
    * oracle; the accuracy contract (every boundary within one rank-error
    * band of exact, decile populations within 2% of N/10) is asserted in
    * RelationalQueriesSpec instead — the events_uniques HLL pattern. */
  def customerDecilesApprox(spark: SparkSession, dir: String,
                            accuracy: Int = 10000): DataFrame =
    decilesFrom(Tables.customer(spark, dir),
      (1 to 9).map(i =>
        round(expr(s"approx_percentile(c_acctbal, 0.$i, $accuracy)"), 6)))

  val customerDecilesSql: String = {
    val qs = (1 to 9).map(i => s"round(quantile_cont(c_acctbal, 0.$i), 6)").mkString(", ")
    s"""WITH b AS (SELECT [$qs] AS bs FROM customer),
       |a AS (SELECT c_custkey, c_acctbal,
       |        CAST(1 + len(list_filter(bs, x -> c_acctbal > x)) AS INT) AS decile
       |      FROM customer, b)
       |SELECT decile, count(*) AS n_customers,
       |  min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
       |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
       |FROM a GROUP BY decile ORDER BY decile""".stripMargin
  }

  /** #81 TPC-H Q6-shaped revenue forecast: pure filter + single-row
    * aggregate. Every predicate is pushed into the parquet scan
    * (PushedFilters carries the date window, discount band and quantity
    * cap), so at 100 TB this reads only row groups whose min/max stats
    * survive — the cheapest query shape there is. */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
             col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
             col("l_discount").between(0.05, 0.07) &&
             col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
             .cast("double").as("revenue"),
           count(lit(1)).as("n_lines"))

  val q6ForecastSql: String =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** #82 TPC-H Q14-shaped promo-revenue share: conditional sum over a
    * part join, one month of lineitem. Part is a true dimension —
    * broadcast — so the fact side never shuffles; both the numerator and
    * denominator aggregate in the SAME pass (no second scan for the
    * ratio). DECIMAL-exact sums; the final ratio divides two identical
    * doubles on both engines and rounds to 6 dp. */
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
             col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val disc = dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
    li.join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .agg(sum(when(col("p_type").startsWith("PROMO"), disc)).cast("double").as("promo_revenue"),
           sum(disc).cast("double").as("total_revenue"))
      .select(
        round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 6).as("promo_pct"),
        col("promo_revenue"), col("total_revenue"))
  }

  val q14PromoSql: String =
    """WITH a AS (
      |  SELECT
      |    CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
      |          THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE) AS promo_revenue,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01')
      |SELECT round(100.0 * promo_revenue / total_revenue, 6) AS promo_pct,
      |  promo_revenue, total_revenue
      |FROM a""".stripMargin

  /** #83 TPC-H Q17-shaped small-quantity revenue: lines below 20% of
    * their part's average quantity. The correlated per-part subquery is
    * decorrelated by hand into aggregate-then-join — the per-part limit
    * table is ONE map-side-combined aggregate at part grain, then a key
    * shuffle join back; the threshold is computed from DECIMAL-exact
    * sums in a fixed operation order so both engines compare the same
    * 6-dp double. */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val lim = li.groupBy(col("l_partkey").as("lim_partkey"))
      .agg(round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)) * 0.2, 6).as("qty_lim"))
    li.join(lim, col("l_partkey") === col("lim_partkey"))
      .where(col("l_quantity") < col("qty_lim"))
      .agg(round(sum(dec(col("l_extendedprice"))).cast("double") / 7.0, 6).as("avg_yearly"),
           count(lit(1)).as("n_lines"))
  }

  val q17SmallQtySql: String =
    """WITH lim AS (
      |  SELECT l_partkey AS lim_partkey,
      |    round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 0.2, 6) AS qty_lim
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly,
      |  count(*) AS n_lines
      |FROM lineitem JOIN lim ON l_partkey = lim_partkey
      |WHERE l_quantity < qty_lim""".stripMargin

  /** #84 TPC-H Q19-shaped disjunctive filter: OR of three (brand, size,
    * quantity) branches over a part join. The brand/size arms prune the
    * broadcast part side; the OR-of-ANDs stays one codegen'd predicate —
    * no union of three scans (the naive rewrite triples the fact I/O). */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val branch = (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) && col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) && col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) && col("l_quantity").between(20, 30))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .where(branch)
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
             .cast("double").as("revenue"),
           count(lit(1)).as("n_lines"))
  }

  val q19DisjunctiveSql: String =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** #85 TPC-H Q22-shaped idle balances: customers holding more than the
    * average positive balance who have never placed a large order
    * (totalprice > 400k), per nation. The scalar cutoff is ONE tiny
    * aggregate broadcast back (never a per-row subquery); "never placed"
    * is a LEFT ANTI join on the customer key — multiplicity-free by
    * construction, no distinct pass — with the price filter pushed into
    * the orders scan so the anti side carries only large orders. */
  def q22IdleBalances(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val cut = cust.where(col("c_acctbal") > 0)
      .agg(round(sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)), 6).as("cutoff"))
    val bigOrders = Tables.orders(spark, dir)
      .where(col("o_totalprice") > 400000).select(col("o_custkey"))
    cust.crossJoin(broadcast(cut))
      .where(col("c_acctbal") > col("cutoff"))
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
           sum(dec(col("c_acctbal"))).cast("double").as("total_bal"))
      .orderBy(col("c_nationkey"))
  }

  val q22IdleBalancesSql: String =
    """WITH cut AS (
      |  SELECT round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS cutoff
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT c_nationkey, count(*) AS n_customers,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer, cut
      |WHERE c_acctbal > cutoff
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** #91 TPC-H Q2-shaped min-cost supplier: for every size-15 part, the
    * supplier(s) offering it at the lowest observed price. There is no
    * partsupp table in this schema, so lineitem stands in as the
    * part×supplier offer fact, reduced to (part, supplier) grain FIRST
    * (one map-side-combined aggregate). The correlated min-cost subquery
    * is decorrelated by hand into aggregate-then-join — the classic
    * per-group ARGMIN shape: a part-grain min table joins back to the
    * offer table on (part, cost = min), keeping ties like the reference
    * query does. Both join inputs are already at reduced grain, and the
    * supplier/nation dims broadcast. min over identical doubles is exact,
    * so the double-equality join key is engine-portable. */
  def q2MinSupplier(spark: SparkSession, dir: String): DataFrame = {
    val cost = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice")).as("min_cost"))
    val best = cost.groupBy(col("l_partkey").as("b_partkey"))
      .agg(min(col("min_cost")).as("best_cost"))
    cost
      .join(best, col("l_partkey") === col("b_partkey") &&
                  col("min_cost") === col("best_cost"))
      .join(broadcast(Tables.part(spark, dir).where(col("p_size") === 15)),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("p_brand"), col("min_cost"))
      .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
      .limit(20)
  }

  val q2MinSupplierSql: String =
    """WITH cost AS (
      |  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS min_cost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, min_cost
      |FROM cost
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_size = 15
      |  AND min_cost = (SELECT min(c2.min_cost) FROM cost c2
      |                  WHERE c2.l_partkey = cost.l_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 20""".stripMargin

  /** #92 TPC-H Q13-shaped order-count distribution: how many customers
    * placed exactly N non-urgent orders — INCLUDING the zero-order
    * customers, which is why the priority predicate lives in the LEFT
    * OUTER join condition, not a WHERE (a post-join filter would silently
    * drop the unmatched rows the query exists to count). Two aggregates:
    * customer grain (count skips the nulls the outer join manufactures),
    * then the tiny distribution grain. */
  def q13Custdist(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .where(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(spark, dir)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  val q13CustdistSql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** #93 TPC-H Q21-shaped sole-fault supplier: suppliers whose returned
    * line was the ONLY return in a multi-supplier order. Stacked EXISTS +
    * NOT EXISTS against the SAME fact: the EXISTS ("another supplier
    * shipped in this order") is a LEFT SEMI join, the NOT EXISTS ("no
    * other supplier's line was returned") a LEFT ANTI join — both shuffle
    * on the order key only, neither materializes match multiplicity, and
    * the returned-lines side is filtered before either join. The tiny
    * supplier dim broadcasts for the final name lookup. */
  def q21SoleFault(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val l1 = li.where(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"))
    val others = li.select(col("l_orderkey").as("o2_orderkey"), col("l_suppkey").as("o2_suppkey"))
    val otherReturns = li.where(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o3_orderkey"), col("l_suppkey").as("o3_suppkey"))
    l1
      .join(others, col("l_orderkey") === col("o2_orderkey") &&
                    col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
      .join(otherReturns, col("l_orderkey") === col("o3_orderkey") &&
                          col("l_suppkey") =!= col("o3_suppkey"), "left_anti")
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
      .limit(20)
  }

  val q21SoleFaultSql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  /** #95 TPC-H Q15-shaped top supplier: the supplier(s) whose quarterly
    * revenue equals the GLOBAL maximum — the scalar-argmax twin of q2's
    * per-group argmin. The revenue table is one map-side-combined
    * aggregate at supplier grain; the max is a one-row aggregate
    * broadcast back (never a rank-everything window); DECIMAL-exact sums
    * make the equality join engine-portable; ties kept like the
    * reference query's VIEW formulation. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val disc = dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
    val rev = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
             col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(disc).as("rev"))
    val top = rev.agg(max(col("rev")).as("max_rev"))
    rev.crossJoin(broadcast(top))
      .where(col("rev") === col("max_rev"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15TopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev = (SELECT max(rev) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** #96 TPC-H Q20-shaped dominant suppliers: suppliers providing more
    * than 35% of a part's recently shipped volume. The correlated
    * share subquery is decorrelated into TWO aggregates at different
    * grains of the SAME filtered fact — (part, supplier) then part —
    * joined back on the part key; the share predicate compares
    * DECIMAL×integer products (q·100 > tq·35), exact on both engines,
    * never a double division. Supplier dim broadcasts for the name. */
  def q20VolumeSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1999-01-01").cast("timestamp"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("q"))
    val tot = ps.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("q")).as("tq"))
    ps.join(tot, col("l_partkey") === col("pk"))
      .where(col("q") * 100 > col("tq") * 35)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_dominated"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_dominated"))
      .orderBy(col("s_suppkey"))
  }

  val q20VolumeSuppliersSql: String =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
      |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1999-01-01'
      |  GROUP BY l_partkey, l_suppkey),
      |tot AS (SELECT l_partkey AS pk, sum(q) AS tq FROM ps GROUP BY l_partkey)
      |SELECT s_suppkey, s_name, count(*) AS n_dominated
      |FROM ps JOIN tot ON l_partkey = pk
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE q * 100 > tq * 35
      |GROUP BY s_suppkey, s_name
      |ORDER BY s_suppkey""".stripMargin

  /** #109 TPC-H Q8-shaped national market share: a supplier nation's
    * share of ECONOMY-part revenue bought by AMERICA-region customers,
    * per order year. The two facts join once on their natural key (the
    * one shuffle); every dimension chain — filtered part, supplier→
    * nation, customer→nation→region — broadcasts; numerator and
    * denominator come out of the SAME decimal aggregate pass
    * (conditional sum over sum), never a second scan or self-join. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
    val part = Tables.part(spark, dir).where(col("p_type") === "ECONOMY")
      .select(col("p_partkey"))
    val supNat = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custAmerica = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).where(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val ord = Tables.orders(spark, dir)
      .where(col("o_orderdate").between(lit("1996-01-01").cast("timestamp"),
        lit("1997-12-31").cast("timestamp")))
    Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(custAmerica), col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_3", rev)
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
        sum(rev).cast("double"), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q8MarketShareSql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  round(
      |    CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
      |    6) AS mkt_share
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN part     ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region   ON n1.n_regionkey = r_regionkey
      |WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** #110 TPC-H Q9-shaped product-line profit per (supplier nation,
    * order year) over '%red%' parts. This schema has no partsupp, so
    * supply cost derives deterministically from the part dimension —
    * 40% of retail price per unit — the same closed formula both
    * engines evaluate (the q2 lineitem-stand-in discipline). Facts
    * join once; part and supplier→nation broadcast; profit stays
    * DECIMAL until the final cast. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame =
    q9ProductProfitOf(spark, dir,
      Tables.lineitem(spark, dir), Tables.orders(spark, dir))

  /** #313 q9_bucketed: #110's product-line profit SERVED FROM the #294
    * bucketed layout — the fact-fact lineitem⋈orders join (the query's
    * ONLY large exchange: §3q measured it at 16 GB/decade, and its
    * per-thread SMJ sorts are the 24 GB-heap spill's whole source) reads
    * aligned order-key bucket files with no shuffle and no sort on
    * either side; the part/supplier dimensions broadcast as in #110 and
    * the residual exchanges move only the ~175-group aggregate.
    * Production code path and oracle are IDENTICAL to #110 (the #294
    * contract: layout changes the plan, never the answer; PlanSpec pins
    * zero Exchange at/below the fact-fact join). */
  def q9Bucketed(spark: SparkSession, dir: String): DataFrame = {
    val (lt, ot) = IngestQueries.bucketedTables(spark, dir)
    q9ProductProfitOf(spark, dir, spark.table(lt), spark.table(ot))
  }

  private def q9ProductProfitOf(spark: SparkSession, dir: String,
                                lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val profit = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))) -
      dec(col("p_retailprice")) * lit(0.40).cast("decimal(18,2)") * dec(col("l_quantity"))
    val part = Tables.part(spark, dir).where(col("p_name").like("%red%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val supNat = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(profit).cast("double").as("sum_profit"))
      .orderBy(col("nation"), desc("o_year"))
  }

  val q9ProductProfitSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(sum(
      |    CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) -
      |    CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.40 AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))
      |  ) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN part     ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** #111 TPC-H Q11-shaped important stock: per-part traded value from
    * two nations' suppliers, kept when above 0.1% of that trade's total
    * — the group-by + HAVING-over-global-scalar shape. The scalar total
    * is ONE tiny aggregate broadcast back (the q22 discipline, never a
    * per-row subquery); value stays DECIMAL through the aggregate AND
    * the threshold compare (exact on both engines), double only on
    * output. lineitem stands in for partsupp at (part, supplier) grain
    * (the q2 discipline). */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val supNat = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).where(
        col("n_name").isin("NATION_0", "NATION_1"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val value = Tables.lineitem(spark, dir)
      .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("partkey"))
      .agg(sum(dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))).as("value_d"))
    val total = value.agg(sum(col("value_d")).as("total_d"))
    value.crossJoin(broadcast(total))
      .where(col("value_d") * 1000 > col("total_d"))
      .select(col("partkey"), col("value_d").cast("double").as("value"))
      .orderBy(desc("value"), col("partkey"))
  }

  val q11ImportantStockSql: String =
    """WITH v AS (
      |  SELECT l_partkey AS partkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS value_d
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  WHERE n_name IN ('NATION_0', 'NATION_1')
      |  GROUP BY l_partkey),
      |t AS (SELECT sum(value_d) AS total_d FROM v)
      |SELECT partkey, CAST(value_d AS DOUBLE) AS value
      |FROM v, t
      |WHERE value_d * 1000 > total_d
      |ORDER BY value DESC, partkey""".stripMargin

  /** #119 open order book per day — the POINT-IN-INTERVAL RANGE JOIN
    * shape (graft.operators.RangeJoin): for each distinct 1995 order
    * date, the number of orders whose fulfillment window
    * [o_orderdate, max line ship date] contains it. A bare BETWEEN join
    * is a BroadcastNestedLoopJoin in Spark — O(dates × orders) — so the
    * operator turns it into a banded EQUI-join (bin by mean interval
    * length, explode intervals over their bins, join on bin, exact
    * containment filter); DuckDB serves the same SQL with its native
    * IEJoin, which is the oracle. PlanSpec pins no-BNLJ/no-cartesian. */
  def ordersOpenBook(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val win = ord.join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(max(col("l_shipdate")).as("hi_ts"))
      .select(unix_date(to_date(col("o_orderdate"))).as("lo_day"),
              unix_date(to_date(col("hi_ts"))).as("hi_day"))
    val dates = ord
      .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
             col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_orderdate").as("d")).distinct()
      .withColumn("d_day", unix_date(to_date(col("d"))))
    graft.operators.RangeJoin
      .pointInInterval(dates, "d_day", win, "lo_day", "hi_day")
      .groupBy(col("d")).agg(count(lit(1)).as("n_open"))
      .orderBy(col("d"))
  }

  val ordersOpenBookSql: String =
    """WITH win AS (
      |  SELECT o_orderkey, o_orderdate AS lo, max(l_shipdate) AS hi
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY o_orderkey, o_orderdate),
      |dates AS (
      |  SELECT DISTINCT o_orderdate AS d FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      |    AND o_orderdate < TIMESTAMP '1996-01-01')
      |SELECT d, count(*) AS n_open
      |FROM dates JOIN win ON lo <= d AND d <= hi
      |GROUP BY d ORDER BY d""".stripMargin

  /** #141 orders_reconcile: the warehouse reconciliation job — diff the
    * BOOKED order totals against totals DERIVED from their line items
    * (TPC-H's own o_totalprice identity: Σ extprice·(1−disc)·(1+tax)),
    * through the generic [[graft.operators.SnapshotDiff]] CDC operator
    * (one full-outer key join, row-local null-safe comparison), then one
    * tiny per-class aggregate: counts + the exact decimal sum of
    * absolute discrepancy. "removed" = orders with no line items at all
    * (the referential-integrity finding); "changed" = totals that
    * disagree. Decimal arithmetic end-to-end, so the compare is exact. */
  def ordersReconcile(s: SparkSession, d: String): DataFrame = {
    // exact integer micro-units (10⁻⁶ currency): every 2-dp source value
    // ×100 rounds to an exact integer, products/sums stay integers —
    // engine-arithmetic differences can't enter the compare
    val booked = Tables.orders(s, d)
      .select(col("o_orderkey"),
        (round(col("o_totalprice") * 100).cast("long") * 10000L).as("total_micro"))
    val derived = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")) *
          (lit(100L) + round(col("l_tax") * 100).cast("long")))
        .as("total_micro"))
    graft.operators.SnapshotDiff.diff(booked, derived, Seq("o_orderkey"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_orders"),
        sum(abs(coalesce(col("new_total_micro"), lit(0L)) -
                coalesce(col("old_total_micro"), lit(0L)))).as("abs_diff_micro"))
      .orderBy("change_type")
  }

  val ordersReconcileSql: String =
    """WITH booked AS (
      |  SELECT o_orderkey,
      |    CAST(round(o_totalprice * 100, 0) AS BIGINT) * 10000 AS old_total_micro
      |  FROM orders),
      |derived AS (
      |  SELECT l_orderkey AS o_orderkey,
      |    CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
      |        * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
      |        * (100 + CAST(round(l_tax * 100, 0) AS BIGINT))) AS BIGINT) AS new_total_micro
      |  FROM lineitem GROUP BY l_orderkey),
      |d AS (
      |  SELECT CASE WHEN b.o_orderkey IS NULL THEN 'added'
      |              WHEN v.o_orderkey IS NULL THEN 'removed'
      |              WHEN b.old_total_micro IS DISTINCT FROM v.new_total_micro THEN 'changed'
      |              ELSE 'unchanged' END AS change_type,
      |         b.old_total_micro, v.new_total_micro
      |  FROM booked b FULL OUTER JOIN derived v ON b.o_orderkey = v.o_orderkey)
      |SELECT change_type, count(*) AS n_orders,
      |  CAST(sum(abs(coalesce(new_total_micro, 0) - coalesce(old_total_micro, 0))) AS BIGINT) AS abs_diff_micro
      |FROM d GROUP BY change_type ORDER BY change_type""".stripMargin

  /** #186 customer_pareto: revenue-concentration readout — Gini
    * coefficient (rank formula G = 2·Σi·xᵢ/(n·Σx) − (n+1)/n over
    * ascending revenue) plus top-1/5/10/20% revenue shares, ONE summary
    * row. The global ascending rank is computed the SCALE-SAFE way (the
    * corpus_shuffle discipline — never a one-task window): range
    * exchange on (rev, custkey) → per-shard row_number (windows
    * partitioned by shard run parallel) → broadcast shard-count prefix
    * offsets. Range partition boundaries are sampled (nondeterministic
    * shard CUTS), but rank = offset + local rank is invariant to where
    * the cuts fall — the total order (rev, custkey) is unique, so ranks
    * and every downstream number are deterministic. All sums are exact
    * DECIMAL (rank cast to DECIMAL(10,0) keeps products inside 38
    * digits); only the final ratios are doubles, rounded 6 dp. Cuts
    * ceil(p·n) are exact decimal arithmetic in both engines. */
  def customerPareto(spark: SparkSession, dir: String): DataFrame =
    customerParetoOf(Tables.orders(spark, dir))

  def customerParetoOf(orders: DataFrame): DataFrame = {
    val rev = orders.groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).cast("decimal(18,2)").as("rev"))
    // localCheckpoint pins ONE materialized range partitioning: the
    // broadcast-offset rank is only correct if the offsets aggregate and
    // the ranked join observe the IDENTICAL partition boundaries, and
    // relying on deterministic RangePartitioner sampling + ReuseExchange
    // would silently mis-rank under any plan change (the DedupQueries
    // pair-cache discipline).
    val parted = rev.repartitionByRange(32, col("rev"), col("o_custkey"))
      .withColumn("pid", spark_partition_id())
      .pin()
    val shard = Window.partitionBy("pid").orderBy(col("rev"), col("o_custkey"))
    val local = parted.withColumn("lrk", row_number().over(shard).cast("long"))
    val offW = graft.operators.BoundedWindow.keyed(col("pid")).orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(offW), lit(0L)))
      .select("pid", "off")
    val ranked = local.join(broadcast(offsets), "pid")
      .withColumn("rk", col("off") + col("lrk"))
    val nRow = ranked.agg(count(lit(1)).as("n"))
      .selectExpr("n",
        "CAST(ceil(n * 0.01) AS BIGINT) AS c1",
        "CAST(ceil(n * 0.05) AS BIGINT) AS c5",
        "CAST(ceil(n * 0.10) AS BIGINT) AS c10",
        "CAST(ceil(n * 0.20) AS BIGINT) AS c20")
    ranked.crossJoin(broadcast(nRow))
      .groupBy("n", "c1", "c5", "c10", "c20")
      .agg(sum(col("rev")).as("s"),
        sum(col("rev") * col("rk").cast("decimal(10,0)")).as("s2"),
        sum(when(col("rk") >= col("n") - col("c1") + 1, col("rev"))).as("t1"),
        sum(when(col("rk") >= col("n") - col("c5") + 1, col("rev"))).as("t5"),
        sum(when(col("rk") >= col("n") - col("c10") + 1, col("rev"))).as("t10"),
        sum(when(col("rk") >= col("n") - col("c20") + 1, col("rev"))).as("t20"))
      .selectExpr("n",
        "CAST(s AS DOUBLE) AS total_revenue",
        "round(CAST(2 AS DOUBLE) * CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)) " +
          "- CAST(n + 1 AS DOUBLE) / n, 6) AS gini",
        "round(CAST(t1 AS DOUBLE) / CAST(s AS DOUBLE), 6) AS top1_share",
        "round(CAST(t5 AS DOUBLE) / CAST(s AS DOUBLE), 6) AS top5_share",
        "round(CAST(t10 AS DOUBLE) / CAST(s AS DOUBLE), 6) AS top10_share",
        "round(CAST(t20 AS DOUBLE) / CAST(s AS DOUBLE), 6) AS top20_share")
  }

  val customerParetoSql: String =
    """WITH rev AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
      |  FROM orders GROUP BY 1),
      |rk AS (
      |  SELECT rev,
      |    CAST(row_number() OVER (ORDER BY rev, o_custkey) AS BIGINT) AS rk
      |  FROM rev),
      |nn AS (
      |  SELECT count(*) AS n,
      |    CAST(ceil(count(*) * 0.01) AS BIGINT) AS c1,
      |    CAST(ceil(count(*) * 0.05) AS BIGINT) AS c5,
      |    CAST(ceil(count(*) * 0.10) AS BIGINT) AS c10,
      |    CAST(ceil(count(*) * 0.20) AS BIGINT) AS c20
      |  FROM rev),
      |agg AS (
      |  SELECT n, c1, c5, c10, c20,
      |    sum(rev) AS s,
      |    sum(rev * CAST(rk AS DECIMAL(10,0))) AS s2,
      |    sum(CASE WHEN rk >= n - c1 + 1 THEN rev END) AS t1,
      |    sum(CASE WHEN rk >= n - c5 + 1 THEN rev END) AS t5,
      |    sum(CASE WHEN rk >= n - c10 + 1 THEN rev END) AS t10,
      |    sum(CASE WHEN rk >= n - c20 + 1 THEN rev END) AS t20
      |  FROM rk, nn GROUP BY 1, 2, 3, 4, 5)
      |SELECT n,
      |  CAST(s AS DOUBLE) AS total_revenue,
      |  round(CAST(2 AS DOUBLE) * CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
      |    - CAST(n + 1 AS DOUBLE) / n, 6) AS gini,
      |  round(CAST(t1 AS DOUBLE) / CAST(s AS DOUBLE), 6) AS top1_share,
      |  round(CAST(t5 AS DOUBLE) / CAST(s AS DOUBLE), 6) AS top5_share,
      |  round(CAST(t10 AS DOUBLE) / CAST(s AS DOUBLE), 6) AS top10_share,
      |  round(CAST(t20 AS DOUBLE) / CAST(s AS DOUBLE), 6) AS top20_share
      |FROM agg""".stripMargin

  /** #187 orders_backlog: concurrent-interval counting — how many orders
    * are OPEN (placed, not yet fully shipped) on each day an order
    * opens or closes. The classic sweep-line rewrite: instead of joining
    * every day against every order interval (quadratic), each order
    * contributes a +1 delta at o_orderdate and a −1 the day after its
    * last l_shipdate (this corpus's lineitem carries shipdate, not receipt); the backlog is the running sum of day-grain
    * deltas. Shapes: one l_orderkey aggregate + one co-keyed equi-join
    * (corpus-sized, the only data-sized stages), then a day-grain
    * aggregate and ONE running-sum window over the ~2.5k-day calendar —
    * bounded by the calendar, not the data (the ewma discipline).
    * All-integer arithmetic: exact on both engines. */
  def ordersBacklog(spark: SparkSession, dir: String): DataFrame =
    ordersBacklogOf(Tables.orders(spark, dir), Tables.lineitem(spark, dir))

  def ordersBacklogOf(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val closes = lineitem.groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("close_date"))
    val spans = orders.select(col("o_orderkey"), col("o_orderdate"))
      .join(closes, col("o_orderkey") === col("l_orderkey"))
    val deltas = spans.select(col("o_orderdate").as("day"), lit(1L).as("d"))
      .unionAll(spans.select(date_add(col("close_date"), 1).as("day"), lit(-1L).as("d")))
    val daily = deltas.groupBy("day").agg(sum(col("d")).as("delta"))
    val sweep = graft.operators.BoundedWindow.keyed(col("day")).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("backlog", sum(col("delta")).over(sweep))
      .orderBy("day")
  }

  val ordersBacklogSql: String =
    """WITH closes AS (
      |  SELECT l_orderkey, max(l_shipdate) AS close_date
      |  FROM lineitem GROUP BY 1),
      |spans AS (
      |  SELECT o.o_orderkey, o.o_orderdate, c.close_date
      |  FROM orders o JOIN closes c ON o.o_orderkey = c.l_orderkey),
      |deltas AS (
      |  SELECT o_orderdate AS day, CAST(1 AS BIGINT) AS d FROM spans
      |  UNION ALL
      |  SELECT close_date + INTERVAL 1 DAY, CAST(-1 AS BIGINT) FROM spans),
      |daily AS (SELECT CAST(day AS DATE) AS day, sum(d) AS delta FROM deltas GROUP BY 1)
      |SELECT day, CAST(delta AS BIGINT) AS delta,
      |  CAST(sum(delta) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS backlog
      |FROM daily ORDER BY day""".stripMargin

  /** #195 orders_seasonality: the month-grain BI readout — order volume,
    * exact DECIMAL revenue, and month-over-month / year-over-year growth
    * per calendar month. One map-side-combined month aggregate is the
    * only corpus pass; the lag windows ride the ~80-row month series
    * (bounded by the calendar — the ewma/backlog discipline). Growth =
    * (rev − lag)/lag on doubles both engines derive from the same exact
    * decimal, rounded 6 dp; leading months (no lag) are NULL in both. */
  def ordersSeasonality(spark: SparkSession, dir: String): DataFrame =
    ordersSeasonalityOf(Tables.orders(spark, dir))

  def ordersSeasonalityOf(orders: DataFrame): DataFrame = {
    val m = orders.groupBy(
        date_trunc("MONTH", col("o_orderdate")).cast("date").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
    val w = graft.operators.BoundedWindow.keyed(col("month")).orderBy("month")
    m.withColumn("mom", round(
        (col("revenue") - lag(col("revenue"), 1).over(w)) /
          lag(col("revenue"), 1).over(w), 6))
      .withColumn("yoy", round(
        (col("revenue") - lag(col("revenue"), 12).over(w)) /
          lag(col("revenue"), 12).over(w), 6))
      .orderBy("month")
  }

  val ordersSeasonalitySql: String =
    """WITH m AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |    count(*) AS n_orders,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |  FROM orders GROUP BY 1)
      |SELECT month, n_orders, revenue,
      |  round((revenue - lag(revenue, 1) OVER (ORDER BY month)) /
      |        lag(revenue, 1) OVER (ORDER BY month), 6) AS mom,
      |  round((revenue - lag(revenue, 12) OVER (ORDER BY month)) /
      |        lag(revenue, 12) OVER (ORDER BY month), 6) AS yoy
      |FROM m ORDER BY month""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_seasonality" -> (ordersSeasonality _),
    "orders_backlog" -> (ordersBacklog _),
    "customer_pareto" -> (customerPareto _),
    "orders_reconcile" -> (ordersReconcile _),
    "orders_open_book" -> (ordersOpenBook _),
    "q8_market_share" -> (q8MarketShare _),
    "q9_product_profit" -> (q9ProductProfit _),
    "q9_bucketed" -> (q9Bucketed _),
    "q11_important_stock" -> (q11ImportantStock _),
    "q1_pricing" -> (q1Pricing _),
    "q3_priority" -> (q3Priority _),
    "q5_region" -> (q5Region _),
    "q10_returns" -> (q10Returns _),
    "q1_rollup" -> (q1Rollup _),
    "orders_running" -> (ordersRunning _),
    "top_customers" -> (topCustomers _),
    "q4_priority" -> (q4Priority _),
    "q16_parts" -> (q16Parts _),
    "q12_lateness" -> (q12Lateness _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q18_bucketed" -> (q18Bucketed _),
    "customer_deciles" -> (customerDeciles _),
    "q6_forecast" -> (q6Forecast _),
    "q14_promo" -> (q14Promo _),
    "q17_small_qty" -> (q17SmallQty _),
    "q19_disjunctive" -> (q19Disjunctive _),
    "q22_idle_balances" -> (q22IdleBalances _),
    "q2_min_supplier" -> (q2MinSupplier _),
    "q13_custdist" -> (q13Custdist _),
    "q21_sole_fault" -> (q21SoleFault _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q20_volume_suppliers" -> (q20VolumeSuppliers _),
    "q7_volume_shipping" -> (q7VolumeShipping _))

  val oracles: Map[String, String] = Map(
    "orders_seasonality" -> ordersSeasonalitySql,
    "orders_backlog" -> ordersBacklogSql,
    "customer_pareto" -> customerParetoSql,
    "q8_market_share" -> q8MarketShareSql,
    "q9_product_profit" -> q9ProductProfitSql,
    // #313/#314: the bucketed-layout twins share #110/#78's oracles
    // verbatim — the layout must change the plan, never the answer
    "q9_bucketed" -> q9ProductProfitSql,
    "q11_important_stock" -> q11ImportantStockSql,
    "q1_pricing" -> q1PricingSql,
    "q3_priority" -> q3PrioritySql,
    "q5_region" -> q5RegionSql,
    "q10_returns" -> q10ReturnsSql,
    "q1_rollup" -> q1RollupSql,
    "orders_running" -> ordersRunningSql,
    "top_customers" -> topCustomersSql,
    "q4_priority" -> q4PrioritySql,
    "q16_parts" -> q16PartsSql,
    "q12_lateness" -> q12LatenessSql,
    "q18_large_orders" -> q18LargeOrdersSql,
    "q18_bucketed" -> q18LargeOrdersSql,
    "customer_deciles" -> customerDecilesSql,
    "q6_forecast" -> q6ForecastSql,
    "q14_promo" -> q14PromoSql,
    "q17_small_qty" -> q17SmallQtySql,
    "q19_disjunctive" -> q19DisjunctiveSql,
    "q22_idle_balances" -> q22IdleBalancesSql,
    "q2_min_supplier" -> q2MinSupplierSql,
    "q13_custdist" -> q13CustdistSql,
    "q21_sole_fault" -> q21SoleFaultSql,
    "q15_top_supplier" -> q15TopSupplierSql,
    "q20_volume_suppliers" -> q20VolumeSuppliersSql,
    "q7_volume_shipping" -> q7VolumeShippingSql,
    "orders_open_book" -> ordersOpenBookSql,
    "orders_reconcile" -> ordersReconcileSql)
}
