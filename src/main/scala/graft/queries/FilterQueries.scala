package graft.queries

import graft.Tables
import graft.filters.FilterDsl
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2 #1–12: the reference filter DSL, one query per operator.
  *
  * Every query goes through `FilterDsl.parseJson` + `compile` — the same
  * path a real caller uses — so the JSON format, casting rules and
  * null-fails semantics are exercised end-to-end, and the resulting plan
  * is a plain Catalyst predicate that pushes into the parquet scan.
  *
  * Reference: src/dataio/validators.py (ops, null/cast semantics),
  * src/selectivity.py (selectivity), artifacts/artifacts.py:write_queries
  * (the JSON query shape).
  */
object FilterQueries {

  private def filtered(df: DataFrame, json: String): DataFrame =
    FilterDsl.applyJson(df, json)

  def filterEq(s: SparkSession, d: String): DataFrame =
    filtered(Tables.customer(s, d), """{"c_mktsegment":{"eq":"BUILDING"}}""")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  val filterEqSql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin

  def filterNe(s: SparkSession, d: String): DataFrame =
    filtered(Tables.orders(s, d), """{"o_orderstatus":{"ne":"O"}}""")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))

  val filterNeSql =
    """SELECT o_orderkey, o_orderstatus FROM orders
      |WHERE o_orderstatus IS NOT NULL AND o_orderstatus <> 'O'
      |ORDER BY o_orderkey""".stripMargin

  def filterIn(s: SparkSession, d: String): DataFrame =
    filtered(Tables.part(s, d), """{"p_brand":{"in":["Brand#1","Brand#12","Brand#13"]}}""")
      .select(col("p_partkey"), col("p_brand"))
      .orderBy(col("p_partkey"))

  val filterInSql =
    """SELECT p_partkey, p_brand FROM part
      |WHERE p_brand IN ('Brand#1','Brand#12','Brand#13') ORDER BY p_partkey""".stripMargin

  def filterBetween(s: SparkSession, d: String): DataFrame =
    filtered(Tables.part(s, d), """{"p_size":{"between":[10,20]}}""")
      .select(col("p_partkey"), col("p_size"))
      .orderBy(col("p_partkey"))

  val filterBetweenSql =
    """SELECT p_partkey, p_size FROM part
      |WHERE p_size BETWEEN 10 AND 20 ORDER BY p_partkey""".stripMargin

  def filterGeLe(s: SparkSession, d: String): DataFrame =
    filtered(Tables.customer(s, d), """{"c_acctbal":{"ge":0,"le":5000}}""")
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("c_acctbal"))
      .orderBy(col("c_custkey"))

  val filterGeLeSql =
    """SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal FROM customer
      |WHERE c_acctbal >= 0 AND c_acctbal <= 5000 ORDER BY c_custkey""".stripMargin

  def filterGtLt(s: SparkSession, d: String): DataFrame =
    filtered(Tables.lineitem(s, d),
      """{"l_quantity":{"gt":45},"l_extendedprice":{"lt":50000}}""")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val filterGtLtSql =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_quantity > 45 AND l_extendedprice < 50000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Mixed-case needle against all-lowercase part names: matches only
    * because `like` is case-insensitive substring (validators.py:213-221),
    * and matches >0 rows so the oracle hash compare is non-vacuous. */
  def filterLike(s: SparkSession, d: String): DataFrame =
    filtered(Tables.part(s, d), """{"p_name":{"like":"RiNg"}}""")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))

  val filterLikeSql =
    """SELECT p_partkey, p_name FROM part
      |WHERE contains(lower(CAST(p_name AS VARCHAR)), 'ring') ORDER BY p_partkey""".stripMargin

  /** Geo box: the reference hard-errors unless lat_between/lon_between
    * target columns NAMED latitude/longitude (validators.py:153-156), so
    * the testdata (no geo columns) is projected into that shape first —
    * the DSL then validates and filters exactly like the reference. */
  def filterGeoBox(s: SparkSession, d: String): DataFrame = {
    val geo = Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").as("latitude"), col("l_extendedprice").as("longitude"))
    FilterDsl.applyJson(geo,
      """{"latitude":{"lat_between":[10,20]},"longitude":{"lon_between":[10000,30000]}}""")
      .select(col("l_orderkey"), col("l_linenumber"), col("latitude"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val filterGeoBoxSql =
    """SELECT l_orderkey, l_linenumber, l_quantity AS latitude FROM lineitem
      |WHERE l_quantity BETWEEN 10 AND 20
      |  AND l_extendedprice BETWEEN 10000 AND 30000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** NULL fails every predicate, including `ne` (reference
    * validators.py:313 `m & s.notna()`). The testdata has no nullable
    * column, so derive one with nullif and filter it with `ne`. */
  def filterNullFails(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("etype", nullif(col("event_type"), lit("error")))
    FilterDsl.applyJson(ev, """{"etype":{"ne":"view"}}""")
      .select(col("event_id"), col("etype"))
      .orderBy(col("event_id"))
  }

  val filterNullFailsSql =
    """SELECT event_id, nullif(event_type,'error') AS etype FROM events
      |WHERE nullif(event_type,'error') IS NOT NULL
      |  AND nullif(event_type,'error') <> 'view'
      |ORDER BY event_id""".stripMargin

  /** Multi-column AND, the reference's typical query shape
    * (artifacts.py qid=1: state eq + stars ge + price in). */
  def filterCompound(s: SparkSession, d: String): DataFrame =
    filtered(Tables.customer(s, d),
      """{"c_mktsegment":{"eq":"BUILDING"},"c_acctbal":{"ge":1000},"c_name":{"like":"1"}}""")
      .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("c_acctbal"))
      .orderBy(col("c_custkey"))

  val filterCompoundSql =
    """SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal FROM customer
      |WHERE c_mktsegment = 'BUILDING' AND c_acctbal >= 1000
      |  AND contains(lower(CAST(c_name AS VARCHAR)), '1')
      |ORDER BY c_custkey""".stripMargin

  /** Raw JSON string in, rows out — the full reference query path. */
  def filterJson(s: SparkSession, d: String): DataFrame =
    filtered(Tables.orders(s, d),
      """{"o_orderstatus":{"eq":"F"},"o_totalprice":{"between":[50000,150000]},"o_orderpriority":{"in":["1-URGENT","2-HIGH"]}}""")
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("o_orderkey"))

  val filterJsonSql =
    """SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS o_totalprice
      |FROM orders
      |WHERE o_orderstatus = 'F' AND o_totalprice BETWEEN 50000 AND 150000
      |  AND o_orderpriority IN ('1-URGENT','2-HIGH')
      |ORDER BY o_orderkey""".stripMargin

  /** Fraction of rows passing — reference compute_selectivity. */
  def selectivityQ(s: SparkSession, d: String): DataFrame =
    FilterDsl.selectivity(Tables.customer(s, d),
      FilterDsl.parseJson("""{"c_mktsegment":{"eq":"BUILDING"},"c_acctbal":{"ge":1000}}"""))

  val selectivitySql =
    """SELECT round(avg(CASE WHEN c_mktsegment = 'BUILDING' AND c_acctbal >= 1000
      |  THEN 1.0 ELSE 0.0 END), 6) AS selectivity FROM customer""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "filter_eq" -> (filterEq _),
    "filter_ne" -> (filterNe _),
    "filter_in" -> (filterIn _),
    "filter_between" -> (filterBetween _),
    "filter_ge_le" -> (filterGeLe _),
    "filter_gt_lt" -> (filterGtLt _),
    "filter_like" -> (filterLike _),
    "filter_geo_box" -> (filterGeoBox _),
    "filter_null_fails" -> (filterNullFails _),
    "filter_compound" -> (filterCompound _),
    "filter_json" -> (filterJson _),
    "selectivity" -> (selectivityQ _)
  )

  val oracles: Map[String, String] = Map(
    "filter_eq" -> filterEqSql,
    "filter_ne" -> filterNeSql,
    "filter_in" -> filterInSql,
    "filter_between" -> filterBetweenSql,
    "filter_ge_le" -> filterGeLeSql,
    "filter_gt_lt" -> filterGtLtSql,
    "filter_like" -> filterLikeSql,
    "filter_geo_box" -> filterGeoBoxSql,
    "filter_null_fails" -> filterNullFailsSql,
    "filter_compound" -> filterCompoundSql,
    "filter_json" -> filterJsonSql,
    "selectivity" -> selectivitySql
  )
}
