package graft.sources

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.HilbertIndex

/** Hilbert-curve clustering — ZOrder's sibling layout with strictly better
  * locality: consecutive curve positions are always ADJACENT grid cells
  * (Morton jumps quadrants every 2^k boundary), so range-partitioned files
  * get tighter min/max envelopes in both dimensions and 2-D box predicates
  * skip more files. This is the layout Delta Lake moved to for OPTIMIZE
  * (liquid clustering) and what Iceberg's hilbert transform offers; here it
  * is plain Spark: quantize (ZOrder.quantize, same bounds discipline) →
  * native HilbertIndex expression (the per-level rotate/reflect loop stays
  * inside whole-stage codegen — see LayoutExpressions.scala for why it
  * cannot be a Column composition) → repartitionByRange → sort.
  *
  * The walk is the classic xy→d conversion, so an external engine can
  * replay it level by level; [[chainSql]] generates that replay as a
  * materialized per-level CTE chain for the DuckDB oracle.
  */
object Hilbert {

  /** Hilbert index column over two pre-quantized long columns. */
  def index(qx: Column, qy: Column, bits: Int = 16): Column =
    GraftBridge.column(HilbertIndex(
      GraftBridge.expression(qx), GraftBridge.expression(qy), bits))

  /** Attach `h` for two numeric columns, bounds discovered in-plan (the
    * ZOrder.withZ discipline: one tiny broadcast aggregate, no literals). */
  def withH(df: DataFrame, xCol: String, yCol: String, bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 31, s"hilbert: bits $bits outside [1,31]")
    val bounds = df.agg(
      min(col(xCol)).as("_hxlo"), max(col(xCol)).as("_hxhi"),
      min(col(yCol)).as("_hylo"), max(col(yCol)).as("_hyhi"))
    df.crossJoin(broadcast(bounds))
      .withColumn("h", index(
        ZOrder.quantize(col(xCol), col("_hxlo"), col("_hxhi"), bits),
        ZOrder.quantize(col(yCol), col("_hylo"), col("_hyhi"), bits), bits))
      .drop("_hxlo", "_hxhi", "_hylo", "_hyhi")
  }

  /** Cluster the frame for 2-D pruning along the Hilbert curve. */
  def clusterBy(df: DataFrame, xCol: String, yCol: String,
                nPartitions: Int, bits: Int = 16): DataFrame =
    withH(df, xCol, yCol, bits)
      .repartitionByRange(nPartitions, col("h"))
      .sortWithinPartitions("h")

  /** SQL twin of [[index]]: a chain of `bits` MATERIALIZED CTEs (one per
    * curve level, high bit first), each rotating the frame exactly as the
    * native expression's loop body does. `from` must provide `keyCols`
    * plus pre-quantized `qx`, `qy`. The final CTE is `hlvl0` with the
    * accumulated `d`. Materialization matters: each level reads x and y
    * twice, so textual inlining would double the tree per level. */
  def chainSql(keyCols: Seq[String], from: String, bits: Int): String = {
    val keys = keyCols.mkString(", ")
    val start =
      s"""hlvl$bits AS MATERIALIZED (
         |  SELECT $keys, qx AS x, qy AS y, CAST(0 AS BIGINT) AS d FROM $from)""".stripMargin
    val levels = (bits - 1 to 0 by -1).map { i =>
      val s = 1L << i
      val rx = s"(CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)"
      s"""hlvl$i AS MATERIALIZED (
         |  SELECT $keys,
         |    CASE WHEN (y & $s) = 0
         |         THEN (CASE WHEN (x & $s) > 0 THEN ${s - 1} - y ELSE y END)
         |         ELSE x END AS x,
         |    CASE WHEN (y & $s) = 0
         |         THEN (CASE WHEN (x & $s) > 0 THEN ${s - 1} - x ELSE x END)
         |         ELSE y END AS y,
         |    d + CAST(${s * s} AS BIGINT) * xor(3 * $rx, $ry) AS d
         |  FROM hlvl${i + 1})""".stripMargin
    }
    (start +: levels).mkString(",\n")
  }
}
