package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark lacks natively.
  *
  * For every left row, attach the single right row with the greatest
  * `rightTs <= leftTs` within the same key group (inclusive backward
  * match; the DuckDB `ASOF JOIN` / kdb `aj` semantics). Left rows with no
  * prior right row keep NULL payloads (left-outer).
  *
  * Encoding: tag both sides, union, and carry the last right payload
  * forward with an `ignoreNulls` window over (keys, ts, side) — right
  * rows sort before left rows at equal ts so "at-or-before" is inclusive.
  *
  * Scale shape: ONE hash shuffle on the key columns + a per-partition
  * sort — the same cost as a sort-merge join, with NO pair explosion
  * regardless of how many left rows share a right match (a range-join
  * rewrite would be O(|L|·|R|) per key in the worst case). Payload
  * columns ride in a struct so a genuinely-NULL payload field cannot be
  * confused with "no match yet" by the ignoreNulls carry.
  *
  * Contract: right must be unique per (keys, rightTs) — pre-aggregate
  * duplicates first, otherwise which same-ts row wins is undefined (in
  * any engine, including DuckDB's ASOF).
  */
object AsOfJoin {

  /** @param payload right-side columns to attach (must exist in `right`;
    *                 emitted under the same names, NULL when unmatched) */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payload.contains),
      s"payload names ${payload.mkString(",")} collide with left columns")

    // side 0 = right (sorts first at equal ts), side 1 = left
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_asof_ts"), lit(0).as("_asof_side"),
        struct(payload.map(col): _*).as("_asof_p")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_asof_ts"), lit(1).as("_asof_side"),
        lit(null).cast(r.schema("_asof_p").dataType).as("_asof_p")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts"), col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("_asof_m", last(col("_asof_p"), ignoreNulls = true).over(w))
      .where(col("_asof_side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"_asof_m.$p").as(p)): _*)
  }

  /** Convenience: backward as-of where both sides share the ts name. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               ts: String, payload: Seq[String]): DataFrame =
    backward(left, right, keys, ts, ts, payload)
}
