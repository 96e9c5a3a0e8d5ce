package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — an operator Spark lacks natively.
  *
  * `backward`: for every left row, attach the single right row with the
  * greatest `rightTs <= leftTs` within the same key group (inclusive;
  * the DuckDB `ASOF JOIN` / kdb `aj` semantics). `forward`: the single
  * right row with the SMALLEST `rightTs >= leftTs`. Left rows with no
  * match keep NULL payloads (left-outer). An optional `toleranceUs`
  * bounds the match's staleness (|leftTs − rightTs| ≤ tolerance), the
  * attribution-window rule — an out-of-window match degrades to NULL,
  * exactly as if no right row existed.
  *
  * Encoding: tag both sides, union, and carry the adjacent right payload
  * with an `ignoreNulls` window over (keys, ts, side) — right rows sort
  * before left rows at equal ts (in traversal direction) so "at-or-
  * before"/"at-or-after" are inclusive.
  *
  * Scale shape: ONE hash shuffle on the key columns + a per-partition
  * sort — the same cost as a sort-merge join, with NO pair explosion
  * regardless of how many left rows share a right match (a range-join
  * rewrite would be O(|L|·|R|) per key in the worst case). Payload
  * columns ride in a struct so a genuinely-NULL payload field cannot be
  * confused with "no match yet" by the ignoreNulls carry; the match's
  * own event time rides in the same struct for the tolerance check.
  *
  * Contract: right must be unique per (keys, rightTs) — pre-aggregate
  * duplicates first, otherwise which same-ts row wins is undefined (in
  * any engine, including DuckDB's ASOF).
  */
object AsOfJoin {

  /** @param payload right-side columns to attach (must exist in `right`;
    *                 emitted under the same names, NULL when unmatched)
    * @param toleranceUs max |leftTs − rightTs| in microseconds; None =
    *                    unbounded */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame =
    join(left, right, keys, leftTs, rightTs, payload, toleranceUs, fwd = false)

  /** Earliest right row at-or-after each left row (the "next reading
    * after the order" direction). */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame =
    join(left, right, keys, leftTs, rightTs, payload, toleranceUs, fwd = true)

  /** Convenience: backward as-of where both sides share the ts name. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               ts: String, payload: Seq[String]): DataFrame =
    backward(left, right, keys, ts, ts, payload)

  private def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      toleranceUs: Option[Long],
      fwd: Boolean): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payload.contains),
      s"payload names ${payload.mkString(",")} collide with left columns")
    require(!payload.contains("_mts"), "payload name _mts is reserved")
    val internal = Set("_asof_ts", "_asof_side", "_asof_p", "_asof_m")
    val clash = (leftCols ++ right.columns ++ payload).filter(internal)
    require(clash.isEmpty,
      s"column names ${clash.distinct.mkString(",")} collide with as-of internals (_asof_*)")

    // side 0 = right (sorts first in traversal direction at equal ts),
    // side 1 = left; the struct's _mts field carries the match's own
    // event time for the tolerance check
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_asof_ts"), lit(0).as("_asof_side"),
        struct(col(rightTs).as("_mts") +: payload.map(col): _*).as("_asof_p")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_asof_ts"), lit(1).as("_asof_side"),
        lit(null).cast(r.schema("_asof_p").dataType).as("_asof_p")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val ord =
      if (fwd) Seq(col("_asof_ts").desc, col("_asof_side").asc)
      else Seq(col("_asof_ts").asc, col("_asof_side").asc)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .withColumn("_asof_m", last(col("_asof_p"), ignoreNulls = true).over(w))
      .where(col("_asof_side") === 1)
    val inWindow = toleranceUs match {
      case None => col("_asof_m").isNotNull
      case Some(tol) =>
        val delta =
          if (fwd) unix_micros(col("_asof_m._mts")) - unix_micros(col(leftTs))
          else unix_micros(col(leftTs)) - unix_micros(col("_asof_m._mts"))
        col("_asof_m").isNotNull && delta <= tol
    }
    carried
      .withColumn("_asof_m", when(inWindow, col("_asof_m")))
      .select(leftCols.map(col) ++ payload.map(p => col(s"_asof_m.$p").as(p)): _*)
  }
}
