package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles by distributed rank selection
  * over VALUE COUNTS. `percentile`-style aggregates buffer every value of
  * a group in one aggregation buffer (fine at day-grain, OOM at a
  * trillion rows). The previous shape here ranked raw rows with a
  * per-group row_number window — but Window.partitionBy(group) hashes the
  * whole group to ONE task, so with few groups the "distributed" rank was
  * a handful of giant single-task sorts: the r18 1000× probe measured
  * orders_ship_lag at ratio 260 with 137 GB of sort spill (5 priorities ×
  * 120M rows each) and events_gap_quantiles at ratio 144 (BASELINE §3n).
  *
  * The fix keeps the exact semantics and changes the unit of work: rows
  * first collapse to (group, value, count) through an ordinary hash
  * aggregate — map-side combined, so the shuffle carries DISTINCT values
  * per group, never rows — and rank selection runs over cumulative
  * counts: value at rank k is the collapsed row with cum−c < k ≤ cum.
  * The per-group window still serializes per group, but over distinct
  * values (121 integer lags for ship_lag; gap values repeat heavily in
  * real event streams), which is the information-theoretic payload of an
  * exact quantile. A pathological all-unique column degrades to the old
  * cost, never worse. Interpolation vlo + (vhi−vlo)·frac is unchanged
  * and stays bit-identical to DuckDB/Postgres quantile_cont at 6 dp
  * (events_quantiles oracle parity). Shared by events_quantiles,
  * events_gap_quantiles, orders_ship_lag and corpus_prune_quantile.
  */
object Quantiles {

  /** Per-group percentiles of `valueCol` at fractions `ps`: returns
    * (groupCol, p, q) with q rounded to 6 dp, ordered (group, p). */
  def perGroup(df: DataFrame, groupCol: String, valueCol: String,
               ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantiles: fractions ${ps.mkString(",")} outside [0,1]")
    val spark = df.sparkSession
    import spark.implicits._
    val collapsed = df.where(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .groupBy(col(groupCol), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val cumW = Window.partitionBy(groupCol).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def holds(rank: org.apache.spark.sql.Column) =
      col("__cum") - col("__c") < rank && rank <= col("__cum")
    collapsed
      .withColumn("__cum", sum(col("__c")).over(cumW))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(groupCol)))
      .crossJoin(broadcast(ps.toDF("p")))
      .withColumn("__idx", col("p") * (col("__n") - 1))
      .withColumn("__lo", floor(col("__idx")) + 1)
      .withColumn("__hi", ceil(col("__idx")) + 1)
      .where(holds(col("__lo")) || holds(col("__hi")))
      .groupBy(col(groupCol), col("p"))
      .agg(
        max(when(holds(col("__lo")), col("__v"))).as("__vlo"),
        max(when(holds(col("__hi")), col("__v"))).as("__vhi"),
        first(col("__idx") - floor(col("__idx"))).as("__frac"))
      .select(col(groupCol), col("p"),
        round(col("__vlo") + (col("__vhi") - col("__vlo")) * col("__frac"), 6).as("q"))
      .orderBy(groupCol, "p")
  }
}
