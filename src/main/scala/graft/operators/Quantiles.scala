package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles by distributed rank selection
  * — the shape that survives any group size: ONE row_number window ranks
  * each group by value, each requested p needs only the rows at ranks
  * floor/ceil of p·(n−1), and the interpolation vlo + (vhi−vlo)·frac is
  * a single rounded expression. `percentile`-style aggregates buffer
  * every value of a group in one aggregation buffer (fine at day-grain,
  * OOM at a trillion rows); here the only state is the sort within the
  * hash partition, which a range-partitioned sort absorbs on a real
  * cluster. Bit-identical to DuckDB/Postgres quantile_cont at 6 dp
  * (events_quantiles oracle parity). Shared by events_quantiles,
  * events_gap_quantiles, and corpus_prune_quantile. */
object Quantiles {

  /** Per-group percentiles of `valueCol` at fractions `ps`: returns
    * (groupCol, p, q) with q rounded to 6 dp, ordered (group, p). */
  def perGroup(df: DataFrame, groupCol: String, valueCol: String,
               ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantiles: fractions ${ps.mkString(",")} outside [0,1]")
    val spark = df.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(groupCol).orderBy("__v")
    df.where(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
      .crossJoin(broadcast(ps.toDF("p")))
      .withColumn("__idx", col("p") * (col("__n") - 1))
      .withColumn("__lo", floor(col("__idx")) + 1)
      .withColumn("__hi", ceil(col("__idx")) + 1)
      .where(col("__rn") === col("__lo") || col("__rn") === col("__hi"))
      .groupBy(col(groupCol), col("p"))
      .agg(
        max(when(col("__rn") === col("__lo"), col("__v"))).as("__vlo"),
        max(when(col("__rn") === col("__hi"), col("__v"))).as("__vhi"),
        first(col("__idx") - floor(col("__idx"))).as("__frac"))
      .select(col(groupCol), col("p"),
        round(col("__vlo") + (col("__vhi") - col("__vlo")) * col("__frac"), 6).as("q"))
      .orderBy(groupCol, "p")
  }
}
