package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Paired cold+warm A/B for q1_rollup's Spread repartition (r21 VERDICT
  * item: driver cold read 5.46 s vs < 1.74 in r20 — contention or a real
  * repartition cost?). Runs BOTH variants in one JVM: first each variant
  * once cold (order set by arg "spread-first" / "nospread-first" — run the
  * tool twice, once per order, to cancel first-plan JIT debt), then
  * interleaved warm reps. Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_REPS (default 4). Dev tool. */
object R22RollupAB {
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  private def rollupOf(spark: SparkSession, dir: String, spread: Boolean): DataFrame = {
    val base = graft.Tables.lineitem(spark, dir)
    val src = if (spread) graft.operators.Spread(base, "l_orderkey") else base
    src.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .select(col("gid").cast("int").as("gid"), col("l_returnflag"),
        col("l_linestatus"), col("sum_qty"), col("n"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spreadFirst = args.headOption.forall(_ == "spread-first")
    val spark = Sessions.localSized(cpus, sfDir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def time(spread: Boolean): Double = {
      val t0 = System.nanoTime()
      rollupOf(spark, sfDir, spread).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // driver-like JVM state: some unrelated prior work (entry + one agg)
    graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val order = if (spreadFirst) Seq(true, false) else Seq(false, true)
    val cold = order.map(s => (if (s) "spread" else "nospread") -> time(s))
    val warm = (0 until reps).flatMap { _ =>
      order.map(s => (if (s) "spread" else "nospread") -> time(s))
    }
    def med(xs: Seq[Double]) = { val s = xs.sorted; s(s.length / 2) }
    val wS = warm.collect { case ("spread", v) => v }
    val wN = warm.collect { case ("nospread", v) => v }
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(s"""{"order":"${order.map(s => if (s) "S" else "N").mkString}","cold":{${cold.map { case (n, v) => "\"" + n + "\":" + f2(v) }.mkString(",")}},""" +
      s""""warm_spread":[${wS.map(f2).mkString(",")}],"warm_nospread":[${wN.map(f2).mkString(",")}],""" +
      s""""warm_med_spread":${f2(med(wS))},"warm_med_nospread":${f2(med(wN))}}""")
    System.out.flush()
  }
}
