package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B probe: customer_migration's r20 shape (two filtered groupBys) vs
  * the r21 fused conditional-sum shape, interleaved reps on one session
  * so box weather hits both. Dev tool. */
object R21MigAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.AnalyticsQueries.{globalRowNumber, ntileExpr}
    def dec(c: Column) = c.cast("decimal(18,2)")

    def oldImpl(ord: DataFrame): DataFrame = {
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
      def quintiles(filter: Column, out: String): DataFrame = {
        val h = tagged.where(filter).groupBy("o_custkey")
          .agg(sum(dec(col("o_totalprice"))).cast("decimal(18,2)").as("mon"))
        val n = h.agg(count(lit(1)).as("__n"))
        globalRowNumber(h, "__mrk", col("mon").desc, col("o_custkey").asc)
          .crossJoin(broadcast(n))
          .withColumn(out, expr(ntileExpr("__mrk", "__n", 5)))
          .select(col("o_custkey"), col(out))
      }
      val p0 = quintiles(col("day") <= col("cutoff"), "q0")
      val p1 = quintiles(col("day") > col("cutoff"), "q1")
      p0.join(p1, Seq("o_custkey"), "full_outer")
        .select(coalesce(col("q0").cast("string"), lit("new")).as("seg_prior"),
          coalesce(col("q1").cast("string"), lit("churned")).as("seg_latest"))
        .groupBy("seg_prior", "seg_latest").agg(count(lit(1)).as("n_customers"))
        .orderBy("seg_prior", "seg_latest")
    }

    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[mig] $name%-16s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val ord = graft.Tables.orders(spark, sfDir)
    for (rep <- 1 to 5) {
      time(s"old #$rep")(noop(oldImpl(ord)))
      time(s"new #$rep")(noop(
        graft.queries.AnalyticsQueries.customerMigrationOf(ord)))
    }
    spark.stop()
  }
}
