package graft.tools

import org.apache.spark.sql.functions._

/** Bare-shuffle fixed-cost probe: times a trivial groupBy at several row
  * counts and initial-partition settings to isolate the per-stage
  * scheduling/AQE constant from data volume. Dev tool. */
object R21ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val confs = sys.env.getOrElse("SPARK_GRAFT_AB_CONF", "")
      .split(";").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v) }
    val b = Sessions.local(cpus)
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[sh] $name%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm
    noop(spark.range(1000).groupBy((col("id") % 100).as("k")).agg(count(lit(1))))
    for (rows <- Seq(10000L, 200000L, 2000000L); rep <- 1 to 3) {
      time(s"groupBy rows=$rows #$rep")(
        noop(spark.range(rows).groupBy((col("id") % (rows / 2)).as("k"))
          .agg(count(lit(1))).where(col("count(1)") > 1)))
    }
    // two chained shuffles
    for (rep <- 1 to 3) {
      val df = spark.range(200000L)
        .groupBy((col("id") % 100000).as("k")).agg(count(lit(1)).as("c"))
        .groupBy((col("c") % 977).as("k2")).agg(sum("c"))
      time(s"chained 2-shuffle 200k #$rep")(noop(df))
    }
    // a sort (range partitioner pass)
    for (rep <- 1 to 3)
      time(s"orderBy 200k #$rep")(noop(spark.range(200000L).toDF("id").orderBy(desc("id"))))
    spark.stop()
  }
}
