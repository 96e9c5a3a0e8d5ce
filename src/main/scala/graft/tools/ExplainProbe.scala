package graft.tools

/** Ad-hoc plan inspector: prints the Exchange lines of a registered
  * query's executed plan. Dev tool, not part of the driver contract. */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    println("EXCHANGES=" + "Exchange ".r.findAllIn(plan).length)
    println(plan.split("\n").filter(l => l.contains("Exchange")).mkString("\n"))
    spark.stop()
  }
}
