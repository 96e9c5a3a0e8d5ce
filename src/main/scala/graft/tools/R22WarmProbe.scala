package graft.tools

/** Times each item of Bench's code_warm phase individually (sequential,
  * fresh JVM — the same state code_warm sees), so the r22 setup-debt cut
  * targets the measured term. Dev tool. */
object R22WarmProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.localSized(cpus, "/root/testdata/sf0.1").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val warm = "/root/testdata/sf0.001"
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[warm] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("entry_warm")(noop(graft.SparkEntry.entry(spark)))
    time("corpusCurate")(noop(graft.queries.PipelineQueries.corpusCurate(spark, warm)))
    time("dedupMinhashLsh")(noop(graft.queries.DedupQueries.dedupMinhashLsh(spark, warm)))
    time("textDupSpans")(noop(graft.queries.TextQueries.textDupSpans(spark, warm)))
    time("runMany")(graft.harness.RunHarness.runMany(spark, warm,
      graft.queries.VectorQueries.HarnessFamilies,
      ram = graft.queries.VectorQueries.servingTier(spark, warm)))
    time("hybridRrf")(noop(graft.queries.VectorQueries.hybridRrf(spark, warm)))
    time("vecAutotune")(noop(graft.queries.VectorQueries.vecAutotune(spark, warm)))
    spark.stop()
  }
}
