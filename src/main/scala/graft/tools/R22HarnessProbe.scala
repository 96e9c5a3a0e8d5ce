package graft.tools

/** Finer decomposition of runMany's "shared" seconds (r22, VERDICT #6):
  * runs the full family set with 1..6 queries and reports wall minus
  * family-timed sum per query count, separating the per-invocation
  * (buildGroups, model lookups) from the per-query (prologue/epilogue)
  * share. Also counts Spark jobs per pass. Dev tool. */
object R22HarnessProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.localSized(cpus, sfDir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    var jobs = 0
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
    })
    val ram = graft.queries.VectorQueries.servingTier(spark, sfDir)
    val fams = graft.queries.VectorQueries.HarnessFamilies
    val qs = graft.search.QuerySet.default
    // warm pass (code + models)
    graft.harness.RunHarness.runMany(spark, sfDir, fams, ram = ram)
    for (n <- Seq(1, 3, 6, 6)) {
      var famSum = 0.0
      jobs = 0
      val t0 = System.nanoTime()
      graft.harness.RunHarness.runMany(spark, sfDir, fams, qs = qs.take(n),
        ram = ram,
        onBackendTimed = (_, s) => synchronized { famSum += s })
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[r22] n=$n%d wall=$wall%6.3f famSum=$famSum%6.3f shared=${wall - famSum}%6.3f jobs=$jobs%d")
    }
    spark.stop()
  }
}
