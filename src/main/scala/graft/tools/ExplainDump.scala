package graft.tools

/** Dump `.explain("formatted")` for registered queries to files — the
  * round's plans/<round>/<query>_{before,after}.txt evidence (run once on
  * the baseline commit and once on HEAD). Args: outDir suffix then query
  * names. Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_PLAN_DIR (default plans/out). Dev tool. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/out")
    val suffix = if (args.nonEmpty) args.head else "after"
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: ExplainDump <suffix> <query> [query ...]")
    val spark = Sessions.localSized(cpus, sfDir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { q =>
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${q}_$suffix.txt"), formatted)
        println(s"[explain] wrote $outDir/${q}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[explain] $q FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
