package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeat-timer for individual registered queries — the same-box A/B
  * instrument (BASELINE §3 discipline: never compare timings across VMs;
  * re-run both HEADs on one box). Args: query names; env:
  * SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS (default 5).
  * Prints one JSON line with per-rep seconds (rep 0 is the cold run;
  * median of the warm reps is the comparable number). */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_minhash_lsh")
    val spark = Sessions.localSized(cpus, sfDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // code-warm at the smallest sf (Bench's discipline)
    names.foreach { q =>
      try graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val per = names.map { q =>
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = ts.drop(1).sorted
      val med = if (warm.isEmpty) ts.head else warm(warm.length / 2)
      s""""$q":{"reps":[${ts.map(f2).mkString(",")}],"warm_median":${f2(med)}}"""
    }.mkString("{", ",", "}")
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(s"""{"metric":"query_bench","sf_dir":"$sfDir","queries":$per}""")
    System.out.flush()
  }
}
