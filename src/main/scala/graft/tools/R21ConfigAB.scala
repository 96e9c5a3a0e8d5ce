package graft.tools

/** Round-21 config A/B: times a fixed mid-tier query slice under session
  * overrides passed by env, so a sizing-rule candidate is measured before
  * it becomes a default (guide §1.2: config only after algorithm).
  * SPARK_GRAFT_AB_CONF="k=v;k=v" applies on top of Sessions.local.
  * Dev tool, not part of the driver contract.
  */
object R21ConfigAB {
  val Slice: Seq[String] = Seq(
    "customer_migration", "part_rank_shift", "q1_cube", "orders_abc",
    "market_hhi", "supplier_concurrency", "dedup_minhash_portable",
    "text_novelty", "basket_pairs", "corpus_ccnet_buckets",
    "dedup_jaccard_mine", "orders_rfm", "q2_min_supplier", "split_signoff",
    "table_profile", "scd2_events", "events_ewma", "q18_large_orders")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val confs = sys.env.getOrElse("SPARK_GRAFT_AB_CONF", "")
      .split(";").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v) }
    val b = Sessions.local(cpus)
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Slice
    // code-warm at sf0.001 (Bench discipline)
    names.foreach { q =>
      try graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    def runAll(tag: String): Double = {
      val t0 = System.nanoTime()
      names.foreach { q =>
        val tq = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[ab] $tag $q%-28s ${(System.nanoTime() - tq) / 1e9}%6.2f s")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val c1 = runAll("pass1")
    val c2 = runAll("pass2")
    println(f"[ab] TOTAL conf='${confs.map(c => c._1 + "=" + c._2).mkString(";")}' pass1=$c1%.2f pass2=$c2%.2f")
    spark.stop()
  }
}
