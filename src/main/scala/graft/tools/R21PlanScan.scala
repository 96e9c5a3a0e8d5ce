package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Round-21 plan census: for each named query, one warm timed run with
  * job/stage/exchange counts — ranks the plan-surgery targets (the
  * per-shuffle fixed cost is ~0.3-0.5 s on this box, so exchange/job
  * count predicts bench seconds at sf0.1). Dev tool. */
object R21PlanScan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.localSized(cpus, sfDir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
    })
    val names = if (args.nonEmpty) args.toSeq
      else Seq("text_dup_spans", "text_dedup_spans", "dedup_jaccard_mine",
        "hybrid_stats", "vec_autotune", "dedup_minhash_portable", "profile_drift",
        "vec_ivf_compact", "dedup_minhash_lsh", "dedup_recall", "q1_cube",
        "table_profile", "part_rank_shift", "table_profile_approx",
        "customer_migration", "text_novelty", "hybrid_rrf", "supplier_triangles",
        "dedup_sweep", "mm_decode", "dedup_semantic_inc", "basket_pairs",
        "corpus_ccnet_buckets", "hybrid_qtext_rrf", "hybrid_rrf_batch",
        "pipeline_serve", "dedup_incremental", "orders_abc", "supplier_concurrency",
        "vec_pq_sweep", "market_hhi", "orders_rfm", "q2_min_supplier",
        "split_signoff", "sample_cluster_balance", "dedup_semantic",
        "orders_open_book", "dedup_minhash_bucketed", "corpus_dsir", "events_ewma",
        "nation_trade_balance", "q18_large_orders", "dedup_cdc", "q10_returns")
    // one cold pass (JIT/codegen) — not timed per query
    names.foreach { q =>
      try graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[scan] $q COLD FAIL ${e.getMessage}") }
    }
    println("[scan] name, warm_sec, jobs, stages, exchanges")
    names.foreach { q =>
      jobs = 0; stages = 0
      // time fn(…)+save together — driver-eager queries do their work in
      // the fn call (Bench times it the same way)
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50) // let listener drain
      val plan = df.queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(plan).length
      println(f"[scan] $q%-28s $sec%6.2f  jobs=$jobs%-4d stages=$stages%-4d exch=$ex")
    }
    spark.stop()
  }
}
