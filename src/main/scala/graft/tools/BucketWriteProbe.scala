package graft.tools

/** Write-side cost probe for the bucketed minhash band layout (r18
  * verdict #6, complementing BASELINE §3k's read-side closures): the
  * 10,000× bucket-count arithmetic rested on measured READ probes plus
  * write-side reasoning — this records a measured ingest point: the
  * wall + sort spill of `Bucketing.writeBucketed` over the band table
  * at the probed corpus scale (256 buckets on local[32]).
  *
  * Itemization mirrors the production split: `build_sec` is the
  * corpusBands artifact build/read-back (the minhash pass — already
  * priced by the §3m probes), `write_sec` is the timed bucketed CTAS
  * (scan artifact → hash-distribute into buckets → per-file sort →
  * parquet write) — exactly the one-off ingest line the #302 layout
  * pays so every later mine joins shuffle-free.
  *
  * Env: SPARK_GRAFT_SF_DIR (corpus dir, e.g. the 1000× replica dir),
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_INIT_PARTS / SPARK_GRAFT_ADVISORY_MB
  * (the ScaleBench sizing knobs). Prints ONE JSON line.
  */
object BucketWriteProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val initParts = sys.env.get("SPARK_GRAFT_INIT_PARTS")
    val advisoryMb = sys.env.get("SPARK_GRAFT_ADVISORY_MB")
    // the input-sized default rule (Sessions.localSized doc); env knobs
    // below still override for A/Bs
    val builder = Sessions.localSized(cpus, dir)
    initParts.foreach(p =>
      builder.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", p))
    advisoryMb.foreach(m =>
      builder.config("spark.sql.adaptive.advisoryPartitionSizeInBytes", s"${m}m"))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed prerequisite, itemized: the published band artifact (the
    // minhash pass — §3m already prices it; a fresh dir builds it here)
    val tBuild = System.nanoTime()
    val bands = graft.queries.DedupQueries.corpusBands(spark, dir)
    val buildSec = (System.nanoTime() - tBuild) / 1e9

    val nDocs = graft.Tables.rowCount(spark, dir, "documents")
    val explodedRows = nDocs * graft.queries.DedupQueries.BandGeom._1
    // r19 verdict #4: SPARK_GRAFT_BUCKETS pins the count so the write
    // side can be measured at the 256-bucket local ceiling the §3k
    // 10,000× arithmetic leans on (pickBuckets sized the r19 run to 32 —
    // the band table's own rows, below the ceiling regime)
    // defensive parse (ADVICE r20): a typo ('256m', '') or non-positive
    // value must fail naming the variable, not NumberFormatException into
    // the CTAS (the isIvfPqDial discipline)
    val buckets = sys.env.get("SPARK_GRAFT_BUCKETS").map { v =>
      require(v.nonEmpty && v.forall(_.isDigit) && v.toLong > 0 && v.toLong <= 1000000,
        s"SPARK_GRAFT_BUCKETS must be a positive integer, got '$v'")
      v.toInt
    }.getOrElse(graft.sources.Bucketing.pickBuckets(spark, explodedRows))
    val tbl = "graft_write_probe_minhash_bands"

    val spill = new ScaleBench.SpillListener
    spark.sparkContext.addSparkListener(spill)
    org.apache.spark.GraftListenerBus.drain(spark.sparkContext)
    spill.reset()
    val t0 = System.nanoTime()
    graft.sources.Bucketing.writeBucketed(bands, tbl, Seq("band", "key"), buckets)
    val writeSec = (System.nanoTime() - t0) / 1e9
    org.apache.spark.GraftListenerBus.drain(spark.sparkContext)
    val rows = spark.table(tbl).count()
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")

    // r22 (VERDICT r20 #3): the FACT-scale bucketed CTAS behind
    // q9/q18_bucketed/bucketed_join — lineitem and orders distributed
    // into `buckets` on the order key, the one-off ingest line the
    // co-located join's deleted Exchange amortizes. Timed per table with
    // the same spill accounting; opt in via SPARK_GRAFT_BUCKET_FACTS=1
    // (the band line above stays the default so prior artifacts compare).
    val factLines = if (sys.env.get("SPARK_GRAFT_BUCKET_FACTS").contains("1")) {
      def f2l(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
      Seq(("lineitem", graft.Tables.lineitem(spark, dir), "l_orderkey"),
          ("orders", graft.Tables.orders(spark, dir), "o_orderkey")).map {
        case (name, df, key) =>
          val t = s"graft_write_probe_$name"
          org.apache.spark.GraftListenerBus.drain(spark.sparkContext)
          spill.reset()
          val w0 = System.nanoTime()
          graft.sources.Bucketing.writeBucketed(df, t, Seq(key), buckets)
          val wSec = (System.nanoTime() - w0) / 1e9
          org.apache.spark.GraftListenerBus.drain(spark.sparkContext)
          val n = spark.table(t).count()
          spark.sql(s"DROP TABLE IF EXISTS `$t`")
          s""""$name":{"rows":$n,"write_sec":${f2l(wSec)},""" +
            s""""spill_mem_mb":${spill.memSpill.get >> 20},""" +
            s""""spill_disk_mb":${spill.diskSpill.get >> 20},""" +
            s""""shuffle_mb":${spill.shuffleWrite.get >> 20}}"""
      }
    } else Nil
    val factsJson =
      if (factLines.isEmpty) "" else s""","facts":{${factLines.mkString(",")}}"""

    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val cfg = (initParts.map(p => s""""init_parts":$p""") ++
      advisoryMb.map(m => s""""advisory_mb":$m""")).mkString(",")
    val cfgJson = if (cfg.isEmpty) "" else s""","config":{$cfg}"""
    val line =
      s"""{"metric":"bucket_write","buckets":$buckets,"rows":$rows,""" +
        s""""n_docs":$nDocs,"build_sec":${f2(buildSec)},"write_sec":${f2(writeSec)},""" +
        s""""spill_mem_mb":${spill.memSpill.get >> 20},"spill_disk_mb":${spill.diskSpill.get >> 20},""" +
        s""""shuffle_mb":${spill.shuffleWrite.get >> 20}$factsJson$cfgJson}"""
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(line)
    System.out.flush()
  }
}
