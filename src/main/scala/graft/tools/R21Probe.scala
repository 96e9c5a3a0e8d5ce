package graft.tools

import org.apache.spark.sql.functions._

/** Round-21 optimization probe: decomposes the bench's heaviest entries
  * into stage-level timings so each optimization targets a measured term
  * (guide §1 discipline — the bench reports whole queries; this splits
  * them). Dev tool, not part of the driver contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.R21Probe [section ...]"
  * Sections: harness dupspans minhash profile ivfcompact (default: all).
  */
object R21Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sections = if (args.nonEmpty) args.toSet else Set("harness", "dupspans", "minhash")
    val spark = Sessions.localSized(cpus, sfDir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[r21] $name%-42s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    if (sections("harness")) {
      println("== harness (hybrid_stats shared-cost decomposition) ==")
      val emb = graft.Tables.embeddings(spark, sfDir)
      time("emb.count (cold scan)")(emb.count())
      time("emb.count (again)")(emb.count())
      time("dim first()")(emb.select(size(col("embedding"))).first())
      val ram = time("servingTier (cached?)")(
        graft.queries.VectorQueries.servingTier(spark, sfDir))
      // warm code once so the measured pass below is plan cost
      time("runMany exact-only (cold)")(
        graft.harness.RunHarness.runMany(spark, sfDir, Seq("exact"), ram = ram))
      time("runMany exact-only (warm)")(
        graft.harness.RunHarness.runMany(spark, sfDir, Seq("exact"), ram = ram))
      val fam = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val t0 = System.nanoTime()
      graft.harness.RunHarness.runMany(spark, sfDir,
        graft.queries.VectorQueries.HarnessFamilies, ram = ram,
        onBackendTimed = (n, sec) =>
          fam.synchronized { fam.update(n, fam.getOrElse(n, 0.0) + sec) })
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[r21] full runMany wall                       $wall%7.3f s")
      fam.toSeq.sortBy(-_._2).foreach { case (n, v) =>
        println(f"[r21]   family $n%-34s $v%7.3f s") }
      println(f"[r21]   shared = wall - sum(family)           ${wall - fam.values.sum}%7.3f s")
      // second full pass: warm plan cost
      fam.clear()
      val t1 = System.nanoTime()
      graft.harness.RunHarness.runMany(spark, sfDir,
        graft.queries.VectorQueries.HarnessFamilies, ram = ram,
        onBackendTimed = (n, sec) =>
          fam.synchronized { fam.update(n, fam.getOrElse(n, 0.0) + sec) })
      val wall2 = (System.nanoTime() - t1) / 1e9
      println(f"[r21] full runMany wall (warm)                $wall2%7.3f s")
      fam.toSeq.sortBy(-_._2).foreach { case (n, v) =>
        println(f"[r21]   family $n%-34s $v%7.3f s") }
      println(f"[r21]   shared (warm)                         ${wall2 - fam.values.sum}%7.3f s")
    }

    if (sections("dupspans")) {
      println("== dupspans (text_dup_spans stage decomposition) ==")
      val docs = graft.Tables.documents(spark, sfDir)
      docs.count()
      val n = 13
      val t = split(col("text"), " ")
      val base = docs.select(col("doc_id"), t.as("t"))
        .withColumn("ghs", expr(
          s"""CASE WHEN size(t) >= $n THEN
             |  transform(sequence(1, size(t) - ${n - 1}),
             |    i -> xxhash64(slice(t, i, $n)))
             |ELSE cast(array() AS array<bigint>) END""".stripMargin))
      val posH = base.select(col("doc_id"), col("t"),
        posexplode(col("ghs")).as(Seq("i", "gh")))
      time("stage1 volume agg count>1 (cold)") {
        posH.select("gh").groupBy("gh").agg(count(lit(1)).as("c"))
          .where(col("c") > 1).select("gh")
          .write.format("noop").mode("overwrite").save()
      }
      time("stage1 volume agg count>1 (warm)") {
        posH.select("gh").groupBy("gh").agg(count(lit(1)).as("c"))
          .where(col("c") > 1).select("gh")
          .write.format("noop").mode("overwrite").save()
      }
      val dupH = posH.select("gh").groupBy("gh").agg(count(lit(1)).as("c"))
        .where(col("c") > 1).select("gh")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDup = time("persist + count")(dupH.count())
      println(s"[r21]   nDup=$nDup")
      val bloom = time("driver bloomFilter build")(
        dupH.stat.bloomFilter("gh", math.max(nDup, 1L), 0.01))
      val bos = new java.io.ByteArrayOutputStream(); bloom.writeTo(bos)
      val sketch = bos.toByteArray
      println(s"[r21]   sketch bytes=${sketch.length}")
      dupH.unpersist()
      val surv = posH
        .where(graft.functions.VectorFunctions.bloomMightContainLong(col("gh"), sketch))
        .select(col("doc_id"), expr(s"array_join(slice(t, i + 1, $n), ' ')").as("gram"))
      val g = surv.groupBy("gram", "doc_id").agg(count(lit(1)).as("m"))
      val byGram = org.apache.spark.sql.expressions.Window.partitionBy("gram")
      val perDoc = g.withColumn("t", sum("m").over(byGram))
        .where(col("t") > 1)
        .groupBy("doc_id").agg(sum("m").cast("long").as("dup_grams"))
      time("stage2 survivors+window+rollup")(
        perDoc.write.format("noop").mode("overwrite").save())
      time("full withDupSpans (cold-ish)")(
        graft.text.TextAnalysis.withDupSpans(docs).orderBy("doc_id")
          .write.format("noop").mode("overwrite").save())
      time("full withDupSpans (again)")(
        graft.text.TextAnalysis.withDupSpans(docs).orderBy("doc_id")
          .write.format("noop").mode("overwrite").save())
      time("full withDedupSpans (cold-ish)")(
        graft.text.TextAnalysis.withDedupSpans(docs).orderBy("doc_id")
          .write.format("noop").mode("overwrite").save())
      time("full withDedupSpans (again)")(
        graft.text.TextAnalysis.withDedupSpans(docs).orderBy("doc_id")
          .write.format("noop").mode("overwrite").save())
    }

    if (sections("minhash")) {
      println("== minhash portable decomposition ==")
      val docs = graft.Tables.documents(spark, sfDir)
      docs.count()
      time("dedup_minhash_portable (cold)")(
        graft.queries.DedupQueries.dedupMinhashPortable(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      time("dedup_minhash_portable (warm)")(
        graft.queries.DedupQueries.dedupMinhashPortable(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      // md5 token hashing alone
      val ts = array_distinct(split(lower(col("text")), " "))
      time("md5 token-hash pass alone") {
        docs.select(col("doc_id"),
          transform(ts, t =>
            conv(substring(md5(encode(t, "UTF-8")), 1, 12), 16, 10)
              .cast("long")).as("xs"))
          .write.format("noop").mode("overwrite").save()
      }
      time("tokenize alone") {
        docs.select(col("doc_id"), ts.as("xs"))
          .write.format("noop").mode("overwrite").save()
      }
    }

    if (sections("profile")) {
      println("== profile_drift / table_profile ==")
      time("table_profile (cold)")(
        graft.SparkEntry.queries("table_profile")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      time("table_profile (warm)")(
        graft.SparkEntry.queries("table_profile")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      time("profile_drift (cold)")(
        graft.SparkEntry.queries("profile_drift")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      time("profile_drift (warm)")(
        graft.SparkEntry.queries("profile_drift")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
    }

    if (sections("ivfcompact")) {
      println("== vec_ivf_compact ==")
      graft.queries.VectorQueries.ivfModel(spark, sfDir)
      time("vec_ivf_compact (cold)")(
        graft.SparkEntry.queries("vec_ivf_compact")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      time("vec_ivf_compact (warm)")(
        graft.SparkEntry.queries("vec_ivf_compact")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
    }

    spark.stop()
  }
}
