package graft.tools

import org.apache.spark.sql.functions._

/** Round-21 dup-spans micro-decomposition: separates the gram-hash
  * compute from the shuffle, and A/Bs the candidate cheaper fingerprint
  * (per-token xxhash64 once, window hash over the LONG array) against
  * the current 13-string-slice hash. Result identity is by construction
  * (fingerprints are internal; the string recount kills collisions) —
  * this probe measures the compute delta only. Dev tool.
  */
object R21DupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[dup] $name%-46s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val n = 13
    val docs = graft.Tables.documents(spark, sfDir)
    println(s"[dup] docs=${docs.count()}")
    val t = split(col("text"), " ")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // -- current shape: xxhash64 over 13-token STRING slices
    val baseStr = docs.select(col("doc_id"), t.as("t"))
      .withColumn("ghs", expr(
        s"""CASE WHEN size(t) >= $n THEN
           |  transform(sequence(1, size(t) - ${n - 1}),
           |    i -> xxhash64(slice(t, i, $n)))
           |ELSE cast(array() AS array<bigint>) END""".stripMargin))
    // -- candidate: hash each token once, window-hash the long array
    val baseLong = docs.select(col("doc_id"), t.as("t"))
      .withColumn("th", expr("transform(t, x -> xxhash64(x))"))
      .withColumn("ghs", expr(
        s"""CASE WHEN size(th) >= $n THEN
           |  transform(sequence(1, size(th) - ${n - 1}),
           |    i -> xxhash64(slice(th, i, $n)))
           |ELSE cast(array() AS array<bigint>) END""".stripMargin))

    for (rep <- 1 to 3) {
      time(s"A hash pass (string slices) #$rep")(noop(baseStr.select("doc_id", "ghs")))
      time(s"B hash pass (token-hash longs) #$rep")(noop(baseLong.select("doc_id", "ghs")))
    }
    // posexplode + agg (the stage1 shuffle), both shapes
    def stage1(base: org.apache.spark.sql.DataFrame): Unit = {
      val posH = base.select(col("doc_id"), posexplode(col("ghs")).as(Seq("i", "gh")))
      noop(posH.select("gh").groupBy("gh").agg(count(lit(1)).as("c"))
        .where(col("c") > 1).select("gh"))
    }
    for (rep <- 1 to 2) {
      time(s"A stage1 agg #$rep")(stage1(baseStr))
      time(s"B stage1 agg #$rep")(stage1(baseLong))
    }
    // gram volume for context
    val vol = baseStr.select(explode(col("ghs")).as("gh")).count()
    println(s"[dup] gram positions=$vol")
    // full-query reps: min over 4 is the comparable number on this box
    for (rep <- 1 to 4)
      time(s"full text_dup_spans #$rep")(
        noop(graft.text.TextAnalysis.withDupSpans(docs).orderBy("doc_id")))
    for (rep <- 1 to 4)
      time(s"full text_dedup_spans #$rep")(
        noop(graft.text.TextAnalysis.withDedupSpans(docs).orderBy("doc_id")))
    spark.stop()
  }
}
