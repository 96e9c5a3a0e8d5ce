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
    val spark = Sessions.localSized(cpus, sfDir).getOrCreate()
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

    // post-spread decomposition of the REAL shape
    val sdocs = graft.operators.Spread(
      docs.select(col("doc_id"), col("text")), "doc_id")
    val baseS = sdocs.select(col("doc_id"), t.as("t"))
      .withColumn("ghs", expr(
        s"""CASE WHEN size(t) >= $n THEN
           |  transform(sequence(1, size(t) - ${n - 1}),
           |    i -> xxhash64(slice(t, i, $n)))
           |ELSE cast(array() AS array<bigint>) END""".stripMargin))
    val posHS = baseS.select(col("doc_id"), col("t"),
      posexplode(col("ghs")).as(Seq("i", "gh")))
    for (rep <- 1 to 3) {
      time(s"S hash pass (spread) #$rep")(noop(baseS.select("doc_id", "ghs")))
      time(s"S posH project #$rep")(noop(posHS.select("gh")))
      time(s"S stage1 agg #$rep")(
        noop(posHS.select("gh").groupBy("gh").agg(count(lit(1)).as("c"))
          .where(col("c") > 1).select("gh")))
      time(s"S stage2 sliver #$rep") {
        // survivors WITHOUT the bloom (probe everything) — upper bound of
        // the gram-string + window + rollup cost
        val surv = posHS.select(col("doc_id"),
          expr(s"array_join(slice(t, i + 1, $n), ' ')").as("gram"))
        val g = surv.groupBy("gram", "doc_id").agg(count(lit(1)).as("m"))
        val byGram = org.apache.spark.sql.expressions.Window.partitionBy("gram")
        noop(g.withColumn("tt", sum("m").over(byGram))
          .where(col("tt") > 1)
          .groupBy("doc_id").agg(sum("m").cast("long").as("dup_grams")))
      }
    }

    // codegen-fallback isolation: explode a NATIVE array (sequence) vs the
    // transform-computed ghs — same row counts, different codegen status
    for (rep <- 1 to 3) {
      time(s"C explode native sequence #$rep")(
        noop(sdocs.select(explode(expr(
          s"sequence(1, greatest(size(split(text, ' ')) - ${n - 1}, 0))")).as("i"))))
      time(s"C explode ghs after checkpointed compute #$rep") {
        val g = baseS.select(col("doc_id"), col("ghs")).localCheckpoint()
        noop(g.select(explode(col("ghs")).as("gh")))
      }
    }

    // NARROW generator variants: never carry the token array through
    // the explode
    for (rep <- 1 to 3) {
      time(s"N stage1 narrow explode+agg #$rep") {
        val gh1 = baseS.select(explode(col("ghs")).as("gh"))
        noop(gh1.groupBy("gh").agg(count(lit(1)).as("c"))
          .where(col("c") > 1).select("gh"))
      }
      time(s"N narrow explode only #$rep")(
        noop(baseS.select(explode(col("ghs")).as("gh"))))
      time(s"N stage2 survivor-only gen #$rep") {
        // emit (doc_id, gram) for surviving positions only, built inside
        // the array domain (no per-position t copies). Stand-in survivor
        // rule: gh % 23 == 0 (~4% — same order as the real dup sliver)
        val surv = baseS.select(col("doc_id"), explode(expr(
          s"""transform(
             |  filter(sequence(1, size(ghs)),
             |         i -> element_at(ghs, i) % 23 = 0),
             |  i -> array_join(slice(t, i, $n), ' '))""".stripMargin)).as("gram"))
        val g = surv.groupBy("gram", "doc_id").agg(count(lit(1)).as("m"))
        val byGram = org.apache.spark.sql.expressions.Window.partitionBy("gram")
        noop(g.withColumn("tt", sum("m").over(byGram))
          .where(col("tt") > 1)
          .groupBy("doc_id").agg(sum("m").cast("long").as("dup_grams")))
      }
    }

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
