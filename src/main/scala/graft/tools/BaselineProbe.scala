package graft.tools

import graft.harness.RunHarness
import graft.search.{HybridQuery, RamCorpus}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-scale baseline probe (closes the BENCH-vs-BASELINE gate).
  *
  * The reference's published results.jsonl (results/results.jsonl,
  * results/week1/results_full.jsonl) was measured on its real corpus:
  * N≈150,346 vectors, D=384 (all-MiniLM-L6-v2), in-RAM NumPy/FAISS on a
  * single node. The driver testdata's embeddings table is 75× smaller
  * (2,000×64 at sf0.1), so per-query latencies there measure Spark's
  * job-launch floor, not scoring cost — the two are not comparable.
  *
  * This tool makes the comparison honest: it materializes a deterministic
  * N=150,346 × D=384 unit-norm corpus to parquet (one-time, like the
  * reference's artifact build), pins it in RAM the way the reference
  * keeps vectors.npy resident (RamCorpus — flat primitive blocks, zero
  * per-query decode), then runs the SAME RunHarness pipeline REPS times
  * (default 5) and prints per-rep and min/median/max per-backend
  * latencies — the ranges BASELINE.md records against the reference's.
  */
object BaselineProbe {
  val N = 150346L // reference results_full.jsonl corpus size
  val D = 384     // all-MiniLM-L6-v2 dimension (artifacts.py:14)

  /** Deterministic local unit vector (query side). */
  private def unitVec(seed: Long): Array[Float] = {
    val rng = new scala.util.Random(seed)
    val v = Array.fill(D)(rng.nextGaussian().toFloat)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    v.map(x => (x / n).toFloat)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "5").toInt
    // "-g2": generation 2 corpus (genuinely Gaussian coordinates; the g1
    // tanh(sin·1e5) formula saturated to ±1/√D hypercube corners, fine
    // for latency but degenerate geometry for any recall reading)
    val dir = s"${sys.props("java.io.tmpdir")}/graft-baseline-n$N-d$D-g2"
    val spark = Sessions.local(cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(s"$dir/embeddings.parquet/_SUCCESS").exists()) {
      // genuinely Gaussian deterministic coordinates: Box–Muller over two
      // (id, dim-index)-hashed uniforms in (0,1], then L2-normalize —
      // same shape/metadata contract as the sf testdata
      val p = 1000000007L // prime modulus; u ∈ (0, 1]
      def unif(j: Int) =
        (pmod(xxhash64(col("id"), lit(j)), lit(p)).cast("double") + 1.0d) / p.toDouble
      val coords = (0 until D).map(j =>
        (sqrt(lit(-2.0d) * log(unif(2 * j))) * cos(lit(2.0d * math.Pi) * unif(2 * j + 1)))
          .cast("float"))
      val raw = spark.range(N)
        .select(col("id").as("vec_id"), array(coords: _*).as("e"),
          pmod(col("id"), lit(10)).cast("int").as("label"))
      val norm = sqrt(aggregate(col("e"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double")))
      raw.select(col("vec_id"),
          transform(col("e"), x => (x.cast("double") / norm).cast("float")).as("embedding"),
          col("label"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }

    // per-query K=10 hybrid set mirroring the reference's query mix
    val qs = Seq(
      HybridQuery(0, unitVec(100), "{}", "TRUE", 10),
      HybridQuery(1, unitVec(101), """{"label":{"in":[0,1,2]}}""", "label IN (0,1,2)", 10),
      HybridQuery(2, unitVec(102), """{"label":{"ge":5}}""", "label >= 5", 10),
      HybridQuery(3, unitVec(103), """{"label":{"eq":7}}""", "label = 7", 10),
      HybridQuery(4, unitVec(104), """{"label":{"between":[2,6]}}""", "label BETWEEN 2 AND 6", 10),
      HybridQuery(5, unitVec(105), """{"label":{"ne":3}}""", "label <> 3", 10))

    // one-time costs BEFORE any timed rep, mirroring the reference's
    // load-time work (loaders.py mmaps vectors.npy and builds FAISS once;
    // its per-query latencies never pay either):
    //  - IVF train/persist (also JIT-warms the harness path), then the PQ
    //    codebooks/code table and the composed IVFPQ code table — all
    //    artifact-build cost the reference's per-query numbers never pay
    RunHarness.runMany(spark, dir, Seq("pre_filter", "ivf"), qs.take(1))
    RunHarness.runMany(spark, dir, Seq("pq", "ivfpq"), qs.take(1))
    RunHarness.runMany(spark, dir, Seq("sq"), qs.take(1)) // SQ8 params + byte codes
    RunHarness.runMany(spark, dir, Seq("bq"), qs.take(1)) // BQ sign-bit codes
    //  - columnar cache for the backends that still scan the table
    //    (random, the per-query allowed-subset counts)
    graft.Tables.embeddings(spark, dir).cache().count()
    //  - the RAM serving tier: flat primitive blocks, the analogue of the
    //    reference's resident N×D float32 matrix
    val ram = RamCorpus.build(graft.Tables.embeddings(spark, dir))
    RunHarness.runMany(spark, dir, Seq("exact", "post_filter"), qs.take(1), ram = Some(ram))

    // pq scans the FULL 150k code table (m bytes/vector); ivfpq scans only
    // the probed lists' codes — the corpus where the compression and
    // pruning actually pay, unlike the 2k-vector sf tables where both ride
    // the job-launch floor
    val backends = Seq("exact", "pre_filter", "post_filter", "ivf", "pq", "ivfpq", "sq", "bq", "random")
    val repRows = (1 to reps).map { rep =>
      val rows = RunHarness.runMany(spark, dir, backends, qs, ram = Some(ram))
      val s = RunHarness.summarize(rows).map { case (m, mean, p50, rec) =>
        s""""$m":{"mean_ms":$mean,"p50_ms":$p50,"mean_recall":$rec}"""
      }.mkString("{", ",", "}")
      println(s"""{"metric":"baseline_scale_rep","rep":$rep,"backends":$s}""")
      rows
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("results_baseline_scale.jsonl"),
      RunHarness.toJsonLines(repRows.flatten))

    // min/median/max of the per-rep mean latency, per backend — the
    // ranges the 2× gate is judged against (flattering single runs hide
    // page-cache/GC variance)
    def mmm(xs: Seq[Double]): String = {
      val s = xs.sorted
      s"""{"min":${s.head},"median":${s(s.length / 2)},"max":${s.last}}"""
    }
    val perRep = repRows.map(RunHarness.summarize)
    val summary = backends.sorted.map { b =>
      val means = perRep.map(_.find(_._1 == b).get._2)
      val recalls = perRep.map(_.find(_._1 == b).get._4)
      s""""$b":{"mean_ms":${mmm(means)},"mean_recall":${recalls.max}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"baseline_scale","n":$N,"d":$D,"reps":$reps,"backends":$summary}""")

    // --- structured-geometry companion: the i.i.d. corpus above is IVF's
    // worst case (no cluster structure → recall ≈ probed fraction). Real
    // text embeddings cluster, which is what the reference's 0.73–0.99
    // recalls ride on. Same N×D drawn from a 300-center Gaussian mixture
    // (σ=0.35 → intra-cluster cosine ≈ 0.9): recall here shows what the
    // SAME index code does on clusterable geometry.
    val dirS = s"${sys.props("java.io.tmpdir")}/graft-baseline-structured-n$N-d$D-g2"
    if (!new java.io.File(s"$dirS/embeddings.parquet/_SUCCESS").exists()) {
      val p = 1000000007L
      def unifOf(idc: org.apache.spark.sql.Column, j: Int) =
        (pmod(xxhash64(idc, lit(j)), lit(p)).cast("double") + 1.0d) / p.toDouble
      def gauss(idc: org.apache.spark.sql.Column, j: Int) =
        sqrt(lit(-2.0d) * log(unifOf(idc, 2 * j))) * cos(lit(2.0d * math.Pi) * unifOf(idc, 2 * j + 1))
      val center = pmod(col("id"), lit(300L))
      val coords = (0 until D).map(j =>
        (gauss(center, j) + lit(0.35d) * gauss(col("id") + lit(7919L), j)).cast("float"))
      val raw = spark.range(N)
        .select(col("id").as("vec_id"), array(coords: _*).as("e"),
          pmod(col("id"), lit(10)).cast("int").as("label"))
      val norm = sqrt(aggregate(col("e"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double")))
      raw.select(col("vec_id"),
          transform(col("e"), x => (x.cast("double") / norm).cast("float")).as("embedding"),
          col("label"))
        .write.mode("overwrite").parquet(s"$dirS/embeddings.parquet")
    }
    // empty qvec → dataset vector at qid (the reference's empty-qtext
    // rule): queries sit inside real clusters
    val qsS = (0L until 6L).map(q => HybridQuery(q * 25000L, Array.empty[Float], "{}", "TRUE", 10))
    RunHarness.runMany(spark, dirS, Seq("pq", "ivfpq"), qsS.take(1)) // build, untimed
    RunHarness.runMany(spark, dirS, Seq("bq"), qsS.take(1))          // sign-bit codes, untimed
    RunHarness.runMany(spark, dirS, Seq("ivfpq_res"), qsS.take(1))   // residual codebook, untimed
    val ramS = RamCorpus.build(graft.Tables.embeddings(spark, dirS)) // serving tier, untimed
    val rowsS = RunHarness.runMany(spark, dirS,
      Seq("pre_filter", "ivf", "pq", "ivfpq", "ivfpq_res", "bq"), qsS,
      ram = Some(ramS))
    val sS = RunHarness.summarize(rowsS).map { case (m, mean, p50, rec) =>
      s""""$m":{"mean_ms":$mean,"p50_ms":$p50,"mean_recall":$rec}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"baseline_scale_structured","n":$N,"d":$D,"centers":300,"backends":$sS}""")

    // the compressed tier's dial at reference scale: widen the ADC
    // shortlist (pq:N / ivfpq:N grammar) — the recall the shortlist-100
    // operating point trades away is recoverable without touching the
    // index, at a latency still at-or-below the flat probe's
    val dialNames = Seq("pq:500", "ivfpq:500", "ivfpq_res:500", "pq:1000",
      "ivfpq:1000", "ivfpq_res:1000", "bq:500", "bq:1000", "bq:5000")
    val rowsD = RunHarness.runMany(spark, dirS, dialNames, qsS, ram = Some(ramS))
    // dial rows that share one timed pass say so (fused ladder — their
    // latencies are intentionally near-identical, not duplicated reps)
    val fusedD = RunHarness.fusedKeys(dialNames)
    val sD = RunHarness.summarize(rowsD).map { case (m, mean, p50, rec) =>
      val fused = fusedD.get(m).filter(_ != m)
        .map(k => s""","fused":"$k"""").getOrElse("")
      s""""$m":{"mean_ms":$mean,"p50_ms":$p50,"mean_recall":$rec$fused}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"baseline_scale_structured_dial","n":$N,"d":$D,"centers":300,"backends":$sD}""")
    spark.stop()
  }
}
