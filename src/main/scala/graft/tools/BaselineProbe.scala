package graft.tools

import graft.harness.RunHarness
import graft.search.HybridQuery
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
  * reference's artifact build), then runs the SAME RunHarness pipeline
  * (exact / pre_filter / post_filter / random) the sf queries use, and
  * prints one JSON line with per-backend mean/p50 latency — the numbers
  * BASELINE.md records against the reference's.
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
    val dir = s"${sys.props("java.io.tmpdir")}/graft-baseline-n$N-d$D"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(s"$dir/embeddings.parquet/_SUCCESS").exists()) {
      // deterministic gaussian coordinates from (id, dim-index) hashes,
      // L2-normalized — same shape/metadata contract as the sf testdata
      val coords = (0 until D).map(j =>
        tanh(sin(xxhash64(col("id"), lit(j)).cast("double")) * 1e5).cast("float"))
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

    // warm-up pass (JIT + one-time IVF train/persist) BEFORE caching: the
    // KMeans working set would otherwise evict the cached corpus blocks
    RunHarness.runMany(spark, dir, Seq("pre_filter", "ivf"), qs.take(1))

    // RAM-resident corpus, like the reference (loaders.py mmaps/loads
    // vectors.npy ONCE; its per-query latencies never pay the load): cache
    // the table so every harness scan hits memory — the CacheManager
    // serves any identical parquet plan from the cached columnar batches.
    // Index build stays excluded from per-query latency, exactly as the
    // reference excludes FAISS construction.
    graft.Tables.embeddings(spark, dir).cache().count()
    RunHarness.runMany(spark, dir, Seq("pre_filter"), qs.take(1))
    val rows = RunHarness.runMany(spark, dir,
      Seq("exact", "pre_filter", "post_filter", "ivf", "random"), qs)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("results_baseline_scale.jsonl"),
      RunHarness.toJsonLines(rows))
    val summary = RunHarness.summarize(rows).map { case (m, mean, p50, rec) =>
      s""""$m":{"mean_ms":$mean,"p50_ms":$p50,"mean_recall":$rec}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"baseline_scale","n":$N,"d":$D,"backends":$summary}""")
    spark.stop()
  }
}
