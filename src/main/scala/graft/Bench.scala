package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every registered query against the noop sink.
  *
  * The noop datasource forces full execution of the plan (all columns
  * materialized, nothing skipped the way `.count()` lets Catalyst drop
  * projections), without any write cost. Prints ONE JSON line.
  */
object Bench {

  /** Queries shown on the stdout line: the TOP-N slowest. The driver keeps
    * only the LAST 2000 chars of stdout and parses that tail's final line
    * as JSON, so the line must stay well clear of 2000 chars as coverage
    * grows (at 92 queries the full per-query map hit 1903 — ~5 queries of
    * headroom; the itemized setup_sec map costs ~260 more, paid for by
    * trimming TopN 40 → 36; the warm_sec map costs up to ~210 more, paid
    * for by trimming 36 → 30; the r18 always-warm watch entries plus the
    * worst-case `contended` marker cost up to ~190 more, paid for by
    * trimming 30 → 27; supplier_triangles joining WarmWatch in r19 cost
    * one more worst-case warm row, paid for by 27 → 26). The slowest 26
    * are the ones a reader acts on; the rest is summarized as
    * `other_sec`/`n_queries`, and the FULL map is written to
    * bench_queries.json. */
  private[graft] val TopN = 26

  /** Entries recorded above this get one immediate warm rep, emitted as
    * `warm_sec` beside the cold numbers: the r14 round proved the recorded
    * signal for many-short-job queries can carry 9× JVM/scheduler debt
    * (hybrid_stats 97.1 s recorded vs 10.3 s warm median) — the warm rep
    * makes the plan cost and the environment debt separately visible.
    * Lowered 10→5 s (r16 verdict #1): profile_drift swung 3.6–9.4 s
    * across rounds just UNDER the old threshold, so no warm rep ever
    * separated plan cost from VM weather for the 5–10 s band. */
  private[graft] val WarmRepThreshold = 5.0

  /** warm_sec line budget: entries are few by construction (only >5 s
    * recordings — 6 rows in BENCH_r16's ledger), but cap the map so the
    * stdout line stays bounded. Raised with the threshold so the new
    * 5–10 s band isn't crowded out by the by-design harness loops. */
  private[graft] val MaxWarmReps = 8

  /** Always-warm-repped rows regardless of the threshold (r17 verdict
    * #6): the sub-5 s repeat swingers — q1_cube read 2.4–4.9 s across
    * rounds, orders_rfm similar — sit just under WarmRepThreshold and
    * kept re-litigating as unexplained movers every round. A standing
    * warm rep (~6 s of bench time) puts their plan-cost number in the
    * ledger permanently. Names absent from the registry are skipped.
    * supplier_triangles joined in r19 (r18 verdict #6: a known 3.8–5.1 s
    * swinger that kept just missing the MaxWarmReps cut). */
  private[graft] val WarmWatch: Seq[String] = Seq("q1_cube", "orders_rfm", "supplier_triangles")

  /** `contended` marker budget: names listed on the line when a warm
    * rep reads HIGHER than its cold number (box contention mid-rep, not
    * plan cost — r17's text_dedup_spans read 23.3 s warm vs 8.6 s cold
    * and the ledger had no way to say so). Capped so the worst case
    * (every warm row contended at once = the whole ledger is weather)
    * stays inside the driver's 2000-char tail; `n` carries the true
    * count when the list overflows. */
  private[graft] val MaxContended = 3

  /** Noise floor for the `contended` marker (r18 verdict #2: the raw
    * rep>cold compare flagged a 0.7% delta — pure rep jitter — alongside
    * two real 1.2–1.4× contentions, diluting what the word means). A rep
    * counts as contended only when it exceeds cold by BOTH 10% and
    * 0.5 s: the relative gate keeps long rows honest (a 9.8 vs 9.75 s
    * pair is weather), the absolute gate keeps short rows honest (a
    * 0.4 vs 0.3 s pair is scheduler noise, not contention). min-of-pair
    * is emitted either way, so the floor changes only the marker. */
  private[graft] def isContended(rep: Double, cold: Double): Boolean =
    rep > cold * 1.1 && rep > cold + 0.5

  /** Run order: measured-heaviest FIRST (BENCH_r13 top of the per-query
    * map), then the rest alphabetically. The alphabetical order ran the
    * most expensive pair (text_dup_spans/text_dedup_spans) LAST, after
    * ~200 queries of accumulated JVM debt (old-gen pressure, code-cache
    * churn), and their recorded numbers tripled round over round
    * (8.4 → 19.1 → 58.0 s) while warm A/B medians stayed ~5.7 s. Running
    * the heavy set against a fresh heap records the cost a reader should
    * act on; the cheap tail tolerates the debt. Names absent from the
    * registry are skipped, new queries land in the alphabetical tail. */
  private[graft] val HeavyFirst: Seq[String] = Seq(
    "text_dup_spans", "text_dedup_spans", "dedup_jaccard_mine", "hybrid_stats", "q1_rollup",
    "text_winnowing", "dedup_recall", "corpus_curate", "vec_ivf_compact",
    "dedup_minhash_portable", "q20_volume_suppliers", "dedup_ngram",
    "corpus_ccnet_buckets", "supplier_triangles", "customer_migration",
    "text_novelty", "text_zipf", "dedup_minhash_lsh")

  private[graft] def orderedQueries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = {
    val all = SparkEntry.queries
    val head = HeavyFirst.filter(all.contains)
    val rest = (all.keySet -- head).toSeq.sorted
    (head ++ rest).map(n => n -> all(n))
  }

  private[graft] def fmt(dp: Int)(v: Double): String =
    s"%.${dp}f".formatLocal(java.util.Locale.ROOT, v)

  private[graft] def queriesJson(results: Seq[(String, Double)], dp: Int): String =
    results.map { case (k, v) => "\"" + k + "\":" + fmt(dp)(v) }.mkString("{", ",", "}")

  /** The driver-parsed result line: total + top-N slowest per-query
    * timings + the summarized remainder + the itemized UNTIMED setup cost
    * (`setup_sec`: index builds, warm-ups, harness artifacts — work done
    * outside the per-query timings, so the wall-clock of a Bench run is
    * decomposable as value + setup_sec.total). Bounded by construction:
    * TopN + warm (MaxWarmReps + WarmWatch) entries × (name ≤ ~24 + 8)
    * + ~14 fixed setup keys + the capped contended marker + envelope
    * stays under the driver's 2000-char tail even at 120 registered
    * queries (BenchLineSpec pins the worst case). */
  private[graft] def formatLine(results: Seq[(String, Double)], sfNum: String,
                                setup: Seq[(String, Double)] = Nil,
                                warm: Seq[(String, Double)] = Nil): String = {
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // failure sentinels (-1.0) must stay visible on the line no matter how
    // many queries succeed: they'd otherwise sort below the top-N cut and
    // vanish (only bench_queries.json would record them). Failed entries
    // are ALWAYS listed; the top-N budget applies to the successes.
    val (failed, ok) = results.partition { case (_, v) => v < 0 }
    val top = (failed ++ ok.sortBy { case (_, v) => -v }.take(TopN)).sortBy(_._1)
    val otherSec = ok.sortBy { case (_, v) => -v }.drop(TopN).map(_._2).sum
    val setupJson =
      if (setup.isEmpty) ""
      else s""""setup_sec":${queriesJson(setup :+ ("total" -> setup.map(_._2).sum), 2)},"""
    // warm_sec carries min(cold, warm rep) — the comparable plan cost
    // (r17 verdict #2: a single warm rep on a contended box can read
    // HIGHER than cold; emitting the raw rep would have a reader
    // conclude the plan tripled). Rows whose raw rep exceeded cold are
    // named in `contended` (worst warm/cold ratio first, capped, with
    // the true count) so the discarded rep is visible, and the raw rep
    // itself is preserved in bench_queries.json as warm/<name>.
    val cold = results.toMap
    val warmMin = warm.map { case (n, v) =>
      val c = cold.getOrElse(n, -1.0)
      n -> (if (v >= 0 && c >= 0) math.min(v, c) else v)
    }
    val contended = warm
      .filter { case (n, v) =>
        v >= 0 && cold.getOrElse(n, -1.0) >= 0 && isContended(v, cold(n)) }
      .sortBy { case (n, v) => -(v / math.max(cold(n), 1e-9)) }
    val warmJson =
      if (warm.isEmpty) ""
      else s""""warm_sec":${queriesJson(warmMin.sortBy(_._1), 2)},"""
    val contendedJson =
      if (contended.isEmpty) ""
      else {
        val names = contended.take(MaxContended)
          .map { case (n, _) => "\"" + n + "\"" }.mkString("[", ",", "]")
        s""""contended":{"n":${contended.length},"rows":$names},"""
      }
    s"""{"metric":"total","value":${fmt(2)(total)},"unit":"sec",""" +
      s""""queries":${queriesJson(top, 2)},""" +
      s""""n_queries":${results.length},"failed":${failed.length},""" +
      s""""other_sec":${fmt(2)(otherSec)},""" + setupJson + warmJson + contendedJson +
      s""""sf":$sfNum}"""
  }

  def main(args: Array[String]): Unit = {
    val tMain = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // input-sized session (Sessions.localSized doc): the initial shuffle
    // partition count scales with the benched volume instead of a constant
    val spark = graft.tools.Sessions.localSized(cpus, sfDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // every untimed phase is clocked and itemized on the result line as
    // setup_sec (the per-query timings measure serving work ONLY; the
    // builds/warm-ups here are artifact-load cost, loaders.py's side of
    // the reference — itemizing keeps the driver's total decomposable)
    val setup = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    setup += "session" -> ((System.nanoTime() - tMain) / 1e9)
    def phase(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      try body
      catch { case e: Throwable =>
        System.err.println(s"[bench] setup $name failed: ${e.getMessage}") }
      setup += name -> ((System.nanoTime() - t0) / 1e9)
    }
    // run independent warm/build stacks of ONE phase concurrently (guide
    // §2.6 — Spark happily schedules several jobs at once; a warm-up
    // stack's tail leaves most cores idle otherwise). Failures are
    // per-stack non-fatal, like phase(). Concurrency stays INSIDE a
    // phase so the itemized setup times remain wall-true and the run
    // still decomposes as value + setup_sec.total.
    def stacks(name: String)(bodies: (() => Unit)*): Unit = {
      val ts = bodies.map { b =>
        val t = new Thread(() =>
          try b()
          catch { case e: Throwable =>
            System.err.println(s"[bench] setup $name stack failed: ${e.getMessage}") })
        t.start(); t
      }
      ts.foreach(_.join())
    }

    // stable order; one warm-up of the flagship to JIT/codegen-prime
    phase("entry_warm") {
      SparkEntry.entry(spark).write.format("noop").mode("overwrite").save() }
    // build/persist the IVF index before timing, like the reference: FAISS
    // index construction happens at artifact-load time (loaders.py), so its
    // published per-query latencies measure the PROBE, not the build. The
    // timed vec_ivf_* entries below hit the persisted partition-pruned index.
    phase("ivf_build") { graft.queries.VectorQueries.ivfModel(spark, sfDir); () }
    // ...and the RAM serving tier, for the same reason: the reference
    // loads vectors.npy at artifact-load time; per-query latencies
    // measure scoring, not corpus residency setup.
    phase("ram_tier") { graft.queries.VectorQueries.servingTier(spark, sfDir); () }
    // ...and the PQ index (codebooks + code table), same reasoning: the
    // 8 KMeans fits are artifact-build cost; the timed vec_pq_* entries
    // should measure the ADC scan / stats aggregate, not training.
    phase("pq_build") { graft.queries.VectorQueries.pqModel(spark, sfDir); () }
    // ...and the composed IVFPQ code table (derived from the two halves
    // above in one projection + partitioned write — also build cost).
    phase("ivfpq_build") { graft.queries.VectorQueries.ivfpqModel(spark, sfDir); () }
    // ...and the SQ8 code table (one min/max train + one encode pass —
    // also build cost; the timed vec_sq_* entries measure the byte scan).
    phase("sq_build") { graft.queries.VectorQueries.sqModel(spark, sfDir); () }
    // ...and the LSH signature table (r21): signatures are query-
    // independent, so they are index-build cost like every tier above —
    // the timed lsh entries measure the bucket-pruned probe, not a
    // per-query corpus hash pass.
    phase("lsh_sigs") { graft.harness.RunHarness.prewarmLshIndex(spark, sfDir); () }
    // ...and the incremental-ingest RESIDENT models (vec_ivf[pq]_append):
    // the daily-ingest entries should time the batch assignment + probe,
    // not the pre-existing corpus's quantizer training. Calling the query
    // fns builds their cached models eagerly (KMeans/codebook fits); the
    // returned search frames stay lazy and unexecuted here.
    phase("append_models") {
      stacks("append_models")(
        () => { graft.queries.VectorQueries.vecIvfAppend(spark, sfDir); () },
        () => { graft.queries.VectorQueries.vecIvfPqAppend(spark, sfDir); () },
        // ...and dedup_semantic_inc's resident quantizer (same incremental-
        // maintenance semantics: the timed entry measures the batch pass)
        () => { graft.queries.DedupQueries.dedupSemanticInc(spark, sfDir); () }) }
    // ...and the persisted corpus band table (dedup_incremental's
    // pre-existing state): the entry times mining a batch against it,
    // not building it — the same build-vs-probe split as the indexes.
    phase("band_table") { graft.queries.DedupQueries.corpusBands(spark, sfDir); () }
    // ...and the shared τ=0.95 mined-pair + cluster artifacts (r14
    // verdict #2): a production curation run mines the pair graph ONCE
    // and publishes it; every consumer (dedup_jaccard, corpus_curate,
    // dedup_sweep, split_signoff, corpus_release, pipeline_e2e) reads the
    // published table. The mining cost is itemized here; the per-query
    // timings below measure consumption, the same build-vs-probe split
    // as the indexes.
    phase("pair_table") {
      graft.queries.DedupQueries.minedJaccardPairs(spark, sfDir)
      graft.queries.DedupQueries.minedClusters(spark, sfDir); () }
    // ...and the bucketed catalog tables (#294's ingest-time layout
    // decision): the registered query times the co-located JOIN, not the
    // one-off bucketed write.
    phase("bucketed_build") {
      stacks("bucketed_build")(
        () => { graft.queries.IngestQueries.bucketedTables(spark, sfDir); () },
        () => { graft.queries.DedupQueries.simhashChunkTable(spark, sfDir); () },
        () => { graft.queries.DedupQueries.minhashBandTable(spark, sfDir); () }) }
    // ...and the vectors.npy artifact (ingest_npy times the DISTRIBUTED
    // byte-range load; the driver-side artifact write is one-time
    // reference-parity work, artifacts.py's job)
    phase("npy_artifact") { graft.queries.IngestQueries.ingestNpy(spark, sfDir); () }
    // JIT-warm the heavy codegen paths (token-set hashing, intersect
    // verify, cluster resolution) at sf0.001: the alphabetically-first
    // timed query (corpus_curate) otherwise pays cold-compile for the
    // whole dedup stack and its recorded time swings run to run. The
    // pair caches are keyed by sf dir, so nothing leaks into the timed
    // sf run — this warms CODE, not results.
    phase("code_warm") {
      val warm = "/root/testdata/sf0.001"
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      // three independent stacks warm concurrently; items WITHIN a stack
      // share /tmp artifact caches, so they stay ordered
      stacks("code_warm")(
        // dedup stack: curate (pair table + cluster resolution codegen),
        // then the banded-LSH mine
        () => {
          noop(graft.queries.PipelineQueries.corpusCurate(spark, warm))
          noop(graft.queries.DedupQueries.dedupMinhashLsh(spark, warm))
        },
        // the dup-spans pair runs FIRST (HeavyFirst) — prime its codegen
        // (fingerprint volume pass + Bloom flag-back) so the recorded
        // number is the warm plan cost, not first-in-JVM compile
        () => noop(graft.queries.TextQueries.textDupSpans(spark, warm)),
        // vector/harness families (the r14 gap: hybrid_stats ran third
        // against a cold JVM and recorded 97 s vs a 10.3 s warm median —
        // the dedup stack was primed, the 13 backend families were not).
        // One runMany pass at sf0.001 compiles every backend's codegen
        // (ADC scan, Hamming scan, LSH signatures, ladder TakeOrdered,
        // RAM-tier scoring) plus the RRF fusion and autotune dial-ladder
        // plans. Models are dir-keyed, so this warms CODE only.
        () => {
          graft.harness.RunHarness.runMany(spark, warm,
            graft.queries.VectorQueries.HarnessFamilies,
            ram = graft.queries.VectorQueries.servingTier(spark, warm))
          noop(graft.queries.VectorQueries.hybridRrf(spark, warm))
          noop(graft.queries.VectorQueries.vecAutotune(spark, warm))
        })
    }

    // the per-family/per-dial collectors were last written by code_warm's
    // sf0.001 passes — clear them so bench_queries.json can only carry
    // the TIMED runs' decomposition (a failed timed run then publishes
    // no itemization at all, never wrong-scale warm-up numbers)
    graft.queries.VectorQueries.lastFamilySeconds = Map.empty
    graft.queries.VectorQueries.lastDialSeconds = Map.empty

    def timedRun(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
      }
    }
    val results = orderedQueries.map { case (name, fn) => name -> timedRun(name, fn) }

    // the two many-job aggregates, itemized per backend family / dial
    // setting (captured BEFORE the warm reps below re-run them) — land in
    // bench_queries.json as hybrid_stats/<family> and vec_autotune/<dial>
    // rows so a regression in a 60-78-job entry localizes instead of
    // hiding in one number. Fused dial ladders (RunHarness GroupBackend)
    // report under their combined key (e.g. vec_autotune/ivfpq:50+
    // ivfpq:100+ivfpq:200) — one shared pass serves the group, so one
    // itemization term is the honest decomposition.
    val famSecs = graft.queries.VectorQueries.lastFamilySeconds.toSeq
      .map { case (f, v) => s"hybrid_stats/$f" -> v } ++
      graft.queries.VectorQueries.lastDialSeconds.toSeq
        .map { case (f, v) => s"vec_autotune/$f" -> v }

    // one warm second rep for every entry recorded over WarmRepThreshold
    // (5 s since r17 — the 5–10 s band was the blind spot): re-run
    // immediately (same JVM, codegen and models now hot) and emit beside
    // the cold number. The warm value is the plan cost a reader should
    // compare round over round; cold-minus-warm is environment debt.
    // The reps' wall time is itemized as setup_sec.warm_reps — it is in
    // neither `value` nor the warm_sec map's entries individually summed,
    // and without the entry the run's wall clock would no longer
    // decompose as value + setup_sec.total (formatLine's invariant).
    val tWarm = System.nanoTime()
    val overThreshold = results
      .filter { case (_, v) => v > WarmRepThreshold }
      .sortBy { case (_, v) => -v }.take(MaxWarmReps)
      .map(_._1)
    // ...plus the standing watch set (WarmWatch doc): sub-threshold
    // repeat swingers rep every round so their plan cost is always in
    // the ledger; failed rows (-1) are excluded — a warm rep of a
    // failing query would just fail again
    val watch = WarmWatch.filter(n =>
      !overThreshold.contains(n) &&
        results.exists { case (rn, v) => rn == n && v >= 0 })
    val warm = (overThreshold ++ watch)
      .map(name => name -> timedRun(s"$name (warm rep)", SparkEntry.queries(name)))
    setup += "warm_reps" -> ((System.nanoTime() - tWarm) / 1e9)

    // full per-query map (2dp) goes to a FILE — the stdout line carries
    // only the top-N slowest (formatLine doc) plus the warm_sec map
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_queries.json"),
      queriesJson(results ++ famSecs ++ warm.map { case (n, v) => s"warm/$n" -> v }, 2) + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_queries.json write failed: ${e.getMessage}")
    }

    // reference-harness parity artifact: per-(query,backend) results.jsonl
    // (the reference's primary output) + a per-backend latency/recall
    // summary written to bench_harness.json (kept OFF the stdout line to
    // respect the 2000-char tail budget)
    phase("harness") {
      val rows = graft.harness.RunHarness.runMany(
        spark, sfDir, graft.queries.VectorQueries.HarnessFamilies,
        ram = graft.queries.VectorQueries.servingTier(spark, sfDir))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("results.jsonl"),
        graft.harness.RunHarness.toJsonLines(rows))
      val summary = graft.harness.RunHarness.summarize(rows).map { case (m, mean, p50, rec) =>
        s""""$m":{"mean_ms":$mean,"p50_ms":$p50,"mean_recall":$rec}"""
      }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_harness.json"), summary + "\n")
    }

    val sfNum = "sf([0-9.]+)/?$".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse {
      System.err.println(s"[bench] WARNING: sf dir '$sfDir' does not match sf<digits>; reporting sf:0")
      "0"
    }
    val line = formatLine(results, sfNum, setup.toSeq, warm)
    if (line.length > 1750)
      System.err.println(s"[bench] WARNING: result line ${line.length} chars — driver tail is 2000, trim TopN")

    // Print the result line AFTER spark.stop(): the driver reads the LAST
    // stdout line as JSON, and Spark's shutdown logging must not land
    // after it (log level OFF silences the stop-time INFO/WARN chatter).
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(line)
    System.out.flush()
  }
}
