package graft.tools

import org.apache.spark.sql.SparkSession

/** The ONE local-mode session config the bench/probe/test entry points
  * share — single-sourced so a tuning change cannot silently diverge the
  * tools' Spark configs (the same-box A/B discipline depends on the
  * sessions being identical; round 11 had to edit six copies to add one
  * config line).
  */
object Sessions {

  /** Standard local builder: `cpus` threads and shuffle partitions; AQE
    * with WIDE initial shuffle partitions, letting it coalesce — at 1×
    * the mining shuffles coalesce to a handful (64 MB advisory target),
    * while at 30–100× data the candidate shuffle keeps hundreds of
    * partitions instead of spilling 32 giant ones (the corpus_curate
    * 100× spill fix); UTC; graft extensions; UI off. Callers append
    * their extras (appName, overrides) and getOrCreate. */
  def local(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")

  /** Input-SIZED local builder (r21, guide §2.2/VERDICT r20 #1): the
    * initial shuffle-partition count derives from the INPUT VOLUME
    * instead of the fixed 256 — ~one initial partition per 8 MB of
    * source bytes, clamped to [cpus, 4096]. At 1× (≈15 MB) that is
    * `cpus` — fewer M×R shuffle blocks and cheaper AQE replans per
    * query; at the 100×/1000× probe scales it GROWS past the old
    * constant (188, 1875), which is the direction the measured spill
    * classes want (results_scale1000_text_r20: the granularity knob
    * divides per-task state). AQE still coalesces to the 64 MB advisory
    * target, so at every scale the post-coalesce layout is unchanged —
    * the rule moves only the pre-coalesce granularity. */
  def localSized(cpus: String, inputDir: String): SparkSession.Builder =
    localSizedBytes(cpus, dirBytes(inputDir))

  /** [[localSized]] from a caller-supplied byte volume — for callers
    * whose input does not exist yet at session-build time (ScaleBench
    * sizes from base-dir bytes × replicas: the synthetic corpus is built
    * INSIDE the session, so dirBytes on the scale dir would read 0 and
    * silently hand a 15 GB probe the 15 MB config). */
  def localSizedBytes(cpus: String, bytes: Long): SparkSession.Builder = {
    val want = math.max(1L, bytes / (8L << 20))
    val cores = try cpus.toLong catch { case _: Exception => 4L }
    val init = math.min(4096L, math.max(cores, want))
    // scan-split + advisory tiers (r22 — the second half of the sizing
    // default, VERDICT r20 #1): the r20 1000× spill decomposition is a
    // TWO-term budget — per-task state ≈ (split or advisory bytes) ×
    // in-memory expansion (~10× for the gram/pair fan-outs) must stay
    // under the per-slot execution budget. At the 15 GB probe the
    // measured zero-spill knobs were 32 MB splits (scan term: text_novelty
    // 99 GB → 0) and ~16 MB advisory with grown init (reduce term:
    // text_dedup_spans 79 GB → 0, basket_pairs 341 GB → 0), shuffle
    // byte-comparable throughout (results_scale1000_{text,tail}_r20).
    // Tiers keep Spark defaults below 2 GB of input — the bench point is
    // untouched — and step to the validated values as volume grows; on a
    // cluster the same per-slot budget divides by executor count, so the
    // rule errs smaller only where the local box is the constraint.
    val mpMb = if (bytes < (2L << 30)) 128L else if (bytes < (8L << 30)) 64L else 32L
    val advMb = if (bytes < (2L << 30)) 64L else if (bytes < (8L << 30)) 32L else 16L
    local(cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", init.toString)
      .config("spark.sql.files.maxPartitionBytes", s"${mpMb}m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", s"${advMb}m")
  }

  /** Total bytes of the regular files under `dir` (one level of table
    * dirs — the testdata layout); 0 when unreadable, which falls back to
    * the `cpus` floor. */
  private[tools] def dirBytes(dir: String): Long = {
    def sz(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(sz).sum).getOrElse(0L)
    try sz(new java.io.File(dir)) catch { case _: Exception => 0L }
  }
}
