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
  def localSized(cpus: String, inputDir: String): SparkSession.Builder = {
    val bytes = dirBytes(inputDir)
    val want = math.max(1L, bytes / (8L << 20))
    val cores = try cpus.toLong catch { case _: Exception => 4L }
    val init = math.min(4096L, math.max(cores, want))
    local(cpus).config(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum", init.toString)
  }

  /** Total bytes of the regular files under `dir` (one level of table
    * dirs — the testdata layout); 0 when unreadable, which falls back to
    * the `cpus` floor. */
  private def dirBytes(dir: String): Long = {
    def sz(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(sz).sum).getOrElse(0L)
    try sz(new java.io.File(dir)) catch { case _: Exception => 0L }
  }
}
