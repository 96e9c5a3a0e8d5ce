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
}
