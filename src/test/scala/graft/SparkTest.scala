package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. */
object SparkTest {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      // start shuffles WIDE and let AQE coalesce: at 1x the mining
      // shuffles coalesce to a handful of partitions (64 MB advisory
      // target), while at 30-100x data the candidate shuffle keeps
      // hundreds of partitions instead of spilling 32 giant ones --
      // the corpus_curate 100x spill fix (VERDICT r10 #3)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
