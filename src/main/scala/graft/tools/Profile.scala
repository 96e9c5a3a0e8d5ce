package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession

/** Component-level timing for the heavy pipelines (the bench reports
  * whole queries; this splits them so a regression points at a stage).
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.Profile"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }

    val docs = graft.Tables.documents(spark, sfDir)
    docs.count() // warm the scan

    time("jaccard_pairs (cold)")(Dedup.jaccardPairs(docs, 0.95).count())
    time("jaccard_pairs (again)")(Dedup.jaccardPairs(docs, 0.95).count())
    val pairs = Dedup.jaccardPairs(docs, 0.95)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("pairs persist fill")(pairs.count())
    time("clusters on cached pairs")(Dedup.clusters(pairs).count())
    val clusters = Dedup.clusters(pairs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    clusters.count()
    time("curate on cached clusters")(
      graft.queries.PipelineQueries.corpusCurate(docs, clusters).count())
    time("minhash_lsh_pairs")(Dedup.minhashLshPairs(docs, 0.95).count())

    // minhash sub-stage breakdown (re-stated inline; keep in sync with
    // Dedup.minhashLshPairs when diagnosing)
    {
      import graft.functions.VectorFunctions._
      import org.apache.spark.sql.functions._
      val base = docs.select(col("doc_id"), tokenSetIds(col("text"), 1).as("tsi"))
      time("  tokenize+ids only")(base.count())
      val withSig = base.withColumn("sig", minhashSignature(col("tsi"),
        (1 to 32).map(_.toLong * 2654435761L % 2147483647L),
        (1 to 32).map(_.toLong * 40503L % 2147483647L), 2147483647L))
      time("  + 32-perm signature")(withSig.count())
    }
    spark.stop()
  }
}
