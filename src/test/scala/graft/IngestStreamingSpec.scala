package graft

import graft.dedup.Dedup
import graft.queries.{DedupQueries, PipelineQueries}
import graft.streaming.StreamingIngest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The admission-funnel streaming twin's absorption contract: batched,
  * out-of-order and duplicate delivery replays to exactly the batch
  * pipeline_ingest report — including a late batch that RAISES the max
  * doc_id and thereby moves the 80/20 residency boundary, reclassifying
  * documents a fixed-boundary incremental funnel could never reopen.
  */
class IngestStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  private val sf = "/root/testdata/sf0.001"

  private def clustersOf(docs: DataFrame): DataFrame =
    Dedup.clusters(Dedup.jaccardPairs(docs, DedupQueries.JaccardTau))

  private def batchWant(docs: DataFrame, clusters: DataFrame): Seq[(String, Long)] = {
    import spark.implicits._
    PipelineQueries.pipelineIngestOf(docs, clusters)
      .as[(String, Long)].collect().toSeq
  }

  test("streaming ingest: batched + duplicate absorption == pipeline_ingest") {
    val docs = Tables.documents(spark, sf)
    val cl = DedupQueries.minedClusters(spark, sf)
    val si = new StreamingIngest
    // out-of-order thirds, one redelivered — overwrite is idempotent
    val b2 = docs.where(col("doc_id") % 3 === 0)
    Seq(docs.where(col("doc_id") % 3 === 2), b2,
      docs.where(col("doc_id") % 3 === 1), b2).foreach(si.processBatch)
    assert(si.report(cl) == batchWant(docs, cl))
  }

  test("streaming ingest: a late max-raising batch moves the residency boundary exactly") {
    val docs = Tables.documents(spark, sf)
    val mx = docs.agg(max(col("doc_id"))).first().getLong(0)
    // hold back the top 10% of the id book: the late batch RAISES max,
    // shifting the 80/20 boundary and re-classifying earlier docs
    val cut = mx - mx / 10
    val early = docs.where(col("doc_id") <= cut)
    val late = docs.where(col("doc_id") > cut)
    val si = new StreamingIngest
    si.processBatch(early)
    // before the late batch: the funnel over the SHORTER book, with the
    // cluster artifact mined from exactly that book
    assert(si.report(clustersOf(early)) == batchWant(early, clustersOf(early)))
    si.processBatch(late)
    val cl = DedupQueries.minedClusters(spark, sf)
    assert(si.report(cl) == batchWant(docs, cl))
  }
}
