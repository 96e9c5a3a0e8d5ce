package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline compositions (SURVEY.md §2 #49–50). The DuckDB
  * oracle gate value-checks them; these assert the structural invariants.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("split_train_val: deterministic, total, ~95/5, stable across runs") {
    val a = PipelineQueries.splitTrainVal(spark, sf).as[(Long, String)].collect()
    val b = PipelineQueries.splitTrainVal(spark, sf).as[(Long, String)].collect()
    assert(a.toSeq == b.toSeq) // same assignment every run, no seed drift
    val n = Tables.documents(spark, sf).count()
    assert(a.length == n) // total: every doc gets exactly one bucket
    val trainFrac = a.count(_._2 == "train").toDouble / n
    assert(trainFrac > 0.85 && trainFrac < 1.0, s"train fraction $trainFrac")
    assert(a.exists(_._2 == "val"), "validation bucket empty")
  }

  test("corpus_curate: kept docs pass every gate; dropped dup members absent") {
    val docs = Tables.documents(spark, sf)
    val kept = PipelineQueries.corpusCurate(spark, sf)
      .as[(Long, Double, String)].collect()
    assert(kept.nonEmpty)
    kept.foreach { case (_, q, l) => assert(q >= 0.6 && l == "en") }
    // no kept doc is a non-representative member of a dup cluster
    val dropped = graft.dedup.Dedup.clusters(
        graft.dedup.Dedup.jaccardPairs(docs, queries.DedupQueries.JaccardTau))
      .where(col("cluster_id") =!= col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept.forall(k => !dropped(k._1)))
    // and it's a strict filter: fewer rows than the corpus
    assert(kept.length < docs.count())
  }
}
