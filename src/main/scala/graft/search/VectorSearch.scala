package graft.search

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid vector search operators, Spark-first.
  *
  * Scores are rounded to 6 dp BEFORE ranking, with the id as tiebreak —
  * this makes every ranking fully deterministic and immune to last-ulp
  * summation differences across engines (oracle parity), while 1e-6
  * resolution is far below any meaningful similarity gap.
  *
  * Scale notes: `orderBy(...).limit(k)` plans as TakeOrderedAndProject —
  * a per-partition heap + O(k) driver merge, never a global sort. The
  * query side is always broadcast; the embedding side streams through
  * whole-stage-codegen'd scoring.
  */
object VectorSearch {

  /** Score every row of `emb` against the single-row `query(qvec)` frame. */
  private def scored(emb: DataFrame, query: DataFrame): DataFrame =
    emb.crossJoin(broadcast(query))
      .withColumn("score", round(dot(col("embedding"), col("qvec")), 6))

  /** Brute-force top-K inner product, optionally within a filtered subset.
    * The reference's `exact` / `pre_filter` backends
    * (src/eval/oracle.py:36, src/baselines/pre_filter.py:7): filter first,
    * score only survivors — the filter reaches the parquet scan.
    */
  def topK(emb: DataFrame, query: DataFrame, k: Int, pred: Option[Column] = None): DataFrame = {
    val base = pred.map(emb.where).getOrElse(emb)
    scored(base, query)
      .select(col("vec_id"), col("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(k)
  }

  /** Post-filter baseline (reference src/baselines/post_filter.py:17):
    * rank ALL vectors by similarity, take the top K′ as candidates, apply
    * the filter, and widen K′ up the ladder until ≥K survive (or the
    * ladder is exhausted). Returns the top-K survivors.
    *
    * The ladder loop is driver-coordinated (≤ ladder.size tiny jobs), each
    * rung a distributed TakeOrdered — same shape as the reference's
    * retry loop around its ANN index.
    */
  def postFilterLadder(
      emb: DataFrame,
      query: DataFrame,
      pred: Column,
      k: Int,
      ladder: Seq[Int] = Seq(200, 500, 1000)): DataFrame = {
    val sc = scored(emb, query).cache()
    try {
      var result: DataFrame = null
      val it = ladder.iterator
      while (result == null && it.hasNext) {
        val kprime = it.next()
        val kept = sc.orderBy(desc("score"), col("vec_id")).limit(kprime).where(pred)
        if (kept.count() >= k || !it.hasNext) {
          result = kept.select(col("vec_id"), col("score"))
            .orderBy(desc("score"), col("vec_id"))
            .limit(k)
        }
      }
      // materialize before unpersisting the candidate cache
      val out = result.localCheckpoint(eager = true)
      out
    } finally sc.unpersist()
  }

  /** Batch kNN join: every query row against every item, keep top-k per
    * query. Queries are broadcast; ranking shuffles once on qid.
    * At 100 TB the IVF path (Ivf.scala) bounds the scored set instead.
    */
  def knnJoin(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(desc("score"), col("vec_id"))
    emb.crossJoin(broadcast(queries))
      .withColumn("score", round(dot(col("embedding"), col("qvec")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("score"))
      .orderBy(col("qid"), col("rank"))
  }

  /** recall@K (reference src/eval/metrics.py): |pred ∩ truth| / K per qid.
    * Both inputs carry (qid, vec_id). */
  def recallAtK(pred: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val hits = pred.join(truth, Seq("qid", "vec_id"), "inner")
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    truth.select("qid").distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        round(coalesce(col("hits"), lit(0L)) / lit(k.toDouble), 6).as("recall"))
      .orderBy("qid")
  }
}
