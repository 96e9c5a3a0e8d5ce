package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion — the standard way to combine a DENSE (vector
  * top-N) and a SPARSE (BM25 top-N) candidate list into one hybrid
  * ranking (Cormack/Clarke/Buettcher SIGIR'09; every production hybrid
  * search ships this or a learned variant):
  *
  *   rrf(d) = Σ_lists 1 / (c + rank_list(d)),   c = 60
  *
  * Rank-based, so the two retrievers' incomparable score scales never
  * meet — only their orderings do. Scale shape: the heavy work is
  * candidate GENERATION (each side its own pruned plan — TakeOrdered for
  * dense, filtered-postings scan for sparse); fusion itself touches
  * ≤ 2N rows, so the single-partition rank windows and the join are
  * bounded by contract, never corpus-sized.
  */
object Fusion {

  val C = 60

  /** Rank a bounded candidate list: (idCol, rank from 1) ordered by
    * scoreCol DESC with idCol tiebreak. The caller guarantees `cands` is
    * top-N-bounded (the unpartitioned window is a deliberate ≤N-row
    * single task). Scores must already be rounded (round-before-rank). */
  def ranked(cands: DataFrame, idCol: String, scoreCol: String): DataFrame =
    cands.select(col(idCol).as("id"),
      row_number().over(graft.operators.BoundedWindow.keyed(col(idCol))
        .orderBy(desc(scoreCol), col(idCol))).as("rank"))

  /** Fuse two ranked lists (full outer on id — a doc found by only one
    * retriever still scores). Absent ranks surface as 0, contributing
    * nothing. Returns top-k by (rrf DESC, id). */
  def rrf(dense: DataFrame, sparse: DataFrame, k: Int, c: Int = C): DataFrame = {
    val d = dense.withColumnRenamed("rank", "dense_rank")
    val s = sparse.withColumnRenamed("rank", "sparse_rank")
    val contrib = (r: String) =>
      when(col(r) > 0, lit(1.0) / (lit(c.toDouble) + col(r))).otherwise(lit(0.0))
    d.join(s, Seq("id"), "full_outer")
      .na.fill(0, Seq("dense_rank", "sparse_rank"))
      .withColumn("rrf", round(contrib("dense_rank") + contrib("sparse_rank"), 6))
      .select(col("id"), col("rrf"), col("dense_rank"), col("sparse_rank"))
      .orderBy(desc("rrf"), col("id"))
      .limit(k)
  }

  /** Rank per-query candidate lists: (qid, id, rank from 1 within qid),
    * ordered by scoreCol DESC with id tiebreak. The caller bounds each
    * query's candidates first (TopKPerKey — bounded heaps, no sort of
    * doomed rows), so the rank window runs over ≤N rows per query. */
  def rankedPerKey(cands: DataFrame, keyCol: String, idCol: String,
                   scoreCol: String): DataFrame =
    cands.select(col(keyCol).as("qid"), col(idCol).as("id"),
      row_number().over(
        Window.partitionBy(keyCol).orderBy(desc(scoreCol), col(idCol))).as("rank"))

  /** Batch RRF — fuse per-query ranked lists for a WHOLE query batch in
    * one plan (the knnJoin symmetry: candidate generation amortizes the
    * corpus passes over the batch, fusion joins on (qid, id) and keeps
    * top-k per query via a per-query window, never a global sort). Both
    * inputs are (qid, id, rank). */
  def rrfBatch(dense: DataFrame, sparse: DataFrame, k: Int, c: Int = C): DataFrame = {
    val d = dense.withColumnRenamed("rank", "dense_rank")
    val s = sparse.withColumnRenamed("rank", "sparse_rank")
    val contrib = (r: String) =>
      when(col(r) > 0, lit(1.0) / (lit(c.toDouble) + col(r))).otherwise(lit(0.0))
    d.join(s, Seq("qid", "id"), "full_outer")
      .na.fill(0, Seq("dense_rank", "sparse_rank"))
      .withColumn("rrf", round(contrib("dense_rank") + contrib("sparse_rank"), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("rrf"), col("id"))))
      .where(col("rk") <= k)
      .select(col("qid"), col("id"), col("rrf"), col("dense_rank"), col("sparse_rank"))
      .orderBy(col("qid"), desc("rrf"), col("id"))
  }
}
