package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR'98)
  * — the standard diversity pass a retrieval stack runs over its top-N
  * before returning top-k: greedily pick the candidate maximizing
  *
  *   λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s)
  *
  * so near-duplicate hits (the thing a dedup'd-but-not-perfectly corpus
  * still serves) can't occupy multiple result slots.
  *
  * Scale shape: ONE distributed TakeOrdered produces the top-N candidate
  * set (ids + vectors + scores, N·dim floats — bounded by contract, the
  * postFilterLadder collect discipline); the greedy selection is
  * inherently sequential in k, so it runs driver-side over those ≤N rows
  * — k·N dot products of driver math, never a distributed iteration.
  * Determinism: ties break on lowest vec_id; every comparison inside the
  * greedy loop happens on 6-dp-ROUNDED values (relevance comes rounded
  * from withScore; each pairwise sim and each MMR objective is rounded
  * before compare) — the round-before-rank discipline, so the loop's
  * choices are reproducible by any engine that derives the same rounded
  * doubles. The DuckDB oracle (vec_mmr) replays the identical greedy via
  * a recursive CTE and hash-matches row for row.
  */
object Mmr {

  /** Re-rank the top-`n` candidates of `emb` for `qvec` into a diverse
    * top-`k`: (rank, vec_id, relevance, mmr_score). */
  def rerank(emb: DataFrame, qvec: Array[Float], k: Int, n: Int = 50,
             lambda: Double = 0.7): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cands = VectorSearch.withScore(emb, qvec)
      .select(col("vec_id"), col("embedding"), col("score"))
      .orderBy(desc("score"), col("vec_id")).limit(n)
      .as[(Long, Array[Float], Double)].collect()
    greedy(cands, k, lambda)
      .toDF("rank", "vec_id", "relevance", "mmr_score")
  }

  /** The greedy MMR core over an already-bounded candidate list
    * (id, vector, 6dp-rounded relevance), in tie-break order (the
    * caller's ranking order — earlier index wins ties): returns
    * (rank, id, relevance, mmr_score). Shared by rerank (dense-score
    * relevance) and pipeline_serve (fused-RRF relevance); both oracles
    * replay this exact loop as a recursive CTE. */
  def greedy(cands: Array[(Long, Array[Float], Double)], k: Int,
             lambda: Double): Seq[(Int, Long, Double, Double)] = {
    require(lambda >= 0.0 && lambda <= 1.0, s"mmr: lambda $lambda outside [0,1]")
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    val chosen = scala.collection.mutable.Set.empty[Int]
    // max sim of each remaining candidate to the selected set, updated
    // incrementally: one pass per pick, k·N dots total
    val maxSim = Array.fill(cands.length)(0.0)
    while (selected.size < math.min(k, cands.length)) {
      var best = -1
      var bestVal = Double.NegativeInfinity
      var i = 0
      while (i < cands.length) {
        if (!chosen.contains(i)) {
          val v = VecMath.round6(lambda * cands(i)._3 - (1.0 - lambda) * maxSim(i))
          // strict > with ascending index: ties go to the higher-ranked
          // (then lower-vec_id) candidate — cands is already in that order
          if (v > bestVal) { bestVal = v; best = i }
        }
        i += 1
      }
      chosen += best
      val (vid, vec, rel) = cands(best)
      selected += ((vid, rel, bestVal))
      var j = 0
      while (j < cands.length) {
        if (!chosen.contains(j)) {
          val s = VecMath.round6(VecMath.dot(cands(j)._2, vec))
          if (s > maxSim(j)) maxSim(j) = s
        }
        j += 1
      }
    }
    selected.zipWithIndex
      .map { case ((vid, rel, mmr), idx) => (idx + 1, vid, rel, mmr) }
      .toSeq
  }
}
