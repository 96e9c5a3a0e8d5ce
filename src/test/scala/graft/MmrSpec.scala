package graft

import graft.search.{Mmr, QueryVectors, VecMath, VectorSearch}
import org.scalatest.funsuite.AnyFunSuite

/** MMR contracts: reduction to plain top-k at λ=1, the dedup-slot
  * property on a corpus with duplicate vectors, determinism, and the
  * greedy invariants (first pick = top-1, selected ⊆ candidates). */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, sf)
  private val q0 = QueryVectors.qvec(0)

  test("lambda=1 reduces MMR to the exact top-k order") {
    val got = Mmr.rerank(emb, q0, 10, n = 50, lambda = 1.0)
      .select("vec_id").as[Long].collect().toSeq
    val want = VectorSearch.topK(emb, q0, 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == want)
  }

  test("duplicate top hits cannot occupy two slots at moderate lambda") {
    // a and a' are the same vector (both top by relevance); b is close
    // behind but genuinely diverse. Plain top-2 = {a, a'}; MMR must swap
    // the duplicate out. a is deliberately NOT parallel to q: with a ∥ q
    // every candidate's sim-to-a equals its relevance and the λ=0.5
    // objective ties at exactly 0 for all — margins here are ≫ the 6-dp
    // rounding grid, so the displacement is forced, not an ulp artifact.
    val q = Array(1f, 0f)
    val data = Seq(
      (0L, Array(0.99f, 0.14106736f)),   // a        (rel 0.99, unit)
      (1L, Array(0.99f, 0.14106736f)),   // a' (exact duplicate)
      (2L, Array(0.95f, -0.31224989f)))  // b        (rel 0.95, sim-to-a ≈ 0.896)
    val df = data.toDF("vec_id", "embedding")
    val plain = VectorSearch.topK(df, q, 2).select("vec_id").as[Long].collect().toSet
    assert(plain == Set(0L, 1L))
    val mmr = Mmr.rerank(df, q, 2, n = 3, lambda = 0.5)
      .select("vec_id").as[Long].collect().toSeq
    // a': 0.5·0.99 − 0.5·1.0 = −0.005 < b: 0.5·0.95 − 0.5·0.8965 ≈ 0.0268
    assert(mmr == Seq(0L, 2L)) // duplicate a' displaced by diverse b
  }

  test("first pick is the exact top-1; selected set is within candidates, no dups") {
    val out = Mmr.rerank(emb, q0, 10, n = 50, lambda = 0.7)
      .as[(Int, Long, Double, Double)].collect()
    assert(out.length == 10)
    assert(out.map(_._1).toSeq == (1 to 10))
    val top1 = VectorSearch.topK(emb, q0, 1).select("vec_id").as[Long].first()
    assert(out.head._2 == top1)
    val candIds = VectorSearch.topK(emb, q0, 50).select("vec_id").as[Long].collect().toSet
    assert(out.map(_._2).forall(candIds.contains))
    assert(out.map(_._2).distinct.length == 10)
    // mmr_score is non-increasing? (not guaranteed by the greedy in
    // general once penalties shift, but relevance of pick 1 bounds all)
    assert(out.head._4 >= out.map(_._4).max - 1e-9)
  }

  test("diversity: max pairwise sim among MMR picks <= among plain top-k") {
    def maxPairSim(ids: Seq[Long]): Double = {
      val vecs = emb.where(org.apache.spark.sql.functions.col("vec_id").isin(ids: _*))
        .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
      val vs = ids.map(vecs)
      (for { i <- vs.indices; j <- i + 1 until vs.size }
        yield VecMath.dot(vs(i), vs(j))).max
    }
    val plain = VectorSearch.topK(emb, q0, 10).select("vec_id").as[Long].collect().toSeq
    val mmr = Mmr.rerank(emb, q0, 10, n = 50, lambda = 0.5)
      .select("vec_id").as[Long].collect().toSeq
    assert(maxPairSim(mmr) <= maxPairSim(plain) + 1e-9)
  }

  test("deterministic across invocations") {
    val a = Mmr.rerank(emb, q0, 10).collect().toSeq
    val b = Mmr.rerank(emb, q0, 10).collect().toSeq
    assert(a == b)
  }
}
