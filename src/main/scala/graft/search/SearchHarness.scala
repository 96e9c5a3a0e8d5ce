package graft.search

import graft.filters.FilterDsl
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-query evaluation harness — the reference's run.py/metrics loop
  * (src/baselines/post_filter.py:117-126 emits latency_ms, scored_vectors,
  * filter_selectivity, kth_at_stop per query; src/harness/run.py writes
  * results.jsonl). Driver-side coordination is inherent here, exactly like
  * the reference harness: each query is one (or a few) distributed jobs,
  * the stats are O(1) per query.
  */
object SearchHarness {

  case class QueryStats(
      qid: Long,
      backend: String,
      k: Int,
      latency_ms: Double,
      scored_vectors: Long,
      filter_selectivity: Double,
      kth_at_stop: Double,
      n_results: Long)

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e6)
  }

  /** pre_filter backend: filter → score survivors → top-K.
    * scored_vectors = rows passing the filter (what got scored). */
  def preFilter(emb: DataFrame, hq: HybridQuery, total: Long): QueryStats = {
    val spec = FilterDsl.parseJson(hq.filters)
    val pred = if (spec.isEmpty) None else Some(FilterDsl.compile(emb, spec))
    val nAllowed = pred.map(p => emb.where(p).count()).getOrElse(total)
    val (rows, ms) = timed {
      VectorSearch.topK(emb, hq.qvec, hq.k, pred).collect()
    }
    QueryStats(hq.qid, "pre_filter", hq.k, ms, nAllowed,
      VecMath.round6(nAllowed.toDouble / total),
      if (rows.isEmpty) Double.NaN else rows.last.getDouble(1),
      rows.length)
  }

  /** post_filter backend: rank all → ladder → filter. scored_vectors =
    * the stopping rung K′ (candidates examined), kth_at_stop = the K-th
    * kept score at the stopping rung (reference post_filter.py:66-90). */
  def postFilter(emb: DataFrame, hq: HybridQuery, total: Long,
                 ladder: Seq[Int] = Seq(200, 500, 1000)): QueryStats = {
    val spec = FilterDsl.parseJson(hq.filters)
    val pred = if (spec.isEmpty) org.apache.spark.sql.functions.lit(true)
               else FilterDsl.compile(emb, spec)
    val nAllowed = emb.where(pred).count()
    val (out, ms) = timed {
      import org.apache.spark.sql.functions._
      val spark = emb.sparkSession
      import spark.implicits._
      val maxRung = ladder.max
      val cand = VectorSearch.withScore(emb, hq.qvec)
        .withColumn("pass", coalesce(pred, lit(false)))
        .select(col("vec_id").cast("long"), col("score"), col("pass"))
        .orderBy(desc("score"), col("vec_id"))
        .limit(maxRung)
        .as[(Long, Double, Boolean)]
        .collect()
      val chosen = ladder.sorted
        .find(kp => cand.take(kp).count(_._3) >= hq.k)
        .getOrElse(maxRung)
      (chosen, cand.take(chosen).filter(_._3).take(hq.k))
    }
    val (rung, kept) = out
    QueryStats(hq.qid, "post_filter", hq.k, ms, rung,
      VecMath.round6(nAllowed.toDouble / total),
      if (kept.isEmpty) Double.NaN else kept.last._2,
      kept.length)
  }

  /** Run every query in the set through both baseline backends; one row of
    * stats per (query, backend) — the reference's results.jsonl shape. */
  def runAll(spark: SparkSession, emb: DataFrame,
             qs: Seq[HybridQuery] = QuerySet.default): DataFrame = {
    import spark.implicits._
    val total = emb.count()
    val stats = qs.flatMap { hq =>
      Seq(preFilter(emb, hq, total), postFilter(emb, hq, total))
    }
    spark.createDataset(stats).toDF().orderBy("qid", "backend")
  }
}
