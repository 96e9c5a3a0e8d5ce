package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact distributed heavy hitters (top-k most frequent values) without a
  * full-cardinality shuffle — the two-pass sketch-then-verify shape:
  *
  *  1. **Candidates**: per-partition Misra–Gries summaries (capacity c,
  *     the deterministic frequent-items sketch — MG'82) merged by value.
  *     The merged estimate undercounts any true count by at most n/c, and
  *     every value with true count > n/c is GUARANTEED present (a value
  *     absent from a partition's summary lost ≤ n_p/c decrements there;
  *     summed over partitions that is ≤ n/c). Summary size is ≤ c entries
  *     per partition — the shuffle carries O(P·c) rows, never one row per
  *     distinct value. When a partition sees ≤ c distinct values the MG
  *     loop never decrements, so summaries — and the merge — are exact.
  *  2. **Verify**: ONE exact recount of the candidate set only (broadcast
  *     semi-join, map-side-combined count), then the top-k of those exact
  *     counts. CERTIFICATION: if the k-th candidate's exact count is
  *     strictly greater than n/c, no non-candidate (true count ≤ n/c) can
  *     belong to the top-k, so the result is provably exact. If the bound
  *     cannot certify (near-uniform data with cardinality ≫ c), fall back
  *     to the plain full aggregation — the result is ALWAYS exact; only
  *     the shuffle volume is adaptive.
  *
  * At 100 TB this is the difference between shuffling billions of
  * distinct keys to rank the top 20 and shuffling ~P·c sketch rows plus
  * one broadcast-pruned recount; the skewed distributions heavy-hitter
  * queries target are exactly the ones the bound certifies. Ranking is
  * (count desc, value) with TakeOrdered — never a global sort.
  */
object HeavyHitters {

  /** Exact top-k most frequent values of `valueCol` (long), ranked by
    * (count desc, value asc): columns (value, n, rk). */
  def topK(df: DataFrame, valueCol: String, k: Int,
           capacity: Int = 4096): DataFrame = {
    require(k >= 1, s"heavy_hitters: k $k < 1")
    require(capacity >= k, s"heavy_hitters: capacity $capacity < k $k")
    val spark = df.sparkSession
    import spark.implicits._
    val vals: Dataset[Long] = df.select(col(valueCol).cast("long")).as[Long]
    val n = vals.count()
    val summaries = vals.mapPartitions { it =>
      val mg = new scala.collection.mutable.HashMap[Long, Long]()
      while (it.hasNext) {
        val v = it.next()
        mg.get(v) match {
          case Some(c) => mg.update(v, c + 1)
          case None =>
            if (mg.size < capacity) mg.update(v, 1L)
            else {
              // decrement-all: drop zeros; O(c) amortized per c arrivals
              val dead = mg.iterator.collect { case (key, 1L) => key }.toList
              mg.mapValuesInPlace((_, c) => c - 1)
              dead.foreach(mg.remove)
            }
        }
      }
      mg.iterator
    }.toDF("value", "est")
    val candidates = summaries.groupBy("value")
      .agg(sum("est").as("est"))
      .select("value")
    // exact recount of candidates only; candidate set is ≤ P·c rows
    val exact = df.select(col(valueCol).cast("long").as("value"))
      .join(broadcast(candidates), "value")
      .groupBy("value").agg(count(lit(1)).as("n"))
    val top = exact.orderBy(desc("n"), col("value")).limit(k)
      .as[(Long, Long)].collect()
    val bound = n.toDouble / capacity
    // certify only a FULL top-k whose k-th exact count beats the bound —
    // with fewer candidates than k we can't exclude tail values
    val certified = top.length == k && top.last._2 > bound
    val ranked =
      if (certified) top.toSeq.toDF("value", "n")
      else // bound can't separate candidates from the tail: exact fallback
        df.select(col(valueCol).cast("long").as("value"))
          .groupBy("value").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("value")).limit(k)
    ranked
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(desc("n"), col("value"))))
      .orderBy("rk")
  }
}
