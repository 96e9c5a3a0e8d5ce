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
    * (count desc, value asc): columns (value, n, rk). NULL values are
    * excluded on every path (sketch, recount, fallback) — the same
    * contract as Quantiles.perGroup, and path-independent. */
  def topK(df: DataFrame, valueCol: String, k: Int,
           capacity: Int = 4096): DataFrame = {
    require(k >= 1, s"heavy_hitters: k $k < 1")
    require(capacity >= k, s"heavy_hitters: capacity $capacity < k $k")
    val spark = df.sparkSession
    import spark.implicits._
    val nonNull = df.select(col(valueCol).cast("long").as("value"))
      .where(col("value").isNotNull)
    val vals: Dataset[Long] = nonNull.as[Long]
    // one sketch pass emits BOTH the MG summaries and the per-partition
    // row count (the `rows` field, non-zero on exactly one row per
    // non-empty partition) — n needs no dedicated count() scan
    val summaries = vals.mapPartitions { it =>
      val mg = new scala.collection.mutable.HashMap[Long, Long]()
      var rows = 0L
      while (it.hasNext) {
        val v = it.next()
        rows += 1
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
      val entries = mg.iterator.map { case (v, c) => (v, c, 0L) }
      if (rows == 0L) entries else entries ++ Iterator((0L, 0L, rows))
    }.toDF("value", "est", "rows")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = summaries.agg(coalesce(sum("rows"), lit(0L))).first().getLong(0)
    // the distinct candidate set is all the merge needs — the summed
    // estimate would be discarded anyway (the recount below is exact)
    val candidates = summaries.where(col("est") > 0).select("value").distinct()
    // exact recount of candidates only; candidate set is ≤ P·c rows
    val exact = nonNull
      .join(broadcast(candidates), "value")
      .groupBy("value").agg(count(lit(1)).as("n"))
    val top = exact.orderBy(desc("n"), col("value")).limit(k)
      .as[(Long, Long)].collect()
    summaries.unpersist()
    val bound = n.toDouble / capacity
    // certify only a FULL top-k whose k-th exact count beats the bound —
    // with fewer candidates than k we can't exclude tail values
    val certified = top.length == k && top.last._2 > bound
    val ranked =
      if (certified) top.toSeq.toDF("value", "n")
      else // bound can't separate candidates from the tail: exact fallback
        nonNull
          .groupBy("value").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("value")).limit(k)
    ranked
      .withColumn("rk", row_number().over(
        BoundedWindow.keyed(col("value")).orderBy(desc("n"), col("value"))))
      .orderBy("rk")
  }
}
