package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming heavy hitters — the mergeable-summaries twin of the batch
  * [[graft.operators.HeavyHitters]] (Agarwal et al., Mergeable Summaries,
  * PODS'12: Misra–Gries summaries MERGE — add counts, then subtract the
  * (c+1)-th largest count and drop non-positives — and the merged summary
  * keeps the SAME n/c error bound over the total stream, as if one pass
  * had seen everything).
  *
  * Per micro-batch: ONE distributed map-side-combined count of the batch
  * (micro-batches are bounded, their distinct-count table is small),
  * merged into O(capacity) driver state. The state never grows past
  * `capacity` entries no matter how many batches or distinct keys stream
  * through — the property that makes trending-key dashboards viable on an
  * unbounded stream. Estimates UNDERCOUNT by at most `totalSeen/capacity`
  * (spec-pinned against an exact replay); any key whose true count
  * exceeds that bound is guaranteed present.
  */
final class StreamingHeavyHitters(valueCol: String, capacity: Int = 4096) {
  require(capacity >= 1, s"streaming heavy hitters: capacity $capacity < 1")

  private val state = scala.collection.mutable.HashMap.empty[Long, Long]
  @volatile private var total = 0L

  /** Absorb one micro-batch; returns nothing — read via [[topK]]. NULL
    * values are excluded — the batch [[graft.operators.HeavyHitters]]
    * contract. */
  def processBatch(batch: DataFrame): Unit = synchronized {
    val counts = batch
      .select(col(valueCol).cast("long").as("value"))
      .where(col("value").isNotNull)
      .groupBy("value")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    total += counts.map(_._2).sum
    counts.foreach { case (v, n) => state.update(v, state.getOrElse(v, 0L) + n) }
    if (state.size > capacity) {
      // mergeable-summaries prune: subtract the (c+1)-th largest count
      val cut = state.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      val dead = state.iterator.collect { case (k, c) if c <= cut => k }.toList
      state.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(state.remove)
    }
  }

  /** Total rows absorbed so far. */
  def totalSeen: Long = total

  /** The guaranteed maximum undercount of any estimate. */
  def errorBound: Double = total.toDouble / capacity

  /** Current top-k by estimated count (desc, value tiebreak). */
  def topK(k: Int): Seq[(Long, Long)] = synchronized {
    state.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)
  }

  /** foreachBatch writer over a streaming frame carrying `valueCol`;
    * `sink` receives (topK snapshot, batchId) after each batch. */
  def writer(stream: DataFrame, k: Int,
             sink: (Seq[(Long, Long)], Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch((df: Dataset[Row], batchId: Long) => {
        processBatch(df.toDF())
        sink(topK(k), batchId)
      })
}
