package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental SCD2 (queries.QualityQueries.scd2Events' twin): the
  * per-(user, day) sufficient statistic is the DAY-WINNING event — the
  * (ts, event_id)-max observation and its tier. "Keep the larger
  * (ts, event_id)" is a commutative, associative, IDEMPOTENT merge, so
  * late batches, duplicate deliveries and out-of-order days all absorb
  * exactly — including a late row that RETROACTIVELY changes an already-
  * reported day's tier and thereby splits or merges islands, the case a
  * watermark-windowed aggregator can never reopen. `report()` replays
  * the batch operator's gaps-and-islands compression on the bounded
  * (users × days) state.
  */
final class StreamingScd2 {

  // (user, day) -> (tsMicros, event_id, tier) of the day's current winner
  private val state =
    scala.collection.mutable.HashMap.empty[(Long, java.sql.Date), (Long, Long, Long)]

  def processBatch(batch: DataFrame): Unit = synchronized {
    // per-batch pre-reduction: ONE distributed aggregate; only the
    // (user, day) winners cross to the driver (the state's own grain)
    val rows = batch
      .select(col("user_id"), to_date(col("ts")).as("day"),
        unix_micros(col("ts").cast("timestamp")).as("tsm"), col("event_id"),
        graft.queries.QualityQueries.scd2Tier.as("tier"))
      .filter(col("tier").isNotNull)
      .groupBy("user_id", "day")
      .agg(max(struct(col("tsm"), col("event_id"), col("tier"))).as("w"))
      .select(col("user_id"), col("day"),
        col("w.tsm"), col("w.event_id"), col("w.tier"))
      .collect()
    rows.foreach { r =>
      val k = (r.getLong(0), r.getDate(1))
      val v = (r.getLong(2), r.getLong(3), r.getLong(4))
      // full (tsm, event_id, tier) comparison — bitwise-identical to the
      // batch max(struct(tsm, event_id, tier)): tier participates in the
      // tie-break, so duplicate deliveries sharing (ts, event_id) but
      // carrying mutated tiers merge arrival-order-independently.
      state.get(k) match {
        case Some(old) if Ordering[(Long, Long, Long)].compare(old, v) >= 0 => ()
        case _ => state.update(k, v)
      }
    }
  }

  /** (user_id, tier, valid_from, valid_to, n_days, is_current) — the
    * #281 scd2_events schema, ordered by (user, valid_from). */
  def report(): Seq[(Long, Long, java.sql.Date, java.sql.Date, Long, Boolean)] =
    synchronized {
      state.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1).flatMap { case (u, entries) =>
        val days = entries
          .map { case ((_, d), (_, _, tier)) => (d, tier) }
          .sortBy(_._1.getTime)
        val runs = scala.collection.mutable.ArrayBuffer
          .empty[(Long, java.sql.Date, java.sql.Date, Long)] // tier, from, to, n
        days.foreach { case (d, tier) =>
          if (runs.nonEmpty && runs.last._1 == tier) {
            val l = runs.last
            runs(runs.size - 1) = (tier, l._2, d, l._4 + 1)
          } else runs += ((tier, d, d, 1L))
        }
        val maxTo = runs.map(_._3.getTime).max
        runs.map { case (tier, from, to, n) =>
          (u, tier, from, to, n, to.getTime == maxTo)
        }
      }
    }
}
