package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event queries (SURVEY.md §2
  * #36/#38). The batch versions in EventQueries are the oracle-checked
  * ground truth; these produce the same rows on the same data, verified
  * by StreamingSpec with MemoryStream.
  */
object EventStreaming {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionOut(user_id: Long, sid: Long, start_us: Long, end_us: Long,
                        n_events: Long, sum_value_us: Long)

  /** Per-user state: next session id (persists across session closes, so
    * numbering matches the batch cumulative-sum ids) and the open session,
    * if any. value sums are kept in exact integer micro-units (6 dp) so
    * streaming output equals the batch DECIMAL(18,6) sums bit-for-bit. */
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, sumUs: Long)
  case class UserState(nextSid: Long, open: Option[OpenSession])

  /** Streaming exact dedup — the stream twin of Dedup.exact: drop
    * documents whose content hash was already seen, with state BOUNDED by
    * the event-time watermark (dropDuplicatesWithinWatermark) — the only
    * shape that survives an unbounded corpus stream; an unbounded
    * dropDuplicates would grow state forever. Expects (ts, text, ...)
    * columns. */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("h", md5(col("text").cast("binary")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("h")

  /** Streaming NEAR-dup dedup — the stream twin of simhash dedup (#23):
    * drop documents whose 64-bit SimHash signature was already seen within
    * the watermark, so permuted/re-worded near-copies collapse, not just
    * byte-identical ones. The signature is the same row-local codegen'd
    * expression the batch path uses (stateless per row), and
    * dropDuplicatesWithinWatermark bounds the signature state — the only
    * shape that survives an unbounded stream. */
  def nearDedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("sig", graft.functions.VectorFunctions.simHash64(
        graft.functions.VectorFunctions.tokenSetIds(col("text"), 1)))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("sig")

  /** Streaming corpus curation — the stream twin of the batch curation
    * pipeline (#50): the SAME row-local quality and language gate
    * expressions (shared Columns — batch and stream cannot drift),
    * composed with watermark-bounded SimHash near-dedup. The batch
    * pipeline's cluster keep-list becomes "first representative per
    * signature within the watermark" — the arrival-order representative,
    * which equals the batch min-id representative whenever the stream
    * replays in id order (the spec's assertion). Stateless gates + one
    * bounded-state dedup: survives an unbounded corpus stream. */
  def curateStream(docs: DataFrame, watermark: String = "1 hour",
                   minQuality: Double = 0.6, wantLang: String = "en"): DataFrame =
    docs
      .withColumn("quality_score", graft.text.TextAnalysis.qualityScore(col("text")))
      .withColumn("lang_pred", graft.text.TextAnalysis.langPred(col("text")))
      .where(col("quality_score") >= minQuality && col("lang_pred") === wantLang)
      .withColumn("sig", graft.functions.VectorFunctions.simHash64(
        graft.functions.VectorFunctions.tokenSetIds(col("text"), 1)))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("sig")

  /** #36 streaming tumbling-window counts with watermark — the stream twin
    * of EventQueries.eventsWindow (same window, same aggregates). */
  def windowedCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  def microUnits(v: Double): Long =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .underlying.unscaledValue.longValueExact

  /** #38 gap sessionization with flatMapGroupsWithState + event-time
    * timeout: closed sessions emit as soon as a later event (or the
    * watermark) proves the gap; the open session emits on timeout.
    * Semantics match EventQueries.eventsSession (30-min default gap).
    */
  def sessionize(events: Dataset[Event], gapUs: Long = 30L * 60 * 1000000)
                (implicit spark: org.apache.spark.sql.SparkSession): Dataset[SessionOut] = {
    import spark.implicits._

    def fn(userId: Long, it: Iterator[Event], state: GroupState[UserState]): Iterator[SessionOut] = {
      var out = List.empty[SessionOut]
      def close(sid: Long, s: OpenSession): Unit =
        out ::= SessionOut(userId, sid, s.startUs, s.lastUs, s.n, s.sumUs)

      val prior = state.getOption.getOrElse(UserState(1L, None))
      if (state.hasTimedOut) {
        prior.open.foreach(close(prior.nextSid, _))
        // keep the counter so later sessions continue the batch numbering
        state.update(UserState(prior.nextSid + 1, None))
        state.setTimeoutTimestamp(Long.MaxValue / 2000) // effectively never
      } else {
        val evs = it.toSeq.sortBy(e => (e.ts.getTime * 1000, e.event_id))
        var sid = prior.nextSid
        var cur = prior.open.orNull
        evs.foreach { e =>
          val us = e.ts.getTime * 1000 // ms → µs (testdata is µs-truncated)
          if (cur == null) {
            cur = OpenSession(us, us, 1L, microUnits(e.value))
          } else if (us - cur.lastUs > gapUs) {
            close(sid, cur)
            sid += 1
            cur = OpenSession(us, us, 1L, microUnits(e.value))
          } else {
            cur = cur.copy(lastUs = us, n = cur.n + 1, sumUs = cur.sumUs + microUnits(e.value))
          }
        }
        state.update(UserState(sid, Option(cur)))
        if (cur != null) state.setTimeoutTimestamp(cur.lastUs / 1000 + gapUs / 1000)
      }
      out.reverseIterator
    }

    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
