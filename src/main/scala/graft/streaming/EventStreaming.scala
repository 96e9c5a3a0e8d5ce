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

  /** Exact event-time in microseconds. `Timestamp.getTime` TRUNCATES to
    * milliseconds and the driver testdata carries µs precision — any
    * state math must go through these two or it silently drops µs. */
  def tsUs(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  def usTs(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  case class AsOfOut(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                     value: Double, click_ts: Option[java.sql.Timestamp],
                     click_value: Option[Double])
  case class LatestClick(us: Long, value: Double)

  /** #72 streaming as-of join — the stream twin of the batch
    * `AsOfJoin.backward` attribution query (events_asof): each purchase is
    * emitted enriched with the latest click at-or-before it by the same
    * user. State is ONE (ts, value) per user — the bounded
    * enrich-by-latest-dimension shape (O(#users), not O(#events)) — and
    * ties at equal ts keep the max value, matching the batch side's
    * per-(user, ts) pre-aggregate. Equality with the batch plan holds
    * under (ts, click-before-purchase) ordered replay (the spec's
    * assertion); out-of-order WITHIN a micro-batch is handled by the
    * per-group sort, out-of-order ACROSS batches is the stream's
    * approximation, exactly as with the sessionization twin. */
  def asofStream(events: Dataset[Event])
                (implicit spark: org.apache.spark.sql.SparkSession): Dataset[AsOfOut] = {
    import spark.implicits._

    def fn(userId: Long, it: Iterator[Event],
           state: GroupState[LatestClick]): Iterator[AsOfOut] = {
      var cur = state.getOption.orNull
      val out = List.newBuilder[AsOfOut]
      it.toSeq
        .filter(e => e.event_type == "click" || e.event_type == "purchase")
        .sortBy(e => (tsUs(e.ts), if (e.event_type == "click") 0 else 1, e.event_id))
        .foreach { e =>
          if (e.event_type == "click") {
            val us = tsUs(e.ts)
            if (cur == null || us > cur.us) cur = LatestClick(us, e.value)
            else if (us == cur.us && e.value > cur.value) cur = LatestClick(us, e.value)
          } else out += AsOfOut(e.event_id, userId, e.ts, e.value,
            Option(cur).map(c => usTs(c.us)),
            Option(cur).map(_.value))
        }
      if (cur != null) state.update(cur)
      out.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

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
        val evs = it.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
        var sid = prior.nextSid
        var cur = prior.open.orNull
        evs.foreach { e =>
          val us = tsUs(e.ts) // exact µs (getTime would truncate to ms)
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

  case class DedupKeep(event_id: Long, user_id: Long, event_type: String)

  /** Streaming twin of #205 events_dedup_window: per-(user, type) state is
    * ONE last-seen timestamp (µs) — emit the event iff it lands ≥ 5 min
    * after the key's previous event, update the state either way (the
    * batch lag-rule compares against the previous RAW event, kept or
    * dropped, which is exactly what a single last-ts state replays).
    * Equality with the batch operator holds under (ts, event_id) ordered
    * replay; out-of-order WITHIN a micro-batch is handled by the
    * per-group sort, across batches is the stream's approximation — the
    * sessionization twin's contract. State is O(#active keys), bytes per
    * key constant. */
  def dedupWindowStream(events: Dataset[Event], windowUs: Long = 5L * 60 * 1000000)
                       (implicit spark: org.apache.spark.sql.SparkSession): Dataset[DedupKeep] = {
    import spark.implicits._

    def fn(key: (Long, String), it: Iterator[Event],
           state: GroupState[Long]): Iterator[DedupKeep] = {
      var last = state.getOption.getOrElse(Long.MinValue)
      val out = List.newBuilder[DedupKeep]
      it.toSeq.sortBy(e => (tsUs(e.ts), e.event_id)).foreach { e =>
        val us = tsUs(e.ts)
        if (last == Long.MinValue || us - last >= windowUs)
          out += DedupKeep(e.event_id, key._1, key._2)
        last = us
      }
      state.update(last)
      out.result().iterator
    }

    events
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
