package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twins of the round-12 monitoring operators — both are
  * ADDITIVE-SUFFICIENT-STATISTICS incremental (the DSIR/quality-probe
  * discipline): the only state is a category- or calendar-bounded count
  * map, each micro-batch contributes one distributed map-side-combined
  * count, and the report derived from the accumulated state is EXACTLY
  * the batch operator's answer over everything ingested (spec-pinned, not
  * approximate). That is what makes corpus-snapshot drift dashboards and
  * volume-anomaly baselines maintainable on an unbounded ingest stream:
  * per batch cost is one bounded aggregate, state never grows past the
  * category/calendar cardinality.
  */

/** Incremental PSI drift (#179 corpus_drift's twin): per-batch one
  * (dim, category, cohort) count over the two watched dimensions, merged
  * additively. `report()` replays corpus_drift's exact arithmetic
  * (add-1 shares rounded 6 dp, then contribution) on the accumulated
  * counts. */
final class StreamingDrift {

  // (dim, category, cohort) -> count; bounded by category cardinality
  private val state = scala.collection.mutable.HashMap.empty[(String, String, Long), Long]

  def processBatch(batch: DataFrame): Unit = synchronized {
    val counts = batch
      .select(pmod(col("doc_id"), lit(2L)).as("cohort"),
        explode(array(
          struct(lit("lang").as("dim"), col("lang").as("category")),
          struct(lit("source").as("dim"), col("source").as("category")))).as("c"))
      .select(col("c.dim"), col("c.category"), col("cohort"))
      .groupBy("dim", "category", "cohort").agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getString(1), r.getLong(2)), r.getLong(3)))
    counts.foreach { case (k, n) => state.update(k, state.getOrElse(k, 0L) + n) }
  }

  private def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** (dim, category, n0, n1, p0, p1, contrib) rows, the #179 schema,
    * ordered (dim, category). */
  def report(): Seq[(String, String, Long, Long, Double, Double, Double)] = synchronized {
    val cats = state.keys.map { case (d, c, _) => (d, c) }.toSeq.distinct
    val byDim = cats.groupBy(_._1)
    cats.sorted.map { case (dim, cat) =>
      val n0 = state.getOrElse((dim, cat, 0L), 0L)
      val n1 = state.getOrElse((dim, cat, 1L), 0L)
      val dimCats = byDim(dim)
      val t0 = dimCats.map { case (d, c) => state.getOrElse((d, c, 0L), 0L) }.sum
      val t1 = dimCats.map { case (d, c) => state.getOrElse((d, c, 1L), 0L) }.sum
      val ncat = dimCats.size
      val p0 = rnd6((n0 + 1).toDouble / (t0 + ncat))
      val p1 = rnd6((n1 + 1).toDouble / (t1 + ncat))
      (dim, cat, n0, n1, p0, p1, rnd6((p0 - p1) * math.log(p0 / p1)))
    }
  }
}

/** Incremental windowed uniques (#188 events_wau_sketch's twin): per
  * micro-batch ONE distributed hll_sketch_agg per day (KBs per day
  * regardless of user count), merged into per-day Datasketches HLL
  * unions on the driver — HLL union is commutative/associative, so
  * batching order and late-arriving days cannot change the state, and
  * window estimates come from unioning the ≤7 daily sketches at report
  * time. The accuracy contract (vs an exact replay) matches the batch
  * operator's: lgK=14 → ~1.6% rsd. */
final class StreamingWau(lgK: Int = 14) {

  import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
  import org.apache.datasketches.memory.Memory

  // day -> running union of every batch's daily sketch
  private val state = scala.collection.mutable.HashMap.empty[java.sql.Date, Union]

  def processBatch(batch: DataFrame): Unit = synchronized {
    val rows = batch
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day").agg(expr(s"hll_sketch_agg(user_id, $lgK)").as("sk"))
      .collect().map(r => (r.getDate(0), r.getAs[Array[Byte]](1)))
    rows.foreach { case (day, bytes) =>
      val u = state.getOrElseUpdate(day, new Union(lgK))
      u.update(HllSketch.heapify(Memory.wrap(bytes)))
    }
  }

  /** (day, wau_estimate) over the trailing 7 days per observed day.
    * Day offsets use calendar-day arithmetic (not epoch-millis division):
    * java.sql.Date values are local midnights, so across a DST
    * spring-forward a 7-day gap is 167h and millis/86400000 floors to 6,
    * which would wrongly admit an 8th day into the window in a
    * DST-observing default timezone. */
  def report(): Seq[(java.sql.Date, Double)] = synchronized {
    val days = state.keys.toSeq.sortBy(_.getTime)
    days.map { d =>
      val u = new Union(lgK)
      days.filter { p =>
        val diff = java.time.temporal.ChronoUnit.DAYS.between(p.toLocalDate, d.toLocalDate)
        diff >= 0 && diff <= 6
      }.foreach(p => u.update(state(p).getResult(TgtHllType.HLL_8)))
      (d, u.getEstimate)
    }
  }
}

/** Incremental corpus manifest (#189's twin): XOR is its own inverse and
  * commutative, so the per-source fingerprint state absorbs micro-batches
  * additively (and could even RETRACT a batch by re-absorbing it) — the
  * report over accumulated state equals corpus_manifest over the union
  * bit-for-bit. State: one (count, chars, hash) triple per source. */
final class StreamingManifest {

  private val state = scala.collection.mutable.HashMap.empty[String, (Long, Long, Long)]

  def processBatch(batch: DataFrame): Unit = synchronized {
    val rows = batch.select(col("source"), col("n_chars"),
      conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("c"),
        expr("bit_xor(h)").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (src, n, c, x) =>
      val (pn, pc, px) = state.getOrElse(src, (0L, 0L, 0L))
      state.update(src, (pn + n, pc + c, px ^ x))
    }
  }

  /** (source, n_docs, total_chars, content_hash), the #189 schema. */
  def report(): Seq[(String, Long, Long, Long)] = synchronized {
    state.toSeq.sortBy(_._1).map { case (s, (n, c, x)) => (s, n, c, x) }
  }
}

/** Incremental EWMA volume baseline (#181 events_ewma's twin): per-batch
  * one (event_type, day) count, merged additively; the smoothing replays
  * on the calendar-bounded accumulated series with the SAME exact
  * decimal-weighted arithmetic (weights rounded 12 dp, integer counts —
  * order-independent sums), so late-arriving events for an already-seen
  * day are absorbed exactly, not approximated. */
final class StreamingEwma(alpha: Double = 0.3) {

  // (event_type, epochDay) -> count; bounded by types x calendar days
  private val state = scala.collection.mutable.HashMap.empty[(String, java.sql.Date), Long]

  def processBatch(batch: DataFrame): Unit = synchronized {
    val counts = batch
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => ((r.getString(0), r.getDate(1)), r.getLong(2)))
    counts.foreach { case (k, n) => state.update(k, state.getOrElse(k, 0L) + n) }
  }

  private def rnd(x: Double, dp: Int): Double = {
    val f = math.pow(10, dp)
    math.floor(x * f + 0.5) / f
  }

  /** (event_type, day, t, x, ewma) rows, the #181 schema, ordered. */
  def report(): Seq[(String, java.sql.Date, Long, Long, Double)] = synchronized {
    val r = 1.0 - alpha
    state.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1).flatMap { case (et, entries) =>
      val series = entries.map { case ((_, day), x) => (day, x) }
        .sortBy(_._1.getTime)
      series.zipWithIndex.map { case ((day, x), t) =>
        val ws = (0 to t).map(i => BigDecimal(rnd(math.pow(r, (t - i).toDouble), 12)))
        val num = ws.zip(series.take(t + 1).map(_._2)).map { case (w, xi) => w * BigDecimal(xi) }.sum
        val den = ws.sum
        (et, day, t.toLong, x, rnd(num.toDouble / den.toDouble, 6))
      }
    }
  }
}

/** Incremental hourly load matrix (#211 events_hourly's twin): state is
  * the (dow, hour) -> (count, value-micro-units) map — bounded at 7x24
  * forever — absorbed additively per micro-batch; value sums kept in
  * exact integer micro-units (the sessionize discipline) so the report
  * equals the batch operator's DECIMAL sums bit-for-bit over everything
  * ingested. */
final class StreamingHourly {

  // (dow, hour) -> (n, value in 1e-2 units); bounded at 7*24 keys
  private val state = scala.collection.mutable.HashMap.empty[(Int, Int), (Long, Long)]

  def processBatch(batch: DataFrame): Unit = synchronized {
    val rows = batch
      .groupBy((weekday(col("ts")) + 1).as("dow"), hour(col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("v"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
    rows.foreach { case (k, (n, v)) =>
      val (pn, pv) = state.getOrElse(k, (0L, 0L))
      state.update(k, (pn + n, pv + v))
    }
  }

  /** (dow, hour, n_events, total_value) rows, the #211 schema, ordered. */
  def report(): Seq[(Int, Int, Long, Double)] = synchronized {
    state.toSeq.sortBy(_._1).map { case ((d, h), (n, v)) =>
      (d, h, n, v.toDouble / 100.0)
    }
  }
}

/** Incremental burstiness (#213 events_burstiness's twin): daily counts
  * are additive (late events for a seen day are absorbed exactly), and
  * the Fano readout needs only the calendar-bounded accumulated series —
  * the report replays the batch operator's exact integer-moment
  * arithmetic on it, so streamed == batch over everything ingested. */
final class StreamingBurstiness {

  private val state = scala.collection.mutable.HashMap.empty[(String, java.sql.Date), Long]

  def processBatch(batch: DataFrame): Unit = synchronized {
    val rows = batch
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getDate(1)), r.getLong(2)))
    rows.foreach { case (k, n) => state.update(k, state.getOrElse(k, 0L) + n) }
  }

  private def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** (event_type, n_days, n_events, mean_daily, var_daily, fano), the
    * #213 schema (types with >1 observed day), ordered by type. */
  def report(): Seq[(String, Long, Long, Double, Double, Double)] = synchronized {
    state.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1).flatMap { case (et, entries) =>
      val xs = entries.map(_._2)
      val n = xs.length.toLong
      if (n <= 1) None
      else {
        val s1 = xs.sum; val s2 = xs.map(x => x * x).sum
        Some((et, n, s1,
          rnd6(s1.toDouble / n),
          rnd6((n * s2 - s1 * s1).toDouble / (n * (n - 1))),
          rnd6((n * s2 - s1 * s1).toDouble / ((n - 1) * s1))))
      }
    }
  }
}

/** Incremental forecast backtest (#250 events_backtest's twin): daily
  * counts are the additive sufficient statistic; the report replays the
  * batch operator's calendar lag-7 join and integer-exact MAE/WAPE on the
  * accumulated series, so the scored days and metrics equal the batch
  * answer over everything ingested — late rows can even change which
  * days are scorable (a newly-seen day d−7 adds day d), and the replay
  * picks that up exactly where a decayed estimator could not. */
final class StreamingBacktest {

  private val state = scala.collection.mutable.HashMap.empty[(String, java.sql.Date), Long]

  def processBatch(batch: DataFrame): Unit = synchronized {
    val rows = batch
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getDate(1)), r.getLong(2)))
    rows.foreach { case (k, n) => state.update(k, state.getOrElse(k, 0L) + n) }
  }

  private def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** (event_type, n_days, mae, wape), the #250 schema, ordered by type;
    * types with no scorable day are absent (matching the batch join). */
  def report(): Seq[(String, Long, Double, Double)] = synchronized {
    state.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1).flatMap { case (et, entries) =>
      val byDay = entries.map { case ((_, d), n) => (d.toLocalDate, n) }.toMap
      val scored = byDay.toSeq.flatMap { case (d, n) =>
        byDay.get(d.minusDays(7)).map(fc => (math.abs(n - fc), fc))
      }
      if (scored.isEmpty) None
      else {
        val sad = scored.map(_._1).sum
        val sf = scored.map(_._2).sum
        Some((et, scored.length.toLong,
          rnd6(sad.toDouble / scored.length), rnd6(sad.toDouble / sf)))
      }
    }
  }
}

/** Incremental CUSUM changepoint (#242 events_changepoint's twin): daily
  * counts are the additive sufficient statistic, so late rows for a seen
  * day are absorbed exactly; the report replays the batch operator's
  * EXACT integer argmax (numerator D·prefix − k·total, earliest-day
  * tie-break) on the calendar-bounded accumulated series — streamed ==
  * batch over everything ingested, including the changepoint's position,
  * which a windowed/decayed detector could not promise. */
final class StreamingChangepoint {

  private val state = scala.collection.mutable.HashMap.empty[(String, java.sql.Date), Long]

  def processBatch(batch: DataFrame): Unit = synchronized {
    val rows = batch
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getDate(1)), r.getLong(2)))
    rows.foreach { case (k, n) => state.update(k, state.getOrElse(k, 0L) + n) }
  }

  private def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** (event_type, cp_day, max_cusum, mean_before, mean_after), the #242
    * schema, ordered by type. */
  def report(): Seq[(String, java.sql.Date, Double, Double, Option[Double])] =
    synchronized {
      state.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (et, entries) =>
        val days = entries.map { case ((_, d), n) => (d, n) }.sortBy(_._1.getTime)
        val nd = days.length.toLong
        val tot = days.map(_._2).sum
        var pre = 0L
        var best = (0L, 0, 0L) // (|cs|, index, prefix-at-index)
        days.zipWithIndex.foreach { case ((_, n), i) =>
          pre += n
          val cs = math.abs(nd * pre - (i + 1).toLong * tot)
          if (cs > best._1) best = (cs, i, pre)
        }
        val (csAbs, idx, preAt) = best
        val k = idx + 1L
        (et, days(idx)._1,
          rnd6(csAbs.toDouble / nd),
          rnd6(preAt.toDouble / k),
          if (nd > k) Some(rnd6((tot - preAt).toDouble / (nd - k))) else None)
      }
    }
}

/** Incremental Adtributor root-cause (#272 events_root_cause's twin):
  * the (dim, value, day) count map is the additive sufficient statistic,
  * so late rows absorb exactly — INCLUDING late rows that extend the
  * observed horizon and thereby SHIFT both comparison windows, which a
  * watermark-windowed aggregator can never replay. `report()` re-derives
  * the period split from the accumulated horizon and replays the batch
  * operator's exact arithmetic (integer counts, one division per EP,
  * the same JS-term doubles, 6-dp round). State is calendar × value
  * bounded (four dims × their value counts × observed days). */
final class StreamingRootCause {

  private val state =
    scala.collection.mutable.HashMap.empty[(String, String, java.sql.Date), Long]

  def processBatch(batch: DataFrame): Unit = synchronized {
    val rows = graft.queries.EventQueries.rootCauseFanout(
        graft.queries.EventQueries.rootCauseFeatures(batch), "day")
      .groupBy(col("dim"), col("value"), col("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getString(1), r.getDate(2)), r.getLong(3)))
    rows.foreach { case (k, n) => state.update(k, state.getOrElse(k, 0L) + n) }
  }

  private def r6(x: Double) = graft.search.VecMath.round6(x)

  /** (dimension, value, base_n, cur_n, delta, ep, surprise), the #272
    * schema and ordering. */
  def report(): Seq[(String, String, Long, Long, Long, Option[Double], Double)] =
    synchronized {
      if (state.isEmpty) return Seq.empty
      val lastDay = state.keysIterator.map(_._3.toLocalDate).max
      val baseLo = lastDay.minusDays(56)
      val curLo = lastDay.minusDays(28)
      // (dim, value) -> (base, cur) over the re-derived horizon split
      val counts = scala.collection.mutable.HashMap.empty[(String, String), (Long, Long)]
      state.foreach { case ((dim, v, d), n) =>
        val ld = d.toLocalDate
        val key = (dim, v)
        val (b, c) = counts.getOrElse(key, (0L, 0L))
        if (ld.isAfter(curLo)) counts.update(key, (b, c + n))
        else if (ld.isAfter(baseLo)) counts.update(key, (b + n, c))
      }
      val tots = counts.toSeq.groupBy(_._1._1).map { case (dim, es) =>
        dim -> (es.map(_._2._1).sum, es.map(_._2._2).sum)
      }
      def jsTerm(x: Double, y: Double): Double =
        if (x > 0) x * math.log(2.0 * x / (x + y)) else 0.0
      counts.toSeq
        .filter { case (_, (b, c)) => b + c > 0 }
        .sortBy(_._1)
        .map { case ((dim, v), (b, c)) =>
          val (tb, tc) = tots(dim)
          val ep = if (tc != tb)
            Some(r6((c - b).toDouble / (tc - tb).toDouble)) else None
          val p = b.toDouble / tb.toDouble
          val q = c.toDouble / tc.toDouble
          (dim, v, b, c, c - b, ep, r6(0.5 * (jsTerm(p, q) + jsTerm(q, p))))
        }
    }
}
