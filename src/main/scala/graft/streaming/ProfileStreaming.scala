package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental column profiler (queries.QualityQueries.tableProfile's
  * twin, sketch-distinct like #293 table_profile_approx): the
  * data-quality monitor a warehouse runs on an unbounded ingest stream.
  *
  * Every profile statistic is an additive/mergeable sufficient
  * statistic, so micro-batches absorb exactly regardless of order:
  * null counts and row counts ADD; min/max are associative; the numeric
  * mean rides an EXACT DECIMAL(28,6) partial sum (decimal addition is
  * associative, so driver-merged partials equal the batch operator's
  * global sum bit-for-bit, and the final double division is the same
  * single IEEE op); distinct rides one Datasketches HLL sketch per
  * column (`hll_sketch_agg` per batch — KBs per column regardless of
  * row count — merged into a driver Union; union is idempotent, and
  * order-insensitive within the sketch's error bounds — the estimate
  * can move a fraction of a percent across delivery orders because
  * sparse→dense promotion is order-dependent, so the distinct contract
  * is ACCURACY (≤5% vs exact, the #293 discipline), not bytes). Per
  * batch this costs ONE distributed partial-combining aggregate to a
  * single row — the accumulated stream is never re-read.
  *
  * `report()` emits the #279/#293 schema (col, n_null, n_distinct,
  * min_num, max_num, avg_num, min_str, max_str): every non-distinct
  * cell equals the batch `tableProfile` EXACTLY (spec-pinned over
  * out-of-order batches; string min/max assume the profiled string
  * columns are ASCII — Spark orders UTF8 bytes, the driver UTF-16 code
  * units, which agree there), and n_distinct carries the sketch's
  * ≤5%-contract estimate (the #293 accuracy discipline). */
final class StreamingProfile(lgK: Int = 14) {

  import org.apache.datasketches.hll.{TgtHllType, Union}
  import org.apache.datasketches.hll.HllSketch
  import org.apache.datasketches.memory.Memory

  // one owner for the profiled column set (the batch operators'), so
  // the twins cannot drift
  private val NumCols = graft.queries.QualityQueries.ProfileNumCols
  private val StrCols = graft.queries.QualityQueries.ProfileStrCols

  private final class ColState {
    var nNull = 0L
    var nonNull = 0L
    var sum: java.math.BigDecimal = null
    var minN: java.lang.Double = null
    var maxN: java.lang.Double = null
    var minS: String = null
    var maxS: String = null
    val sketch = new Union(lgK)
  }

  private val state = scala.collection.mutable.LinkedHashMap(
    (NumCols ++ StrCols :+ "l_shipdate").map(_ -> new ColState): _*)

  def processBatch(batch: DataFrame): Unit = synchronized {
    def nNull(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn")
    // injective per-column rendering for the sketch (the tableProfile
    // stacked-pass discipline; unix micros for the date — a string
    // rendering would be zone-dependent)
    def sk(c: String, sql: String): Column =
      expr(s"hll_sketch_agg($sql, $lgK)").as(s"${c}__sk")
    val aggs: Seq[Column] =
      NumCols.flatMap { c => Seq(
        nNull(c),
        count(col(c)).as(s"${c}__ct"),
        sum(col(c).cast("decimal(28,6)")).as(s"${c}__sm"),
        min(col(c)).cast("double").as(s"${c}__mn"),
        max(col(c)).cast("double").as(s"${c}__mx"),
        sk(c, s"CAST($c AS STRING)"))
      } ++ StrCols.flatMap { c => Seq(
        nNull(c),
        min(col(c)).as(s"${c}__mns"), max(col(c)).as(s"${c}__mxs"),
        sk(c, c))
      } ++ Seq(
        nNull("l_shipdate"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("l_shipdate__mns"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("l_shipdate__mxs"),
        sk("l_shipdate",
          "CAST(unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS STRING)"))
    val r = batch.agg(aggs.head, aggs.tail: _*).first()
    def mergeSketch(s: ColState, c: String): Unit = {
      val bytes = r.getAs[Array[Byte]](s"${c}__sk")
      if (bytes != null) s.sketch.update(HllSketch.heapify(Memory.wrap(bytes)))
    }
    NumCols.foreach { c =>
      val s = state(c)
      s.nNull += r.getAs[Long](s"${c}__nn")
      s.nonNull += r.getAs[Long](s"${c}__ct")
      val bd = r.getAs[java.math.BigDecimal](s"${c}__sm")
      if (bd != null) s.sum = if (s.sum == null) bd else s.sum.add(bd)
      val (mn, mx) = (r.getAs[java.lang.Double](s"${c}__mn"),
        r.getAs[java.lang.Double](s"${c}__mx"))
      if (mn != null && (s.minN == null || mn < s.minN)) s.minN = mn
      if (mx != null && (s.maxN == null || mx > s.maxN)) s.maxN = mx
      mergeSketch(s, c)
    }
    (StrCols :+ "l_shipdate").foreach { c =>
      val s = state(c)
      s.nNull += r.getAs[Long](s"${c}__nn")
      val (mn, mx) = (r.getAs[String](s"${c}__mns"), r.getAs[String](s"${c}__mxs"))
      if (mn != null && (s.minS == null || mn < s.minS)) s.minS = mn
      if (mx != null && (s.maxS == null || mx > s.maxS)) s.maxS = mx
      mergeSketch(s, c)
    }
  }

  /** (col, n_null, n_distinct, min_num, max_num, avg_num, min_str,
    * max_str) — the #279/#293 schema, ordered by col. */
  def report(): Seq[(String, Long, Long, java.lang.Double, java.lang.Double,
      java.lang.Double, String, String)] = synchronized {
    state.toSeq.sortBy(_._1).map { case (c, s) =>
      val nd = math.round(s.sketch.getResult(TgtHllType.HLL_8).getEstimate)
      val avg: java.lang.Double =
        if (s.sum == null || s.nonNull == 0L) null
        else java.lang.Double.valueOf(s.sum.doubleValue() / s.nonNull.toDouble)
      (c, s.nNull, nd, s.minN, s.maxN, avg, s.minS, s.maxS)
    }
  }

  // ---- frequent items beside the HLL distinct (r15 verdict #7) --------

  /** Per-column Misra–Gries summaries over the profiled string/date
    * columns: the frequent-values readout a profiler publishes next to
    * the distinct estimate (Deequ's histogram analyzer, bounded). Same
    * mergeable-summaries discipline as [[StreamingHeavyHitters]]: counts
    * ADD across batches, and when a column's summary exceeds
    * `topCapacity` entries the (c+1)-th largest count is subtracted and
    * non-positives dropped — the merged summary keeps the n/c undercount
    * bound of a single pass over the whole stream (Agarwal et al.,
    * PODS'12). State is O(columns × capacity) regardless of stream
    * length; any value whose true count exceeds totalRows/capacity is
    * guaranteed present. */
  private val TopCapacity = 256
  private val topState = scala.collection.mutable.LinkedHashMap(
    (StrCols :+ "l_shipdate").map(_ -> scala.collection.mutable.HashMap.empty[String, Long]): _*)
  // true non-null rows absorbed per column — the n in the n/c bound
  private val topTotal = scala.collection.mutable.HashMap(
    (StrCols :+ "l_shipdate").map(_ -> 0L): _*)

  /** Absorb one micro-batch into the frequent-items summaries: the
    * profiled string/date columns STACK to narrow (col, value) pairs —
    * the tableProfile stacked-pass discipline — so ONE map-side-combined
    * aggregate serves every column; per-batch distinct pairs are bounded
    * by the micro-batch, the same premise the HLL merge rides. Callers
    * absorb each batch once into BOTH halves (processBatch + this);
    * counts add, so redelivery is not idempotent here — exactly the
    * batch heavy-hitters contract, unlike the min/max/null half. */
  def processBatchTop(batch: DataFrame): Unit = synchronized {
    val stacked = (StrCols.map(c => struct(lit(c).as("c"), col(c).as("v"))) :+
      struct(lit("l_shipdate").as("c"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("v")))
    val counts = batch
      .select(explode(array(stacked: _*)).as("cv"))
      .where(col("cv.v").isNotNull)
      .groupBy(col("cv.c").as("c"), col("cv.v").as("v"))
      .agg(count(lit(1)).as("n"))
      .collect()
    counts.foreach { r =>
      val c = r.getString(0)
      val m = topState(c)
      val v = r.getString(1)
      m.update(v, m.getOrElse(v, 0L) + r.getLong(2))
      topTotal.update(c, topTotal(c) + r.getLong(2))
    }
    topState.valuesIterator.foreach { m =>
      if (m.size > TopCapacity) {
        val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(TopCapacity)
        val dead = m.iterator.collect { case (k, c) if c <= cut => k }.toList
        m.mapValuesInPlace((_, c) => c - cut)
        dead.foreach(m.remove)
      }
    }
  }

  /** Guaranteed maximum undercount of any [[topValues]] estimate for a
    * column: non-null rows absorbed into its summary / capacity (the
    * Misra–Gries n/c bound, preserved under merging). */
  def topErrorBound(c: String): Double = synchronized {
    topTotal(c).toDouble / TopCapacity
  }

  /** Current top-k values (value, estimated count) for a profiled
    * string/date column, count desc then value asc. */
  def topValues(c: String, k: Int): Seq[(String, Long)] = synchronized {
    topState(c).toSeq.sortBy { case (v, n) => (-n, v) }.take(k)
  }
}
