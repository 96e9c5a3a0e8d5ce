package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental forecasting (queries.QualityQueries2.eventsForecastEnsemble's
  * twin): the (event_type, day) count map is the additive sufficient
  * statistic, so late rows absorb exactly — INCLUDING a late batch that
  * extends the observed horizon and thereby moves every model's training
  * window and seasonal phase, which a fitted-state streaming smoother
  * could never reopen. `report()` re-derives the zero-filled global spine
  * from the accumulated counts and replays the batch operator's exact
  * arithmetic: the same Holt fold, the same Holt-Winters seasonal-slot
  * recursion, the same naive MAE, the same inverse-MAE blend — doubles in
  * the identical sequential order, rounded with Spark's own HALF_UP rule,
  * so the report equals events_forecast_ensemble bit-for-bit. State is
  * calendar × types bounded. */
final class StreamingForecast {

  // keyed by LocalDate, not java.sql.Date: Date equality is epoch-millis
  // equality, and stepping millis in fixed 86400000L increments drifts off
  // local midnight across a DST transition (23h/25h days), silently
  // zero-filling real days — the same trap MonitorStreaming documents.
  // Calendar-day keys make the spine walk below DST-proof.
  private val state =
    scala.collection.mutable.HashMap.empty[(String, java.time.LocalDate), Long]

  def processBatch(batch: DataFrame): Unit = synchronized {
    batch
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .foreach { r =>
        val k = (r.getString(0), r.getDate(1).toLocalDate)
        state.update(k, state.getOrElse(k, 0L) + r.getLong(2))
      }
  }

  /** Spark's round(): java BigDecimal.valueOf + HALF_UP. */
  private def rnd6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** (event_type, h, mae_naive, mae_holt, mae_hw, f_naive, f_holt, f_hw,
    * f_ens) — the #290 schema, ordered by (type, h). */
  def report(): Seq[(String, Long, Double, Double, Double, Double, Double,
      Double, Double)] = synchronized {
    if (state.isEmpty) return Seq.empty
    val d0 = state.keys.map(_._2).min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    val d1 = state.keys.map(_._2).max(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    val days = (d0.toEpochDay to d1.toEpochDay)
      .map(java.time.LocalDate.ofEpochDay).toVector
    state.keys.map(_._1).toSeq.distinct.sorted.flatMap { et =>
      val ys = days.map(d => state.getOrElse((et, d), 0L).toDouble)
      val n = ys.length
      if (n < 8) Seq.empty
      else {
        // Holt fold — the HoltAggExpr arithmetic in the same order
        var (hLvl, hTr, hAe) = (ys(0), ys(1) - ys(0), 0.0); var hN = 0
        for (t <- 1 until n) {
          val y = ys(t)
          val lvl2 = 0.3 * y + 0.7 * (hLvl + hTr)
          val tr2 = 0.1 * (lvl2 - hLvl) + 0.9 * hTr
          hAe += math.abs(y - (hLvl + hTr)); hN += 1
          hLvl = lvl2; hTr = tr2
        }
        // Holt-Winters fold — the HwAggExpr arithmetic
        var wLvl = ys.take(7).reduceLeft(_ + _) / 7.0
        var wTr = 0.0
        val s = Array.tabulate(7)(i => ys(i) - wLvl)
        var (wAe, wCnt) = (0.0, 0)
        for (t <- 7 until n) {
          val y = ys(t); val slot = wCnt % 7
          val lvl2 = 0.3 * (y - s(slot)) + 0.7 * (wLvl + wTr)
          val tr2 = 0.1 * (lvl2 - wLvl) + 0.9 * wTr
          wAe += math.abs(y - (wLvl + wTr + s(slot)))
          s(slot) = 0.2 * (y - lvl2) + 0.8 * s(slot)
          wLvl = lvl2; wTr = tr2; wCnt += 1
        }
        // naive: integer-valued doubles, order-proof
        val nAe = (7 until n).map(t => math.abs(ys(t) - ys(t - 7))).sum
        val maeN = rnd6(nAe / (n - 7))
        val maeH = rnd6(hAe / hN)
        val maeW = rnd6(wAe / wCnt)
        (1 to 7).map { h =>
          val fN = rnd6(ys(n - 7 + h - 1))
          val fH = rnd6(hLvl + h * hTr)
          val fW = rnd6(wLvl + h * wTr + s((n + h - 8) % 7))
          // the EnsBlendExpr arithmetic, same association order
          val wn = 1.0 / math.max(maeN, 1e-9)
          val wh = 1.0 / math.max(maeH, 1e-9)
          val ww = 1.0 / math.max(maeW, 1e-9)
          val fE = rnd6((wn * fN + wh * fH + ww * fW) / ((wn + wh) + ww))
          (et, h.toLong, maeN, maeH, maeW, fN, fH, fW, fE)
        }
      }
    }
  }
}
