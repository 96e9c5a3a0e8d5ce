package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a cartesian plan.
  *
  * Spark executes a bare `p BETWEEN lo AND hi` join as
  * BroadcastNestedLoopJoin (small side) or a cartesian product — O(N·M)
  * comparisons that do not survive scale. The banded formulation turns it
  * into an EQUI-join: bucket the domain into bins of width `binWidth`,
  * explode each interval into the bins it covers, join on the bin key,
  * then apply the exact containment predicate. Each point falls in exactly
  * ONE bin, so every qualifying (point, interval) pair is produced exactly
  * once — no dedup pass.
  *
  * Cost model: the equi-join shuffles N + M·(avgLen/binWidth + 1) rows on
  * the bin key and compares only within-bin pairs. `binWidth` ≈ the MEAN
  * interval length balances the two failure modes: too narrow explodes
  * every interval into many bins; too wide (e.g. sizing by the max under a
  * heavy-tailed length distribution) collapses everything into one bin and
  * degenerates back toward the cartesian. Long-tail intervals simply span
  * more bins — correctness never depends on the width (the same blocking
  * idea the dedup suite uses for LSH buckets, applied to a 1-D ordered
  * domain; Databricks' range-join hint takes the same bin-size parameter).
  *
  * The reference has no interval operator; this is engine substrate the
  * relational suite exercises (lineitem ship→receipt transit windows) the
  * way DuckDB serves the same query with its native IEJoin.
  */
object RangeJoin {

  /** Join `points` rows to every `intervals` row whose [loCol, hiCol]
    * contains pointCol (inclusive both ends). All three columns must be
    * integral (cast dates to day numbers first — `unix_date`).
    * `binWidth = 0` (default) auto-sizes to the observed MEAN interval
    * length (one tiny aggregate job over the interval table).
    * Intervals with hi < lo are dropped (empty by definition).
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long = 0L): DataFrame = {
    val iv = intervals.where(col(hiCol) >= col(loCol))
    val width: Long =
      if (binWidth > 0) binWidth
      else {
        val row = iv.agg(avg(col(hiCol).cast("long") - col(loCol).cast("long"))).first()
        if (row.isNullAt(0)) 1L // no intervals survive: any width is fine
        else math.max(1L, math.ceil(row.getDouble(0)).toLong + 1L)
      }

    def bin(c: Column): Column = floor(c.cast("long") / width)

    // exploded side: the bins this interval overlaps — ≤ 2 when the
    // interval fits one width, always (len/width + 2) bounded
    val ivBinned = iv.withColumn("_rj_bin",
      explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    val pBinned = points.withColumn("_rj_bin", bin(col(pointCol)))

    pBinned.join(ivBinned, Seq("_rj_bin"))
      .where(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("_rj_bin")
  }
}
