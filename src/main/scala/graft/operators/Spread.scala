package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Spread per-row heavy projections across the cluster (guide-§2.5's
  * unsplittable-input rule, shared from Dedup's r12 fix): a small corpus
  * often sits in ONE parquet split (the driver testdata ships one row
  * group per table), which serializes per-row token/shingle/hash work
  * onto a single core — there, one cheap hash shuffle on the id buys
  * full parallelism for the expensive downstream projections. At 100 TB
  * the input already has thousands of splits, so the repartition is
  * SKIPPED (it would otherwise shuffle the whole corpus for nothing).
  */
object Spread {
  def apply(df: DataFrame, idCol: String): DataFrame = {
    // pass through when the spread key is absent (spec fixtures project
    // only the columns an operator reads — a tiny LocalRelation needs no
    // spreading anyway)
    if (!df.columns.contains(idCol)) return df
    val want = df.sparkSession.sparkContext.defaultParallelism
    // plan-side split estimate: leaf file count, no RDD lineage
    // materialized (df.rdd would eagerly build the conversion per call).
    // A many-split single file is undercounted, but that only triggers
    // the cheap branch (one hash shuffle of a corpus small enough to sit
    // in few files); non-file sources report 0 and land there too.
    if (df.inputFiles.length >= want) df else df.repartition(col(idCol))
  }
}
