package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic snapshot diff — the CDC/reconciliation primitive (the shape
  * behind Delta's CDF, Iceberg's changelog scan, and every warehouse
  * "what changed between loads" job): ONE full-outer key join classifies
  * every key as added / removed / changed / unchanged and names the
  * changed columns, null-safely.
  *
  * Scale shape: the single shuffle is the key join both snapshots need
  * anyway; comparisons are row-local codegen'd `<=>` expressions, and the
  * changed-column array is built from the same pass — no per-column jobs,
  * no second scan. Skewed keys behave like any equi-join (AQE handles
  * them); at 100 TB the usual refinement is partition-pruning both sides
  * to the touched partitions first, which composes with this operator
  * unchanged.
  */
object SnapshotDiff {

  /** Diff `neu` against `old` on `keys`. Output: keys…, change_type
    * (added = key only in neu, removed = only in old, changed, unchanged),
    * changed_cols (sorted names), and old_<c>/new_<c> for every compared
    * column (old's non-key columns, which must all exist in neu). */
  def diff(old: DataFrame, neu: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshot_diff: empty key list")
    val compareCols = old.columns.filterNot(keys.contains).toSeq
    val missing = compareCols.filterNot(neu.columns.contains)
    require(missing.isEmpty,
      s"snapshot_diff: columns ${missing.mkString(",")} absent from the new snapshot")
    val o = old.select(
      (keys.map(col) ++ compareCols.map(c => col(c).as(s"old_$c")) :+
        lit(1).as("__o")): _*)
    val n = neu.select(
      (keys.map(col) ++ compareCols.map(c => col(c).as(s"new_$c")) :+
        lit(1).as("__n")): _*)
    val j = o.join(n, keys, "full_outer")
    val changedArr: Column = sort_array(filter(
      array(compareCols.map(c =>
        when(!(col(s"old_$c") <=> col(s"new_$c")), lit(c))): _*),
      x => x.isNotNull))
    j.withColumn("change_type",
        when(col("__o").isNull, "added")
          .when(col("__n").isNull, "removed")
          .when(size(changedArr) > 0, "changed")
          .otherwise("unchanged"))
      .withColumn("changed_cols",
        when(col("change_type") === "changed", changedArr)
          .otherwise(array().cast("array<string>")))
      .drop("__o", "__n")
  }
}
