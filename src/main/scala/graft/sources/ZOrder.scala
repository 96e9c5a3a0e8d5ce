package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional data-layout lever
  * for scan pruning at scale. A table range-partitioned and sorted by ONE
  * column prunes only predicates on that column; interleaving the bits of
  * two quantized columns into one sort key gives every file/row-group a
  * small min/max envelope in BOTH dimensions, so a 2-D box predicate
  * (the filter DSL's geo_box) skips most files regardless of which
  * dimension is thin. This is the Delta/Iceberg OPTIMIZE ZORDER BY idea
  * expressed as plain Spark: quantize → interleave → repartitionByRange →
  * sortWithinPartitions; parquet min/max stats do the skipping.
  *
  * All math is integer/IEEE-deterministic (quantization is one subtract,
  * one divide, one multiply, one floor — identical across engines), so
  * the z-value itself is oracle-checkable in SQL with the same unrolled
  * bit-interleave expression.
  */
object ZOrder {

  /** Quantize `c` into [0, 2^bits) against [lo, hi] bounds. hi == lo
    * (constant column) maps everything to 0. The formula is evaluated in
    * the exact literal order `floor((c - lo) / (hi - lo) * (2^bits - 1))`
    * so an engine-portable SQL twin can reproduce it bit-for-bit. */
  def quantize(c: Column, lo: Column, hi: Column, bits: Int): Column =
    when(hi === lo, lit(0L)).otherwise(
      floor((c - lo) / (hi - lo) * lit((1L << bits) - 1)).cast("long"))

  /** Morton interleave of two pre-quantized long columns: bit i of qx
    * lands at position 2i, bit i of qy at 2i+1. Unrolled shift/mask/add
    * terms stay inside whole-stage codegen. */
  def interleave(qx: Column, qy: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftright(qx, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
      shiftright(qy, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** The z column for two numeric columns, bounds discovered in-plan
    * (one tiny broadcast aggregate, no driver collect): attach with
    * `withZ(df, "x", "y")` and the frame gains a `z` column. */
  def withZ(df: DataFrame, xCol: String, yCol: String, bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 31, s"zorder: bits $bits outside [1,31]")
    val bounds = df.agg(
      min(col(xCol)).as("_zxlo"), max(col(xCol)).as("_zxhi"),
      min(col(yCol)).as("_zylo"), max(col(yCol)).as("_zyhi"))
    df.crossJoin(broadcast(bounds))
      .withColumn("z", interleave(
        quantize(col(xCol), col("_zxlo"), col("_zxhi"), bits),
        quantize(col(yCol), col("_zylo"), col("_zyhi"), bits), bits))
      .drop("_zxlo", "_zxhi", "_zylo", "_zyhi")
  }

  /** Cluster the frame for 2-D pruning: range-partition on z (balanced
    * output files at any scale — range, not hash, so files own contiguous
    * z envelopes) and sort within partitions so row-group stats are tight.
    * Downstream `.write.parquet` then yields skippable files for box
    * predicates on (xCol, yCol). */
  def clusterBy(df: DataFrame, xCol: String, yCol: String,
                nPartitions: Int, bits: Int = 16): DataFrame =
    withZ(df, xCol, yCol, bits)
      .repartitionByRange(nPartitions, col("z"))
      .sortWithinPartitions("z")

  /** The SQL twin of [[withZ]]'s z expression over pre-quantized qx/qy —
    * generated with the same unrolled terms so an external engine hashes
    * identically. */
  def interleaveSql(qx: String, qy: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($qx >> $i) & 1) * ${1L << (2 * i)} + (($qy >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")
}
