package graft

import graft.sources.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout contracts: the Morton key matches a local bit-interleave
  * recompute, and clustering by it actually buys the 2-D pruning the
  * operator exists for — a box thin in the second dimension touches far
  * fewer range-partitions than under a 1-D sort on the first.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def interleaveLocal(qx: Long, qy: Long, bits: Int): Long =
    (0 until bits).map(i =>
      ((qx >> i) & 1L) << (2 * i) | ((qy >> i) & 1L) << (2 * i + 1)).sum

  test("z key matches a local quantize+interleave recompute") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
    val rows = ZOrder.withZ(li, "l_quantity", "l_extendedprice")
      .select("l_quantity", "l_extendedprice", "z")
      .as[(Double, Double, Long)].collect()
    val (xlo, xhi) = (rows.map(_._1).min, rows.map(_._1).max)
    val (ylo, yhi) = (rows.map(_._2).min, rows.map(_._2).max)
    rows.foreach { case (x, y, z) =>
      val qx = math.floor((x - xlo) / (xhi - xlo) * 65535).toLong
      val qy = math.floor((y - ylo) / (yhi - ylo) * 65535).toLong
      assert(z == interleaveLocal(qx, qy, 16), s"($x,$y)")
    }
  }

  test("z preserves 2-D locality: recursive quadrant order") {
    // Morton property: the high bit pair selects the quadrant, so any
    // z-contiguous run stays within at most 2 adjacent quadrant cells at
    // every recursion level; spot-check the quadrant ordering directly
    val pts = for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y)
    val byZ = pts.sortBy { case (x, y) => interleaveLocal(x, y, 6) }
    // quadrant index (2 high bits of each coord) must be non-decreasing
    // in Morton order of the quadrant pair
    val quads = byZ.map { case (x, y) => interleaveLocal(x >> 5, y >> 5, 1) }
    assert(quads == quads.sorted, "quadrants not visited in Morton order")
    // and all points of one quadrant are contiguous in z
    assert(quads.toSeq.distinct.size == 4 &&
      quads.zipWithIndex.groupBy(_._1).values.forall { g =>
        val idx = g.map(_._2); idx.max - idx.min + 1 == idx.size
      })
  }

  test("clusterBy: thin-in-y box touches far fewer partitions than a 1-D x sort") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"))
    val n = 16
    // y-thin box: full x range, narrow y slice — the adversarial case for
    // a layout sorted by x only
    val (ylo, yhi) = (10000.0, 15000.0)
    def touched(df: org.apache.spark.sql.DataFrame): Long =
      df.select(spark_partition_id().as("pid"), col("x"), col("y"))
        .where(col("y") >= ylo && col("y") <= yhi)
        .select("pid").distinct().count()
    val zTouched = touched(ZOrder.clusterBy(li, "x", "y", n))
    val xTouched = touched(li.repartitionByRange(n, col("x")).sortWithinPartitions("x"))
    // 1-D layout smears the y-slice over every partition; z-order keeps
    // it in a bounded set of z envelopes
    assert(xTouched >= n - 2, s"x-sort unexpectedly pruned: $xTouched")
    assert(zTouched <= xTouched / 2,
      s"z-order touched $zTouched of $n vs x-sort $xTouched")
  }
}
