package graft

import graft.sources.{Hilbert, ZOrder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hilbert layout contracts: the native expression walks the real Hilbert
  * curve (bijective, unit-step adjacent — the property Morton lacks), the
  * key matches a local recompute of the classic xy→d loop, and clustering
  * by it buys 2-D pruning at least as well as z-order.
  */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Independent local recompute of the xy→d walk. */
  private def hilbertLocal(qx: Long, qy: Long, bits: Int): Long = {
    var x = qx; var y = qy; var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += (s * s) * ((3 * rx) ^ ry)
      if (ry == 0) {
        val t = if (rx == 1) s - 1 - y else y
        y = if (rx == 1) s - 1 - x else x
        x = t
      }
      i -= 1
    }
    d
  }

  test("hilbert index is a bijection onto 0..2^(2b)-1 with unit-step adjacency") {
    val bits = 4
    val cells = for { x <- 0L until 16L; y <- 0L until 16L } yield (x, y)
    val got = cells.toDF("qx", "qy")
      .select(col("qx"), col("qy"),
        Hilbert.index(col("qx"), col("qy"), bits).as("h"))
      .as[(Long, Long, Long)].collect()
    // bijection: every position 0..255 hit exactly once
    assert(got.map(_._3).sorted.toSeq == (0L until 256L))
    // adjacency: consecutive curve positions are Manhattan-distance-1
    // neighbours — THE Hilbert property (Morton jumps quadrants)
    val byH = got.sortBy(_._3)
    byH.sliding(2).foreach { case Array((x0, y0, _), (x1, y1, _)) =>
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"non-adjacent step ($x0,$y0)->($x1,$y1)")
    }
  }

  test("codegen path matches the local recompute at full 16-bit depth") {
    val pts = Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L),
      (12345L, 54321L), (40000L, 1L), (1L, 40000L), (32768L, 32767L))
    val got = pts.toDF("qx", "qy")
      .select(Hilbert.index(col("qx"), col("qy"), 16).as("h"))
      .as[Long].collect()
    assert(got.toSeq == pts.map { case (x, y) => hilbertLocal(x, y, 16) })
  }

  test("withH: quantize + walk matches local recompute on real data") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_quantity"), col("l_extendedprice"))
    val rows = Hilbert.withH(li, "l_quantity", "l_extendedprice")
      .select("l_quantity", "l_extendedprice", "h")
      .as[(Double, Double, Long)].collect()
    val (xlo, xhi) = (rows.map(_._1).min, rows.map(_._1).max)
    val (ylo, yhi) = (rows.map(_._2).min, rows.map(_._2).max)
    rows.foreach { case (x, y, h) =>
      val qx = math.floor((x - xlo) / (xhi - xlo) * 65535).toLong
      val qy = math.floor((y - ylo) / (yhi - ylo) * 65535).toLong
      assert(h == hilbertLocal(qx, qy, 16), s"($x,$y)")
    }
  }

  test("clusterBy: thin box touches few partitions, within 2x of z-order") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"))
    val n = 16
    def touched(clustered: org.apache.spark.sql.DataFrame, key: String): Long = {
      val withPid = clustered.withColumn("pid", spark_partition_id())
      val Array(ylo, yhi) = withPid.agg(min("y"), max("y")).as[(Double, Double)]
        .collect().map(t => Array(t._1, t._2)).head
      val cut = ylo + (yhi - ylo) * 0.05
      withPid.where(col("y") <= cut).select("pid").distinct().count()
    }
    val hTouch = touched(Hilbert.clusterBy(li, "x", "y", n), "h")
    val zTouch = touched(ZOrder.clusterBy(li, "x", "y", n), "z")
    // a y-thin full-x box under 2-D clustering touches a subset of
    // partitions; Hilbert should be in z-order's neighbourhood or better
    assert(hTouch <= n / 2, s"hilbert touched $hTouch of $n")
    assert(hTouch <= 2 * zTouch, s"hilbert $hTouch vs zorder $zTouch")
  }
}
