package graft

import graft.queries.QualityQueries
import graft.streaming.StreamingProfile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming profiler's absorption contract: out-of-order
  * micro-batches replay to the batch table_profile exactly on every
  * additive statistic (nulls, min/max, decimal-exact mean), and the
  * HLL-union distinct estimate meets the #293 ≤5% accuracy contract
  * under every delivery order (the estimate itself may move within the
  * sketch's error bounds across orders — sparse→dense promotion is
  * order-dependent — which is why the contract is accuracy, not bytes).
  */
class ProfileStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  private val sf = "/root/testdata/sf0.001"

  test("streaming profile: out-of-order absorption == table_profile; distinct ≤5%") {
    val li = Tables.lineitem(spark, sf)
    val exact = QualityQueries.tableProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val batches = Seq(2L, 0L, 1L).map(i => li.where(col("l_orderkey") % 3 === i))
    val sp = new StreamingProfile
    batches.foreach(sp.processBatch)
    val got = sp.report().map(t => t._1 -> t).toMap
    assert(got.keySet == exact.keySet && got.size == 11)
    exact.foreach { case (c, e) =>
      val g = got(c)
      assert(g._2 == e.getLong(1), s"$c n_null")
      val de = e.getLong(2).toDouble
      assert(math.abs(g._3 - de) / de <= 0.05, s"$c distinct: exact $de got ${g._3}")
      // min/max/avg: EXACT equality (decimal partial sums add exactly;
      // the final double division is the same single IEEE op)
      def d(i: Int): java.lang.Double =
        if (e.isNullAt(i)) null else java.lang.Double.valueOf(e.getDouble(i))
      assert(g._4 == d(3) && g._5 == d(4) && g._6 == d(5), s"$c numeric stats")
      def s(i: Int): String = if (e.isNullAt(i)) null else e.getString(i)
      assert(g._7 == s(6) && g._8 == s(7), s"$c string stats")
    }
    // order-independence: every EXACT statistic is identical under
    // reversed delivery; the sketch estimate may move within its error
    // bounds (Datasketches HLL union promotes sparse→dense at an
    // order-dependent point), so it re-meets the ≤5% contract instead
    val sp2 = new StreamingProfile
    batches.reverse.foreach(sp2.processBatch)
    val byCol = sp2.report().map(t => t._1 -> t).toMap
    sp.report().foreach { case t @ (c, _, _, _, _, _, _, _) =>
      val u = byCol(c)
      assert(t.copy(_3 = 0L) == u.copy(_3 = 0L), s"$c exact stats drifted with order")
      val de = exact(c).getLong(2).toDouble
      assert(math.abs(u._3 - de) / de <= 0.05, s"$c distinct (reversed): $de vs ${u._3}")
    }
  }

  test("streaming profile topK: merged Misra–Gries == exact replay within n/c; " +
       "exact when capacity covers the column") {
    val li = Tables.lineitem(spark, sf)
    val batches = Seq(2L, 0L, 1L).map(i => li.where(col("l_orderkey") % 3 === i))
    val sp = new StreamingProfile
    batches.foreach(sp.processBatchTop)
    val cols = Seq("l_returnflag" -> col("l_returnflag").cast("string"),
      "l_linestatus" -> col("l_linestatus").cast("string"),
      "l_shipdate" -> date_format(col("l_shipdate"), "yyyy-MM-dd"))
    cols.foreach { case (c, rendered) =>
      val exact = li.select(rendered.as("v")).where(col("v").isNotNull)
        .groupBy("v").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bound = sp.topErrorBound(c)
      assert(bound == exact.valuesIterator.sum.toDouble / 256, s"$c n/c bound")
      // every summary estimate undercounts by at most n/c and never
      // overcounts; every value whose true count exceeds n/c is present
      val got = sp.topValues(c, Int.MaxValue).toMap
      got.foreach { case (v, est) =>
        val tr = exact.getOrElse(v, 0L)
        assert(est <= tr && tr - est <= bound, s"$c value $v: est $est true $tr")
      }
      exact.foreach { case (v, tr) =>
        if (tr > bound) assert(got.contains(v), s"$c heavy value $v (count $tr) missing")
      }
      // the low-cardinality flag/status columns fit entirely below the
      // 256-entry capacity: no prune ever fires, so the summary IS the
      // exact top-k, counts included
      if (exact.size <= 256)
        assert(sp.topValues(c, exact.size).toMap == exact, s"$c exact topK")
    }
  }
}
