package graft

import graft.queries.{EventQueries, RelationalQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the round-5 relational/event additions that the DuckDB
  * oracle can't express directly: sketch accuracy, rollup level algebra,
  * pivot conservation, rolling-frame consistency, range-search bounds.
  */
class RelationalQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL) within 5% of exact per day") {
    val both = Tables.events(spark, sf)
      .groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(count_distinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .select(abs(col("approx") - col("exact")) / col("exact"))
      .as[Double].collect()
    assert(both.nonEmpty && both.forall(_ <= 0.05))
  }

  test("events_quantiles_approx: sketch tracks exact per (type, p) within 5% of spread") {
    val rows = EventQueries.eventsQuantilesApprox(spark, sf)
      .as[(String, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    // error bound relative to each type's value spread (rank-sketch
    // guarantees are in rank space; 1e4 accuracy makes value error tiny
    // on this data — 5% of spread is a loose, stable ceiling)
    val spread = Tables.events(spark, sf)
      .groupBy("event_type").agg((max("value") - min("value")).as("w"))
      .as[(String, Double)].collect().toMap
    rows.foreach { case (t, p, _, _, err) =>
      assert(err <= 0.05 * spread(t) + 1e-6, s"($t, $p): abs_err $err")
    }
    // coverage: every type × each of the three percentiles
    val types = spread.keySet
    assert(rows.map(_._1).toSet == types && rows.length == types.size * 3)
  }

  test("events_markov: transitions conserve and probabilities sum to 1 per src") {
    val rows = EventQueries.eventsMarkov(spark, sf)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    // total transitions = events-with-successor count (exact conservation)
    val nTransitions = rows.map(_._3).sum
    val perUser = Tables.events(spark, sf).where(col("event_type").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .agg(sum(col("n") - 1)).first().getLong(0)
    assert(nTransitions == perUser, s"$nTransitions vs $perUser")
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val p = rs.map(_._4).sum
      assert(math.abs(p - 1.0) <= 1e-4, s"src $src probs sum to $p")
    }
  }

  test("orders_open_book: per-day counts match a local interval recompute") {
    val sf0 = "/root/testdata/sf0.001"
    val got = RelationalQueries.ordersOpenBook(spark, sf0)
      .as[(java.sql.Timestamp, Long)].collect().toSeq
    val wins = Tables.orders(spark, sf0)
      .join(Tables.lineitem(spark, sf0), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(max(col("l_shipdate")).as("hi"))
      .select(col("o_orderdate"), col("hi"))
      .as[(java.sql.Timestamp, java.sql.Timestamp)].collect()
    val dates = Tables.orders(spark, sf0)
      .select(col("o_orderdate")).as[java.sql.Timestamp].collect()
      .filter(d => d.toString >= "1995-01-01" && d.toString < "1996-01-01").distinct
    val want = dates.map { d =>
      d -> wins.count { case (lo, hi) => !d.before(lo) && !d.after(hi) }.toLong
    }.filter(_._2 > 0).sortBy(_._1.getTime)
    assert(got == want.toSeq)
  }

  test("q1_rollup: per-level sums reconcile and gid encodes the level") {
    val r = RelationalQueries.q1Rollup(spark, sf).collect()
    val leaf = r.filter(_.getInt(0) == 0)
    val flagLvl = r.filter(_.getInt(0) == 1) // l_linestatus rolled up
    val total = r.filter(_.getInt(0) == 3)
    assert(total.length == 1)
    assert(leaf.map(_.getLong(4)).sum == total.head.getLong(4))
    assert(flagLvl.map(_.getLong(4)).sum == total.head.getLong(4))
    assert(flagLvl.forall(x => x.isNullAt(2) && !x.isNullAt(1)))
    // no gid=2 rows: ROLLUP (a, b) never rolls up `a` while keeping `b`
    assert(!r.exists(_.getInt(0) == 2))
  }

  test("events_pivot: per-type columns conserve the raw event count") {
    val total = Tables.events(spark, sf).count()
    val p = EventQueries.eventsPivot(spark, sf)
    val cols = Seq("n_click", "n_error", "n_purchase", "n_signup", "n_view")
    val summed = p.select(cols.map(c => sum(col(c))).reduce(_ + _)).as[Long].head()
    assert(summed == total)
  }

  test("events_rolling: 7-day frame equals the sum of the last ≤7 dailies") {
    val r = EventQueries.eventsRolling(spark, sf)
      .select("event_type", "day", "n_events", "roll_events")
      .as[(String, java.sql.Timestamp, Long, Long)].collect()
      .groupBy(_._1).values
    r.foreach { rows =>
      val byDay = rows.sortBy(_._2.getTime)
      byDay.zipWithIndex.foreach { case ((_, day, _, roll), i) =>
        val lo = day.getTime - 6L * 86400000
        val want = byDay.take(i + 1).filter(_._2.getTime >= lo).map(_._3).sum
        assert(roll == want)
      }
    }
  }

  test("events_anomaly: exactly the days a local exact-moments recompute flags") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .as[(String, java.sql.Timestamp, Long)].collect()
    val want = daily.groupBy(_._1).flatMap { case (t, rows) =>
      val n = rows.length
      if (n <= 1) Seq.empty[(String, java.sql.Timestamp)]
      else {
        val s1 = rows.map(_._3).sum; val s2 = rows.map(r => r._3 * r._3).sum
        val mean = s1.toDouble / n
        val sd = math.sqrt((s2.toDouble - s1.toDouble * s1 / n) / (n - 1))
        rows.toSeq.collect { case (_, day, x)
          if math.abs(BigDecimal((x - mean) / sd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) >= 2.0 =>
          (t, day)
        }
      }
    }.toSet
    val got = graft.queries.EventQueries.eventsAnomaly(spark, sf)
      .select("event_type", "day").as[(String, java.sql.Timestamp)].collect().toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("orders_running: final running_spend equals the customer's exact total") {
    val r = graft.queries.RelationalQueries.ordersRunning(spark, sf)
    val lastRow = r.groupBy("o_custkey")
      .agg(max("order_no").as("n"), max("running_spend").as("final_spend"))
    val want = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(count(lit(1)).as("n2"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    val joined = lastRow.join(want, "o_custkey")
    assert(joined.where(col("n") =!= col("n2") ||
      abs(col("final_spend") - col("total")) > 1e-9).count() == 0)
    // running totals are non-decreasing (prices are positive)
    assert(r.where(col("running_spend") < 0).count() == 0)
  }

  test("customer_deciles approx path: boundaries and populations track exact") {
    // the scale path (mergeable approx_percentile sketch) must agree with
    // the exact-percentile gate query within its rank-error contract:
    // at accuracy=10000 over ~1500 customers the sketch is effectively
    // exact, so decile populations match N/10 within 2% of N and the
    // total balance is conserved exactly
    val exact = RelationalQueries.customerDeciles(spark, sf).collect()
    val approx = RelationalQueries.customerDecilesApprox(spark, sf).collect()
    val n = Tables.customer(spark, sf).count()
    assert(approx.map(_.getInt(0)).toSeq == (1 to 10), "all ten deciles present")
    approx.foreach { r =>
      assert(math.abs(r.getLong(1) - n / 10.0) <= math.max(2.0, 0.02 * n),
        s"decile ${r.getInt(0)} population ${r.getLong(1)} off N/10=${n / 10}")
    }
    // both paths partition the same rows: totals conserved
    assert(approx.map(_.getLong(1)).sum == n)
    assert(math.abs(approx.map(_.getDouble(4)).sum - exact.map(_.getDouble(4)).sum) < 1e-6)
    // min/max per decile are monotone across deciles in both paths
    val mins = approx.map(_.getDouble(2)).toSeq
    assert(mins == mins.sorted, s"approx decile mins not monotone: $mins")
  }

  test("q16_parts: gate-scale result is non-empty and excludes returned parts") {
    val r = RelationalQueries.q16Parts(spark, sf).collect()
    assert(r.nonEmpty, "q16 must compare populated outputs at gate scale")
    assert(r.map(_.getLong(1)).sum > 0)
    // cross-check the anti-join: no counted part has a recent R return
    val recent = Tables.lineitem(spark, sf)
      .where(col("l_returnflag") === "R" &&
        col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
      .select("l_partkey").distinct().count()
    val total = Tables.part(spark, sf).count()
    assert(r.map(_.getLong(1)).sum == total - recent)
  }

  test("q2_min_supplier: every row carries its part's true minimum cost") {
    val r = RelationalQueries.q2MinSupplier(spark, sf)
    val rows = r.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // min_cost equals the part's global minimum offer (argmin join is tight)
    val best = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey")).agg(min(col("l_extendedprice")).as("truth"))
    val bad = r.join(best, r("p_partkey") === best("l_partkey"))
      .where(col("min_cost") =!= col("truth")).count()
    assert(bad == 0)
    // ordering contract: s_acctbal descending
    val bals = rows.map(_.getDouble(0)).toSeq
    assert(bals == bals.sorted.reverse)
  }

  test("q13_custdist: distribution conserves customers incl. zero-order ones") {
    val r = RelationalQueries.q13Custdist(spark, sf).collect()
    val n = Tables.customer(spark, sf).count()
    assert(r.map(_.getLong(1)).sum == n, "every customer in exactly one bucket")
    // weighted count = total non-urgent orders (the outer join drops none)
    val orders = Tables.orders(spark, sf)
      .where(col("o_orderpriority") =!= "1-URGENT").count()
    assert(r.map(x => x.getLong(0) * x.getLong(1)).sum == orders)
  }

  test("q21_sole_fault: counted lines are sole returns in multi-supplier orders") {
    val rows = RelationalQueries.q21SoleFault(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // recompute the whole distribution from first principles (one collect
    // of the small-SF fact, grouped locally)
    val lines = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      .as[(Long, Long, String)].collect()
    val byOrder = lines.groupBy(_._1)
    val counts = lines.filter(_._3 == "R").filter { case (ok, sk, _) =>
      val os = byOrder(ok)
      os.exists(_._2 != sk) && !os.exists(l => l._2 != sk && l._3 == "R")
    }.groupBy(_._2).map { case (sk, ls) => sk -> ls.length.toLong }
    val names = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name")).as[(Long, String)].collect().toMap
    val want = counts.toSeq.map { case (sk, n) => (names(sk), n) }
      .sortBy { case (nm, n) => (-n, nm) }.take(rows.length)
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == want)
  }

  test("q15_top_supplier: returned suppliers carry exactly the global max revenue") {
    val rows = RelationalQueries.q15TopSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    // all ties carry the same revenue, and it IS the max over all suppliers
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length == 1)
    val perSupp = Tables.lineitem(spark, sf)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
             col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("double").as("r"))
      .select("r").as[Double].collect()
    assert(math.abs(revs.head - perSupp.max) < 1e-9)
    assert(rows.length == perSupp.count(r => math.abs(r - perSupp.max) < 1e-9))
  }

  test("q20_volume_suppliers: every returned supplier genuinely dominates its parts") {
    val rows = RelationalQueries.q20VolumeSuppliers(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute from first principles on the collected small-SF fact
    val lines = Tables.lineitem(spark, sf)
      .where(col("l_shipdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").as("q100"))
      .as[(Long, Long, Long)].collect()
    val byPS = lines.groupBy(l => (l._1, l._2)).view.mapValues(_.map(_._3).sum).toMap
    val byP = lines.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val want = byPS.collect { case ((pk, sk), q) if q * 100 > byP(pk) * 35 => sk }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == want, s"got $got want $want")
  }

  test("q7_volume_shipping: both directions, bounded years, revenue matches a local recompute") {
    val rows = RelationalQueries.q7VolumeShipping(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty, "nation pair chosen to be non-degenerate at every SF")
    val dirs = rows.map(r => (r._1, r._2)).toSet
    assert(dirs.subsetOf(Set(("NATION_13", "NATION_19"), ("NATION_19", "NATION_13"))))
    assert(dirs.size == 2, "both trade directions must appear")
    assert(rows.forall(r => r._3 >= 1996L && r._3 <= 1997L))
    assert(rows.forall(_._4 > 0.0))
    // revenue reconciles against an independent Spark-side recompute that
    // joins the other way around (customer-first) — same rows either way
    val redo = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .where(col("n_name").isin("NATION_13", "NATION_19"))
      .select(col("c_custkey"), col("n_name").as("cn"))
      .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
             col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf).select(col("n_nationkey").as("nk2"), col("n_name").as("sn")),
        col("s_nationkey") === col("nk2"))
      .where(col("sn") =!= col("cn") && col("sn").isin("NATION_13", "NATION_19"))
      .groupBy(col("sn"), col("cn"), year(col("l_shipdate")).cast("long").as("y"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("double").as("rev"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(rows.toSet == redo, s"join-order-independent result broken")
  }

  test("rangeSearch: superset-consistent with topK and monotone in tau") {
    val emb = Tables.embeddings(spark, sf)
    val q0 = graft.search.QueryVectors.qvec(0)
    val r02 = graft.search.VectorSearch.rangeSearch(emb, q0, 0.2)
      .as[(Long, Double)].collect()
    val r03 = graft.search.VectorSearch.rangeSearch(emb, q0, 0.3)
      .as[(Long, Double)].collect()
    assert(r02.forall(_._2 >= 0.2) && r03.forall(_._2 >= 0.3))
    assert(r03.map(_._1).toSet.subsetOf(r02.map(_._1).toSet))
    // every top-K hit above tau must appear in the range result
    val top = graft.search.VectorSearch.topK(emb, q0, 10)
      .as[(Long, Double)].collect().filter(_._2 >= 0.2)
    assert(top.map(_._1).toSet.subsetOf(r02.map(_._1).toSet))
  }

  test("orders_reconcile: classes partition the order set; removed = orders without lineitems") {
    val rows = RelationalQueries.ordersReconcile(spark, sf)
      .as[(String, Long, Long)].collect()
      .map { case (k, n, d) => k -> (n, d) }.toMap
    val nOrders = Tables.orders(spark, sf).count()
    val noItems = Tables.orders(spark, sf).join(
      Tables.lineitem(spark, sf).select(col("l_orderkey").as("o_orderkey")).distinct(),
      Seq("o_orderkey"), "left_anti").count()
    // every order lands in exactly one class (no lineitem orphans in this data)
    assert(rows.values.map(_._1).sum == nOrders)
    assert(rows.get("removed").map(_._1).contains(noItems))
    assert(!rows.contains("added"))
    // discrepancy totals are positive exactly where a diff exists
    assert(rows.get("changed").forall(_._2 > 0))
    rows.get("unchanged").foreach { case (_, d) => assert(d == 0L) }
  }

  test("events_anomaly_mad: robust flags agree with a driver replay of the MAD formula") {
    val got = EventQueries.eventsAnomalyMad(spark, sf)
      .select("event_type", "n", "rz")
      .as[(String, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.forall { case (_, _, rz) => math.abs(rz) >= 2.0 })
    // driver replay over the same daily counts
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .select("event_type", "n").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2.toDouble).sorted.toSeq).toMap
    def interp(v: Seq[Double], p: Double): Double = {
      val idx = p * (v.length - 1)
      val lo = math.floor(idx).toInt
      val hi = math.ceil(idx).toInt
      v(lo) + (v(hi) - v(lo)) * (idx - lo)
    }
    val flagged = daily.toSeq.flatMap { case (et, ns) =>
      val med = interp(ns, 0.5)
      val mad = interp(ns.map(x => math.abs(x - med)).sorted, 0.5)
      if (mad <= 0) Seq.empty
      else ns.map { n =>
        (et, n.toLong, math.rint(0.6745 * (n - med) / mad * 1e6) / 1e6)
      }.filter { case (_, _, rz) => math.abs(rz) >= 2.0 }
    }
    assert(got.sorted == flagged.sorted)
  }

  test("events_pagerank: hub absorbs rank; dangling mass conserved; sums to 1") {
    import graft.queries.EventQueries.pagerankOf
    // hub graph: a and b feed c, c splits back — c must rank highest
    val hub = pagerankOf(
      Seq(("a", "c", 1.0), ("b", "c", 1.0), ("c", "a", 0.5), ("c", "b", 0.5)),
      Seq("a", "b", "c"))
    assert(hub("c") > hub("a") && hub("c") > hub("b"), hub.toString)
    assert(math.abs(hub.values.sum - 1.0) < 1e-4, s"mass leaked: $hub")
    // dangling node: b has no out-edges; its mass redistributes, total
    // stays 1 and the fed node still outranks the feeder
    val dang = pagerankOf(Seq(("a", "b", 1.0)), Seq("a", "b"))
    assert(math.abs(dang.values.sum - 1.0) < 1e-4, s"dangling leaked: $dang")
    assert(dang("b") > dang("a"), dang.toString)
    // corpus run: total mass 1, deterministic, one row per event type
    val a = queries.EventQueries.eventsPagerank(spark, sf)
      .as[(String, Double)].collect()
    val b = queries.EventQueries.eventsPagerank(spark, sf)
      .as[(String, Double)].collect()
    assert(a.toSeq == b.toSeq)
    assert(math.abs(a.map(_._2).sum - 1.0) < 1e-4)
    val types = Tables.events(spark, sf).select("event_type")
      .where(col("event_type").isNotNull).distinct().count()
    assert(a.length == types)
  }

  test("q9_bucketed / q18_bucketed: the layout changes the plan, never the answer") {
    // the #294 contract, applied to the two TPC-H consumers: row-for-row
    // identity against the plain-parquet originals (the oracle the gate
    // rows share). PlanSpec pins the zero-Exchange property separately.
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    assert(rows(queries.RelationalQueries.q9Bucketed(spark, sf)) ==
      rows(queries.RelationalQueries.q9ProductProfit(spark, sf)))
    assert(rows(queries.RelationalQueries.q18Bucketed(spark, sf)) ==
      rows(queries.RelationalQueries.q18LargeOrders(spark, sf)))
  }
}
