package graft

import graft.queries.{QualityQueries, QualityQueries2}
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the round-14 widening, across shapes the hand
  * tests don't reach. Invariants, not value replays: er_resolve emits a
  * valid partition with in-cluster canonicals and conserved record mass;
  * scd2_events tiles each user's observed days exactly (no gaps inside
  * an interval beyond missing days, intervals ordered, exactly one
  * current); feat_customer_orders is leak-free (features at row t depend
  * only on orders ≤ t, label only on t+1); profile_drift's SMD sign
  * follows the mean shift. Fixed-seed generators (deterministic CI).
  */
class QualityPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def ts(day: Int, min: Int = 0) =
    new Timestamp(1700000000000L + day * 86400000L + min * 60000L)

  // --- er_resolve: partition validity + conservation -------------------

  private val partsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 120)
    rows <- Gen.listOfN(n,
      for {
        adj <- Gen.oneOf("hot", "red", "blue", "big")
        noun <- Gen.oneOf("gear", "bear", "year", "rod", "ring", "bolt")
      } yield s"$adj $noun")
  } yield rows.zipWithIndex.map { case (nm, i) => ((i + 1).toLong, nm) }

  test("er_resolve: valid partition, canonical in cluster, record mass conserved") {
    (1 to 10).foreach { i =>
      val rows = sample(partsGen, 9100L + i)
      val part = rows.toDF("p_partkey", "p_name")
      val clusters = QualityQueries2.erResolveOf(part)
        .as[(Long, String, Long, Long)].collect()
      // record mass conserved: every record is in exactly one cluster
      assert(clusters.map(_._4).sum == rows.length, s"draw $i")
      // distinct names conserved
      assert(clusters.map(_._3).sum == rows.map(_._2.toLowerCase).distinct.length)
      // cluster ids unique
      assert(clusters.map(_._1).distinct.length == clusters.length)
      // the canonical name really is a member name (its records are in
      // the cluster's mass): n_records >= canonical's own record count
      val byName = rows.groupBy(_._2.toLowerCase).view.mapValues(_.length).toMap
      clusters.foreach { case (_, canon, _, nRecs) =>
        assert(byName(canon) <= nRecs)
      }
    }
  }

  // --- scd2_events: interval tiling ------------------------------------

  private val eventsGen: Gen[List[(Long, Int, Int, Long, Int)]] = for {
    nUsers <- Gen.chooseNum(1, 6)
    rows <- Gen.listOfN(nUsers, for {
      nEv <- Gen.chooseNum(1, 40)
      evs <- Gen.listOfN(nEv, for {
        day <- Gen.chooseNum(0, 14)
        min <- Gen.chooseNum(0, 600)
        k <- Gen.chooseNum(0, 99)
      } yield (day, min, k))
    } yield evs)
  } yield rows.zipWithIndex.flatMap { case (evs, u) =>
    evs.zipWithIndex.map { case ((d, m, k), j) =>
      ((u * 10000 + j + 1).toLong, d, m, (u + 1).toLong, k)
    }
  }

  test("scd2_events: intervals tile observed days, one current per user") {
    (1 to 10).foreach { i =>
      val rows = sample(eventsGen, 9200L + i)
      val ev = rows.map { case (id, d, m, u, k) =>
        (id, ts(d, m), u, "click", 1.0, s"""{"k": $k}""")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val got = QualityQueries.scd2EventsOf(ev)
        .as[(Long, Long, java.sql.Date, java.sql.Date, Long, Boolean)].collect()
      got.groupBy(_._1).foreach { case (u, ivs) =>
        val sorted = ivs.sortBy(_._3.getTime)
        // exactly one current, and it is the LAST interval
        assert(sorted.count(_._6) == 1 && sorted.last._6)
        // intervals ordered and non-overlapping
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._4.getTime < b._3.getTime)
          case _ =>
        }
        // adjacent intervals have DIFFERENT tiers (maximal islands)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._2 != b._2)
          case _ =>
        }
        // n_days sums to the user's observed distinct CALENDAR days (the
        // base epoch is 22:13 UTC, so minute offsets can cross midnight)
        val observed = rows.filter(_._4 == u)
          .map { case (_, d, m, _, _) =>
            (1700000000000L + d * 86400000L + m * 60000L) / 86400000L }
          .distinct.length
        assert(sorted.map(_._5).sum == observed)
      }
    }
  }

  // --- feat_customer_orders: leak-freedom ------------------------------

  private val ordersGen: Gen[List[(Long, Long, Int, Double)]] = for {
    nCust <- Gen.chooseNum(1, 5)
    rows <- Gen.listOfN(nCust, for {
      nOrd <- Gen.chooseNum(1, 15)
      os <- Gen.listOfN(nOrd, for {
        day <- Gen.chooseNum(0, 60)
        price <- Gen.chooseNum(1, 9999).map(_ / 100.0 * 100)
      } yield (day, price))
    } yield os)
  } yield rows.zipWithIndex.flatMap { case (os, c) =>
    os.zipWithIndex.map { case ((d, p), j) =>
      ((c * 1000 + j + 1).toLong, (c + 1).toLong, d, p)
    }
  }

  test("feat_customer_orders: point-in-time features never read the future") {
    (1 to 10).foreach { i =>
      val rows = sample(ordersGen, 9300L + i)
      val orders = rows.map { case (ok, ck, d, p) => (ok, ck, ts(d), p) }
        .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val got = QualityQueries.featCustomerOrdersOf(orders).collect()
      got.groupBy(_.getLong(0)).foreach { case (cust, rs) =>
        val ordered = rs.sortBy(_.getLong(3)) // ord_idx
        // spend_so_far is the running prefix sum of this customer's prices
        // in (date, orderkey) order — a FUTURE order can't contribute
        val hist = rows.filter(_._2 == cust)
          .sortBy(r => (r._3, r._1)).map(_._4)
        ordered.zipWithIndex.foreach { case (r, idx) =>
          val want = hist.take(idx + 1).map(BigDecimal(_)).sum.toDouble
          assert(math.abs(r.getDouble(5) - want) < 1e-6)
        }
        // censoring: exactly the last order has a NULL label
        assert(ordered.count(_.isNullAt(7)) == 1 && ordered.last.isNullAt(7))
      }
    }
  }

  // --- profile_drift: SMD sign follows the mean shift ------------------

  test("profile_drift: SMD sign matches the planted mean shift direction") {
    (1 to 5).foreach { i =>
      val shift = i * 2.0
      // even keys low, odd keys high by `shift` with jitter
      val rows = (1L to 60L).map { k =>
        val base = 10.0 + (k % 5)
        (k, if (k % 2 == 0) base else base + shift, 1.0, 0.0, 0.0)
      }
      val li = rows.toDF("l_orderkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax")
      val q = QualityQueries2.profileDriftOf(li).collect()
        .find(_.getString(0) == "l_quantity").get
      assert(q.getDouble(2) > q.getDouble(1))   // mean_b > mean_a
      assert(q.getDouble(7) > 0)                // smd positive
    }
  }
}
