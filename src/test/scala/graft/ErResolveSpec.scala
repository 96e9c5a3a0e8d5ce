package graft

import graft.queries.QualityQueries2
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the batch-3 widening: entity-cluster survivorship (planted
  * transitive chains, golden-record tie rules, singletons) and the
  * profile-drift moments (hand-computed means/stds/SMD on planted halves).
  */
class ErResolveSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  test("er_resolve: transitive closure, survivorship by record count then name") {
    // block "hot": chain bear–gear–year (pairwise dist 1) -> ONE cluster;
    //   "hot bear" has most records (3) -> canonical
    // block "red": "red rod" alone -> singleton cluster
    val part = Seq(
      (10L, "hot bear"), (11L, "hot bear"), (12L, "hot bear"),
      (20L, "hot gear"), (21L, "hot gear"),
      (30L, "hot year"),
      (40L, "red rod")
    ).toDF("p_partkey", "p_name")
    val got = QualityQueries2.erResolveOf(part)
      .as[(Long, String, Long, Long)].collect()
    assert(got.length == 2)
    val (cid, canon, nNames, nRecs) = got(0)
    assert(cid == 10L)                       // min node id in the component
    assert(canon == "hot bear" && nNames == 3L && nRecs == 6L)
    assert(got(1) == ((40L, "red rod", 1L, 1L)))
  }

  test("er_resolve: survivorship tie on record count breaks to the smaller name") {
    val part = Seq(
      (1L, "hot gear"), (2L, "hot gear"),
      (3L, "hot bear"), (4L, "hot bear")
    ).toDF("p_partkey", "p_name")
    val got = QualityQueries2.erResolveOf(part).collect()
    assert(got.length == 1)
    assert(got(0).getString(1) == "hot bear")  // tie 2-2 -> lexicographic
  }

  test("profile_drift: hand-computed means, stds, and SMD on planted halves") {
    // even orderkeys (grp 0): quantity 2, 4  -> mean 3, var 1
    // odd  orderkeys (grp 1): quantity 6, 10 -> mean 8, var 4
    // smd = (8-3)/sqrt((1+4)/2) = 5/sqrt(2.5)
    val li = Seq(
      (2L, 2.0, 1.0, 0.0, 0.0), (4L, 4.0, 1.0, 0.0, 0.0),
      (1L, 6.0, 1.0, 0.0, 0.0), (3L, 10.0, 1.0, 0.0, 0.0)
    ).toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val got = QualityQueries2.profileDriftOf(li).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.size == 4)
    val q = got("l_quantity")
    assert(q.getDouble(1) == 3.0 && q.getDouble(2) == 8.0)
    assert(q.getDouble(3) == 1.0 && q.getDouble(4) == 2.0)
    assert(math.abs(q.getDouble(7) - 5.0 / math.sqrt(2.5)) < 1e-6)
    assert(q.getDouble(5) == 0.0 && q.getDouble(6) == 0.0)
    // a constant column drifts nowhere: std 0 both sides
    val e = got("l_extendedprice")
    assert(e.getDouble(1) == 1.0 && e.getDouble(2) == 1.0
      && e.getDouble(3) == 0.0 && e.getDouble(4) == 0.0)
  }
}
