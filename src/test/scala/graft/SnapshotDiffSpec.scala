package graft

import graft.operators.SnapshotDiff
import org.scalatest.funsuite.AnyFunSuite

/** SnapshotDiff contracts: the four-way classification, null-safe column
  * comparison, the changed-column name list, and totality (every key of
  * either snapshot appears exactly once).
  */
class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def run() = {
    val old = Seq(
      (1L, "a", Some(10)),  // unchanged
      (2L, "b", Some(20)),  // value change
      (3L, "c", None),      // null -> value change
      (4L, "d", Some(40)),  // removed
      (5L, "e", None)       // null == null unchanged
    ).toDF("k", "s", "v")
    val neu = Seq(
      (1L, "a", Some(10)),
      (2L, "B", Some(21)),
      (3L, "c", Some(30)),
      (5L, "e", None),
      (6L, "f", Some(60))   // added
    ).toDF("k", "s", "v")
    SnapshotDiff.diff(old, neu, Seq("k"))
      .select("k", "change_type", "changed_cols")
      .as[(Long, String, Seq[String])].collect().sortBy(_._1).toSeq
  }

  test("classification, null-safety, and changed-column names") {
    assert(run() == Seq(
      (1L, "unchanged", Seq.empty),
      (2L, "changed", Seq("s", "v")),
      (3L, "changed", Seq("v")),
      (4L, "removed", Seq.empty),
      (5L, "unchanged", Seq.empty),
      (6L, "added", Seq.empty)))
  }

  test("totality: each key appears exactly once; old/new value columns survive") {
    val old = Seq((1L, 10), (2L, 20)).toDF("k", "v")
    val neu = Seq((2L, 25), (3L, 30)).toDF("k", "v")
    val out = SnapshotDiff.diff(old, neu, Seq("k"))
    assert(out.columns.toSet == Set("k", "old_v", "new_v", "change_type", "changed_cols"))
    val rows = out.select("k", "old_v", "new_v", "change_type")
      .as[(Long, Option[Int], Option[Int], String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq(
      (1L, Some(10), None, "removed"),
      (2L, Some(20), Some(25), "changed"),
      (3L, None, Some(30), "added")))
  }

  test("missing compare column in the new snapshot is rejected") {
    val old = Seq((1L, 10)).toDF("k", "v")
    val neu = Seq((1L, "x")).toDF("k", "w")
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(old, neu, Seq("k"))
    }
  }
}
