package graft

import graft.streaming.DedupSpansStreaming
import graft.text.TextAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming/incremental span removal (#153, the dedup_incremental
  * symmetry for #152): sequential cleanBatch calls against the
  * accumulated gram store must reproduce, unit by unit, exactly what the
  * batch operator computes on the union under ordered doc ids — and the
  * store must grow by DISTINCT grams, not occurrences. */
class DedupSpansStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val n = 13
  private def words(prefix: String, a: Int, b: Int) =
    (a to b).map(i => s"$prefix$i").mkString(" ")

  // corpus: an internal verbatim pair (1,2) + unique docs
  private val corpus = Seq(
    (0L, words("c", 1, 30)),
    (1L, words("x", 1, 40)),
    (2L, words("x", 1, 40)),              // within-corpus copy of 1
    (3L, "short doc"),
    (4L, words("u", 1, 25)))
  // batch 1: re-posts a corpus doc, adds fresh content + a self-repeat
  private val b1 = Seq(
    (10L, words("c", 1, 30)),             // copy of corpus doc 0
    (11L, words("f", 1, 35)),
    (12L, words("f", 1, 20) + " " + words("f", 1, 20))) // overlaps 11's prefix
  // batch 2: re-posts from corpus AND batch 1, plus fresh
  private val b2 = Seq(
    (20L, words("x", 1, 40)),             // copy of corpus 1/2
    (21L, words("f", 1, 35)),             // copy of b1 doc 11
    (22L, words("z", 1, 30)))

  private def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
  private def rowsOf(d: org.apache.spark.sql.DataFrame) =
    d.orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq

  test("sequential cleanBatch == batch operator on the union (ordered replay)") {
    val all = corpus ++ b1 ++ b2
    val want = rowsOf(TextAnalysis.withDedupSpans(df(all), n))
    val (c0, s1) = DedupSpansStreaming.cleanBatch(df(corpus),
      DedupSpansStreaming.emptyStore(spark), n)
    val got0 = rowsOf(c0)
    val s1m = s1.persist(); s1m.count()
    val (c1, s2) = DedupSpansStreaming.cleanBatch(df(b1), s1m, n)
    val got1 = rowsOf(c1)
    val s2m = s2.persist(); s2m.count()
    val (c2, s3) = DedupSpansStreaming.cleanBatch(df(b2), s2m, n)
    val got2 = rowsOf(c2)
    val wantBy = want.groupBy(_._1).view.mapValues(_.head).toMap
    (got0 ++ got1 ++ got2).foreach { r =>
      assert(r == wantBy(r._1), s"doc ${r._1}: incremental $r vs batch ${wantBy(r._1)}")
    }
    // the store holds each distinct gram once, never per occurrence
    val distinctGrams = all.flatMap { case (_, txt) =>
      val tk = txt.split(" ", -1)
      if (tk.length < n) Seq.empty
      else (0 to tk.length - n).map(i => tk.slice(i, i + n).mkString(" "))
    }.distinct.size
    assert(s3.count() == distinctGrams.toLong, "store must be distinct-gram-sized")
    s1m.unpersist(); s2m.unpersist()
  }

  test("foreachBatch writer twin: per-batch sinks match sequential cleanBatch") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val sunk = scala.collection.mutable.Map.empty[Long, Seq[(Long, Long, Long, String)]]
    val q = DedupSpansStreaming.writer(
      stream.toDF().toDF("doc_id", "text"), spark, n) { (cleaned, id) =>
        sunk(id) = rowsOf(cleaned)
      }.start()
    try {
      stream.addData(corpus: _*); q.processAllAvailable()
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val want = rowsOf(TextAnalysis.withDedupSpans(df(corpus ++ b1 ++ b2), n))
      .groupBy(_._1).view.mapValues(_.head).toMap
    val got = sunk.values.flatten.toSeq
    assert(got.map(_._1).sorted == (corpus ++ b1 ++ b2).map(_._1).sorted,
      "every doc cleaned exactly once across batches")
    got.foreach(r => assert(r == want(r._1), s"doc ${r._1} diverges from batch run"))
  }
}
