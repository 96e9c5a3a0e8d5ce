package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Text suite contracts vs local Scala recomputation. */
class TextSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)
  private lazy val texts: Map[Long, String] =
    docs.select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap

  test("token counts match local split") {
    val got = TextAnalysis.withTokenCounts(docs).as[(Long, Int, Int)].collect()
    got.foreach { case (id, ws, bpe) =>
      val t = texts(id)
      assert(ws == t.split(" ", -1).length, s"doc $id ws")
      assert(bpe == TextAnalysis.BpePattern.r.findAllIn(t).length, s"doc $id bpe")
    }
  }

  test("quality features match local formulas") {
    val got = TextAnalysis.withQuality(docs)
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    got.foreach { case (id, len, ntok, avgTok, stopR, alphaR, q) =>
      val t = texts(id)
      val toks = t.split(" ", -1)
      assert(len == t.length && ntok == toks.length)
      val stops = toks.count(TextAnalysis.Stopwords.contains).toDouble
      def r6(x: Double) = graft.search.VecMath.round6(x)
      assert(avgTok == r6((t.length - toks.length + 1.0) / toks.length))
      assert(stopR == r6(stops / toks.length))
      val alpha = t.count(c => c >= 'a' && c <= 'z').toDouble
      assert(alphaR == r6(alpha / t.length))
      val expect = r6(math.min(1.0, toks.length / 100.0) * 0.4 +
        math.min(1.0, stops / toks.length * 10.0) * 0.3 + alpha / t.length * 0.3)
      assert(q == expect, s"doc $id quality")
    }
  }

  test("langid picks the max-density language with priority tiebreak") {
    val got = TextAnalysis.withLangId(docs).as[(Long, String, Double)].collect()
    got.foreach { case (id, lang, score) =>
      val toks = texts(id).split(" ", -1)
      val scores = TextAnalysis.LangMarkers.map { case (l, ws) =>
        l -> toks.count(ws.contains).toDouble / toks.length
      }
      val best = scores.map(_._2).max
      val expect = if (best == 0.0) "und" else scores.find(_._2 == best).get._1
      assert(lang == expect && score == graft.search.VecMath.round6(best), s"doc $id")
    }
  }

  test("fingerprint equals local rolling hash") {
    val got = TextAnalysis.withFingerprint(docs).as[(Long, Long)].collect()
    got.foreach { case (id, fp) =>
      var h = 0L
      texts(id).foreach { c => h = (h * 31 + c.toInt) % 4294967296L }
      assert(fp == h, s"doc $id")
    }
  }

  test("fingerprint distinguishes distinct docs (no trivial collisions)") {
    val fps = TextAnalysis.withFingerprint(docs).select("fp").as[Long].collect()
    assert(fps.distinct.length > fps.length * 9 / 10)
  }
}
