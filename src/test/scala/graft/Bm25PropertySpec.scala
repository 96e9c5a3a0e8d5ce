package graft

import graft.text.Bm25
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for BM25 against a direct local model over arbitrary
  * small corpora and term sets — guards the distributed formulation (the
  * filtered explode, the window-df, the broadcast stats) across shapes
  * hand tests don't reach: repeated terms in a doc, terms absent from the
  * corpus, single-doc corpora, every-doc-matches, duplicate docs.
  * Fixed-seed generators (deterministic CI), the FilterDslPropertySpec
  * convention. */
class Bm25PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val vocab = Vector("a", "b", "c", "dd", "ee", "ff", "zz")
  private val docGen: Gen[String] =
    Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab))).map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, docGen))
  private val termsGen: Gen[List[String]] =
    Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab :+ "absent")))
      .map(_.distinct)

  private def localBm25(corpus: Seq[(Long, String)], terms: Seq[String])
      : Map[Long, (Double, Long)] = {
    val tokss = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val n = corpus.size.toDouble
    val avgdl = tokss.map(_._2.size).sum.toDouble / n
    val df = terms.map(t => t -> tokss.count(_._2.contains(t)).toDouble).toMap
    tokss.flatMap { case (id, toks) =>
      val dl = toks.size.toDouble
      val hits = terms.filter(t => toks.contains(t))
      if (hits.isEmpty) None
      else {
        val s = hits.map { t =>
          val tf = toks.count(_ == t).toDouble
          math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) * tf * (Bm25.K1 + 1.0) /
            (tf + Bm25.K1 * (1.0 - Bm25.B + Bm25.B * dl / avgdl))
        }.sum
        Some(id -> (graft.search.VecMath.round6(s), hits.size.toLong))
      }
    }.toMap
  }

  test("scores() equals the local model on 30 random corpus/term draws") {
    (1 to 30).foreach { i =>
      val corpus = sample(corpusGen, 1000L + i).zipWithIndex
        .map { case (t, id) => (id.toLong, t) }
      val terms = sample(termsGen, 2000L + i)
      val got = Bm25.scores(corpus.toDF("doc_id", "text"), terms)
        .as[(Long, Double, Long)].collect()
        .map { case (id, s, nt) => id -> (s, nt) }.toMap
      val want = localBm25(corpus, terms)
      // compare at 1e-6 (the rounding grid): sum order across ≤4 terms can
      // differ at the last ulp between the two evaluation orders
      assert(got.keySet == want.keySet, s"draw $i: doc sets differ")
      got.foreach { case (id, (s, nt)) =>
        val (ws, wnt) = want(id)
        assert(nt == wnt, s"draw $i doc $id n_terms")
        assert(math.abs(s - ws) <= 1e-6, s"draw $i doc $id: $s vs $ws")
      }
    }
  }

  test("batchScores() restricted to each qid equals scores() on 10 draws") {
    (1 to 10).foreach { i =>
      val corpus = sample(corpusGen, 3000L + i).zipWithIndex
        .map { case (t, id) => (id.toLong, t) }
      val batch = (0 until 3).map { q =>
        q.toLong -> sample(termsGen, 4000L + 10 * i + q)
      }
      val df = corpus.toDF("doc_id", "text")
      val got = Bm25.batchScores(df, batch)
        .as[(Long, Long, Double, Long)].collect()
        .groupBy(_._1).view
        .mapValues(_.map(r => r._2 -> (r._3, r._4)).toMap).toMap
      batch.foreach { case (qid, terms) =>
        val single = Bm25.scores(df, terms)
          .as[(Long, Double, Long)].collect()
          .map { case (id, s, nt) => id -> (s, nt) }.toMap
        assert(got.getOrElse(qid, Map.empty) == single, s"draw $i qid $qid")
      }
    }
  }
}
