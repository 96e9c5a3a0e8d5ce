package graft

import graft.text.Unigram
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer training contracts (SURVEY.md §2 #171). */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("textbook corpus: shared stems survive pruning as pieces") {
    // the Sennrich teaching corpus: low/lower/newest/widest share stems
    val hist = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val pieces = Unigram.trainOnHistogram(hist, targetSize = 18)
    val vocab = pieces.map(_.piece).toSet
    // every single character must survive (coverage)
    hist.flatMap(_._1.toSeq).distinct.foreach { c =>
      assert(vocab.contains(c.toString), s"char '$c' pruned — coverage broken")
    }
    // hard Viterbi-EM is winner-take-all: the best model of a frequent
    // word is the word itself, so whole high-frequency words survive as
    // pieces (BPE's bottom-up growth is where "est" emerges — that
    // golden is pinned in BpeSpec; unigram prunes top-down instead)
    assert(vocab.contains("low"), s"stem 'low' missing from $vocab")
    assert(vocab.contains("newest"), s"top word 'newest' missing from $vocab")
    assert(vocab.contains("lower"), s"word 'lower' missing from $vocab")
    // pruning actually happened: seed had far more candidates than kept
    assert(pieces.length <= 18)
  }

  test("viterbi: matches brute-force best segmentation, ties to longer piece") {
    val lp = Map("a" -> -3.0, "b" -> -3.0, "ab" -> -2.0, "abc" -> -4.0,
      "c" -> -2.5, "bc" -> -5.0)
    // brute force over all segmentations of "abc"
    def all(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to w.length).flatMap { l =>
        val h = w.take(l)
        if (lp.contains(h)) all(w.drop(l)).map(h +: _) else Seq.empty
      }
    val best = all("abc").maxBy(seg => (seg.map(lp).sum, seg.last.length))
    val got = Unigram.viterbiForTest("abc", lp).toSeq
    assert(got.map(lp).sum == best.map(lp).sum, s"$got vs $best")
    // tie case: "ab"+"c" (-4.5) vs "abc" (-4.0) → abc wins outright;
    // craft an exact tie and check the longer-final-piece rule
    val lp2 = Map("x" -> -1.0, "xx" -> -2.0)
    assert(Unigram.viterbiForTest("xx", lp2).toSeq == Seq("xx"))
  }

  test("unsegmentable word returns null (missing char)") {
    assert(Unigram.viterbiForTest("aQ", Map("a" -> -1.0)) == null)
  }

  test("training is deterministic and the registered query is stable") {
    val a = Unigram.trainOnHistogram(Seq(("seed", 3L), ("seeds", 2L), ("see", 4L)), 12)
    val b = Unigram.trainOnHistogram(Seq(("seed", 3L), ("seeds", 2L), ("see", 4L)), 12)
    assert(a == b)
    val q1 = queries.TextQueries.textUnigramTrain(spark, sf)
      .as[(String, Double, Long)].collect()
    val q2 = queries.TextQueries.textUnigramTrain(spark, sf)
      .as[(String, Double, Long)].collect()
    assert(q1.toSeq == q2.toSeq)
    assert(q1.nonEmpty && q1.length <= queries.TextQueries.UnigramTarget)
    // counts are positive for the head of the table and logprobs negative
    assert(q1.head._3 > 0 && q1.forall(_._2 < 0))
    // every corpus word segments under the learned vocab (coverage)
    val lp = q1.map(r => r._1 -> r._2).toMap
    val words = graft.text.Bpe.wordHistogram(
      Tables.documents(spark, sf), 50000).map(_._1)
    words.foreach { w =>
      assert(Unigram.viterbiForTest(w, lp) != null, s"word '$w' unsegmentable")
    }
  }
}
