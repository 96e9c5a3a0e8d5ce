package graft

import graft.text.Bpe
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for BPE tokenizer training/encoding (SURVEY §2 #155–156):
  * the classic Sennrich walkthrough as a golden, tie-break determinism,
  * histogram-cap determinism, and distributed == driver parity.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  // the corpus from Sennrich et al. (2016) §3.2's worked example
  private val classic = Seq(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("classic corpus learns the textbook merge sequence") {
    val merges = Bpe.trainOnHistogram(classic, 5)
    val got = merges.map(m => (m.left, m.right))
    // hand-derived: freq-9 tie (e,s)/(s,t)/(t,</w>) breaks lex → (e,s);
    // then (es,t) 9, (est,</w>) 9, then the freq-7 tie (l,o)/(o,w) → (l,o),
    // then (lo,w) 7.
    assert(got == Seq(
      ("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord), ("l", "o"), ("lo", "w")))
    assert(merges.map(_.freq) == Seq(9L, 9L, 9L, 7L, 7L))
  }

  test("encode applies merges in rank order: lowest → [low, est</w>]") {
    val ranks = Bpe.trainOnHistogram(classic, 5)
      .map(m => (m.left, m.right) -> m.rank).toMap
    assert(Bpe.encodeWord("lowest", ranks) == Seq("low", "est" + Bpe.EndOfWord))
    // unseen word falls back to finer units but still terminates
    assert(Bpe.encodeWord("xyz", ranks) == Seq("x", "y", "z", Bpe.EndOfWord))
    // a training word round-trips to its fully-merged form
    assert(Bpe.encodeWord("low", ranks) == Seq("low", Bpe.EndOfWord))
  }

  test("training is deterministic and stops when no pairs remain") {
    val twice = (1 to 2).map(_ => Bpe.trainOnHistogram(classic, 5))
    assert(twice(0) == twice(1))
    // single-char words exhaust pairs: ask for more merges than exist
    val tiny = Bpe.trainOnHistogram(Seq("ab" -> 1L), 10)
    // "a"+"b", "ab"+"</w>" and then nothing mergeable remains
    assert(tiny.size == 2)
  }

  test("wordHistogram caps deterministically by (count desc, word asc)") {
    val docs = Seq(
      (0L, "b b b a a c"), (1L, "a c d")).toDF("doc_id", "text")
    val h = Bpe.wordHistogram(docs, 3)
    assert(h.toSeq == Seq(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  test("encodeDocs matches driver-side encode per row") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val merges = Bpe.train(docs, numMerges = 40, maxWords = 1000)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    val got = Bpe.encodeDocs(docs, merges)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == texts.size)
    got.foreach { case (id, nw, nb, ratio) =>
      val words = texts(id).split(" ").filter(_.nonEmpty)
      val expB = words.map(w => Bpe.encodeWord(w, ranks).length.toLong).sum
      assert(nw == words.length.toLong, s"doc $id word count")
      assert(nb == expB, s"doc $id bpe count")
      val expR = if (words.isEmpty) 0.0
        else graft.search.VecMath.round6(expB.toDouble / words.length)
      assert(ratio == expR, s"doc $id fertility")
    }
  }

  test("more merges never increase a word's token count") {
    val mFew  = Bpe.trainOnHistogram(classic, 2).map(m => (m.left, m.right) -> m.rank).toMap
    val mMore = Bpe.trainOnHistogram(classic, 5).map(m => (m.left, m.right) -> m.rank).toMap
    Seq("low", "lower", "newest", "widest", "lowest").foreach { w =>
      assert(Bpe.encodeWord(w, mMore).length <= Bpe.encodeWord(w, mFew).length, w)
    }
  }
}
