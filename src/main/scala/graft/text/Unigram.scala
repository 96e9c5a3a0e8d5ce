package graft.text

import org.apache.spark.sql.DataFrame

import scala.collection.mutable

/** Unigram language-model tokenizer TRAINING (SURVEY.md §2 #171) — the
  * OTHER production subword algorithm next to BPE (Kudo, ACL 2018,
  * arXiv:1804.10959; SentencePiece's default): start from a large seed
  * vocabulary of candidate pieces, fit piece probabilities by EM over the
  * corpus segmentations, and prune low-utility pieces until the target
  * vocabulary size — where BPE GROWS a vocabulary bottom-up, unigram
  * SHRINKS one top-down, which is why the two coexist in practice.
  *
  * Scale design: the SAME word-histogram bridge as [[Bpe]] — segmentation
  * likelihood depends only on word frequencies, so training factorizes
  * into ONE distributed word count (capped, deterministic total order)
  * and a driver loop over the compact histogram: seed → (Viterbi-EM ×
  * `emIters` → prune) until `targetSize`. O(distinct words × piece len)
  * per iteration, independent of corpus bytes — the SentencePiece shape.
  *
  * This implementation uses VITERBI-EM (hard counts from the best
  * segmentation) rather than full forward–backward expected counts: the
  * standard deterministic approximation (used by several production
  * re-implementations), and the contract the specs pin. Ties in the
  * Viterbi lattice break toward the LONGER final piece, then
  * lexicographically — a total order, so training is byte-reproducible.
  *
  * Determinism: seed cap by (score DESC, piece ASC); prune keeps single
  * characters unconditionally (coverage: every word stays segmentable);
  * EM count ties in pruning break by (count DESC, piece ASC).
  */
object Unigram {

  final case class Piece(piece: String, logprob: Double, count: Long)

  val MaxPieceLen = 8
  val EmIters = 2
  val PruneKeep = 0.75 // keep top 75% of prunable pieces per round

  /** Seed vocabulary: every substring (length ≤ MaxPieceLen) of every
    * histogram word, scored by freq × occurrences, capped to `seedSize`
    * by (score DESC, piece ASC); single chars always included. */
  private[text] def seedVocab(hist: Seq[(String, Long)],
                              seedSize: Int): Map[String, Long] = {
    val score = mutable.HashMap.empty[String, Long]
    hist.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= MaxPieceLen && i + l <= w.length) {
          val p = w.substring(i, i + l)
          score.update(p, score.getOrElse(p, 0L) + c)
          l += 1
        }
        i += 1
      }
    }
    val chars = score.keysIterator.filter(_.length == 1).toSeq
    val multi = score.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, s) => (-s, p) }
      .take(math.max(seedSize - chars.length, 0))
    (chars.map(c => c -> score(c)) ++ multi).toMap
  }

  /** Viterbi-best segmentation of `w` under piece log-probs. Ties break
    * toward the longer final piece, then the lexicographically smaller
    * one. Returns null when `w` cannot be segmented (never happens while
    * all single chars stay in the vocabulary). */
  private[text] def viterbi(w: String,
                            lp: collection.Map[String, Double]): Array[String] = {
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1) // length of final piece at i
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= MaxPieceLen && l <= i) {
        val p = w.substring(i - l, i)
        lp.get(p) match {
          case Some(x) if best(i - l) != Double.NegativeInfinity =>
            val cand = best(i - l) + x
            if (cand > best(i) || (cand == best(i) && l > back(i))) {
              best(i) = cand; back(i) = l
            }
          case _ =>
        }
        l += 1
      }
      i += 1
    }
    if (best(n) == Double.NegativeInfinity) return null
    val out = mutable.ArrayBuffer.empty[String]
    var j = n
    while (j > 0) { out += w.substring(j - back(j), j); j -= back(j) }
    out.reverseIterator.toArray
  }

  /** Train on the compact histogram: seed → (Viterbi-EM → prune) until
    * `targetSize` pieces remain, then a final EM pass for clean probs. */
  def trainOnHistogram(hist: Seq[(String, Long)],
                       targetSize: Int): Seq[Piece] = {
    require(targetSize > 0, "unigram: targetSize must be positive")
    var vocab: Map[String, Long] = seedVocab(hist, targetSize * 4)

    def emCounts(lp: collection.Map[String, Double]): mutable.HashMap[String, Long] = {
      val cnt = mutable.HashMap.empty[String, Long]
      hist.foreach { case (w, c) =>
        val seg = viterbi(w, lp)
        if (seg != null) seg.foreach(p => cnt.update(p, cnt.getOrElse(p, 0L) + c))
      }
      cnt
    }

    def logprobs(counts: collection.Map[String, Long]): Map[String, Double] = {
      val total = math.max(counts.valuesIterator.sum, 1L).toDouble
      counts.iterator.map { case (p, c) =>
        p -> math.log(math.max(c, 1L) / total)
      }.toMap
    }

    var lp = logprobs(vocab)
    var guard = 0
    while (vocab.size > targetSize && guard < 100) {
      var it = 0
      var counts = emCounts(lp)
      while (it < EmIters - 1) {
        lp = logprobs(counts.map { case (p, c) => p -> c } ++
          vocab.keysIterator.filterNot(counts.contains).map(_ -> 0L))
        counts = emCounts(lp)
        it += 1
      }
      // prune: single chars are immortal (coverage); of the rest, keep
      // the top PruneKeep fraction by (EM count DESC, piece ASC), at
      // least down to the target
      val chars = vocab.keysIterator.filter(_.length == 1).toSeq
      val prunable = vocab.keysIterator.filter(_.length > 1).toSeq
        .sortBy(p => (-counts.getOrElse(p, 0L), p))
      val keepN = math.max(targetSize - chars.length,
        math.min(prunable.length, (prunable.length * PruneKeep).toInt))
      val kept = prunable.take(keepN)
      vocab = (chars ++ kept).map(p => p -> counts.getOrElse(p, 0L)).toMap
      lp = logprobs(vocab)
      guard += 1
    }
    val finalCounts = emCounts(lp)
    val finalLp = logprobs(finalCounts.map { case (p, c) => p -> c } ++
      vocab.keysIterator.filterNot(finalCounts.contains).map(_ -> 0L))
    vocab.keysIterator.toSeq.sorted.map { p =>
      Piece(p, math.rint(finalLp(p) * 1e6) / 1e6, finalCounts.getOrElse(p, 0L))
    }.sortBy(pc => (-pc.count, pc.piece))
  }

  /** Test seam: the exact Viterbi the trainer uses (UnigramSpec). */
  def viterbiForTest(w: String,
                     lp: collection.Map[String, Double]): Array[String] =
    viterbi(w, lp)

  /** One distributed capped word count + the driver loop — Bpe.train's
    * shape on the unigram algorithm. */
  def train(docs: DataFrame, targetSize: Int, maxWords: Int): Seq[Piece] =
    trainOnHistogram(Bpe.wordHistogram(docs, maxWords).toSeq, targetSize)
}
