package graft.encode

import java.text.Normalizer

/** WordPiece tokenizer — the public BERT-family algorithm (Devlin et al.
  * 2018; the lowercase variant all-MiniLM-L6-v2 ships, reference
  * run.py:137-147 encodes queries with that model).
  *
  * Basic pass: NFD-decompose and strip combining accents, lowercase,
  * split on whitespace, and split each punctuation character into its own
  * token (HF BasicTokenizer semantics). WordPiece pass: greedy longest-
  * match-first against the vocab, continuation pieces carry the `##`
  * prefix; a word with any uncoverable remainder — or longer than
  * `maxInputChars` — becomes [UNK] whole.
  *
  * Pure, allocation-light, Serializable: one instance rides inside each
  * executor-side encoder (the per-partition batch shape).
  */
final class WordPiece(val vocab: Map[String, Int],
                      val unkToken: String = "[UNK]",
                      val clsToken: String = "[CLS]",
                      val sepToken: String = "[SEP]",
                      maxInputChars: Int = 100) extends Serializable {

  require(vocab.contains(unkToken), s"vocab missing $unkToken")

  private def isPunct(c: Char): Boolean = {
    // HF BasicTokenizer: ASCII non-alphanumeric printables count as
    // punctuation even where Unicode classifies them otherwise ($, +, ~…)
    val ascii = (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
      (c >= 91 && c <= 96) || (c >= 123 && c <= 126)
    ascii || {
      val t = Character.getType(c)
      t == Character.CONNECTOR_PUNCTUATION || t == Character.DASH_PUNCTUATION ||
      t == Character.START_PUNCTUATION || t == Character.END_PUNCTUATION ||
      t == Character.INITIAL_QUOTE_PUNCTUATION || t == Character.FINAL_QUOTE_PUNCTUATION ||
      t == Character.OTHER_PUNCTUATION
    }
  }

  /** Basic tokenization: accent-strip, lowercase, whitespace + punct split. */
  def tokenizeWords(text: String): Seq[String] = {
    val stripped = Normalizer.normalize(text, Normalizer.Form.NFD)
      .filter(c => Character.getType(c) != Character.NON_SPACING_MARK)
      .toLowerCase
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    def flush(): Unit = { if (cur.nonEmpty) { out += cur.toString; cur.clear() } }
    stripped.foreach { c =>
      if (Character.isWhitespace(c) || Character.isISOControl(c)) flush()
      else if (isPunct(c)) { flush(); out += c.toString }
      else cur += c
    }
    flush()
    out.result()
  }

  /** Greedy longest-match-first subword split of ONE word. */
  def wordpiece(word: String): Seq[String] = {
    if (word.length > maxInputChars) return Seq(unkToken)
    val pieces = Seq.newBuilder[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found: String = null
      while (found == null && end > start) {
        val sub = (if (start > 0) "##" else "") + word.substring(start, end)
        if (vocab.contains(sub)) found = sub else end -= 1
      }
      if (found == null) return Seq(unkToken) // uncoverable remainder → whole word UNK
      pieces += found
      start = end
    }
    pieces.result()
  }

  def tokenize(text: String): Seq[String] =
    tokenizeWords(text).flatMap(wordpiece)

  /** Token ids with [CLS]/[SEP] framing, truncated to `maxLen` total
    * (the BERT convention: content is cut so the [SEP] always fits). */
  def encode(text: String, maxLen: Int = 128): Array[Int] = {
    val body = tokenize(text).take(math.max(0, maxLen - 2))
    val withSpecial =
      (if (vocab.contains(clsToken)) Seq(clsToken) else Nil) ++ body ++
      (if (vocab.contains(sepToken)) Seq(sepToken) else Nil)
    withSpecial.map(t => vocab.getOrElse(t, vocab(unkToken))).toArray
  }
}

object WordPiece {
  /** Load a BERT vocab.txt (one token per line; line number = id). */
  def fromFile(path: String): WordPiece = {
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    val vocab = scala.jdk.CollectionConverters.ListHasAsScala(lines).asScala
      .zipWithIndex.map { case (t, i) => (t.trim, i) }
      .filter(_._1.nonEmpty).toMap
    new WordPiece(vocab)
  }

  /** A minimal fully-covering lowercase vocab (specials + a-z + digits as
    * both word-initial and ## continuation pieces): every basic-pass token
    * of lowercase text tokenizes without UNK. Used by the seeded tiny
    * model; real deployments load the model's own vocab.txt. */
  def charVocab: Map[String, Int] = {
    val chars = ('a' to 'z') ++ ('0' to '9')
    val toks = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]") ++
      chars.map(_.toString) ++ chars.map(c => s"##$c") ++
      Seq(".", ",", "!", "?", "-", "'")
    toks.zipWithIndex.toMap
  }
}
