package graft.encode

import java.text.Normalizer

/** WordPiece tokenizer — the public BERT-family algorithm (Devlin et al.
  * 2018; the lowercase variant all-MiniLM-L6-v2 ships, reference
  * run.py:137-147 encodes queries with that model).
  *
  * Basic pass: NFD-decompose and strip combining accents, lowercase,
  * drop control characters (HF `_clean_text` — removal, NOT a word
  * boundary), split on whitespace, split each punctuation character into
  * its own token, and split each CJK ideograph into its own token (the
  * real model ships `tokenize_chinese_chars=true` — without this a CJK
  * run would tokenize as one giant [UNK] word instead of per-character
  * pieces). WordPiece pass: greedy longest-match-first against the
  * vocab, continuation pieces carry the `##` prefix; a word with any
  * uncoverable remainder — or longer than `maxInputChars` — becomes
  * [UNK] whole.
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

  private def isPunct(cp: Int): Boolean = {
    // HF BasicTokenizer: ASCII non-alphanumeric printables count as
    // punctuation even where Unicode classifies them otherwise ($, +, ~…)
    val ascii = (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)
    ascii || {
      val t = Character.getType(cp)
      t == Character.CONNECTOR_PUNCTUATION || t == Character.DASH_PUNCTUATION ||
      t == Character.START_PUNCTUATION || t == Character.END_PUNCTUATION ||
      t == Character.INITIAL_QUOTE_PUNCTUATION || t == Character.FINAL_QUOTE_PUNCTUATION ||
      t == Character.OTHER_PUNCTUATION
    }
  }

  /** The public BERT `_is_chinese_char` ranges: the CJK Unified blocks
    * (base + extensions A–F) and the compatibility ideographs. Kana and
    * Hangul are deliberately NOT here — the real tokenizer leaves them as
    * words (the same published rule). */
  private def isCjk(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
    (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F) ||
    (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0x2B820 && cp <= 0x2CEAF) ||
    (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F)

  /** Basic tokenization: accent-strip, lowercase, control-char removal,
    * whitespace + punct + CJK-ideograph split (class doc). Iterates by
    * code point so supplementary-plane CJK (extensions B+) splits
    * correctly instead of breaking surrogate pairs. */
  def tokenizeWords(text: String): Seq[String] = {
    val stripped = Normalizer.normalize(text, Normalizer.Form.NFD)
      .filter(c => Character.getType(c) != Character.NON_SPACING_MARK)
      .toLowerCase
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    def flush(): Unit = { if (cur.nonEmpty) { out += cur.toString; cur.clear() } }
    var i = 0
    while (i < stripped.length) {
      val cp = stripped.codePointAt(i)
      if (Character.isWhitespace(cp)) flush()
      else if (Character.isISOControl(cp) || cp == 0xFFFD) () // HF _clean_text: dropped, NOT a boundary
      else if (isCjk(cp)) { flush(); out += new String(Character.toChars(cp)) }
      else if (isPunct(cp)) { flush(); out += new String(Character.toChars(cp)) }
      else cur.appendAll(Character.toChars(cp))
      i += Character.charCount(cp)
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
