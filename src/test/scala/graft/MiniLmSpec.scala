package graft

import graft.encode.{MiniLm, WordPiece}
import org.scalatest.funsuite.AnyFunSuite

/** The qtext → qvec encoder (reference run.py:137-147 / artifacts.py):
  * WordPiece against the published algorithm's canonical cases, the math
  * kernels against hand-computed values, the forward pass against its
  * architectural contracts (determinism, unit norm, order sensitivity),
  * and the .npy weight layout round-trip. No real model weights ship in
  * this container, so parity with all-MiniLM-L6-v2's OUTPUTS is not
  * testable here — the contracts below pin everything a weight file
  * doesn't: tokenization, kernel math, wiring, pooling, normalization. */
class MiniLmSpec extends AnyFunSuite {

  private lazy val spark = SparkTest.session

  // ---- WordPiece ---------------------------------------------------------

  private val wpVocab = Map(
    "[UNK]" -> 0, "[CLS]" -> 1, "[SEP]" -> 2,
    "un" -> 3, "##aff" -> 4, "##able" -> 5, "hello" -> 6, "world" -> 7,
    "," -> 8, "!" -> 9, "cafe" -> 10, "run" -> 11, "##ner" -> 12, "runn" -> 13)
  private val wp = new WordPiece(wpVocab)

  test("wordpiece: canonical greedy longest-match split (unaffable)") {
    assert(wp.tokenize("unaffable") == Seq("un", "##aff", "##able"))
  }

  test("wordpiece: longest-match-first prefers runn over run when coverable") {
    // greedy tries 'runner' then 'runn' (in vocab) — but then '##er' is
    // uncoverable, and BERT's published algorithm does NOT backtrack:
    // the whole word becomes [UNK] even though run + ##ner would work
    assert(wp.tokenize("runner") == Seq("[UNK]"))
    // with no 'runn' entry the run/##ner path is found
    val wp2 = new WordPiece(wpVocab - "runn")
    assert(wp2.tokenize("runner") == Seq("run", "##ner"))
  }

  test("basic pass: punctuation splits, lowercase, accent strip") {
    assert(wp.tokenize("Hello, World!") == Seq("hello", ",", "world", "!"))
    assert(wp.tokenize("Café") == Seq("cafe")) // NFD accent strip
  }

  test("uncoverable word becomes [UNK] whole, not partial pieces") {
    assert(wp.tokenize("xyz") == Seq("[UNK]"))
  }

  test("encode frames with [CLS]/[SEP] and truncates to maxLen") {
    val ids = wp.encode("hello world", maxLen = 128)
    assert(ids.head == wpVocab("[CLS]") && ids.last == wpVocab("[SEP]"))
    assert(ids.toSeq == Seq(1, 6, 7, 2))
    val t = wp.encode("hello world hello world hello", maxLen = 4)
    assert(t.length == 4 && t.last == wpVocab("[SEP]"), "content cut so [SEP] fits")
  }

  test("charVocab covers every lowercase alphanumeric word (no UNK)") {
    val cv = new WordPiece(WordPiece.charVocab)
    val toks = cv.tokenize("affordable italian restaurant 42")
    assert(!toks.contains("[UNK]"))
    assert(toks.take(2) == Seq("a", "##f"))
  }

  test("CJK ideographs split per character (tokenize_chinese_chars parity)") {
    val v = wpVocab ++ Map("深" -> 20, "度" -> 21, "hi" -> 22)
    val wpC = new WordPiece(v)
    // each ideograph is its own word — NOT one [UNK] run, NOT glued to latin
    assert(wpC.tokenize("hi深度hi") == Seq("hi", "深", "度", "hi"))
    // an ideograph missing from the vocab UNKs alone, neighbors survive
    assert(wpC.tokenize("深圳") == Seq("深", "[UNK]"))
    // kana/hangul are NOT CJK-split (the published rule): uncovered → one UNK word
    assert(wpC.tokenize("ひらがな") == Seq("[UNK]"))
  }

  test("control characters are removed, not word boundaries (HF _clean_text)") {
    // a \u0001 inside a word joins the halves — 'hello' must still match
    assert(wp.tokenize("hel\u0001lo") == Seq("hello"))
    assert(wp.tokenize("hello\uFFFD") == Seq("hello"))
    // but \t and \n stay whitespace (boundary), not removal
    assert(wp.tokenize("hello\tworld") == Seq("hello", "world"))
  }

  test("word longer than maxInputChars becomes [UNK] whole") {
    val wpShort = new WordPiece(WordPiece.charVocab)
    val longWord = "a" * 101 // default maxInputChars = 100
    assert(wpShort.tokenize(longWord) == Seq("[UNK]"))
    assert(wpShort.tokenize("a" * 100) != Seq("[UNK]"), "100 chars still tokenizes")
  }

  // ---- real-weight golden parity (fixture-activated) ---------------------
  //
  // Zero-egress container: the real all-MiniLM-L6-v2 export cannot be
  // downloaded here, so these tests CANCEL (assume) until a user drops the
  // fixtures in — fixtures/minilm/README.md documents the five-line public
  // export. Once present, they fail on ANY divergence from the reference
  // model: tokenizer ids against the real vocab.txt (unicode, ##, unk,
  // truncation — where silent drift hides) and sentence embeddings at
  // 1e-5 (tensor-name mapping, head-split order, pooling).

  private val goldenDir = sys.env.getOrElse("GRAFT_MINILM_GOLDEN", "fixtures/minilm")
  private def golden(name: String) = new java.io.File(s"$goldenDir/$name")
  private def goldenLines(name: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(golden(name).toPath).asScala.toSeq
      .filter(_.nonEmpty)
  }

  test("GOLDEN tokenizer: ids over the real vocab match the HF export") {
    assume(golden("vocab.txt").exists() && golden("tokens.tsv").exists(),
      s"real-model fixtures absent under $goldenDir")
    val real = WordPiece.fromFile(s"$goldenDir/vocab.txt")
    val cases = goldenLines("tokens.tsv")
    assert(cases.nonEmpty, "tokens.tsv is empty")
    cases.foreach { ln =>
      val parts = ln.split("\t", 2)
      val want = parts(1).trim.split("\\s+").map(_.toInt).toSeq
      val got = real.encode(parts(0), maxLen = 128).toSeq
      assert(got == want,
        s"tokenizer divergence on '${parts(0)}': got $got want $want")
    }
  }

  test("GOLDEN embeddings: real-weight encode matches reference vectors at 1e-5") {
    assume(golden("vocab.txt").exists() && golden("embeddings.tsv").exists() &&
      golden("embeddings.word_embeddings.weight.npy").exists(),
      s"real-model fixtures absent under $goldenDir")
    val enc = new MiniLm.Encoder(MiniLm.load(goldenDir))
    val cases = goldenLines("embeddings.tsv")
    assert(cases.nonEmpty, "embeddings.tsv is empty")
    cases.foreach { ln =>
      val parts = ln.split("\t", 2)
      val want = parts(1).trim.split(",").map(_.toFloat)
      val got = enc.encode(parts(0))
      assert(got.length == want.length,
        s"dim mismatch on '${parts(0)}': ${got.length} vs ${want.length}")
      val maxDiff = got.zip(want).map { case (a, b) => math.abs(a - b) }.max
      assert(maxDiff < 1e-5,
        s"embedding divergence on '${parts(0)}': max |Δ| $maxDiff")
    }
  }

  // ---- math kernels ------------------------------------------------------

  test("layerNorm: hand-computed values for [1,2,3,4]") {
    val g = Array.fill(4)(1.0f); val b = new Array[Float](4)
    val out = MiniLm.layerNorm(Array(1f, 2f, 3f, 4f), g, b)
    // mean 2.5, var 1.25, inv = 1/sqrt(1.25) → ±1.3416407, ±0.4472136
    val exp = Array(-1.3416407f, -0.4472136f, 0.4472136f, 1.3416407f)
    out.zip(exp).foreach { case (o, e) => assert(math.abs(o - e) < 1e-5, s"$o vs $e") }
  }

  test("softmax: [0, ln 2] → [1/3, 2/3]") {
    val x = Array(0.0, math.log(2.0))
    MiniLm.softmaxInPlace(x)
    assert(math.abs(x(0) - 1.0 / 3) < 1e-12 && math.abs(x(1) - 2.0 / 3) < 1e-12)
  }

  test("gelu: erf-form values at 0, 1, -1, 2") {
    assert(MiniLm.gelu(0.0) == 0.0)
    assert(math.abs(MiniLm.gelu(1.0) - 0.8413447461) < 1e-6)
    assert(math.abs(MiniLm.gelu(-1.0) - (-0.1586552539)) < 1e-6)
    assert(math.abs(MiniLm.gelu(2.0) - 1.9544997361) < 1e-6)
  }

  test("linear: PyTorch (out,in) convention, y = W·x + b") {
    val w = Array(Array(1f, 2f), Array(3f, 4f), Array(0f, -1f))
    val out = MiniLm.linear(w, Array(10f, 20f, 30f), Array(1f, 1f))
    assert(out.toSeq == Seq(13f, 27f, 29f))
  }

  // ---- forward pass contracts --------------------------------------------

  private lazy val tiny = MiniLm.seededTiny()
  private lazy val enc = new MiniLm.Encoder(tiny)

  test("encoder output: testdata dim, unit norm, deterministic") {
    val v1 = enc.encode("affordable italian restaurant")
    val v2 = new MiniLm.Encoder(MiniLm.seededTiny()).encode("affordable italian restaurant")
    assert(v1.length == 64)
    val nrm = math.sqrt(graft.search.VecMath.dot(v1, v1))
    assert(math.abs(nrm - 1.0) < 1e-5, s"norm $nrm")
    assert(v1.sameElements(v2), "same text + same weights → identical vector")
  }

  test("different texts and different token ORDER produce different vectors") {
    val a = enc.encode("cheap pizza in ohio")
    val b = enc.encode("five star steakhouse")
    val c = enc.encode("ohio in pizza cheap") // position embeddings must matter
    assert(!a.sameElements(b) && !a.sameElements(c))
  }

  test("empty text still encodes (UNK fallback), non-zero unit vector") {
    val v = enc.encode("")
    assert(math.abs(math.sqrt(graft.search.VecMath.dot(v, v)) - 1.0) < 1e-5)
  }

  test("long input truncates at maxLen instead of overrunning the position table") {
    val longText = Seq.fill(500)("word").mkString(" ")
    val v = new MiniLm.Encoder(tiny, maxLen = 128).encode(longText)
    assert(v.length == 64)
  }

  test("save → load round-trips weights through the .npy layout exactly") {
    val dir = java.nio.file.Files.createTempDirectory("minilm").toString
    MiniLm.save(tiny, dir)
    val loaded = MiniLm.load(dir)
    assert(loaded.heads == tiny.heads && loaded.hidden == tiny.hidden)
    assert(loaded.layers.length == tiny.layers.length)
    val texts = Seq("hello world", "a b c", "restaurant with patio")
    texts.foreach { t =>
      val a = new MiniLm.Encoder(tiny).encode(t)
      val b = new MiniLm.Encoder(loaded).encode(t)
      assert(a.sameElements(b), s"'$t' differs after weight round-trip")
    }
  }

  test("embedTable: distributed encode matches driver-side encode per row") {
    import spark.implicits._
    val docs = Seq((0L, "hello world"), (1L, "cheap pizza"), (2L, "five star"),
      (3L, "")).toDF("doc_id", "text").repartition(3)
    val got = MiniLm.embedTable(docs, "text", "doc_id", tiny).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    assert(got.length == 4)
    val local = Map(0L -> "hello world", 1L -> "cheap pizza", 2L -> "five star", 3L -> "")
    got.foreach { case (id, v) =>
      assert(v.sameElements(enc.encode(local(id))), s"doc $id differs from driver encode")
    }
  }
}
