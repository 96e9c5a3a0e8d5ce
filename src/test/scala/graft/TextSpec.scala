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

  test("text_tfidf matches a local recompute; exactly the top 3 per doc") {
    val got = graft.queries.TextQueries.textTfidf(spark, sf)
      .as[(Long, String, Double)].collect().toSeq
    // local oracle over the same corpus
    def r6(x: Double) = graft.search.VecMath.round6(x)
    val tokenized = texts.map { case (id, t) => id -> t.toLowerCase.split(" ", -1).toSeq }
    val df = tokenized.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size }
    val n = texts.size.toDouble
    val want = tokenized.toSeq.flatMap { case (id, toks) =>
      toks.groupBy(identity).map { case (t, xs) =>
        (id, t, r6(xs.size * math.log(n / df(t))))
      }.toSeq.sortBy { case (_, t, s) => (-s, t) }.take(3)
    }.sortBy { case (id, t, s) => (id, -s, t) }
    assert(got == want)
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

  test("scrub masks URLs, emails and digit runs with correct counts") {
    val df = Seq(
      (1L, "visit https://x.io/a?b=1 or mail a.b+c@mail.co now"),
      (2L, "plain words only"),
      (3L, "codes 42 and 007 and t168"),
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.withScrub(df)
      .as[(Long, String, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == "visit <URL> or mail <EMAIL> now")
    assert(got(1L)._3 == 1 && got(1L)._4 == 1)
    assert(got(2L) == ((2L, "plain words only", 0, 0, 0)))
    assert(got(3L)._2 == "codes <NUM> and <NUM> and t<NUM>" && got(3L)._5 == 3)
    assert(got(4L) == ((4L, "", 0, 0, 0)))
    // the registered query target (events.props) makes the digit arm
    // non-vacuous on every row
    val ev = TextAnalysis.withScrub(Tables.events(spark, sf), "event_id", "props")
    assert(ev.where(col("n_nums") > 0).count() > 0, "events.props has no digit runs")
    assert(ev.where(col("scrubbed").contains("<NUM>")).count() > 0)
  }

  test("repetition signals match local math") {
    val df = Seq(
      (1L, "a b a b a"),   // tokens: 5, distinct 2; bigrams: 4 distinct 2; top 'a'=3
      (2L, "x y z"),       // no repetition
      (3L, "w")).toDF("doc_id", "text")
    val got = TextAnalysis.withRepetition(df)
      .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 0.6, 0.5, 0.6)))
    assert(got(2L) == ((2L, 0.0, 0.0, VecMath6(1.0 / 3))))
    assert(got(3L) == ((3L, 0.0, 0.0, 1.0)))
  }
  private def VecMath6(x: Double) = graft.search.VecMath.round6(x)

  test("text_logprob matches the local unigram LM exactly") {
    val got = graft.queries.TextQueries.textLogprob(spark, sf)
      .as[(Long, Long, Double)].collect()
    // local twin: corpus unigram distribution over the same tokenizer
    val all = texts.values.toSeq.flatMap(_.toLowerCase.split(" ", -1))
    val tf = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = all.size.toDouble
    got.foreach { case (id, n, lp) =>
      val toks = texts(id).toLowerCase.split(" ", -1).toSeq
      assert(n == toks.size, s"doc $id token count")
      val want = toks.map(t => math.log(tf(t) / total)).sum / toks.size
      assert(math.abs(lp - BigDecimal(want).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) <= 1e-6, s"doc $id: $lp vs $want")
    }
    assert(got.nonEmpty)
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

  test("text_chunks: exact windows, full token coverage, short docs = one chunk") {
    import graft.queries.TextQueries.{ChunkWidth => W, ChunkStride => S}
    val chunks = graft.queries.TextQueries.textChunks(spark, sf)
      .as[(Long, Int, Long, String)].collect()
    assert(chunks.nonEmpty)
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet.size == texts.size, "every doc chunked")
    byDoc.foreach { case (id, cs) =>
      val toks = texts(id).split(" ", -1)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0 until cs.length), s"doc $id ids not contiguous")
      sorted.foreach { case (_, cid, ct, t) =>
        val want = toks.slice(cid * S, cid * S + W)
        assert(t == want.mkString(" "), s"doc $id chunk $cid window mismatch")
        assert(ct == want.length.toLong)
      }
      // coverage: the last chunk reaches the final token
      val (_, lastId, lastCt, _) = sorted.last
      assert(lastId * S + lastCt == toks.length, s"doc $id tail uncovered")
      // short docs are exactly one whole-doc chunk
      if (toks.length <= W) assert(cs.length == 1 && sorted.head._4 == texts(id))
    }
  }

  test("dup spans match a local recompute; planted duplicate span is flagged") {
    val n = 13
    val got = TextAnalysis.withDupSpans(docs, n)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(_._1).toSet == texts.keySet, "every doc reported")
    // local oracle: corpus-wide n-gram counts, then per-doc dup positions
    val gramsOf: Map[Long, Seq[String]] = texts.map { case (id, t) =>
      val toks = t.split(" ", -1)
      id -> (if (toks.length < n) Seq.empty[String]
             else toks.sliding(n).map(_.mkString(" ")).toSeq)
    }
    val corpusCount = gramsOf.values.flatten
      .groupBy(identity).map { case (g, occ) => g -> occ.size }
    got.foreach { case (id, nGrams, dupGrams, frac) =>
      val grams = gramsOf(id)
      assert(nGrams == grams.length.toLong, s"doc $id n_grams")
      val dups = grams.count(g => corpusCount(g) > 1).toLong
      assert(dupGrams == dups, s"doc $id dup_grams")
      val want = if (grams.isEmpty) 0.0
                 else graft.search.VecMath.round6(dups.toDouble / grams.length)
      assert(frac == want, s"doc $id dup_frac")
    }
    // a doc that repeats another doc's text verbatim must be fully flagged
    val base = texts.values.find(_.split(" ", -1).length >= n).get
    val planted = docs.sparkSession.createDataset(Seq(
      (900001L, base), (900002L, base + " unique tail marker"),
      (900003L, "short doc")))
      .toDF("doc_id", "text")
    val flagged = TextAnalysis.withDupSpans(planted, n)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val full = flagged.find(_._1 == 900001L).get
    assert(full._3 == full._2 && full._4 == 1.0, "verbatim copy fully flagged")
    assert(flagged.find(_._1 == 900003L).get._2 == 0L, "short doc has zero positions")
  }

  test("dedup spans: canonical kept, copies deleted, local recompute matches") {
    val n = 13
    // local oracle of the removal rule
    def localClean(corpus: Map[Long, String]): Map[Long, (Long, Long, String)] = {
      val grams = corpus.toSeq.sortBy(_._1).flatMap { case (id, txt) =>
        val tk = txt.split(" ", -1)
        if (tk.length < n) Seq.empty
        else (0 to tk.length - n).map(i => (tk.slice(i, i + n).mkString(" "), id, i + 1))
      }
      val counts = grams.groupBy(_._1).map { case (g, occ) => g -> occ.size }
      val canon = grams.groupBy(_._1).map { case (g, occ) =>
        g -> occ.map(o => (o._2, o._3)).min }
      val del: Set[(Long, Int)] = grams.collect {
        case (g, id, w) if counts(g) > 1 && canon(g) != ((id, w)) =>
          (w until w + n).map(j => (id, j))
      }.flatten.toSet
      corpus.map { case (id, txt) =>
        val tk = txt.split(" ", -1)
        val keptToks = tk.zipWithIndex.collect {
          case (tok, p) if !del.contains((id, p + 1)) => tok }
        id -> (tk.length.toLong, (tk.length - keptToks.length).toLong,
          keptToks.mkString(" "))
      }
    }
    val got = TextAnalysis.withDedupSpans(docs, n)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == localClean(texts), "sf corpus removal mismatch")
    // crafted: canonical re-post, self-repeat, short, unique
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val crafted = Map(
      1L -> base, 2L -> base, 3L -> (base + " " + base),
      4L -> "short doc", 5L -> (100 to 160).map(i => s"u$i").mkString(" "))
    val cdf = docs.sparkSession.createDataset(crafted.toSeq).toDF("doc_id", "text")
    val cg = TextAnalysis.withDedupSpans(cdf, n)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(cg == localClean(crafted))
    assert(cg(1L)._3 == base, "canonical copy untouched")
    assert(cg(2L) == ((40L, 40L, "")), "verbatim re-post fully deleted")
    assert(cg(3L) == ((80L, 80L, "")), "self-repeat of a duplicated base fully deleted")
    assert(cg(4L)._2 == 0L && cg(5L)._2 == 0L, "short/unique docs untouched")
  }

  test("dup spans: hashed-key plan is row-for-row identical to the string-keyed twin") {
    // the registered (hashed + Bloom flag-back) plan must equal the plan
    // the DuckDB oracle computes literally — on the real corpus and on a
    // crafted one with heavy duplication, overlap-within-doc, and shorts
    val n = 13
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows(TextAnalysis.withDupSpans(docs, n)) ==
      rows(TextAnalysis.withDupSpansStringKeyed(docs, n)))
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val crafted = docs.sparkSession.createDataset(Seq(
      (1L, base), (2L, base),                         // verbatim pair
      (3L, base + " " + base),                        // self-repetition
      (4L, (1 to 12).map(i => s"w$i").mkString(" ")), // below n tokens
      (5L, (100 to 160).map(i => s"u$i").mkString(" ")))) // all unique
      .toDF("doc_id", "text")
    assert(rows(TextAnalysis.withDupSpans(crafted, n)) ==
      rows(TextAnalysis.withDupSpansStringKeyed(crafted, n)))
  }

  test("text_phrase: counts consecutive sequences, overlaps included, short docs safe") {
    import graft.queries.TextQueries
    val crafted = spark.createDataset(Seq(
      (1L, "table hash join table hash"),   // 2 matches of "table hash"
      (2L, "stream table hash batch"),      // trigram + its embedded bigram
      (3L, "hash table"),                   // reversed — no match
      (4L, "merge"),                        // shorter than any phrase
      (5L, "merge group merge group merge group"))) // 3 matches
      .toDF("doc_id", "text")
    // drive the same registered query body over a crafted table
    val toks = split(lower(col("text")), " ")
    val got = TextQueries.DefaultPhrases.map { p =>
      val c = crafted.select(col("doc_id"),
        TextQueries.phraseCountForTest(toks, p.split(" ").toSeq).as("n"))
        .as[(Long, Long)].collect().toMap
      p -> c
    }.toMap
    assert(got("table hash")(1L) == 2 && got("table hash")(2L) == 1)
    assert(got("table hash")(3L) == 0 && got("table hash")(4L) == 0)
    assert(got("stream table hash")(2L) == 1 && got("stream table hash")(1L) == 0)
    assert(got("merge group")(5L) == 3 && got("merge group")(4L) == 0)
    // corpus run: nonempty for every default phrase, deterministic
    val a = TextQueries.textPhrase(spark, sf).as[(String, Long, Long)].collect()
    val b = TextQueries.textPhrase(spark, sf).as[(String, Long, Long)].collect()
    assert(a.toSeq == b.toSeq)
    TextQueries.DefaultPhrases.foreach { p =>
      assert(a.exists(_._1 == p), s"phrase '$p' found nowhere in the corpus")
    }
  }

  test("quality probe: distributed fit == driver fit; separation; deterministic") {
    import graft.text.QualityProbe
    val labeled = docs.select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)].collect()
    // driver twin: identical features + identical solver, serial sums
    val D = QualityProbe.D
    val tri = D * (D + 1) / 2
    val xtx = new Array[Double](tri)
    val xty = new Array[Double](D)
    labeled.foreach { case (_, text, lang) =>
      val x = QualityProbe.features(text)
      var i = 0; var t = 0
      while (i < D) {
        var j = i
        while (j < D) { xtx(t) += x(i) * x(j); j += 1; t += 1 }
        if (lang == "en") xty(i) += x(i)
        i += 1
      }
    }
    val wantW = QualityProbe.solveRidgeForTest(xtx, xty, QualityProbe.Lambda)
    val model = QualityProbe.fit(docs, col("lang") === "en")
    model.w.zip(wantW).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-6, s"weight drift: $g vs $w")
    }
    // scored margins separate the target class: AUC over en-vs-rest
    val scored = QualityProbe.score(docs, model)
      .as[(Long, Double)].collect().toMap
    val lang = labeled.map(r => r._1 -> r._3).toMap
    val pos = scored.filter(kv => lang(kv._1) == "en").values.toSeq
    val neg = scored.filterNot(kv => lang(kv._1) == "en").values.toSeq
    val wins = (for (p <- pos; q <- neg) yield
      if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
    val auc = wins / (pos.size.toLong * neg.size)
    assert(auc > 0.9, s"probe AUC $auc — fails to separate the target class")
    // determinism + totality
    val a = queries.TextQueries.corpusQualityProbe(spark, sf)
      .as[(Long, Double)].collect()
    val b = queries.TextQueries.corpusQualityProbe(spark, sf)
      .as[(Long, Double)].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == labeled.length, "every doc scored exactly once")
  }

  test("text_fertility: per-language sums and ratios match local recomputation") {
    val got = queries.TextQueries.textFertility(spark, sf)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    val meta = docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .as[(Long, String, Long)].collect()
    val want = meta.groupBy(_._2).map { case (lang, rows) =>
      val ws = rows.map(r => texts(r._1).split(" ", -1).length.toLong).sum
      val bpe = rows.map(r =>
        TextAnalysis.BpePattern.r.findAllIn(texts(r._1)).length.toLong).sum
      val ch = rows.map(_._3).sum
      (lang, rows.length.toLong, ws, bpe,
        math.rint(bpe.toDouble / ws * 1e6) / 1e6,
        math.rint(ch.toDouble / bpe * 1e6) / 1e6)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // the corpus has >1 language, so the audit discriminates
    assert(got.length > 1)
    // sanity: fertility >= 1 (the BPE-ish pattern splits punctuation off)
    got.foreach(r => assert(r._5 >= 1.0, s"fertility < 1: $r"))
  }
}
