package graft

import graft.search.Fusion
import graft.text.Bm25
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 scoring vs a local recompute of the exact formula, and RRF fusion
  * vs hand-computed reciprocal ranks. */
class Bm25FusionSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def r6(x: Double) = graft.search.VecMath.round6(x)

  /** Local BM25 recompute over a seq of (id, text). */
  private def localBm25(corpus: Seq[(Long, String)], terms: Seq[String])
      : Map[Long, Double] = {
    val tokss = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val n = corpus.size.toDouble
    val avgdl = tokss.map(_._2.size).sum.toDouble / n
    val df = terms.map(t => t -> tokss.count(_._2.contains(t)).toDouble).toMap
    tokss.flatMap { case (id, toks) =>
      val dl = toks.size.toDouble
      val s = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0 || df(t) == 0) 0.0
        else {
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          idf * tf * (Bm25.K1 + 1.0) /
            (tf + Bm25.K1 * (1.0 - Bm25.B + Bm25.B * dl / avgdl))
        }
      }.sum
      if (s > 0) Some(id -> r6(s)) else None
    }.toMap
  }

  private val tiny = Seq(
    (0L, "a b a"), (1L, "b c"), (2L, "c c c"), (3L, "d d"))

  test("bm25 scores match the exact formula on a hand corpus") {
    val docs = tiny.toDF("doc_id", "text")
    val got = Bm25.scores(docs, Seq("a", "c"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    val want = localBm25(tiny, Seq("a", "c"))
    assert(got == want)
    // doc 3 matches no term: absent, not zero-scored
    assert(!got.contains(3L))
    // idf ordering: 'a' (df=1) is rarer than 'c' (df=2); the tf=2 'a' doc
    // must outrank the tf=1 'c' doc
    assert(got(0L) > got(1L))
  }

  test("bm25 tf monotonicity at equal dl and df") {
    val corpus = Seq((0L, "a a b"), (1L, "a b b"), (2L, "a x y"))
    val got = Bm25.scores(corpus.toDF("doc_id", "text"), Seq("a"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    assert(got(0L) > got(1L)) // tf 2 beats tf 1
    assert(got(1L) == got(2L)) // same tf, same dl -> identical score
  }

  test("bm25 topK on the sf corpus: deterministic, k-bounded, sorted") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Bm25.topK(docs, Bm25.DefaultTerms, 20).collect()
    val b = Bm25.topK(docs, Bm25.DefaultTerms, 20).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 20)
    val scores = a.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    // against the local recompute at full precision
    val corpus = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val want = localBm25(corpus, Bm25.DefaultTerms)
    a.foreach(r => assert(math.abs(r.getDouble(1) - want(r.getLong(0))) <= 1e-6))
  }

  test("rrf fuses hand-built rank lists with exact reciprocal arithmetic") {
    val dense = Seq((10L, 1), (20L, 2)).toDF("id", "rank")
    val sparse = Seq((20L, 1), (30L, 2)).toDF("id", "rank")
    val got = Fusion.rrf(dense, sparse, 10)
      .as[(Long, Double, Int, Int)].collect()
    val c = Fusion.C.toDouble
    val want = Seq(
      (20L, r6(1.0 / (c + 2) + 1.0 / (c + 1)), 2, 1), // both lists: top fused
      (10L, r6(1.0 / (c + 1)), 1, 0),
      (30L, r6(1.0 / (c + 2)), 0, 2))
    assert(got.toSeq == want)
  }

  test("ranked() assigns dense ranks by rounded score with id tiebreak") {
    val cands = Seq((5L, 0.9), (3L, 0.9), (7L, 0.8)).toDF("vec_id", "score")
    val got = Fusion.ranked(cands, "vec_id", "score")
      .as[(Long, Int)].collect().toMap
    assert(got == Map(3L -> 1, 5L -> 2, 7L -> 3))
  }

  test("batchScores over a batch agrees with per-query scores()") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val batch = Seq(7L -> Seq("vector", "scan"), 9L -> Seq("merge", "batch"))
    val got = Bm25.batchScores(docs, batch)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4)).toSet).toMap
    batch.foreach { case (qid, terms) =>
      val single = Bm25.scores(docs, terms)
        .as[(Long, Double, Long)].collect().toSet
      assert(got(qid) == single, s"qid $qid batch != single")
    }
  }

  test("rrfBatch equals per-qid rrf on hand-built rank lists") {
    val dense = Seq((0L, 10L, 1), (0L, 20L, 2), (1L, 30L, 1))
      .toDF("qid", "id", "rank")
    val sparse = Seq((0L, 20L, 1), (1L, 40L, 1), (1L, 30L, 2))
      .toDF("qid", "id", "rank")
    val got = Fusion.rrfBatch(dense, sparse, 10)
      .as[(Long, Long, Double, Int, Int)].collect().toSeq
    val c = Fusion.C.toDouble
    val want = Seq(
      (0L, 20L, r6(1.0 / (c + 2) + 1.0 / (c + 1)), 2, 1),
      (0L, 10L, r6(1.0 / (c + 1)), 1, 0),
      (1L, 30L, r6(1.0 / (c + 1) + 1.0 / (c + 2)), 1, 2),
      (1L, 40L, r6(1.0 / (c + 1)), 0, 1))
    assert(got == want)
  }

  test("hybrid_rrf_batch end-to-end: k rows per qid, correct arithmetic") {
    val out = graft.queries.VectorQueries.hybridRrfBatch(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double, Int, Int)].collect()
    val byQid = out.groupBy(_._1)
    assert(byQid.keySet == Set(0L, 1L, 2L, 3L))
    byQid.foreach { case (qid, rows) =>
      assert(rows.length == 10, s"qid $qid")
      val c = Fusion.C.toDouble
      rows.foreach { case (_, _, rrf, dr, sr) =>
        assert(dr > 0 || sr > 0)
        val expect = r6((if (dr > 0) 1.0 / (c + dr) else 0.0) +
          (if (sr > 0) 1.0 / (c + sr) else 0.0))
        assert(rrf == expect)
      }
      val s = rows.map(_._3)
      assert(s.zip(s.tail).forall { case (x, y) => x >= y })
    }
  }

  test("hybrid_qtext_rrf: one qtext drives both retrievers; k rows per qid") {
    val out = graft.queries.VectorQueries.hybridQtextRrf(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double, Int, Int)].collect()
    val byQid = out.groupBy(_._1)
    assert(byQid.keySet == Set(0L, 1L, 2L))
    val c = Fusion.C.toDouble
    byQid.values.foreach { rows =>
      assert(rows.length == 10)
      rows.foreach { case (_, _, rrf, dr, sr) =>
        assert(dr > 0 || sr > 0)
        assert(rrf == r6((if (dr > 0) 1.0 / (c + dr) else 0.0) +
          (if (sr > 0) 1.0 / (c + sr) else 0.0)))
      }
    }
    // the sparse side genuinely fires: some fused row carries a BM25 rank
    // (the qtext tokens are corpus-vocab words)
    assert(out.exists(_._5 > 0))
    // and the dense side too
    assert(out.exists(_._4 > 0))
  }

  test("hybrid_rrf end-to-end: k rows, every id from one of the top-N lists") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.VectorQueries.hybridRrf(spark, sf)
      .as[(Long, Double, Int, Int)].collect()
    assert(out.length == 10)
    out.foreach { case (_, rrf, dr, sr) =>
      assert(dr > 0 || sr > 0)
      val c = Fusion.C.toDouble
      val expect = r6((if (dr > 0) 1.0 / (c + dr) else 0.0) +
        (if (sr > 0) 1.0 / (c + sr) else 0.0))
      assert(rrf == expect)
    }
    // descending by fused score
    val s = out.map(_._2)
    assert(s.zip(s.tail).forall { case (x, y) => x >= y })
  }

  test("pipeline_serve: full local replay of filter→retrieve²→fuse→MMR") {
    import graft.queries.VectorQueries
    val sf = "/root/testdata/sf0.001"
    val got = VectorQueries.pipelineServe(spark, sf)
      .as[(Long, Int, Long, Double, Double)].collect().toSeq

    // local corpus
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Option[Int])].collect()
    val docTexts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val vecOf = embs.map(e => e._1 -> e._2).toMap

    val want = VectorQueries.serveResolved.flatMap { case (qid, qv, terms, fj, _) =>
      val allow: Option[Int] => Boolean = fj match {
        case "{}" => _ => true
        case s if s.contains("between") => { case Some(l) => l >= 0 && l <= 4; case None => false }
        case _ => { case Some(l) => l != 3; case None => false } // ne 3; NULL fails
      }
      val allowed = embs.filter(e => allow(e._3)).map(_._1).toSet
      // dense: exact IP top-N within the allowed subset
      val dense = embs.filter(e => allowed(e._1))
        .map(e => e._1 -> r6(graft.search.VecMath.dot(e._2, qv)))
        .sortBy(x => (-x._2, x._1)).take(VectorQueries.RrfN)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
      // sparse: BM25 over the whole corpus, then the filter, then top-N
      val sparse = localBm25(docTexts, terms.distinct).toSeq
        .filter(x => allowed(x._1))
        .sortBy(x => (-x._2, x._1)).take(VectorQueries.RrfN)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
      // RRF fuse, top-ServeCand candidates
      val c = Fusion.C.toDouble
      val fused = (dense.keySet ++ sparse.keySet).toSeq.map { id =>
        id -> r6(dense.get(id).map(r => 1.0 / (c + r)).getOrElse(0.0) +
                 sparse.get(id).map(r => 1.0 / (c + r)).getOrElse(0.0))
      }.sortBy(x => (-x._2, x._1)).take(VectorQueries.ServeCand)
      // naive quadratic MMR greedy (independent of Mmr.greedy)
      val lam = VectorQueries.ServeLambda
      var sel = Vector.empty[(Int, Long, Double, Double)]
      var rest = fused.zipWithIndex.map { case ((id, rrf), i) => (i, id, rrf) }
      while (sel.size < math.min(VectorQueries.ServeK, fused.size)) {
        val scored = rest.map { case (i, id, rrf) =>
          val red = sel.map(s => r6(graft.search.VecMath.dot(vecOf(id), vecOf(s._2))))
            .foldLeft(0.0)(math.max)
          (i, id, rrf, r6(lam * rrf - (1.0 - lam) * red))
        }
        val best = scored.minBy { case (i, _, _, v) => (-v, i) }
        sel :+= ((sel.size + 1, best._2, best._3, best._4))
        rest = rest.filterNot(_._1 == best._1)
      }
      sel.map { case (rank, id, rrf, mmr) => (qid, rank, id, rrf, mmr) }
    }.sortBy(r => (r._1, r._2))

    assert(got == want, s"got:\n${got.mkString("\n")}\nwant:\n${want.mkString("\n")}")
    // contracts: K rows per qid with contiguous ranks; filters respected
    VectorQueries.ServeQueries.foreach { case (qid, _, _, _) =>
      val rs = got.filter(_._1 == qid)
      assert(rs.map(_._2) == (1 to VectorQueries.ServeK))
    }
    val labelOf = embs.map(e => e._1 -> e._3).toMap
    got.filter(_._1 == 1L).foreach(r => assert(labelOf(r._3).exists(l => l >= 0 && l <= 4)))
    got.filter(_._1 == 2L).foreach(r => assert(labelOf(r._3).exists(_ != 3)))
    // diversity is live: some qid's MMR order differs from pure-rrf order
    assert(got.groupBy(_._1).values.exists { rs =>
      rs.sortBy(_._2).map(_._3) != rs.sortBy(r => (-r._4, r._3)).map(_._3) ||
      rs.map(_._5).distinct.length > 1
    })
  }
}
