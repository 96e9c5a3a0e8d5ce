package graft

import graft.streaming.EventStreaming
import graft.streaming.EventStreaming.{Event, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming twins vs their oracle-checked batch counterparts
  * (SURVEY.md §2 #36/#38): same data through MemoryStream must produce
  * the same rows the batch plans produce.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  /** Deterministic event sample: 3 users, multi-session gaps. */
  private def sampleEvents: Seq[Event] = {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(id: Long, user: Long, offsetMin: Long, typ: String, v: Double) =
      Event(id, new java.sql.Timestamp(base + offsetMin * 60000), user, typ, v)
    Seq(
      ev(1, 1, 0, "view", 1.5), ev(2, 1, 10, "click", 2.0), ev(3, 1, 50, "view", 0.5),
      ev(4, 1, 200, "purchase", 99.99), // gap > 30min → new session
      ev(5, 2, 5, "view", 1.0), ev(6, 2, 400, "signup", 0.0), ev(7, 2, 420, "click", 3.25),
      ev(8, 3, 100, "error", 0.1))
  }

  test("streaming windowed counts with watermark == batch window agg") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Event]
    val out = EventStreaming.windowedCounts(stream.toDF())
    val q = out.writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    try {
      // two chunks in event-time order, then a far-future row to push the
      // watermark past every real window so append-mode emits them
      val (a, b) = sampleEvents.sortBy(_.ts.getTime).splitAt(4)
      stream.addData(a: _*); q.processAllAvailable()
      stream.addData(b: _*); q.processAllAvailable()
      stream.addData(Event(99, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 9, "view", 0.0))
      q.processAllAvailable()

      val got = spark.table("win_counts")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      val want = sampleEvents.toDS().toDF()
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,6)")).cast("double").as("s"))
        .select(col("w.start"), col("event_type"), col("n"), col("s"))
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      assert(want.subsetOf(got), s"missing ${want -- got}")
    } finally q.stop()
  }

  test("late events beyond the watermark are dropped from windowed counts") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Event]
    val out = EventStreaming.windowedCounts(stream.toDF(), watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("win_late")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:10:00")
      stream.addData(Event(1, t0, 1, "view", 1.0)); q.processAllAvailable()
      // push the watermark far past t0's window
      stream.addData(Event(2, java.sql.Timestamp.valueOf("2024-01-01 06:00:00"), 1, "view", 1.0))
      q.processAllAvailable()
      // late arrival into the long-closed 00:00 window: must be ignored
      stream.addData(Event(3, t0, 1, "view", 5.0)); q.processAllAvailable()
      stream.addData(Event(4, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_late")
        .as[(java.sql.Timestamp, String, Long, Double)].collect()
        .filter(_._1.toString.startsWith("2024-01-01 00:00"))
      assert(rows.length == 1 && rows.head._3 == 1 && rows.head._4 == 1.0,
        s"late event leaked into closed window: ${rows.mkString(",")}")
    } finally q.stop()
  }

  test("streaming exact dedup keeps one row per content hash (bounded state)") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Long)]
    val named = stream.toDF().toDF("ts", "text", "doc_id")
    val out = graft.streaming.EventStreaming.dedupStream(named, "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      def t(min: Long) = new java.sql.Timestamp(base + min * 60000)
      stream.addData((t(0), "alpha beta", 1L), (t(1), "gamma", 2L), (t(2), "alpha beta", 3L))
      q.processAllAvailable()
      stream.addData((t(3), "alpha beta", 4L), (t(4), "delta", 5L))
      q.processAllAvailable()
      val texts = spark.table("dedup_stream").select("text").as[String].collect()
      assert(texts.sorted.toSeq == Seq("alpha beta", "delta", "gamma"),
        s"got ${texts.mkString(",")}")
    } finally q.stop()
  }

  test("streaming simhash near-dedup collapses permuted near-copies (bounded state)") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Long)]
    val named = stream.toDF().toDF("ts", "text", "doc_id")
    val out = EventStreaming.nearDedupStream(named, "10 minutes")
    val q = out.writeStream.format("memory").queryName("near_dedup_stream")
      .outputMode("append").start()
    try {
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      def t(min: Long) = new java.sql.Timestamp(base + min * 60000)
      // "beta alpha alpha" has the same token SET as "alpha beta" → same
      // SimHash signature → dropped, even though the bytes differ (this is
      // what the exact-dedup stream cannot do)
      stream.addData((t(0), "alpha beta", 1L), (t(1), "gamma delta", 2L))
      q.processAllAvailable()
      stream.addData((t(2), "beta alpha alpha", 3L), (t(3), "epsilon zeta", 4L))
      q.processAllAvailable()
      val got = spark.table("near_dedup_stream").select("doc_id").as[Long].collect().toSet
      assert(got == Set(1L, 2L, 4L), s"got $got")
      // stream signatures equal the batch expression's signatures
      val sigs = spark.table("near_dedup_stream").select("sig").as[Long].collect().toSet
      import graft.functions.VectorFunctions._
      val batchSigs = Seq("alpha beta", "gamma delta", "epsilon zeta").toDF("text")
        .select(graft.functions.VectorFunctions.simHash64(tokenSetIds(col("text"), 1)))
        .as[Long].collect().toSet
      assert(sigs == batchSigs)
    } finally q.stop()
  }

  test("streaming curation: gates match batch expressions, dedup keeps the id-order representative") {
    implicit val sq = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val stream = MemoryStream[(java.sql.Timestamp, String, Long)]
    val named = stream.toDF().toDF("ts", "text", "doc_id")
    val out = EventStreaming.curateStream(named, "1 hour")
    val q = out.writeStream.format("memory").queryName("curate_stream")
      .outputMode("append").start()
    try {
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      // replay the real corpus in doc_id order (one batch — ordering
      // inside is by arrival) so "first per signature" == "min doc_id
      // per signature", comparable to the batch representative rule
      val docs = Tables.documents(spark, sf)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect().sortBy(_._1)
      docs.grouped(100).zipWithIndex.foreach { case (chunk, i) =>
        stream.addData(chunk.map { case (id, tx) =>
          (new java.sql.Timestamp(base + i * 60000L), tx, id)
        }.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("curate_stream").select("doc_id").as[Long].collect().toSet
      // batch expectation from the SAME shared gate expressions: survivors
      // of quality ∧ lang, then min doc_id per simhash signature
      import graft.functions.VectorFunctions._
      val want = Tables.documents(spark, sf)
        .where(graft.text.TextAnalysis.qualityScore(col("text")) >= 0.6 &&
          graft.text.TextAnalysis.langPred(col("text")) === "en")
        .withColumn("sig", simHash64(tokenSetIds(col("text"), 1)))
        .groupBy("sig").agg(org.apache.spark.sql.functions.min("doc_id").as("doc_id"))
        .select("doc_id").as[Long].collect().toSet
      assert(got == want, s"missing ${want -- got}, extra ${got -- want}")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming IVF ingest: micro-batch appends compose to the batch append, full probe exact") {
    implicit val sq = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
    val resident = emb.where(pmod(col("vec_id"), lit(3)) =!= 0)
    val rest = emb.where(pmod(col("vec_id"), lit(3)) === 0)
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Long)].collect().sortBy(_._1)
    val (b1, b2) = rest.splitAt(rest.length / 2)

    val m0 = graft.search.Ivf.build(resident, nlist = 8, maxIter = 5)
    val inc = new graft.streaming.IncrementalIvf(m0)
    val counts = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stream = MemoryStream[(Long, Array[Float], Long)]
    val q = inc.writer(stream.toDF().toDF("vec_id", "embedding", "label"),
      (m, _) => counts.synchronized { counts += m.indexed.count() }).start()
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      // each snapshot absorbed exactly its batch
      val base = resident.count()
      assert(counts.toSeq == Seq(base + b1.length, base + b1.length + b2.length))
      // the final snapshot serves exactly like the batch-append model:
      // full probe == exact top-k over everything ingested
      val qv = graft.search.QueryVectors.qvec(0)
      val got = inc.model.search(qv, nprobe = 8, k = 10)
        .select("vec_id").as[Long].collect().toSeq
      val want = graft.search.VectorSearch.topK(emb, qv, 10)
        .select("vec_id").as[Long].collect().toSeq
      assert(got == want, s"streamed ingest $got != exact $want")
    } finally q.stop()
  }

  test("streaming kNN: running top-K converges to the batch knnJoin answer") {
    implicit val sq = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val stream = MemoryStream[(Long, Array[Float])]
    val queries = graft.search.QueryVectors.batch(3)
    val k = 5
    val out = graft.streaming.VectorStreaming.knnStream(stream.toDS(), queries, k)
    val q = out.writeStream.format("memory").queryName("knn_stream")
      .outputMode("update").start()
    try {
      val emb = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect()
      // feed the corpus in two arbitrary chunks — online maintenance must
      // end at the same answer regardless of arrival order
      val (a, b) = emb.splitAt(emb.length / 3)
      stream.addData(a.toIndexedSeq); q.processAllAvailable()
      stream.addData(b.toIndexedSeq); q.processAllAvailable()
      // at-least-once replay: re-delivering a chunk must not let duplicate
      // vec_ids crowd genuine neighbours out of the K-entry state
      stream.addData(a.toIndexedSeq); q.processAllAvailable()
      // compare the final top-K per qid against the oracle-checked batch twin
      val want = graft.search.VectorSearch.knnJoin(
          Tables.embeddings(spark, sf), queries, k)
        .select(col("qid"), col("vec_id"), col("score"))
        .as[(Long, Long, Double)].collect().toSet
      val lastPerQ = spark.table("knn_stream").as[(Long, Long, Double)].collect()
        .toSeq.distinct.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
          // reconstruct the final heap: highest-scoring k distinct vec_ids
          rows.sortBy(r => (-r._3, r._2)).take(k)
        }.toSet
      assert(want.subsetOf(lastPerQ), s"missing ${want -- lastPerQ}")
    } finally q.stop()
  }

  test("text analysis pipelines run unchanged on streams (scan-only ops)") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    // the same batch column pipeline applied to a stream — possible
    // precisely because the text ops are stateless, shuffle-free plans
    val out = graft.text.TextAnalysis.withQuality(docs)
    val q = out.writeStream.format("memory").queryName("stream_quality")
      .outputMode("append").start()
    try {
      stream.addData((1L, "the quick fox"), (2L, "a b"))
      q.processAllAvailable()
      val got = spark.table("stream_quality")
        .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 3L, 2L -> 2L))
    } finally q.stop()
  }

  test("streaming chunker == batch chunker (stateless generate-over-scan)") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = Seq(
      1L -> Seq.tabulate(100)(i => s"t$i").mkString(" "), // 100 tokens → 2 chunks
      2L -> "short doc")                                   // 1 whole-doc chunk
    val out = graft.queries.TextQueries.chunked(stream.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("stream_chunks")
      .outputMode("append").start()
    try {
      stream.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("stream_chunks")
        .as[(Long, Int, Long, String)].collect().toSet
      val want = graft.queries.TextQueries
        .chunked(docs.toDF("doc_id", "text"))
        .as[(Long, Int, Long, String)].collect().toSet
      assert(got == want)
      assert(got.count(_._1 == 1L) == 2 && got.count(_._1 == 2L) == 1)
    } finally q.stop()
  }

  test("streaming incremental dedup: micro-batch appends compose to the full mine") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions.pmod
    // real documents, split 2/3 corpus + two micro-batches of the rest:
    // the streamed pairs must equal full-mine(everything) minus
    // full-mine(corpus) — B1×corpus surfaces with B1, B1×B2 with B2
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val corpus = docs.where(pmod(col("doc_id"), lit(3)) =!= 0)
    val rest = docs.where(pmod(col("doc_id"), lit(3)) === 0)
      .as[(Long, String)].collect().sortBy(_._1)
    val (b1, b2) = rest.splitAt(rest.length / 2)

    val inc = new graft.streaming.IncrementalDedup(corpus, tau = 0.95)
    val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val stream = MemoryStream[(Long, String)]
    val q = inc.writer(stream.toDF().toDF("doc_id", "text"),
      (pairs, _) => got.synchronized {
        got ++= pairs.as[(Long, Long, Double)].collect()
      }).start()
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      val afterB1 = got.toSet
      stream.addData(b2: _*); q.processAllAvailable()

      val full = graft.dedup.Dedup.minhashLshPairs(docs, 0.95)
        .as[(Long, Long, Double)].collect().toSet
      val corpusOnly = graft.dedup.Dedup.minhashLshPairs(corpus, 0.95)
        .as[(Long, Long, Double)].collect().toSet
      assert(got.toSet == full -- corpusOnly,
        s"|streamed|=${got.size} |full-minus-corpus|=${(full -- corpusOnly).size}")
      // batch-1 pairs never touch batch-2 docs (B2 unseen at that point)
      val b2Ids = b2.map(_._1).toSet
      afterB1.foreach { case (a, b, _) =>
        assert(!b2Ids(a) && !b2Ids(b), s"pair ($a,$b) saw an unarrived doc")
      }
    } finally q.stop()
  }

  test("streaming as-of join == batch AsOfJoin under ordered replay") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val evs = Tables.events(spark, sf)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect()
      // the equality contract: (ts, click-before-purchase, id) replay order
      .sortBy(e => (EventStreaming.tsUs(e.ts),
        if (e.event_type == "click") 0 else 1, e.event_id))

    val stream = MemoryStream[Event]
    val q = EventStreaming.asofStream(stream.toDS())
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      evs.grouped(math.max(1, evs.length / 3)).foreach { chunk =>
        stream.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      val got = spark.table("asof_stream")
        .as[EventStreaming.AsOfOut].collect()
        .map(o => o.event_id -> ((o.click_ts, o.click_value))).toMap
      val want = graft.queries.EventQueries.eventsAsof(spark, sf)
        .select("event_id", "click_ts", "click_value")
        .as[(Long, Option[java.sql.Timestamp], Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == want,
        s"got ${got.size} want ${want.size}; diff=${(want.toSet -- got.toSet).take(3)}")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization == batch lag+cumsum sessions") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Event]
    val out = EventStreaming.sessionize(stream.toDS())
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      val (a, b) = sampleEvents.sortBy(_.ts.getTime).splitAt(5)
      stream.addData(a: _*); q.processAllAvailable()
      stream.addData(b: _*); q.processAllAvailable()
      // advance watermark far past the last event: open sessions time out
      stream.addData(Event(99, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 9, "view", 0.0))
      q.processAllAvailable()
      stream.addData(Event(100, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 9, "view", 0.0))
      q.processAllAvailable()

      val got = spark.table("sessions").as[SessionOut].collect()
        .filter(_.user_id != 9)
        .map(so => (so.user_id, so.sid, so.start_us, so.end_us, so.n_events, so.sum_value_us))
        .toSet

      // batch twin over the same rows (EventQueries.eventsSession logic)
      val evs = sampleEvents
      val want = evs.groupBy(_.user_id).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
        var sid = 0L; var sessions = List.empty[(Long, Long, Long, Long, Long, Long)]
        var cur: Option[(Long, Long, Long, Long)] = None // start, last, n, sum
        sorted.foreach { e =>
          val us = e.ts.getTime * 1000
          cur match {
            case Some((st, last, n, sm)) if us - last <= 30L * 60 * 1000000 =>
              cur = Some((st, us, n + 1, sm + EventStreaming.microUnits(e.value)))
            case Some((st, last, n, sm)) =>
              sid += 1; sessions ::= (u, sid, st, last, n, sm)
              cur = Some((us, us, 1L, EventStreaming.microUnits(e.value)))
            case None =>
              cur = Some((us, us, 1L, EventStreaming.microUnits(e.value)))
          }
        }
        cur.foreach { case (st, last, n, sm) => sid += 1; sessions ::= (u, sid, st, last, n, sm) }
        sessions
      }.toSet
      assert(got == want, s"got ${got.size} want ${want.size}\nmissing: ${want -- got}\nextra: ${got -- want}")
    } finally q.stop()
  }

  test("streaming heavy hitters: mergeable-MG bound holds over batch replay; state stays bounded") {
    val sf = "/root/testdata/sf0.01"
    val users = Tables.events(spark, sf).select(col("user_id"))
    val cap = 64 // << 150 distinct users: forces real merge-prunes
    val hh = new graft.streaming.StreamingHeavyHitters("user_id", cap)
    // replay in 4 deterministic micro-batches
    (0 until 4).foreach { i =>
      hh.processBatch(users.where(pmod(col("user_id"), lit(4)) === i))
    }
    val n = users.count()
    assert(hh.totalSeen == n)
    val exact = users.groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    val est = hh.topK(cap).toMap
    assert(est.size <= cap, s"state ${est.size} exceeds capacity")
    // never overcounts; undercounts by at most the bound
    est.foreach { case (v, e) =>
      assert(e <= exact(v), s"user $v overcounted: $e > ${exact(v)}")
      assert(exact(v) - e <= hh.errorBound, s"user $v undercount ${exact(v) - e}")
    }
    // every key whose true count clears the bound is tracked
    exact.foreach { case (v, c) =>
      if (c > hh.errorBound) assert(est.contains(v), s"heavy user $v (count $c) lost")
    }
  }

  test("streaming heavy hitters: foreachBatch wiring snapshots top-k per batch") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Long]
    val hh = new graft.streaming.StreamingHeavyHitters("value", 16)
    val snaps = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long)]]
    val q = hh.writer(stream.toDF().toDF("value"), k = 2,
      (top, _) => snaps.synchronized { snaps += top; () }).start()
    try {
      stream.addData(Seq(7L, 7L, 7L, 3L, 3L, 9L): _*)
      q.processAllAvailable()
      stream.addData(Seq(3L, 3L, 3L): _*)
      q.processAllAvailable()
      assert(snaps.nonEmpty)
      // after both batches: 3 has 5 hits, 7 has 3 — small state, exact
      assert(snaps.last == Seq((3L, 5L), (7L, 3L)))
    } finally q.stop()
  }

  test("streaming semantic dedup: batches compose to the frozen-model verdict") {
    implicit val sq = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
    val resident = emb.where(col("vec_id") % 10 =!= 0)
    val rest = emb.where(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Long)].collect().sortBy(_._1)
    val (b1, b2) = rest.splitAt(rest.length / 2)

    val model = graft.search.Ivf.build(resident, nlist = 8, maxIter = 5)
    val tau = 0.4
    val inc = new graft.streaming.IncrementalSemDedup(model, resident, tau)
    val stream = MemoryStream[(Long, Array[Float], Long)]
    var batches = 0
    val q = inc.writer(stream.toDF().toDF("vec_id", "embedding", "label"),
      (_, _) => batches += 1).start()
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      assert(batches == 2)
      val got = inc.verdict.orderBy("vec_id").collect().map(_.toSeq).toSeq
      val want = graft.dedup.SemDedup.verdictFor(
          graft.dedup.SemDedup.assignWith(model, emb), tau)
        .orderBy("vec_id").collect().map(_.toSeq).toSeq
      assert(got == want)
    } finally q.stop()
  }

  test("streaming semantic dedup == registered dedup_semantic_inc (#159) under its split") {
    // the #300-style append-contract parity, streamed flavor: drive the
    // twin with #159's exact corpus/batch split and model construction
    // (Ivf.build is seed-deterministic, so both build the SAME frozen
    // quantizer) — the streamed snapshots must compose to the registered
    // gate row's output byte for byte
    implicit val sq = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
    val resident = emb.where(col("vec_id") % 10 =!= 0)
    val batchRows = emb.where(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Long)].collect().sortBy(_._1)
    val (b1, b2) = batchRows.splitAt(batchRows.length / 2)
    val model = graft.search.Ivf.build(resident,
      graft.dedup.SemDedup.pickK(resident.count()))
    val tau = graft.queries.DedupQueries.CosineTau
    val inc = new graft.streaming.IncrementalSemDedup(model, resident, tau)
    val stream = MemoryStream[(Long, Array[Float], Long)]
    val q = inc.writer(stream.toDF().toDF("vec_id", "embedding", "label"),
      (_, _) => ()).start()
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      val got = inc.verdict.orderBy("vec_id").collect().map(_.toSeq).toSeq
      val want = graft.queries.DedupQueries.dedupSemanticInc(spark, sf)
        .collect().map(_.toSeq).toSeq
      assert(got == want)
    } finally q.stop()
  }

  test("streaming DSIR: absorbed batches reproduce the batch model bit-for-bit") {
    implicit val sq = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val rows = docs.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    val (b1, b2) = rows.splitAt(rows.length / 2)

    val inc = graft.streaming.IncrementalDsir.empty(spark)
    val stream = MemoryStream[(Long, String, String)]
    var batches = 0
    val q = inc.writer(stream.toDF().toDF("doc_id", "lang", "text"),
      (df, _) => { batches += 1; assert(df.count() > 0) }).start()
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      assert(batches == 2)
      // the histogram is additive integer state: scoring the corpus under
      // the streamed model must equal batch corpus_dsir EXACTLY
      val got = inc.scoreWith(docs).orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
      val want = queries.PipelineQueries.corpusDsir(spark, sf)
        .collect().map(_.toSeq).toSeq
      assert(got == want)
    } finally q.stop()
  }

  test("streaming quality probe: RLS moments == batch fit; prequential scores flow") {
    implicit val sq = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val rows = docs.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    val (b1, b2) = rows.splitAt(rows.length / 2)

    val inc = new graft.streaming.IncrementalQualityProbe(col("lang") === "en")
    val stream = MemoryStream[(Long, String, String)]
    var scored = 0L
    val q = inc.writer(stream.toDF().toDF("doc_id", "lang", "text"),
      (df, _) => scored += df.count()).start()
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      assert(scored == rows.length, "every streamed doc scored exactly once")
      // moment additivity: streamed weights match the batch fit
      val batchModel = graft.text.QualityProbe.fit(docs, col("lang") === "en")
      val streamModel = inc.model.getOrElse(fail("no model after two batches"))
      streamModel.w.zip(batchModel.w).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-6, s"weight drift: $g vs $w")
      }
      val got = inc.scoreWith(docs).as[(Long, Double)].collect().toMap
      val want = graft.text.QualityProbe.score(docs, batchModel)
        .as[(Long, Double)].collect().toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (id, s) =>
        assert(math.abs(s - want(id)) < 1e-5, s"doc $id: $s vs ${want(id)}")
      }
    } finally q.stop()
  }

  test("dedupWindowStream == batch events_dedup_window under ordered replay") {
    implicit val ss = spark
    implicit val sq = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val evs = graft.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
    val stream = MemoryStream[Event]
    val q = graft.streaming.EventStreaming.dedupWindowStream(stream.toDS())
      .writeStream.format("memory").queryName("dedup_win")
      .outputMode("append").start()
    try {
      evs.grouped(math.max(1, evs.length / 4)).foreach { chunk =>
        stream.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      val got = spark.table("dedup_win")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_kept"),
          expr("bit_xor(event_id)").as("kept_xor"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val want = graft.queries.EventQueries.eventsDedupWindow(spark, sf)
        .select("event_type", "n_kept", "kept_xor")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == want)
    } finally q.stop()
  }
}
