package graft

import graft.queries.{EventQueries, TextQueries}
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the round-12 analytics additions: multi-touch attribution
  * (credit conservation + model semantics on planted journeys), the A/B
  * readout (hand-computed z), and PMI collocations (local recompute).
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("attribution: linear conserves value; last/first go to the right touch") {
    // user 1: view@0, click@10, purchase@20 (value 30) -> linear 15/15,
    //   last to click, first to view
    // user 2: click@0, purchase@5 (value 10) -> all 10 to click
    // user 3: purchase@0 with NO touches -> unattributed (absent)
    // user 4: view 8 days before purchase@0 (value 99) -> outside window
    val ev = Seq(
      (1L, ts(0), 1L, "view", 0.0),
      (2L, ts(10), 1L, "click", 0.0),
      (3L, ts(20), 1L, "purchase", 30.0),
      (4L, ts(0), 2L, "click", 0.0),
      (5L, ts(5), 2L, "purchase", 10.0),
      (6L, ts(0), 3L, "purchase", 50.0),
      (7L, ts(0), 4L, "view", 0.0),
      (8L, ts(8L * 24 * 60), 4L, "purchase", 99.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventQueries.eventsAttributionOf(ev)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, nTc, nPc, linC, lastC, firstC) = got("click")
    val (_, nTv, nPv, linV, lastV, firstV) = got("view")
    assert(nTc == 2 && nPc == 2 && nTv == 1 && nPv == 1)
    assert(linC == 25.0 && linV == 15.0)   // 15 + 10 vs 15
    assert(lastC == 40.0 && lastV == 0.0)  // both purchases last-touched by click
    assert(firstC == 10.0 && firstV == 30.0)
    // conservation: every model distributes exactly the attributed value
    assert(linC + linV == 40.0 && lastC + lastV == 40.0 && firstC + firstV == 40.0)
  }

  test("ab readout: counts, rates, and z match a hand computation") {
    // variant 0 (even ids): users 2, 4 -> user 2 converts (value 95)
    // variant 1 (odd ids): users 1, 3, 5 -> users 1, 3 convert
    val ev = Seq(
      (1L, 2L, "purchase", 95.0),
      (2L, 2L, "view", 0.0),
      (3L, 4L, "purchase", 10.0), // below 90: not a conversion, counts in ARPU
      (4L, 1L, "purchase", 92.0),
      (5L, 3L, "purchase", 99.0),
      (6L, 5L, "view", 0.0)
    ).toDF("event_id", "user_id", "event_type", "value")
    val r = EventQueries.eventsAbOf(ev)
      .select("n0", "n1", "c0", "c1", "rate0", "rate1", "z")
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect().head
    assert(r._1 == 2 && r._2 == 3 && r._3 == 1 && r._4 == 2)
    assert(r._5 == 0.5 && math.abs(r._6 - 0.666667) < 1e-9)
    val p0 = 0.5; val p1 = 2.0 / 3; val pp = 3.0 / 5
    val z = (p1 - p0) / math.sqrt(pp * (1 - pp) * (1.0 / 2 + 1.0 / 3))
    assert(math.abs(r._7 - math.floor(z * 1e6 + 0.5) / 1e6) < 1e-9)
  }

  test("perplexity: bigram LM scores match a local recompute; repetition scores high") {
    val docs = Seq(
      (1L, "a b a b a b a b"),     // highly predictable transitions
      (2L, "a b c d e f g h"),     // every transition seen once
      (3L, "z")                    // < 2 tokens: absent from output
    ).toDF("doc_id", "text")
    val got = TextQueries.textPerplexityOf(docs)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(3L))
    // local recompute
    val corpus = Seq("a b a b a b a b", "a b c d e f g h", "z")
    val toks = corpus.map(_.split(" ").toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val bi = toks.filter(_.size >= 2).flatMap(_.sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size).toMap
    val v = uni.size.toDouble
    def score(text: String): (Long, Double) = {
      val t = text.split(" ").toSeq
      val lps = t.sliding(2).toSeq.map { p =>
        math.log((bi((p(0), p(1))) + 1).toDouble / (uni(p(0)) + v))
      }
      (lps.size.toLong, math.floor(lps.sum / lps.size * 1e6 + 0.5) / 1e6)
    }
    Seq(1L -> "a b a b a b a b", 2L -> "a b c d e f g h").foreach { case (id, t) =>
      val (n, mean) = score(t)
      val (_, gn, gm, gp) = got(id)
      assert(gn == n && math.abs(gm - mean) < 1e-9, s"doc $id")
      assert(math.abs(gp - math.floor(math.exp(-gm) * 1e6 + 0.5) / 1e6) < 1e-9)
    }
    // the repetitive doc is more probable than the all-distinct doc
    assert(got(1L)._3 > got(2L)._3 && got(1L)._4 < got(2L)._4)
  }

  test("drift: identical cohort distributions give PSI contributions of 0") {
    // parity-balanced: every (lang, source) appears once per cohort
    val docs = (0L until 40L).map(i =>
      (i, s"doc $i", if ((i / 2) % 2 == 0) "en" else "de", s"src${(i / 4) % 2}"))
      .toDF("doc_id", "text", "lang", "source")
    val got = graft.queries.PipelineQueries.corpusDriftOf(docs)
      .as[(String, String, Long, Long, Double, Double, Double)].collect()
    assert(got.length == 4) // 2 langs + 2 sources
    got.foreach { case (dim, cat, n0, n1, p0, p1, contrib) =>
      assert(n0 == n1, s"$dim/$cat")
      assert(p0 == p1 && contrib == 0.0, s"$dim/$cat")
    }
  }

  test("drift: a category present in only one cohort contributes positive PSI") {
    val docs = (0L until 20L).map { i =>
      val lang = if (i % 2 == 0) "en" else "fr" // en only in cohort 0, fr only in 1
      (i, "x", lang, "s0")
    }.toDF("doc_id", "text", "lang", "source")
    val got = graft.queries.PipelineQueries.corpusDriftOf(docs)
      .as[(String, String, Long, Long, Double, Double, Double)].collect()
      .filter(_._1 == "lang").map(r => r._2 -> r).toMap
    val (_, _, n0en, n1en, p0en, p1en, cEn) = got("en")
    assert(n0en == 10 && n1en == 0 && p0en > p1en && cEn > 0)
    val (_, _, _, _, _, _, cFr) = got("fr")
    assert(cFr > 0) // symmetric shift: both categories contribute positively
  }

  test("entropy: uniform = ln k, constant = 0, mixed matches local recompute") {
    val docs = Seq(
      (1L, "abcd"),         // uniform over 4 -> ln 4
      (2L, "aaaaaa"),       // constant -> 0
      (3L, "aab")           // p = (2/3, 1/3)
    ).toDF("doc_id", "text")
    val got = TextQueries.textEntropyOf(docs)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    def rnd6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got(1L)._2 == rnd6(math.log(4)))
    assert(got(2L)._2 == 0.0)
    val e3 = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(got(3L)._2 - rnd6(e3)) < 1e-9)
    // bits_per_char = entropy / ln 2 of the rounded entropy
    got.values.foreach(r => assert(math.abs(r._3 - rnd6(r._2 / math.log(2.0))) < 1e-9))
  }

  test("ewma: adjust=true smoothing matches a hand recompute over a planted series") {
    val ev = Seq(
      // day 1: 2 events; day 2: 4; day 3: 1 (single type)
      (1L, ts(0), 1L, "click", 0.0), (2L, ts(1), 2L, "click", 0.0),
      (3L, ts(24 * 60), 1L, "click", 0.0), (4L, ts(24 * 60 + 1), 1L, "click", 0.0),
      (5L, ts(24 * 60 + 2), 1L, "click", 0.0), (6L, ts(24 * 60 + 3), 1L, "click", 0.0),
      (7L, ts(48 * 60), 1L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventQueries.eventsEwmaOf(ev)
      .select("t", "x", "ewma").as[(Long, Long, Double)].collect().sortBy(_._1)
    val xs = Seq(2L, 4L, 1L)
    assert(got.map(_._2).toSeq == xs)
    val r = 0.7
    def rnd(x: Double, dp: Int) = math.floor(x * math.pow(10, dp) + 0.5) / math.pow(10, dp)
    got.foreach { case (t, _, ewma) =>
      val ws = (0L to t).map(i => rnd(math.pow(r, (t - i).toDouble), 12))
      val want = rnd(ws.zip(xs).map { case (w, x) => w * x }.sum / ws.sum, 6)
      assert(math.abs(ewma - want) < 1e-9, s"t=$t")
    }
    // smoothing pulls toward history: day-3 ewma sits between x3 and day-2 level
    val e2 = got(1)._3; val e3 = got(2)._3
    assert(e3 > 1.0 && e3 < e2)
  }

  test("langid eval: per-class precision/recall/f1 on a planted confusion") {
    // truth en x3: two predicted en, one predicted de (marker words)
    // truth de x1: predicted en -> en: tp=2 support=3 predicted=3
    //                              de: tp=0 support=1 predicted=1
    // truth fr x1: predicted und (no markers) -> und appears pred-only
    val docs = Seq(
      (1L, "the cat and the dog", "en"),
      (2L, "a walk to the park", "en"),
      (3L, "der hund und das", "en"),      // mislabeled truth: pred de
      (4L, "the der into of to and", "de"),// pred en (more en markers)
      (5L, "xyzzy plugh", "fr")            // no markers: pred und
    ).toDF("doc_id", "text", "lang")
    val got = TextQueries.textLangidEvalOf(docs)
      .as[(String, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val en = got("en")
    assert(en._2 == 3 && en._3 == 2 && en._4 == 3)
    assert(en._5.contains(0.666667) && en._6.contains(0.666667) && en._7.contains(0.666667))
    val de = got("de")
    assert(de._2 == 1 && de._3 == 0 && de._4 == 1)
    assert(de._5.contains(0.0) && de._6.contains(0.0) && de._7.isEmpty) // p+r=0 -> NULL f1
    val fr = got("fr")
    assert(fr._2 == 1 && fr._4 == 0 && fr._5.isEmpty) // never predicted: NULL precision
    val und = got("und")
    assert(und._2 == 0 && und._4 == 1 && und._6.isEmpty) // pred-only class: NULL recall
  }

  test("dau/wau: contribution rewrite matches hand counts, stickiness exact") {
    val ev = Seq(
      (1L, ts(0), 10L, "view", 0.0),              // user 10 day 0
      (2L, ts(5), 11L, "view", 0.0),              // user 11 day 0
      (3L, ts(3L * 24 * 60), 10L, "view", 0.0),   // user 10 day 3
      (4L, ts(3L * 24 * 60 + 9), 10L, "click", 0.0) // same user+day dup
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventQueries.eventsDauOf(ev)
      .as[(java.sql.Date, Long, Long, Double)].collect().sortBy(_._1.getTime)
    assert(got.length == 2) // only observed days surface
    val (d0, d3) = (got(0), got(1))
    assert(d0._2 == 2 && d0._3 == 2 && d0._4 == 1.0)      // day 0: both users
    assert(d3._2 == 1 && d3._3 == 2 && d3._4 == 0.5)      // day 3: window spans day 0
  }

  test("pareto: gini 0 on equal revenues, (n-1)/n on total concentration, shares exact") {
    import graft.queries.RelationalQueries
    def orders(revs: Seq[Double]) =
      revs.zipWithIndex.flatMap { case (r, i) =>
        // split each customer's revenue over two orders to exercise the agg
        Seq((i.toLong, r * 0.25), (i.toLong, r * 0.75))
      }.toDF("o_custkey", "o_totalprice")
    def run(revs: Seq[Double]) =
      RelationalQueries.customerParetoOf(orders(revs))
        .as[(Long, Double, Double, Double, Double, Double, Double)].collect().head
    // equal: G = 0; every top-p% share = ceil(p n)/n
    val eq = run(Seq.fill(10)(100.0))
    assert(eq._1 == 10 && eq._2 == 1000.0 && eq._3 == 0.0)
    assert(eq._4 == 0.1 && eq._5 == 0.1 && eq._6 == 0.1 && eq._7 == 0.2)
    // total concentration: G = (n-1)/n, top shares = 1
    val conc = run(Seq.fill(9)(0.0) :+ 900.0)
    assert(conc._3 == math.floor((9.0 / 10) * 1e6 + 0.5) / 1e6)
    assert(conc._4 == 1.0 && conc._7 == 1.0)
    // hand case: revenues 1..10 -> gini = 2*sum(i*i)/(10*55) - 11/10 = 0.3
    val lin = run((1 to 10).map(_.toDouble))
    assert(lin._3 == 0.3)
    assert(lin._4 == math.floor(10.0 / 55 * 1e6 + 0.5) / 1e6) // top1 = rank10 only
  }

  test("backlog: sweep-line open-order counts match hand-tracked intervals") {
    import graft.queries.RelationalQueries
    def d(off: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(off))
    val orders = Seq((1L, d(0)), (2L, d(1))).toDF("o_orderkey", "o_orderdate")
    val lineitem = Seq(
      (1L, d(1)), (1L, d(2)), // order 1 ships last on day 2
      (2L, d(1))              // order 2 ships day 1
    ).toDF("l_orderkey", "l_shipdate")
    val got = RelationalQueries.ordersBacklogOf(orders, lineitem)
      .select("day", "backlog").as[(java.sql.Date, Long)].collect()
      .map { case (day, b) => day.toString -> b }.toMap
    // d0: order1 open; d1: both; d2: order2 closed after d1 -> 1; d3: 0
    assert(got == Map("2024-01-01" -> 1L, "2024-01-02" -> 2L,
      "2024-01-03" -> 1L, "2024-01-04" -> 0L))
  }

  test("wau sketch: merged daily sketches track exact within the HLL bound") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val got = EventQueries.eventsWauSketchOf(ev)
      .as[(java.sql.Date, Long, Long, Double)].collect()
    val exactDays = EventQueries.eventsDauOf(ev)
      .select("day").as[java.sql.Date].collect().toSet
    assert(got.map(_._1).toSet == exactDays) // same observed-day set
    assert(got.forall(_._4 <= 0.05), got.maxBy(_._4).toString)
    // high cardinality actually exercises estimation: 40k users over 3
    // days, the day-2 window unions all three sketches
    val big = spark.range(40000).select(
      col("id").as("user_id"),
      timestamp_micros(lit(1700000000000000L) +
        (col("id") % 3) * 86400L * 1000000L).as("ts"))
    val bigGot = EventQueries.eventsWauSketchOf(big)
      .as[(java.sql.Date, Long, Long, Double)].collect().maxBy(_._1.getTime)
    assert(bigGot._2 == 40000 && bigGot._4 <= 0.03,
      s"exact=${bigGot._2} est=${bigGot._3} err=${bigGot._4}")
  }

  test("manifest: fingerprint invariant to partitioning; flips on a one-char edit") {
    import graft.queries.PipelineQueries
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = PipelineQueries.corpusManifestOf(docs).collect().toSeq
    val reparted = PipelineQueries.corpusManifestOf(docs.repartition(7)).collect().toSeq
    assert(base == reparted) // XOR fingerprint is order/partition independent
    val touchedSource = docs.where(col("doc_id") === 0)
      .select("source").as[String].collect().head
    val edited = docs.withColumn("text",
      when(col("doc_id") === 0, concat(col("text"), lit("x"))).otherwise(col("text")))
    val editedMan = PipelineQueries.corpusManifestOf(edited).collect().toSeq
    val changed = base.zip(editedMan).filter { case (a, b) => a != b }
    assert(changed.size == 1 && changed.head._1.getString(0) == touchedSource)
  }

  test("readability: Flesch formula matches hand computation; ranks simple above dense") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran. It was fun."),   // short sentences
      (2L, "Extraordinarily sophisticated considerations necessitate comprehensive experimentation")
    ).toDF("doc_id", "text")
    val got = TextQueries.textReadabilityOf(docs)
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    def fre(w: Long, s: Long, sy: Long): Double = {
      val x = 206.835 - 1.015 * (w.toDouble / s) - 84.6 * (sy.toDouble / w)
      math.floor(x * 1e6 + 0.5) / 1e6
    }
    val d1 = got(1L)
    assert(d1._2 == 9 && d1._3 == 3, d1.toString) // 9 ws tokens, 3 sentences
    assert(d1._5 == fre(d1._2, d1._3, d1._4))
    val d2 = got(2L)
    assert(d2._3 == 1) // no terminator: floored at 1
    assert(d2._5 == fre(d2._2, d2._3, d2._4))
    // the polysyllabic doc must score far lower
    assert(d1._5 > d2._5 + 50)
  }

  test("cohort matrix: planted journeys produce the hand-built D0-D7 triangle") {
    def dmin(days: Long) = ts(days * 24 * 60)
    val ev = Seq(
      (1L, dmin(0), 1L, "view", 0.0), (2L, dmin(1), 1L, "view", 0.0),
      (3L, dmin(3), 1L, "view", 0.0),                      // A: d0, d1, d3
      (4L, dmin(0), 2L, "view", 0.0),                      // B: d0 only
      (5L, dmin(1), 3L, "view", 0.0), (6L, dmin(2), 3L, "view", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventQueries.eventsCohortMatrixOf(ev)
      .as[(java.sql.Date, Int, Long, Long, Double)].collect()
      .map(r => (r._1.toString, r._2) -> (r._3, r._4, r._5)).toMap
    val d0 = got.keys.map(_._1).min
    val d1 = java.time.LocalDate.parse(d0).plusDays(1).toString
    assert(got((d0, 0)) == ((2L, 2L, 1.0)))
    assert(got((d0, 1)) == ((1L, 2L, 0.5)))
    assert(got((d0, 3)) == ((1L, 2L, 0.5)))
    assert(got((d1, 0)) == ((1L, 1L, 1.0)))
    assert(got((d1, 1)) == ((1L, 1L, 1.0)))
    assert(got.size == 5)
  }

  test("geo pairs: boundary-straddling pairs found; equals a naive recompute") {
    import graft.queries.VectorQueries
    def hav(la1: Double, lo1: Double, la2: Double, lo2: Double): Double = {
      def r(d: Double) = math.toRadians(d)
      val x = math.pow(math.sin(r(la2 - la1) / 2), 2) +
        math.cos(r(la1)) * math.cos(r(la2)) * math.pow(math.sin(r(lo2 - lo1) / 2), 2)
      math.floor(2 * 6371.0088 * math.asin(math.sqrt(x)) * 1e6 + 0.5) / 1e6
    }
    // points 1,2 straddle the 0.0/0.5-degree cell boundary ~2.2 km apart;
    // 3 is far away; 4 sits ~24.9 km from 1 (inside radius), 5 ~27 km (out)
    val meta = Seq(
      (1L, 0.249, 10.0), (2L, 0.251, 10.0), (3L, 50.0, -100.0),
      (4L, 0.249, 10.224), (5L, 0.249, 10.243)
    ).toDF("vec_id", "latitude", "longitude")
    val got = VectorQueries.geoPairsOf(meta)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got.contains((1L, 2L)), "boundary pair missed")
    assert(got((1L, 2L)) == hav(0.249, 10.0, 0.251, 10.0))
    assert(got.keys.forall { case (a, b) => a != 3L && b != 3L })
    assert(got.contains((1L, 4L)) && !got.contains((1L, 5L)))
    // completeness vs a naive all-pairs recompute on a real slice
    val slice = Tables.embeddingsMeta(spark, "/root/testdata/sf0.001")
      .select("vec_id", "latitude", "longitude").limit(300)
    val pts = slice.as[(Long, Double, Double)].collect()
    val naive = (for {
      (a, la1, lo1) <- pts; (b, la2, lo2) <- pts if a < b
      d = hav(la1, lo1, la2, lo2) if d <= VectorQueries.GeoRadiusKm
    } yield (a, b, d)).toSet
    val blocked = VectorQueries.geoPairsOf(slice)
      .as[(Long, Long, Double)].collect().toSet
    assert(blocked == naive,
      s"missing=${(naive -- blocked).take(3)} extra=${(blocked -- naive).take(3)}")
  }

  test("props agg: schema-on-read degrades malformed/missing JSON to NULL") {
    import graft.queries.EventQueries
    val ev = Seq(
      (1L, "a", """{"k": 5}"""),
      (2L, "a", """{"k": 7}"""),
      (3L, "a", """not json at all"""),   // malformed -> NULL k
      (4L, "a", """{"other": 1}"""),      // missing key -> NULL k
      (5L, "b", """{"k": 10}""")
    ).toDF("event_id", "event_type", "props")
    val got = EventQueries.eventsPropsAggOf(ev)
      .as[(String, Long, Long, Long, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val a = got("a")
    assert(a._2 == 4 && a._3 == 2 && a._4 == 12 && a._5 == 6.0 && a._6 == 5 && a._7 == 7)
    val b = got("b")
    assert(b._2 == 1 && b._3 == 1 && b._4 == 10)
  }

  test("seasonality: monthly rollup with hand-checked MoM/YoY growth") {
    import graft.queries.RelationalQueries
    def d(y: Int, m: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(y, m, 15))
    // 14 consecutive months, revenue = 100 * monthIndex (so growth is known)
    val orders = (1 to 14).flatMap { i =>
      val dt = d(2023 + (i - 1) / 12, (i - 1) % 12 + 1)
      Seq((i.toLong, dt, i * 100.0))
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val got = RelationalQueries.ordersSeasonalityOf(orders)
      .as[(java.sql.Date, Long, Double, Option[Double], Option[Double])]
      .collect().sortBy(_._1.getTime)
    def rnd6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got.length == 14 && got.forall(_._2 == 1))
    assert(got.head._4.isEmpty && got.head._5.isEmpty)      // no lag yet
    assert(got(1)._4.contains(rnd6((200.0 - 100.0) / 100.0)))
    assert(got(12)._5.contains(rnd6((1300.0 - 100.0) / 100.0))) // first YoY
    assert(got(11)._5.isEmpty)                               // month 12: lag 12 missing
  }

  test("dim stats: planted vectors give exact means/vars; dead dim flagged") {
    import graft.queries.VectorQueries
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f)),
      (2L, Array(3.0f, 0.0f, 2.0f)),
      (3L, Array(5.0f, 0.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val got = VectorQueries.vecDimStatsOf(emb)
      .as[(Int, Long, Double, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val d0 = got(0)
    assert(d0._2 == 3 && d0._3 == 3.0)
    assert(d0._4 == math.floor((35.0 / 3 - 9.0) * 1e6 + 0.5) / 1e6)
    assert(d0._5 == 1.0 && d0._6 == 5.0 && d0._7 == 0.0)
    val d1 = got(1) // dead dimension
    assert(d1._3 == 0.0 && d1._4 == 0.0 && d1._7 == 1.0)
    val d2 = got(2) // constant non-zero: variance 0, zero_frac 0
    assert(d2._3 == 2.0 && d2._4 == 0.0 && d2._7 == 0.0)
  }

  test("overlap matrix: hand-built audiences give exact intersection Jaccard") {
    import graft.queries.EventQueries
    // view audience {1,2,3}; click {2,3}; purchase {3}
    val ev = Seq(
      (1L, 1L, "view"), (2L, 2L, "view"), (3L, 3L, "view"), (4L, 2L, "view"),
      (5L, 2L, "click"), (6L, 3L, "click"),
      (7L, 3L, "purchase")
    ).toDF("event_id", "user_id", "event_type")
    val got = EventQueries.eventsOverlapMatrixOf(ev)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val cv = got(("click", "view"))
    assert(cv._3 == 2 && cv._4 == 3 && cv._5 == 2)
    assert(cv._6 == math.floor(2.0 / 3 * 1e6 + 0.5) / 1e6)
    val cp = got(("click", "purchase"))
    assert(cp._5 == 1 && cp._6 == 0.5) // {2,3} vs {3}: 1 / 2
    assert(got.size == 3)
  }

  test("split leakage: type partition matches pairs x splits recomputed locally") {
    import graft.queries.{DedupQueries, PipelineQueries}
    val sf = "/root/testdata/sf0.001"
    val pairs = DedupQueries.minedJaccardPairs(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assume(pairs.nonEmpty)
    val splits = PipelineQueries.splitTrainVal(spark, sf)
      .as[(Long, String)].collect().toMap
    val want = pairs.map { case (a, b) =>
      val s = Seq(splits(a), splits(b)).sorted
      s"${s.head}-${s.last}"
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = PipelineQueries.splitLeakage(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(got.map(r => r._1 -> r._2).toMap == want)
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-4) // shares partition
  }

  test("scorecard: each feature equals its standalone operator per doc") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val sc = TextQueries.corpusScorecardOf(docs)
      .as[(Long, Long, Double, String, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(sc.nonEmpty)
    val q = graft.text.TextAnalysis.withQuality(docs)
      .select("doc_id", "n_tokens", "quality_score")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val e = TextQueries.textEntropyOf(docs).select("doc_id", "entropy")
      .as[(Long, Double)].collect().toMap
    val r = TextQueries.textReadabilityOf(docs).select("doc_id", "fre")
      .as[(Long, Double)].collect().toMap
    sc.foreach { case (id, row) =>
      assert(row._2 == q(id)._2 && row._3 == q(id)._3, s"doc $id quality")
      assert(row._5 == e(id), s"doc $id entropy")
      assert(row._6 == r(id), s"doc $id readability")
    }
    assert(sc.keySet == q.keySet) // the join drops nothing on this corpus
  }

  test("collocations: PMI matches a local recompute on a planted corpus") {
    // "new york" appears 6x; tokens engineered so counts are hand-checkable
    val doc = ("new york " * 6) + ("of the " * 10) + "misc tail"
    val docs = Seq((1L, doc.trim)).toDF("doc_id", "text")
    val got = TextQueries.textCollocationsOf(docs)
      .as[(String, String, Long, Double)].collect()
    val toks = doc.trim.toLowerCase.split(" ").toSeq
    val uni = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = toks.sliding(2).toSeq.map(p => (p(0), p(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nu = toks.size.toDouble
    val nb = (toks.size - 1).toDouble
    got.foreach { case (w1, w2, n, pmi) =>
      assert(bi((w1, w2)) == n, s"count $w1 $w2")
      val want = math.log(n * nu * nu / (nb * uni(w1) * uni(w2)))
      assert(math.abs(pmi - math.floor(want * 1e6 + 0.5) / 1e6) < 1e-9, s"pmi $w1 $w2")
    }
    // the engineered pair is present with its exact count
    assert(got.exists(r => r._1 == "new" && r._2 == "york" && r._3 == 6))
    // min-support: nothing below 5 occurrences surfaced
    assert(got.forall(_._3 >= 5))
  }

  test("q1_cube: subtotals and grand total are consistent with the leaves") {
    val li = Seq(
      ("A", "F", 1.0, 10.0), ("A", "O", 2.0, 20.0),
      ("N", "F", 3.0, 30.0), ("N", "F", 4.0, 40.0)
    ).toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    val got = graft.queries.AnalyticsQueries.q1CubeOf(li)
      .as[(String, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // 3 leaves + 2 flag margins + 2 status margins + grand total
    assert(got.size == 8)
    assert(got(("ALL", "ALL"))._3 == 4 && got(("ALL", "ALL"))._4 == 10.0)
    assert(got(("N", "ALL"))._4 == 7.0 && got(("ALL", "F"))._4 == 8.0)
    assert(got(("A", "ALL"))._3 == 2 && got(("N", "F"))._3 == 2)
  }

  test("orders_rfm: buckets replay ntile populations; extremes land in bucket 1/5") {
    val ts0 = 1700000000000L
    val orders = (1L to 23L).flatMap { c =>
      // customer c: c orders (frequency grows with c), each priced 10*c,
      // all placed c days before the newest order in the table
      (1L to c).map(i => (c * 100 + i, c, 10.0 * c,
        new Timestamp(ts0 - c * 86400000L)))
    }.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val got = graft.queries.AnalyticsQueries.ordersRfmOf(orders)
      .select("o_custkey", "recency_days", "frequency", "monetary", "r", "f", "m")
      .as[(Long, Long, Long, Double, Int, Int, Int)].collect()
    assert(got.length == 23)
    // ntile(5) of 23 rows: buckets sized 5,5,5,4,4
    for (col <- Seq(got.map(_._5), got.map(_._6), got.map(_._7))) {
      val sizes = col.groupBy(identity).view.mapValues(_.size).toMap
      // ntile(5) of 23 rows: first 23%5=3 buckets take 5, the rest 4
      assert(sizes == Map(1 -> 5, 2 -> 5, 3 -> 5, 4 -> 4, 5 -> 4), s"sizes $sizes")
    }
    val byCust = got.map(r => r._1 -> r).toMap
    // customer 1: most recent (r=1), fewest orders (f=5), lowest spend (m=5)
    assert(byCust(1L)._5 == 1 && byCust(1L)._6 == 5 && byCust(1L)._7 == 5)
    // customer 23: least recent (r=5), most orders (f=1), highest spend (m=1)
    assert(byCust(23L)._5 == 5 && byCust(23L)._6 == 1 && byCust(23L)._7 == 1)
    assert(byCust(1L)._2 == 0L && byCust(23L)._2 == 22L)   // recency vs max date
  }

  test("part_skyline: equals the brute-force dominance replay; frontier is an antichain") {
    val rng = new scala.util.Random(7)
    val parts = (1L to 300L).map { id =>
      (id, s"p$id", math.floor(rng.nextDouble() * 500) / 10.0, rng.nextInt(40) + 1)
    }
    val df = parts.toDF("p_partkey", "p_name", "p_retailprice", "p_size")
    val got = graft.queries.AnalyticsQueries.partSkylineOf(df)
      .select("p_partkey").as[Long].collect().toSet
    def dominated(p: (Long, String, Double, Int)) = parts.exists(q =>
      q._3 <= p._3 && q._4 >= p._4 && (q._3 < p._3 || q._4 > p._4))
    val want = parts.filterNot(dominated).map(_._1).toSet
    assert(got == want)
    // antichain: no member dominates another
    val sky = parts.filter(p => got(p._1))
    sky.foreach { p => assert(!sky.exists(q => q != p &&
      q._3 <= p._3 && q._4 >= p._4 && (q._3 < p._3 || q._4 > p._4))) }
  }

  test("fk_audit: planted orphans and domain violations are counted exactly") {
    val li = Seq(
      (1L, 10L, 100L, 5.0, 50.0),   // clean
      (2L, 10L, 100L, -1.0, 50.0),  // bad qty
      (9L, 77L, 100L, 5.0, 0.0)     // orphan order + orphan part + bad price
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    val ord = Seq((1L, 1L, 10.0), (2L, 99L, -5.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Seq(Tuple1(1L)).toDF("c_custkey")
    val part = Seq(Tuple1(10L)).toDF("p_partkey")
    val supp = Seq(Tuple1(100L)).toDF("s_suppkey")
    val got = graft.queries.AnalyticsQueries.fkAuditOf(li, ord, cust, part, supp)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("lineitem_nonpositive_qty") == (3L, 1L))
    assert(got("lineitem_nonpositive_price") == (3L, 1L))
    assert(got("lineitem_orphan_order") == (3L, 1L))
    assert(got("lineitem_orphan_part") == (3L, 1L))
    assert(got("lineitem_orphan_supplier") == (3L, 0L))
    assert(got("orders_orphan_customer") == (2L, 1L))
    assert(got("orders_nonpositive_total") == (2L, 1L))
    assert(got("orders_null_keys") == (2L, 0L))
  }

  test("globalRowNumber: matches a single-partition row_number on every permutation of ties") {
    val df = Seq((5, "a"), (5, "b"), (3, "c"), (9, "d"), (3, "e"), (5, "f"))
      .toDF("k", "id")
    val got = graft.queries.AnalyticsQueries.globalRowNumber(df, "rk",
        col("k").desc, col("id").asc)
      .select("id", "rk").as[(String, Long)].collect().toMap
    assert(got == Map("d" -> 1L, "a" -> 2L, "b" -> 3L, "f" -> 4L, "c" -> 5L, "e" -> 6L))
  }

  test("events_dedup_window: planted bursts collapse by the 5-minute lag rule") {
    def t(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)
    val ev = Seq(
      // user 1 click burst: 0s, 10s, 200s, 400s -> keep 0s (10s,200s within
      // 300s of predecessor; 400s only 200s after 200s) = keep 1
      (1L, t(0), 1L, "click"), (2L, t(10), 1L, "click"),
      (3L, t(200), 1L, "click"), (4L, t(400), 1L, "click"),
      // user 1 view: 0s, 300s (exactly the window) -> both kept (>= rule)
      (5L, t(0), 1L, "view"), (6L, t(300), 1L, "view"),
      // user 2 click: isolated -> kept; not merged with user 1's key
      (7L, t(5), 2L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.queries.EventQueries.eventsDedupWindowOf(ev)
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val (_, ct, ck, cd, cx) = got("click")
    assert(ct == 5 && ck == 2 && cd == 3)
    assert(cx == (1L ^ 7L))              // kept click ids: 1 and 7
    val (_, vt, vk, vd, vx) = got("view")
    assert(vt == 2 && vk == 2 && vd == 0 && vx == (5L ^ 6L))
  }

  test("text_zipf: ranks, frequencies, and cumulative share replay a local count") {
    val docs = Seq(
      (1L, "a a a b b c"), (2L, "a b d"), (3L, "a c c e")
    ).toDF("doc_id", "text")
    val got = graft.queries.TextQueries.textZipfOf(docs)
      .as[(Long, String, Long, Double)].collect()
    val toks = Seq("a a a b b c", "a b d", "a c c e").flatMap(_.split(" "))
    val tf = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = tf.toSeq.sortBy { case (t, f) => (-f, t) }
    assert(got.map(r => (r._2, r._3)).toSeq == want)
    assert(got.map(_._1).toSeq == (1L to got.length))
    // cumulative share is monotone and ends at 1 (all tokens within top-200)
    assert(got.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    assert(math.abs(got.last._4 - 1.0) < 1e-9)
  }

  test("vec_knn_classify: well-separated clusters classify perfectly") {
    // 40 vectors in 2 orthogonal clusters (unit basis + small same-cluster
    // jitter): every eval point's neighbors share its label
    val vecs = (0L until 40L).map { id =>
      val lab = (id / 20).toInt
      val v = Array.fill(8)(0.001f * ((id % 5) + 1))
      v(lab) = 1f
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      (id, v.map(_ / n), lab)
    }
    val df = vecs.toDF("vec_id", "embedding", "label")
    val got = graft.queries.VectorQueries.vecKnnClassifyOf(df)
      .as[(Int, Long, Long, Double)].collect()
    assert(got.map(_._2).sum == 4)       // eval ids 0,10 (label 0), 20,30 (label 1)
    got.foreach { case (_, nEval, nCorrect, acc) =>
      assert(nEval == nCorrect && acc == 1.0)
    }
    assert(got.map(_._1).toSeq == Seq(0, 1))
  }

  test("basket_pairs: counts, support, and lift replay a hand computation") {
    // orders: 1:{B1,B2}, 2:{B1,B2,B3}, 3:{B1}, 4:{B2,B3} -> N=4
    val li = Seq(
      (1L, 11L), (1L, 12L), (1L, 11L),      // duplicate item dedups to grain
      (2L, 11L), (2L, 12L), (2L, 13L),
      (3L, 11L), (4L, 12L), (4L, 13L)
    ).toDF("l_orderkey", "l_partkey")
    val part = Seq((11L, "B1"), (12L, "B2"), (13L, "B3")).toDF("p_partkey", "p_brand")
    val got = graft.queries.AnalyticsQueries.basketPairsOf(li, part)
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val (_, _, na, nb, both, sup, lift) = got(("B1", "B2"))
    assert(na == 3 && nb == 3 && both == 2)
    assert(sup == 0.5)                      // 2/4
    assert(lift == math.floor(2.0 * 4 / 9 * 1e6 + 0.5) / 1e6)
    assert(got(("B2", "B3"))._5 == 2 && got(("B1", "B3"))._5 == 1)
    assert(got.size == 3)
  }

  test("events_hourly: the 7x24 matrix replays a local count") {
    def at(day: String, h: Int) =
      java.sql.Timestamp.valueOf(s"$day ${"%02d".format(h)}:30:00")
    val ev = Seq(
      (1L, at("2024-01-01", 9), 1.5),   // Monday -> isodow 1
      (2L, at("2024-01-01", 9), 2.5),
      (3L, at("2024-01-01", 17), 1.0),
      (4L, at("2024-01-07", 9), 4.0)    // Sunday -> isodow 7
    ).toDF("event_id", "ts", "value")
    val got = graft.queries.EventQueries.eventsHourlyOf(ev)
      .as[(Int, Int, Long, Double)].collect().map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got((1, 9)) == ((2L, 4.0)))
    assert(got((1, 17)) == ((1L, 1.0)))
    assert(got((7, 9)) == ((1L, 4.0)))
    assert(got.size == 3)
  }

  test("corpus_ccnet_buckets: per-lang tercile populations and ppl ordering") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(SparkTest.session, sf)
    val got = graft.queries.PipelineQueries.corpusCcnetBucketsOf(docs)
      .as[(String, String, Long, Double, Double, Double)].collect()
    val byLang = got.groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      val m = rows.map(r => r._2 -> r).toMap
      // tercile populations differ by at most 1
      val ns = rows.map(_._3)
      assert(ns.max - ns.min <= 1, s"$lang sizes $ns")
      // quality ordering: head's worst ppl <= middle's best, etc.
      for ((a, b) <- Seq(("head", "middle"), ("middle", "tail")))
        (m.get(a), m.get(b)) match {
          case (Some(x), Some(y)) => assert(x._5 <= y._4, s"$lang $a..$b")
          case _ =>
        }
    }
  }

  test("groupedRowNumber: matches a per-group local row_number") {
    val df = Seq(
      ("en", 3.0, 1L), ("en", 1.0, 2L), ("en", 1.0, 3L), ("en", 2.0, 4L),
      ("fr", 9.0, 5L), ("fr", 0.5, 6L)
    ).toDF("g", "v", "id")
    val got = graft.queries.AnalyticsQueries.groupedRowNumber(df, "rk",
        col("g"), col("v").asc, col("id").asc)
      .select("id", "rk").as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 1L, 3L -> 2L, 4L -> 3L, 1L -> 4L, 6L -> 1L, 5L -> 2L))
  }

  test("text_heaps: token/type/hapax accounting replays a local count") {
    val docs = Seq(
      (1L, "a a b c", "s1"), (2L, "a d", "s1"),   // s1: tokens=6 types=4 hapax b,c,d=3
      (3L, "x x x", "s2")                          // s2: tokens=3 types=1 hapax=0
    ).toDF("doc_id", "text", "source")
    val got = graft.queries.TextQueries.textHeapsOf(docs)
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("s1") == (("s1", 6L, 4L, 3L, 0.75, math.floor(4.0 / 6 * 1e6 + 0.5) / 1e6)))
    assert(got("s2") == (("s2", 3L, 1L, 0L, 0.0, math.floor(1.0 / 3 * 1e6 + 0.5) / 1e6)))
  }

  test("events_burstiness: exact-moment fano replays a hand computation") {
    def at(day: String) = java.sql.Timestamp.valueOf(s"$day 12:00:00")
    // steady: 2,2,2 -> var 0, fano 0 ; bursty: 1,1,10 -> var 27, fano 6.75
    val ev = (Seq.fill(2)(at("2024-01-01")) ++ Seq.fill(2)(at("2024-01-02")) ++
        Seq.fill(2)(at("2024-01-03"))).map(t => ("steady", t)) ++
      (Seq.fill(1)(at("2024-01-01")) ++ Seq.fill(1)(at("2024-01-02")) ++
        Seq.fill(10)(at("2024-01-03"))).map(t => ("bursty", t))
    val df = ev.zipWithIndex.map { case ((ty, t), i) => (i.toLong, t, ty) }
      .toDF("event_id", "ts", "event_type")
    val got = graft.queries.EventQueries.eventsBurstinessOf(df)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("steady") == (("steady", 3L, 6L, 2.0, 0.0, 0.0)))
    val (_, nd, ne, mean, v, fano) = got("bursty")
    assert(nd == 3 && ne == 12 && mean == 4.0 && v == 27.0 && fano == 6.75)
  }

  test("geo_knn: in-cell brute force agrees; out-of-neighborhood points excluded") {
    // four points inside one 0.5-degree cell + one far point two cells away
    val meta = Seq(
      (1L, 10.10, 20.10), (2L, 10.11, 20.10), (3L, 10.20, 20.20),
      (4L, 10.40, 20.40), (5L, 12.00, 25.00)
    ).toDF("vec_id", "latitude", "longitude")
    val got = graft.queries.VectorQueries.geoKnnOf(meta)
      .as[(Long, Long, Long, Double)].collect()
    val byA = got.groupBy(_._1)
    // the far point has no neighbors in its 3x3 cells, and vice versa
    assert(!byA.contains(5L))
    assert(byA(1L).map(_._3).toSet.subsetOf(Set(2L, 3L, 4L)))
    // point 1's nearest is 2 (0.01 deg apart), then 3, then 4
    assert(byA(1L).sortBy(_._2).map(_._3).toSeq == Seq(2L, 3L, 4L))
    // ranks are 1..k and distances nondecreasing in rank
    byA.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length))
      assert(sorted.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    }
  }

  test("text_cdc_chunks: boundaries reconstruct the text; insertion leaves tail chunks stable") {
    val rng = new scala.util.Random(11)
    def words(n: Int) = Seq.fill(n)("w" + rng.nextInt(500)).mkString(" ")
    val prefix = words(60); val suffix = words(120)
    val a = prefix + " " + suffix
    val b = prefix + " INSERTED PAYLOAD HERE " + suffix
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val ch = graft.queries.TextQueries.textCdcChunksOf(docs)
      .as[(Long, Long, Long, Long, String)].collect()
    // 1. per doc, chunks tile the text exactly
    for ((id, text) <- Seq((1L, a), (2L, b))) {
      val rows = ch.filter(_._1 == id).sortBy(_._2)
      assert(rows.head._3 == 1)
      rows.sliding(2).foreach { p =>
        if (p.length == 2) assert(p(0)._3 + p(0)._4 == p(1)._3) }
      assert(rows.map(_._4).sum == text.length)
      val rebuilt = rows.map(r => text.substring(r._3.toInt - 1, (r._3 + r._4).toInt - 1)).mkString
      assert(rebuilt == text)
    }
    // 2. content-defined stability: the suffix's interior chunks coincide
    //    across the insertion (fixed-offset shingles would all differ)
    val ha = ch.filter(_._1 == 1L).map(_._5).toSet
    val hb = ch.filter(_._1 == 2L).map(_._5).toSet
    val shared = ha intersect hb
    assert(shared.size >= 2, s"expected shared tail chunks, got ${shared.size}")
    // 3. supplementary-plane text: positions are code points end to end,
    //    so chunks still tile exactly (UTF-16 indexing would shift cuts)
    val emoji = new String(Character.toChars(0x1F600))
    val astral = (words(40).split(" ").flatMap(w => Seq(w, emoji)) ++ Seq("tail")).mkString(" ")
    val ch3 = graft.queries.TextQueries.textCdcChunksOf(
        Seq((9L, astral)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._2)
    val cps = astral.codePoints().toArray
    assert(ch3.map(_._4).sum == cps.length)
    val rebuilt3 = ch3.map(r =>
      new String(cps, r._3.toInt - 1, r._4.toInt)).mkString
    assert(rebuilt3 == astral)
  }

  test("dedup_cdc: reported duplicate chunks occur in multiple documents, and are complete") {
    val rng = new scala.util.Random(12)
    def words(n: Int) = Seq.fill(n)("t" + rng.nextInt(300)).mkString(" ")
    val passage = words(150)
    val docs = Seq(
      (1L, words(40) + " " + passage),
      (2L, words(55) + " " + passage + " " + words(10)),
      (3L, words(80))
    ).toDF("doc_id", "text")
    val chunks = graft.queries.TextQueries.textCdcChunksOf(docs)
      .as[(Long, Long, Long, Long, String)].collect()
    val got = graft.queries.DedupQueries.dedupCdcOf(docs)
      .select("chunk_md5", "n_docs").as[(String, Long)].collect().toMap
    // local replay: >=16-char chunk hashes present in more than one doc
    val want = chunks.filter(_._4 >= 16).groupBy(_._5)
      .view.mapValues(_.map(_._1).distinct.size).filter(_._2 > 1).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (h, n) => assert(n == want(h)) }
    assert(got.nonEmpty)   // the planted shared passage yields stable shared chunks
  }

  test("vec_matryoshka: prefix-dominant embeddings keep recall 1.0 at every rung") {
    // score order is decided entirely by dim 0, identical at every prefix
    val q = graft.search.QueryVectors.qvec(0)
    val vecs = (0L until 12L).map { id =>
      val v = new Array[Float](64)
      v(0) = (if (q(0) >= 0) 1f else -1f) * (1f + id * 0.01f)
      (id, v, 0)
    }
    val got = graft.queries.VectorQueries.vecMatryoshkaOf(
        vecs.toDF("vec_id", "embedding", "label"))
      .as[(Int, Double, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(8, 16, 32, 64))
    got.foreach { case (_, rec, _) => assert(rec == 1.0) }
  }

  test("events_autocorr: a period-2 series gives r=-1 at lag 1 and r=+1 at lag 2") {
    def at(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // daily counts 1,3,1,3,1,3,1,3,1,3 for one type
    val ev = (1 to 10).flatMap { d =>
      val n = if (d % 2 == 0) 3 else 1
      Seq.fill(n)(at(d))
    }.zipWithIndex.map { case (t, i) => (i.toLong, t, "pulse") }
      .toDF("event_id", "ts", "event_type")
    val got = graft.queries.EventQueries.eventsAutocorrOf(ev)
      .as[(String, Int, Long, Double)].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    assert(got(1) == ((9L, -1.0)))
    assert(got(2) == ((8L, 1.0)))
    assert(got(3)._2 == -1.0 && got(4)._2 == 1.0)
    // constant series: NULL r at every lag (not a crash, not Infinity)
    val flat = (1 to 6).map(d => (100L + d, java.sql.Timestamp.valueOf(
      f"2024-02-$d%02d 08:00:00"), "flat")).toDF("event_id", "ts", "event_type")
    val fr = graft.queries.EventQueries.eventsAutocorrOf(flat)
      .select("k", "r").as[(Int, Option[Double])].collect()
    assert(fr.nonEmpty && fr.forall(_._2.isEmpty))
  }

  test("split_ks: equals a local exact KS replay over the md5 split") {
    val docs = graft.Tables.documents(SparkTest.session, "/root/testdata/sf0.001")
    val (nT, nV, ksD, atV) = graft.queries.PipelineQueries.splitKsOf(docs)
      .as[(Long, Long, Double, Long)].collect().head
    // local replay
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = docs.select("doc_id", "n_chars").as[(Long, Long)].collect()
    def isTrain(id: Long): Boolean = {
      md.reset()
      val h = md.digest(id.toString.getBytes("UTF-8"))
        .take(1).map(b => f"$b%02x").mkString
      h < "f3"
    }
    val (tr, va) = rows.partition(r => isTrain(r._1))
    assert(nT == tr.length && nV == va.length)
    val values = rows.map(_._2).distinct.sorted
    var best = (0.0, Long.MaxValue)
    values.foreach { v =>
      val d = math.abs(tr.count(_._2 <= v).toDouble / tr.length -
        va.count(_._2 <= v).toDouble / va.length)
      val dr = math.floor(d * 1e6 + 0.5) / 1e6
      if (dr > best._1 || (dr == best._1 && v < best._2)) best = (dr, v)
    }
    assert(ksD == best._1 && atV == best._2)
  }

  test("events_conv_time: first-view to first-purchase-after latency, per variant") {
    def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val ev = Seq(
      // user 2 (variant A): view@0, purchase@30 -> 1800 s
      (1L, t(0), 2L, "view"), (2L, t(30), 2L, "purchase"),
      // user 4 (A): purchase BEFORE first view -> excluded; later purchase@50 counts
      (3L, t(10), 4L, "purchase"), (4L, t(20), 4L, "view"), (5L, t(50), 4L, "purchase"),
      // user 1 (B): view@0, purchases at 10 and 90 -> first = 600 s
      (6L, t(0), 1L, "view"), (7L, t(10), 1L, "purchase"), (8L, t(90), 1L, "purchase"),
      // user 3 (B): view only -> no conversion
      (9L, t(5), 3L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.queries.EventQueries.eventsConvTimeOf(ev)
      .as[(String, Double, Double, Long)].collect()
    val a = got.filter(_._1 == "A"); val b = got.filter(_._1 == "B")
    assert(a.forall(_._4 == 2) && b.forall(_._4 == 1))
    // A latencies: 1800 (user 2), 1800 (user 4: 50-20=30min) -> all quantiles 1800
    a.foreach { case (_, _, q, _) => assert(q == 1800.0) }
    // B: single latency 600 -> all quantiles 600
    b.foreach { case (_, _, q, _) => assert(q == 600.0) }
    assert(got.map(_._2).distinct.sorted.toSeq == Seq(0.25, 0.5, 0.75, 0.9))
  }

  test("market_hhi: monopoly scores 1, even split scores 1/n, exactly") {
    val li = Seq(
      (1L, 10L, 100L, 50.0), (2L, 10L, 100L, 30.0),          // B1: one supplier
      (3L, 20L, 200L, 40.0), (4L, 20L, 300L, 40.0),          // B2: 50/50 split
      (5L, 30L, 400L, 60.0), (6L, 30L, 500L, 20.0), (7L, 30L, 600L, 20.0)
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice")
    val part = Seq((10L, "B1"), (20L, "B2"), (30L, "B3")).toDF("p_partkey", "p_brand")
    val got = graft.queries.AnalyticsQueries.marketHhiOf(li, part)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("B1") == (("B1", 1L, 80.0, 1.0)))
    assert(got("B2") == (("B2", 2L, 80.0, 0.5)))
    // B3: shares 0.6, 0.2, 0.2 -> 0.36 + 0.04 + 0.04 = 0.44
    assert(got("B3") == (("B3", 3L, 100.0, 0.44)))
  }

  test("supplier_otd: Wilson bound demotes small-sample perfection below large-sample excellence") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def day(d: Int) = new java.sql.Timestamp(base.getTime + d * 86400000L)
    // supplier 1: 3/3 on time; supplier 2: 95/100 on time
    val li = (1 to 3).map(i => (i.toLong, 1L, day(10))) ++
      (1 to 100).map(i => (100L + i, 2L, if (i <= 95) day(10) else day(200)))
    val ord = (1 to 203).map(i => (i.toLong, day(0)))
    val got = graft.queries.AnalyticsQueries.supplierOtdOf(
        li.toDF("l_orderkey", "l_suppkey", "l_shipdate"),
        ord.toDF("o_orderkey", "o_orderdate"))
      .as[(Long, Long, Long, Double, Double)].collect()
    val m = got.map(r => r._1 -> r).toMap
    assert(m(1L)._4 == 1.0 && m(2L)._4 == 0.95)
    // raw share ranks supplier 1 first; the Wilson bound must not
    assert(m(2L)._5 > m(1L)._5, s"wilson ${m(1L)._5} vs ${m(2L)._5}")
    assert(got.head._1 == 2L)
  }

  test("events_streaks: islands collapse to per-user max streak histogram") {
    def at(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val ev = Seq(
      // user 1: days 1,2,3 then 7,8 -> max streak 3
      (1L, at(1), 1L), (2L, at(2), 1L), (3L, at(3), 1L), (4L, at(7), 1L), (5L, at(8), 1L),
      // user 2: days 5 only -> max streak 1 (two events same day dedup)
      (6L, at(5), 2L), (7L, at(5), 2L),
      // user 3: days 1,2 -> max streak 2
      (8L, at(1), 3L), (9L, at(2), 3L)
    ).toDF("event_id", "ts", "user_id")
    val got = graft.queries.EventQueries.eventsStreaksOf(ev)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("events_growth: new/retained/resurrected/churned replay a hand journal") {
    def at(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // user 1 active d1,d2,d4; user 2 active d2 only
    val ev = Seq(
      (1L, at(1), 1L), (2L, at(2), 1L), (3L, at(4), 1L),
      (4L, at(2), 2L)
    ).toDF("event_id", "ts", "user_id")
    val got = graft.queries.EventQueries.eventsGrowthOf(ev)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val d1 = 19723L  // 2024-01-01 as epoch day
    assert(got(d1) == ((1L, 0L, 0L, 0L)))          // u1 new
    assert(got(d1 + 1) == ((1L, 1L, 0L, 0L)))      // u2 new, u1 retained
    assert(got(d1 + 2) == ((0L, 0L, 0L, 2L)))      // both churn on d3
    assert(got(d1 + 3) == ((0L, 0L, 1L, 0L)))      // u1 resurrects d4
    assert(got(d1 + 4) == ((0L, 0L, 0L, 1L)))      // u1 churns after d4
  }

  test("CdcBoundaries: matches a direct replay on random strings, unicode included") {
    val rng = new scala.util.Random(99)
    // alphabets as WHOLE characters (the astral ones are 2 UTF-16 units,
    // 1 code point — sampling by charAt would create lone surrogates)
    val alphabets = Seq("abcdefgh ", "αβγδ εζ", "日本語テキスト ", "mix αb 語x ")
      .map(_.map(_.toString)) :+
      Seq("a", "b", " ", new String(Character.toChars(0x1F600)),
        new String(Character.toChars(0x1F680)))
    val cases = (0 until 30).map { i =>
      val a = alphabets(i % alphabets.size)
      (0 until (rng.nextInt(120))).map(_ => a(rng.nextInt(a.length))).mkString
    } :+ "" :+ "short" :+ ("x" * 16)
    val md = java.security.MessageDigest.getInstance("MD5")
    def replay(t: String): Seq[Long] = {
      val cp = t.codePoints().toArray
      (16 to cp.length).filter { i =>
        md.reset()
        (md.digest(new String(cp, i - 16, 16).getBytes("UTF-8"))(0) & 0xFF) < 4
      }.map(_.toLong)
    }
    val got = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), org.apache.spark.sql.GraftBridge.column(
        org.apache.spark.sql.graft.CdcBoundaries(
          org.apache.spark.sql.GraftBridge.expression(col("text")))).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == replay(t), s"case $i: '$t'")
    }
  }

  test("text_novelty: first doc scores 1, an exact copy scores 0, a remix in between") {
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val remix = ((1 to 10).map(i => s"w$i") ++ (1 to 10).map(i => s"x$i")).mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, remix)).toDF("doc_id", "text")
    val got = graft.queries.TextQueries.textNoveltyOf(docs)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._4 == 1.0)
    assert(got(2L)._4 == 0.0)                   // every gram first seen in doc 1
    assert(got(3L)._4 > 0.0 && got(3L)._4 < 1.0) // w1..w10 prefix grams shared
    assert(got(1L)._2 == 13)                     // 20 tokens -> 13 grams
  }

  test("events_spine: zero-filled gaps and carry-forward distance") {
    def at(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val ev = Seq(
      (1L, at(1), "click"), (2L, at(1), "click"), (3L, at(4), "click"),
      (4L, at(2), "view")
    ).toDF("event_id", "ts", "event_type")
    val got = graft.queries.EventQueries.eventsSpineOf(ev)
      .as[(String, Long, Long, Option[Long])].collect()
    val d1 = 19723L
    val clicks = got.filter(_._1 == "click").map(r => r._2 -> ((r._3, r._4))).toMap
    // full spine d1..d4 for every type
    assert(got.count(_._1 == "click") == 4 && got.count(_._1 == "view") == 4)
    assert(clicks(d1) == ((2L, Some(0L))))
    assert(clicks(d1 + 1) == ((0L, Some(1L))))   // gap, 1 day since activity
    assert(clicks(d1 + 2) == ((0L, Some(2L))))
    assert(clicks(d1 + 3) == ((1L, Some(0L))))
    val views = got.filter(_._1 == "view").map(r => r._2 -> ((r._3, r._4))).toMap
    assert(views(d1) == ((0L, None)))            // before first activity
    assert(views(d1 + 1) == ((1L, Some(0L))))
    assert(views(d1 + 3) == ((0L, Some(2L))))
  }

  test("dedup_containment: a copied passage scores ~1 on the short side, Jaccard-low") {
    val rng = new scala.util.Random(17)
    def words(n: Int, tag: String) = Seq.fill(n)(tag + rng.nextInt(200)).mkString(" ")
    val passage = words(30, "p")
    val article = words(100, "a") + " " + passage + " " + words(100, "b")
    val docs = Seq((1L, passage), (2L, article), (3L, words(50, "z")))
      .toDF("doc_id", "text")
    val got = graft.queries.DedupQueries.dedupContainmentOf(docs)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
    // blocking: the passage's min-shingle is shared iff the article's global
    // min shingle lies inside the copied span — engineered corpus where the
    // passage tag sorts below a/b/z md5s is not guaranteed, so assert on
    // the CONTRACT for surfaced pairs instead, plus exactness of the math
    got.foreach { case (da, db, na, nb, nc, ca, cb) =>
      assert(nc <= math.min(na, nb) && math.max(ca, cb) >= 0.9)
      assert(ca == math.floor(nc.toDouble / na * 1e6 + 0.5) / 1e6)
      assert(cb == math.floor(nc.toDouble / nb * 1e6 + 0.5) / 1e6)
    }
    // and the pair (1,2) is found when they share the blocking min: check
    // directly whether the blocking keys coincide, and if so require it
    import graft.functions.VectorFunctions._
    val blks = docs.select(col("doc_id"), tokenSetMinMd5(col("text"), 3).as("b"))
      .as[(Long, String)].collect().toMap
    if (blks(1L) == blks(2L))
      assert(got.exists(r => r._1 == 1L && r._2 == 2L && r._6 == 1.0))
  }

  test("text_script: planted CJK and digit content counted exactly") {
    val docs = Seq(
      (1L, "hello World 123"),
      (2L, "\u4e16\u754c abc \u3042\u308a"),
      (3L, "12345")
    ).toDF("doc_id", "text")
    val got = graft.queries.TextQueries.textScriptOf(docs)
      .as[(Long, Long, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, n1, lat1, cjk1, dig1, sp1, ls1, _) = got(1L)
    assert(n1 == 15 && lat1 == 10 && cjk1 == 0 && dig1 == 3 && sp1 == 2)
    assert(ls1 == math.floor(10.0 / 15 * 1e6 + 0.5) / 1e6)
    val (_, n2, lat2, cjk2, _, _, _, cs2) = got(2L)
    assert(lat2 == 3 && cjk2 == 4)             // 世界 + あり
    assert(cs2 == math.floor(4.0 / n2 * 1e6 + 0.5) / 1e6)
    assert(got(3L)._4 == 0 && got(3L)._5 == 5)
  }

  test("part_corr: perfect linear relation gives r=1, anti-linear r=-1") {
    val part = Seq(
      // B1: price = 10*size -> r = 1
      (1L, "B1", 1, 10.0), (2L, "B1", 2, 20.0), (3L, "B1", 3, 30.0),
      // B2: price = -5*size + 100 -> r = -1
      (4L, "B2", 2, 90.0), (5L, "B2", 4, 80.0), (6L, "B2", 6, 70.0),
      // B3: constant size -> NULL r
      (7L, "B3", 5, 10.0), (8L, "B3", 5, 99.0)
    ).toDF("p_partkey", "p_brand", "p_size", "p_retailprice")
    val got = graft.queries.AnalyticsQueries.partCorrOf(part)
      .as[(String, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(got("B1")._3.contains(1.0))
    assert(got("B2")._3.contains(-1.0))
    assert(got("B3")._3.isEmpty)
  }

  test("vec_dist_hist: identical vectors pile at the top bucket, orthogonal at the middle") {
    val e1 = Array(1f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f)
    // 6 copies of e1 and 4 of e2: C(6,2)=15 pairs at score 1 (bucket 19),
    // C(4,2)=6 pairs at score 1, 6*4=24 cross pairs at 0 (bucket 10)
    val vecs = (0L until 6L).map(i => (i, e1, 0)) ++ (6L until 10L).map(i => (i, e2, 1))
    val got = graft.queries.VectorQueries.vecDistHistOf(
        vecs.toDF("vec_id", "embedding", "label"))
      .as[(Int, Long)].collect().toMap
    assert(got == Map(19 -> 21L, 10 -> 24L))
  }

  test("events_dow_index: a Monday-heavy series indexes Monday above 1, exactly") {
    def at(day: Int, n: Int) = Seq.fill(n)(
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 09:00:00"))
    // Mondays Jan 1/8: 6 events each; Tuesdays Jan 2/9: 2 each
    // overall: 16 events over 4 days -> mean 4
    val ev = (at(1, 6) ++ at(8, 6) ++ at(2, 2) ++ at(9, 2))
      .zipWithIndex.map { case (t, i) => (i.toLong, t, "click") }
      .toDF("event_id", "ts", "event_type")
    val got = graft.queries.EventQueries.eventsDowIndexOf(ev)
      .as[(String, Int, Long, Long, Double)].collect()
      .map(r => r._2 -> r).toMap
    assert(got(1) == (("click", 1, 12L, 2L, 1.5)))   // 6/4
    assert(got(2) == (("click", 2, 4L, 2L, 0.5)))    // 2/4
  }

  test("events_activity_quantiles: linear interpolation replays quantile_cont") {
    // user counts for one type: 1, 2, 3, 10 -> p50 = 2.5, p90 = 7.9
    val ev = (Seq.fill(1)(1L) ++ Seq.fill(2)(2L) ++ Seq.fill(3)(3L) ++ Seq.fill(10)(4L))
      .zipWithIndex.map { case (u, i) =>
        (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u, "view") }
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.queries.EventQueries.eventsActivityQuantilesOf(ev)
      .as[(String, Double, Double)].collect().map(r => r._2 -> r._3).toMap
    // sorted per-user counts: 1,2,3,10; idx = p*(n-1)
    def q(p: Double) = {
      val v = Seq(1.0, 2.0, 3.0, 10.0); val idx = p * 3
      val lo = idx.toInt; val f = idx - lo
      val x = v(lo) + (if (lo + 1 < 4) (v(lo + 1) - v(lo)) * f else 0)
      math.floor(x * 1e6 + 0.5) / 1e6
    }
    assert(got(0.5) == q(0.5) && got(0.9) == q(0.9) && got(0.99) == q(0.99))
  }

  test("corpus_vocab_drift: a token flooding one cohort carries the PSI mass") {
    // even docs (cohort 0) say "spam" a lot; both cohorts share "base"
    val docs = (0L until 20L).map { id =>
      val words = if (id % 2 == 0) Seq.fill(10)("spam") ++ Seq.fill(10)("base")
                  else Seq.fill(20)("base")
      (id, words.mkString(" "))
    }.toDF("doc_id", "text")
    val got = graft.queries.PipelineQueries.corpusVocabDriftOf(docs)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, s0, s1, p0, p1, contrib) = got("spam")
    assert(s0 == 100 && s1 == 0)
    assert(p0 > p1 && contrib > 0)
    // hand replay: p0 = (100+1)/(200+200), p1 = (0+1)/(200+200)
    assert(p0 == math.floor(101.0 / 400 * 1e6 + 0.5) / 1e6)
    assert(p1 == math.floor(1.0 / 400 * 1e6 + 0.5) / 1e6)
    val want = (p0 - p1) * math.log(p0 / p1)
    assert(contrib == math.floor(want * 1e6 + 0.5) / 1e6)
    // base is 100-vs-200 across cohorts: replay its contribution too
    val (_, b0, b1, bp0, bp1, bContrib) = got("base")
    assert(b0 == 100 && b1 == 200)
    val bWant = (bp0 - bp1) * math.log(bp0 / bp1)
    assert(bContrib == math.floor(bWant * 1e6 + 0.5) / 1e6)
  }

  test("orders_aging: bands split on exact day edges; filled orders excluded") {
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (1L, "O", 10.0, d("2024-06-01")),   // age 0  -> a_0_29
      (2L, "O", 20.0, d("2024-05-03")),   // age 29 -> a_0_29
      (3L, "P", 30.0, d("2024-05-02")),   // age 30 -> b_30_89
      (4L, "P", 40.0, d("2023-12-04")),   // age 180 -> d_180_364
      (5L, "O", 50.0, d("2020-01-01")),   // 365+
      (6L, "F", 99.0, d("2020-01-01"))    // filled: excluded
    ).toDF("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val got = graft.queries.AnalyticsQueries.ordersAgingOf(orders)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("O", "a_0_29")) == ((2L, 30.0)))
    assert(got(("P", "b_30_89")) == ((1L, 30.0)))
    assert(got(("P", "d_180_364")) == ((1L, 40.0)))
    assert(got(("O", "e_365_plus")) == ((1L, 50.0)))
    assert(got.size == 4)
  }

  test("vec_ood_score: an isolated probe scores low, an in-cluster probe near 1") {
    // 20 near-identical cluster vectors (ids 0..19, unit on dim 0 with
    // small same-dim jitter) + one orthogonal outlier at id 20
    val vecs = (0L until 20L).map { id =>
      val v = new Array[Float](8); v(0) = 1f; v(1) = 0.001f * (id % 7)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      (id, v.map(_ / n), 0)
    } :+ {
      val v = new Array[Float](8); v(3) = 1f; (20L, v, 1)
    }
    val got = graft.queries.VectorQueries.vecOodScoreOf(
        vecs.toDF("vec_id", "embedding", "label"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    // eval slice: ids 0, 10, 20
    assert(got.keySet == Set(0L, 10L, 20L))
    assert(got(0L)._2 > 0.99 && got(10L)._2 > 0.99)
    assert(got(20L)._2 < 0.01 && got(20L)._3 < 0.01)
    assert(got(0L)._3 >= got(0L)._2)   // mean of top-10 >= its min
  }

  test("orders_ship_lag: per-priority quantiles replay linear interpolation") {
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val ord = Seq((1L, "1-URGENT", d("2024-01-01")), (2L, "1-URGENT", d("2024-01-01")))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    // urgent lags: 1, 3, 5, 100 days
    val li = Seq((1L, d("2024-01-02")), (1L, d("2024-01-04")),
      (2L, d("2024-01-06")), (2L, d("2024-04-10")))
      .toDF("l_orderkey", "l_shipdate")
    val got = graft.queries.AnalyticsQueries.ordersShipLagOf(li, ord)
      .as[(String, Double, Double)].collect().map(r => r._2 -> r._3).toMap
    def q(p: Double) = {
      val v = Seq(1.0, 3.0, 5.0, 100.0); val idx = p * 3
      val lo = idx.toInt; val f = idx - lo
      val x = v(lo) + (if (lo + 1 < 4) (v(lo + 1) - v(lo)) * f else 0)
      math.floor(x * 1e6 + 0.5) / 1e6
    }
    assert(got(0.5) == q(0.5) && got(0.9) == q(0.9) && got(0.99) == q(0.99))
  }

  test("split_balance: expected counts and chi-square contributions replay by hand") {
    // build docs whose split assignment we recompute locally via the md5 rule
    val docs = graft.Tables.documents(SparkTest.session, "/root/testdata/sf0.001")
    val got = graft.queries.PipelineQueries.splitBalanceOf(docs)
      .as[(String, String, Long, Double, Double)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def split(id: Long) = {
      md.reset()
      val h = md.digest(id.toString.getBytes("UTF-8")).take(1).map(b => f"$b%02x").mkString
      if (h < "f3") "train" else "val"
    }
    val rows = docs.select("doc_id", "lang").as[(Long, String)].collect()
      .map { case (id, l) => (split(id), l) }
    val n = rows.length.toDouble
    got.foreach { case (sp, lang, obs, exp, chi) =>
      val o = rows.count(r => r._1 == sp && r._2 == lang)
      assert(obs == o, s"$sp/$lang observed")
      val e = rows.count(_._1 == sp) * rows.count(_._2 == lang) / n
      assert(exp == math.floor(e * 1e6 + 0.5) / 1e6, s"$sp/$lang expected")
      val want = (o - exp) * (o - exp) / exp
      assert(chi == math.floor(want * 1e6 + 0.5) / 1e6, s"$sp/$lang chi")
    }
    // totals conserve
    assert(got.map(_._3).sum == rows.length)
  }

  test("events_velocity: consecutive weeks get exact growth; gaps get NULL") {
    def at(d: String) = java.sql.Timestamp.valueOf(s"$d 12:00:00")
    // week A: 4 events; week B (next): 6 events; then a silent week; week D: 3
    val ev = (Seq.fill(4)(at("2024-01-01")) ++ Seq.fill(6)(at("2024-01-08")) ++
      Seq.fill(3)(at("2024-01-22")))
      .zipWithIndex.map { case (t, i) => (i.toLong, t, "click") }
      .toDF("event_id", "ts", "event_type")
    val got = graft.queries.EventQueries.eventsVelocityOf(ev)
      .as[(String, Long, Long, Option[Double])].collect().sortBy(_._2)
    assert(got.length == 3)
    assert(got(0)._4.isEmpty)                 // first week
    assert(got(1)._4.contains(0.5))           // (6-4)/4
    assert(got(2)._4.isEmpty)                 // after the silent week
  }

  test("supplier_concurrency: sweep finds the overlap peak and its first day") {
    def d(s: String) = java.sql.Date.valueOf(s)
    // supplier 1: [jan01,jan03] and [jan02,jan04] overlap on jan02-03 -> peak 2 @ jan02
    // supplier 2: one closed interval [jan01,jan01] -> peak 1 @ jan01
    val ord = Seq(
      (10L, d("2024-01-01")), (11L, d("2024-01-02")), (12L, d("2024-01-01"))
    ).toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (10L, 1L, d("2024-01-03")), (11L, 1L, d("2024-01-04")),
      (12L, 2L, d("2024-01-01"))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val got = graft.queries.AnalyticsQueries.supplierConcurrencyOf(li, ord)
      .as[(Long, Long, java.sql.Date)].collect()
    assert(got.toSeq == Seq(
      (1L, 2L, d("2024-01-02")), (2L, 1L, d("2024-01-01"))))
  }

  test("events_changepoint: planted level shift is found with exact stats") {
    def at(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // days 1-4: 2 events/day; days 5-8: 10/day -> cp at day 4,
    // cusum peak |8 - 4*6| = 16, mean_before 2, mean_after 10
    val rows = (1 to 4).flatMap(d => Seq.fill(2)(at(d))) ++
      (5 to 8).flatMap(d => Seq.fill(10)(at(d)))
    val ev = rows.map(t => (t, "a")).toDF("ts", "event_type")
    val got = graft.queries.EventQueries.eventsChangepointOf(ev)
      .as[(String, java.sql.Date, Double, Double, Option[Double])].collect()
    assert(got.toSeq == Seq(
      ("a", java.sql.Date.valueOf("2024-01-04"), 16.0, 2.0, Some(10.0))))
  }

  test("events_mau: observed-day avg DAU and monthly stickiness") {
    def at(d: String) = java.sql.Timestamp.valueOf(s"$d 12:00:00")
    // Jan: day1 users {1,2}, day2 user {2} -> sum_dau 3, 2 days, mau 2
    // Feb: day1 user {3} -> avg_dau 1, mau 1, stickiness 1
    val ev = Seq(
      (at("2024-01-01"), 1L), (at("2024-01-01"), 2L), (at("2024-01-01"), 2L),
      (at("2024-01-02"), 2L), (at("2024-02-01"), 3L)
    ).toDF("ts", "user_id")
    val got = graft.queries.EventQueries.eventsMauOf(ev)
      .as[(String, Double, Long, Double)].collect()
    assert(got.toSeq == Seq(
      ("2024-01", 1.5, 2L, 0.75), ("2024-02", 1.0, 1L, 1.0)))
  }

  test("supplier_triangles: degree-oriented wedge join counts exactly") {
    // K4 minus edge (1,4): edges (1,2)(1,3)(2,3)(2,4)(3,4)
    // -> triangles {1,2,3} and {2,3,4}; degs 2,3,3,2 -> wedges 1+3+3+1 = 8
    // -> clustering 3*2/8 = 0.75
    val li = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 3L), (12L, 2L), (12L, 3L),
      (13L, 2L), (13L, 4L), (14L, 3L), (14L, 4L),
      (15L, 2L), (15L, 3L) // duplicate co-order of an existing edge: no new edge
    ).toDF("l_orderkey", "l_suppkey")
    val got = graft.queries.AnalyticsQueries.supplierTrianglesOf(li, minSupport = 1)
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(got.toSeq == Seq((4L, 5L, 2L, Some(0.75))))
    // min-support prunes: only (2,3) co-orders twice -> no triangle, 1 edge
    val thr = graft.queries.AnalyticsQueries.supplierTrianglesOf(li, minSupport = 2)
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(thr.toSeq == Seq((2L, 1L, 0L, None)))
  }

  test("supplier_triangles: triangle-free star graph gives zero clustering") {
    // star center 1 with leaves 2,3,4 (each edge from its own order)
    val li = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 3L), (12L, 1L), (12L, 4L))
      .toDF("l_orderkey", "l_suppkey")
    val got = graft.queries.AnalyticsQueries.supplierTrianglesOf(li, minSupport = 1)
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(got.toSeq == Seq((4L, 3L, 0L, Some(0.0))))
  }

  test("split_temporal: cutoff at the exact p80 day; embargo excluded from both sides") {
    def d(s: String) = java.sql.Date.valueOf(s)
    // 10 orders over days jan01..jan10 (1/day): p80 cutoff = jan08
    // embargo (jan09..feb07], test = none after feb07 except the one planted in march
    val rows = (1 to 10).map(i => (f"2024-01-$i%02d", 100L + i, 10.0)) :+
      (("2024-03-15", 200L, 50.0))
    val ord = rows.map { case (day, c, v) =>
      (java.sql.Timestamp.valueOf(s"$day 00:00:00"), c, v)
    }.toDF("o_orderdate", "o_custkey", "o_totalprice")
    val got = graft.queries.PipelineQueries.splitTemporalOf(ord)
      .select("split", "n_orders", "n_customers", "min_day", "max_day")
      .as[(String, Long, Long, java.sql.Date, java.sql.Date)].collect()
      .map(r => r._1 -> r).toMap
    // 11 orders total: cum*5 >= tot*4 -> first day with cum >= 8.8 -> jan09
    val (_, nT, _, minT, maxT) = got("train")
    assert(nT == 9 && minT == d("2024-01-01") && maxT == d("2024-01-09"))
    val (_, nE, _, minE, maxE) = got("embargo")
    assert(nE == 1 && minE == d("2024-01-10") && maxE == d("2024-01-10"))
    val (_, nX, _, minX, _) = got("test")
    assert(nX == 1 && minX == d("2024-03-15"))
  }

  test("orders_abc: crossing part completes its class; shares are exact") {
    // parts with revenue 50, 30, 15, 5 (total 100):
    //   p1 (50): cum_before 0  < 80  -> A
    //   p2 (30): cum_before 50 < 80  -> A (completes the 80% band)
    //   p3 (15): cum_before 80 < 95  -> B (completes the 95% band)
    //   p4 (5):  cum_before 95       -> C
    val li = Seq((1L, 50.0), (2L, 30.0), (3L, 15.0), (4L, 5.0))
      .toDF("l_partkey", "l_extendedprice")
    val got = graft.queries.AnalyticsQueries.ordersAbcOf(li)
      .select("cls", "n_parts", "rev_share", "part_share")
      .as[(String, Long, Double, Double)].collect()
    assert(got.toSeq == Seq(
      ("A", 2L, 0.8, 0.5), ("B", 1L, 0.15, 0.25), ("C", 1L, 0.05, 0.25)))
  }

  test("geo_hotspots: a flooded cell carries the density z-score") {
    // 3 occupied cells: counts 8, 1, 1 -> mean 10/3, z of the 8-cell =
    // (3*8-10)/sqrt(3*66-100) = 14/sqrt(98)
    val pts = Seq.fill(8)((-30.0, -120.0)) ++ Seq((0.0, 0.0), (55.0, 110.0))
    val meta = pts.toDF("latitude", "longitude")
    val got = graft.queries.VectorQueries.geoHotspotsOf(meta)
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(got.length == 3)
    assert(got.head._3 == 8L)
    val want = math.floor(14.0 / math.sqrt(98.0) * 1e6 + 0.5) / 1e6
    assert(got.head._4.contains(want))
    // grid origin of (-30,-120) is the cell itself
    assert(got.head._1 == -30L && got.head._2 == -120L)
  }

  test("events_survival: KM product-limit with censoring replays by hand") {
    def at(d: String) = java.sql.Timestamp.valueOf(s"$d 12:00:00")
    // obs_end = mar31. users:
    //  u1: jan01..jan01 -> t=0, death
    //  u2: jan01..jan03 -> t=2, death
    //  u3: jan01..jan05 -> t=4, death
    //  u4: mar01..mar30 -> t=29, ld > mar24 -> CENSORED
    //  u5: mar31 only -> t=0, censored (final-week activity)
    // at-risk: t0: 5, d=1 c=1 -> S=4/5; t2: 3, d=1 -> S=0.8*2/3
    // t4: 2, d=1 -> S=*1/2; t29: 1, d=0 c=1 -> S unchanged
    val ev = Seq(
      (at("2024-01-01"), 1L), (at("2024-01-01"), 2L), (at("2024-01-03"), 2L),
      (at("2024-01-01"), 3L), (at("2024-01-05"), 3L),
      (at("2024-03-01"), 4L), (at("2024-03-30"), 4L), (at("2024-03-31"), 5L)
    ).toDF("ts", "user_id")
    // u5 single event on obs_end: t=0 but censored (ld in final week)
    val got = graft.queries.EventQueries.eventsSurvivalOf(ev)
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 5L, 1L, 1L, 0.8)))
    assert(got(2L) == ((2L, 3L, 1L, 0L, 0.533333)))
    assert(got(4L) == ((4L, 2L, 1L, 0L, 0.266667)))
    assert(got(29L) == ((29L, 1L, 0L, 1L, 0.266667)))
  }

  test("supplier_lead_trend: a planted linear lag trend recovers its slope") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s"$s 00:00:00")
    // supplier 1: lag rises 2 days/month over jan..apr (x=m, y=2m+1)
    // supplier 2: constant lag (slope 0); supplier 3: one month -> excluded
    val months = Seq("2024-01-15", "2024-02-15", "2024-03-15", "2024-04-15")
    val rows =
      months.zipWithIndex.map { case (m, i) =>
        (10L + i, 1L, ts(m),
          ts(java.time.LocalDate.parse(m).plusDays(2 * i + 1).toString)) } ++
      months.zipWithIndex.map { case (m, i) =>
        (20L + i, 2L, ts(m),
          ts(java.time.LocalDate.parse(m).plusDays(5).toString)) } :+
      ((30L, 3L, ts("2024-01-15"), ts("2024-01-20")))
    val ord = rows.map(r => (r._1, r._3)).toDF("o_orderkey", "o_orderdate")
    val li = rows.map(r => (r._1, r._2, r._4))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val got = graft.queries.AnalyticsQueries.supplierLeadTrendOf(li, ord)
      .as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 4L, 2.0), (2L, 4L, 0.0)))
  }

  test("pipeline_monitor: the composed morning report on planted scenarios") {
    def at(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    def r6(x: Double) = graft.search.VecMath.round6(x)
    // a: level shift 2/day -> 10/day at day 5 (the changepoint case);
    //    med 6, MAD 4, latest 10 -> rz 0.6745, NOT an anomaly
    // b: steady 2/3 alternation then a 50 spike on the last day;
    //    med 2.5, MAD 0.5 -> rz blows past 2, anomaly fires
    // c: dies after day 3 (absent on the global latest day -> latest_n 0),
    //    MAD 0 -> no rz by convention; no day-7 overlap -> no mae/wape;
    //    flat counts -> cusum 0 everywhere, earliest-day tie-break
    val a = (1 to 4).flatMap(d => Seq.fill(2)(at(d))) ++
      (5 to 8).flatMap(d => Seq.fill(10)(at(d)))
    val bCounts = Seq(2, 3, 2, 3, 2, 3, 2, 50)
    val b = (1 to 8).flatMap(d => Seq.fill(bCounts(d - 1))(at(d)))
    val c = (1 to 3).flatMap(d => Seq.fill(5)(at(d)))
    val ev = (a.map((_, "a")) ++ b.map((_, "b")) ++ c.map((_, "c")))
      .toDF("ts", "event_type")
    val got = graft.queries.EventQueries.pipelineMonitorOf(ev)
      .as[(String, Long, Long, Long, Option[Double], Int, java.sql.Date,
           Double, Option[Double], Option[Double])].collect()
    val day = (d: Int) => java.sql.Date.valueOf(f"2024-01-$d%02d")
    assert(got.toSeq == Seq(
      ("a", 8L, 48L, 10L, Some(r6(0.6745 * (10.0 - 6.0) / 4.0)), 0,
        day(4), 16.0, Some(8.0), Some(4.0)),
      ("b", 8L, 67L, 50L, Some(r6(0.6745 * (50.0 - 2.5) / 0.5)), 1,
        day(7), 41.625, Some(48.0), Some(24.0)),
      ("c", 3L, 15L, 0L, None, 0, day(1), 0.0, None, None)),
      s"got:\n${got.mkString("\n")}")
  }

  test("events_srm: chi-square on planted balanced and broken splits") {
    def at = java.sql.Timestamp.valueOf("2024-02-10 12:00:00")
    // balanced: users 0..9 (5 even, 5 odd) -> chi2 0, no flag
    val ok = (0 until 10).map(u => (at, u.toLong)).toDF("ts", "user_id")
    val g1 = graft.queries.EventQueries.eventsSrmOf(ok)
      .as[(Long, Long, Double, Int)].collect().head
    assert(g1 == ((5L, 5L, 0.0, 0)))
    // broken: 40 even vs 10 odd -> chi2 = 30^2/50 = 18 > 10.83 -> flag
    val bad = ((0 until 80 by 2) ++ (1 until 20 by 2))
      .map(u => (at, u.toLong)).toDF("ts", "user_id")
    val g2 = graft.queries.EventQueries.eventsSrmOf(bad)
      .as[(Long, Long, Double, Int)].collect().head
    assert(g2 == ((40L, 10L, 18.0, 1)))
    // duplicate events don't double-enroll a user
    val dup = ok.unionAll(ok)
    assert(graft.queries.EventQueries.eventsSrmOf(dup)
      .as[(Long, Long, Double, Int)].collect().head == ((5L, 5L, 0.0, 0)))
  }

  test("events_cuped: layered arithmetic replays; adjustment sharpens the planted z") {
    def r6(x: Double) = graft.search.VecMath.round6(x)
    // users 0..5 (variant u%2): pre-count x=u+1, post-count y=2(u+1)+3·(u%2)
    // — strong x↔y correlation plus a constant treatment lift, the setting
    // CUPED exists for
    val pre = java.sql.Timestamp.valueOf("2024-01-10 12:00:00")
    val post = java.sql.Timestamp.valueOf("2024-02-10 12:00:00")
    val horizon = java.sql.Timestamp.valueOf("2024-02-25 12:00:00")
    val ev = (0 until 6).flatMap { u =>
      val y = 2 * (u + 1) + 3 * (u % 2)
      Seq.fill(u + 1)((pre, u.toLong)) ++
        (if (u == 0) Seq((post, 0L), (horizon, 0L)) // y_0 = 2, one pins the horizon
         else Seq.fill(y)((post, u.toLong)))
    }.toDF("ts", "user_id")
    val got = graft.queries.EventQueries.eventsCupedOf(ev)
      .as[(Long, Long, Double, Double, Option[Double], Option[Double],
           Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().head

    // local replay of the exact layer arithmetic from the hand moments
    val (n, sx, sy, sxx, syy, sxy) = (6.0, 21.0, 51.0, 91.0, 535.0, 218.0)
    val (n0, n1, sx0, sx1, sy0, sy1) = (3.0, 3.0, 9.0, 12.0, 18.0, 33.0)
    val cn = n * sxy - sx * sy; val cd = n * sxx - sx * sx; val vy = n * syy - sy * sy
    val xbar = sx / n; val xbar0 = sx0 / n0; val xbar1 = sx1 / n1
    val ybar0 = sy0 / n0; val ybar1 = sy1 / n1
    val thetar = r6(cn / cd)
    val want = (3L, 3L, r6(ybar0), r6(ybar1), Some(thetar),
      Some(r6(ybar0 - thetar * (xbar0 - xbar))),
      Some(r6(ybar1 - thetar * (xbar1 - xbar))),
      Some(r6(cn * cn / (cd * vy))),
      Some(r6((ybar1 - ybar0) / math.sqrt((vy / (n * n)) * (1.0 / n0 + 1.0 / n1)))),
      Some(r6(((ybar1 - thetar * (xbar1 - xbar)) - (ybar0 - thetar * (xbar0 - xbar))) /
        math.sqrt((vy / (n * n)) * (1.0 - cn * cn / (cd * vy)) * (1.0 / n0 + 1.0 / n1)))))
    assert(got == want, s"got $got\nwant $want")
    // the point of CUPED: most variance explained, sharper adjusted z
    assert(got._8.get > 0.8, s"var_reduction ${got._8}")
    assert(got._10.get > got._9.get, s"z_adj ${got._10} !> z_raw ${got._9}")
  }

  test("events_root_cause: explanatory power and surprise on a planted shift") {
    def r6(x: Double) = graft.search.VecMath.round6(x)
    // 56 days (2024-01-01..2024-02-25), all events at hour 12:
    // click: 10/day both periods (k=10); error: 1/day base, 5/day cur
    // (k=90) — error IS the root cause of the +112 move
    val days = (0 until 56).map(i => java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    val ev = days.zipWithIndex.flatMap { case (d, i) =>
      val ts = java.sql.Timestamp.valueOf(s"$d 12:00:00")
      Seq.fill(10)((ts, "click", """{"k": 10}""")) ++
        Seq.fill(if (i < 28) 1 else 5)((ts, "error", """{"k": 90}"""))
    }.toDF("ts", "event_type", "props")
    val got = graft.queries.EventQueries.eventsRootCauseOf(ev)
      .as[(String, String, Long, Long, Long, Option[Double], Double)].collect().toSeq
    assert(got.length == 2 + 7 + 1 + 2, got.map(r => (r._1, r._2)).mkString(","))

    def js(p: Double, q: Double): Double = {
      def t(x: Double, y: Double) = if (x > 0) x * math.log(2.0 * x / (x + y)) else 0.0
      r6(0.5 * (t(p, q) + t(q, p)))
    }
    val byKey = got.map(r => (r._1, r._2) -> r).toMap
    // the shifted type carries ALL the explanatory power; the flat one none
    assert(byKey(("event_type", "error")) ==
      (("event_type", "error", 28L, 140L, 112L, Some(1.0), js(28.0 / 308, 140.0 / 420))))
    assert(byKey(("event_type", "click")) ==
      (("event_type", "click", 280L, 280L, 0L, Some(0.0), js(280.0 / 308, 280.0 / 420))))
    // the k buckets mirror their types exactly (same partition of rows)
    assert(byKey(("k_bucket", "3"))._5 == 112L && byKey(("k_bucket", "3"))._6 == Some(1.0))
    // dow is a NON-explanation: every day of week moved alike — ep splits
    // 7 ways and surprise is exactly 0 (identical shares both periods)
    val dows = got.filter(_._1 == "dow")
    assert(dows.length == 7)
    dows.foreach { r =>
      assert(r._5 == 16L && r._6 == Some(r6(16.0 / 112)) && r._7 == 0.0, r.toString)
    }
    // the single hour band holds everything: ep 1, surprise 0
    assert(byKey(("hour_band", "2")) ==
      (("hour_band", "2", 308L, 420L, 112L, Some(1.0), 0.0)))
    // surprise ranks the true cause above the size-only rows
    assert(byKey(("event_type", "error"))._7 > byKey(("event_type", "click"))._7)
    // per dimension, deltas conserve the total move
    got.groupBy(_._1).foreach { case (dim, rs) =>
      assert(rs.map(_._5).sum == 112L, s"$dim delta sum")
    }
  }

  test("events_backtest: calendar lag-7 forecast, silent weeks not shifted") {
    def at(d: String) = java.sql.Timestamp.valueOf(s"$d 12:00:00")
    // type a: jan01:2, jan08:4, jan15:3. forecasts: jan08<-2 (|4-2|=2),
    //   jan15<-4 (|3-4|=1). sad=3, sf=6 -> mae 1.5, wape 0.5
    // type b: jan01:1, jan09:9 (no day exactly 7 before) -> no scored days
    val ev = (Seq.fill(2)(at("2024-01-01")) ++ Seq.fill(4)(at("2024-01-08")) ++
      Seq.fill(3)(at("2024-01-15"))).map(t => (t, "a")) ++
      (Seq(at("2024-01-01")) ++ Seq.fill(9)(at("2024-01-09"))).map(t => (t, "b"))
    val got = graft.queries.EventQueries.eventsBacktestOf(
        ev.toDF("ts", "event_type"))
      .as[(String, Long, Double, Double)].collect()
    assert(got.toSeq == Seq(("a", 2L, 1.5, 0.5)))
  }

  test("part_rank_shift: movers get prior ranks, entrants get NULL") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s"$s 00:00:00")
    // 1997: p1=100, p2=50; 1998: p2=90, p3=80, p1=10
    val li = Seq(
      (1L, 100.0, "1997-06-01"), (2L, 50.0, "1997-06-01"),
      (2L, 90.0, "1998-06-01"), (3L, 80.0, "1998-06-01"), (1L, 10.0, "1998-06-01")
    ).map { case (p, v, d) => (p, v, ts(d)) }
      .toDF("l_partkey", "l_extendedprice", "l_shipdate")
    val got = graft.queries.AnalyticsQueries.partRankShiftOf(li)
      .select("l_partkey", "rk", "prev_rk", "rank_gain")
      .as[(Long, Long, Option[Long], Option[Long])].collect()
    assert(got.toSeq == Seq(
      (2L, 1L, Some(2L), Some(1L)),   // rose 2 -> 1
      (3L, 2L, None, None),           // new entrant
      (1L, 3L, Some(1L), Some(-2L)))) // fell 1 -> 3
  }

  test("vec_centroid_drift: orthogonal cohorts give cosine 0, exact top gap") {
    // cohort 0 (even ids): two copies of (1, 0); cohort 1: one (0, 1)
    // A=(2e7,0), B=(0,1e7): cos=0; gaps |2e7*1-0|=2e7 both dims -> tie
    // breaks to dim 0; mean gap 2e7/(2*1*1e7)=1.0
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = graft.queries.VectorQueries.vecCentroidDriftOf(emb)
      .as[(Long, Long, Option[Double], Long, Option[Double])].collect()
    assert(got.toSeq == Seq((2L, 1L, Some(0.0), 0L, Some(1.0))))
  }

  test("events_seasonal_strength: pure weekly rhythm scores 1, flat scores 0") {
    def at(d: String) = java.sql.Timestamp.valueOf(s"$d 12:00:00")
    // type a: two full weeks where the count is a pure function of dow
    // (dow index 1..7 events) -> SSW = 0 -> strength 1
    // type b: constant 3/day over 14 days -> SST = 0 -> NULL
    val days = (1 to 14).map(i => f"2024-01-$i%02d")
    val ev = days.zipWithIndex.flatMap { case (d, i) =>
      Seq.fill(i % 7 + 1)((at(d), "a")) ++ Seq.fill(3)((at(d), "b"))
    }
    val got = graft.queries.EventQueries.eventsSeasonalStrengthOf(
        ev.toDF("ts", "event_type"))
      .as[(String, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 14L, Some(1.0))))
    assert(got("b") == (("b", 14L, None)))
  }

  test("brand_bridge: effects conserve the revenue delta by construction") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s"$s 00:00:00")
    // brand X: 1997 qty 10 rev 100 (p0=10); 1998 qty 12 rev 150
    //   volume = (12-10)*10 = 20; price = 150 - 12*10 = 30; sum = 50 = Δrev
    val part = Seq((1L, "X")).toDF("p_partkey", "p_brand")
    val li = Seq(
      (1L, 10.0, 100.0, ts("1997-06-01")), (1L, 12.0, 150.0, ts("1998-06-01"))
    ).toDF("l_partkey", "l_quantity", "l_extendedprice", "l_shipdate")
    val got = graft.queries.AnalyticsQueries.brandBridgeOf(li, part)
      .select("p_brand", "volume_effect", "price_effect")
      .as[(String, Double, Double)].collect()
    assert(got.toSeq == Seq(("X", 20.0, 30.0)))
  }

  test("customer_migration: margins catch entrants and churners, matrix conserves") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s"$s 00:00:00")
    // 10 orders jan01..jan10 (p50 cutoff jan05). prior half: customers
    // 1..5 (one order each); latest half: customers 1..4 and 9 (new).
    // 5 customers per half -> quintiles are the spend ranks themselves.
    val rows =
      (1 to 5).map(i => (ts(f"2024-01-0$i%01d"), i.toLong, i * 100.0)) ++
      (1 to 4).map(i => (ts(f"2024-01-0${5 + i}%01d"), i.toLong, i * 100.0)) :+
      ((ts("2024-01-10"), 9L, 50.0))
    val ord = rows.toDF("o_orderdate", "o_custkey", "o_totalprice")
    val got = graft.queries.AnalyticsQueries.customerMigrationOf(ord)
      .as[(String, String, Long)].collect().toSeq
    // n=5 per half so quintile == spend rank. prior: c5→1 … c1→5;
    // latest: c4→1, c3→2, c2→3, c1→4, c9→5. c5 churned, c9 new.
    assert(got == Seq(
      ("1", "churned", 1L), ("2", "1", 1L), ("3", "2", 1L),
      ("4", "3", 1L), ("5", "4", 1L), ("new", "5", 1L)))
  }

  test("supplier_scorecard: the fused pass reproduces otd share and lead slope") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s"$s 00:00:00")
    // supplier 1 replays the lead-trend fixture: lag 1,3,5,7 over four
    // months (slope 2, avg 4), all within 90 days (ontime share 1)
    val months = Seq("2024-01-15", "2024-02-15", "2024-03-15", "2024-04-15")
    val rows = months.zipWithIndex.map { case (m, i) =>
      (10L + i, 1L, 100.0, ts(m),
        ts(java.time.LocalDate.parse(m).plusDays(2 * i + 1).toString))
    }
    val ord = rows.map(r => (r._1, r._4)).toDF("o_orderkey", "o_orderdate")
    val li = rows.map(r => (r._1, r._2, r._3, r._5))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_shipdate")
    val got = graft.queries.AnalyticsQueries.supplierScorecardOf(li, ord)
      .as[(Long, Double, Long, Double, Double, Option[Double])]
      .collect()
    val (sk, rev, n, otd, lead, slope) = got.head
    assert(sk == 1L && rev == 400.0 && n == 4L)
    assert(otd == 1.0 && lead == 4.0 && slope.contains(2.0))
  }

  test("nation_trade_balance: absent sides zero-fill and the net is exact") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s"$s 00:00:00")
    val nation = Seq((0L, "peru"), (1L, "chad")).toDF("n_nationkey", "n_name")
    val sup = Seq((7L, 0L)).toDF("s_suppkey", "s_nationkey")     // peru supplies
    val cust = Seq((3L, 1L)).toDF("c_custkey", "c_nationkey")    // chad buys
    val ord = Seq((10L, 3L)).toDF("o_orderkey", "o_custkey")
    val li = Seq((10L, 7L, 120.5, ts("1998-01-01")))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_shipdate")
    val got = graft.queries.AnalyticsQueries
      .nationTradeBalanceOf(li, ord, sup, cust, nation)
      .select(col("n_name"), col("exports").cast("double"),
        col("imports").cast("double"), col("net").cast("double"))
      .as[(String, Double, Double, Double)].collect()
    assert(got.toSeq == Seq(
      ("chad", 0.0, 120.5, -120.5), ("peru", 120.5, 0.0, 120.5)))
  }

  test("split_runs_test: runs count and z replay the md5 rule locally") {
    val n = 500
    val docs = (0 until n).map(i => (i.toLong, s"doc $i"))
      .toDF("doc_id", "text")
    val got = graft.queries.PipelineQueries.splitRunsTestOf(docs)
      .as[(Long, Long, Long, Option[Double])].collect().head
    // local replay of the tagging rule + runs statistic
    def tag(i: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      if (hex.substring(0, 2) < "f3") 1L else 0L
    }
    val tags = (0 until n).map(i => tag(i.toLong))
    val n1 = tags.count(_ == 1L).toLong
    val n0 = n - n1
    val runs = 1L + tags.sliding(2).count(p => p(0) != p(1))
    assert(got._1 == n0 && got._2 == n1 && got._3 == runs)
    val a = n0.toDouble * n1
    val z = (runs.toDouble - (1.0 + 2.0 * a / n)) /
      math.sqrt(2.0 * a * (2.0 * a - n) / (n.toDouble * n * (n - 1.0)))
    assert(got._4.contains(math.floor(z * 1e6 + 0.5) / 1e6))
  }

  test("dedup_cross_source: universes and ppm rates replay by hand") {
    // sources: web {1,2,3}, books {10,11}. pairs: (1,2) web-web,
    // (2,10) web-books, (3,11) web-books
    val pairs = Seq((1L, 2L), (2L, 10L), (3L, 11L)).toDF("doc_a", "doc_b")
    val src = Seq((1L, "web"), (2L, "web"), (3L, "web"),
      (10L, "books"), (11L, "books")).toDF("doc_id", "source")
    val got = graft.queries.DedupQueries.dedupCrossSourceOf(pairs, src)
      .as[(String, String, Long, Long, Double)].collect()
    // web-web universe C(3,2)=3; books-web universe 2*3=6
    assert(got.toSeq == Seq(
      ("books", "web", 2L, 6L, 333333.333333),
      ("web", "web", 1L, 3L, 333333.333333)))
  }

  test("vec_centroid_drift: identical cohorts give cosine 1 and zero gap") {
    val emb = Seq(
      (0L, Array(0.6f, 0.8f)), (1L, Array(0.6f, 0.8f))
    ).toDF("vec_id", "embedding")
    val got = graft.queries.VectorQueries.vecCentroidDriftOf(emb)
      .as[(Long, Long, Option[Double], Long, Option[Double])].collect()
    assert(got.toSeq == Seq((1L, 1L, Some(1.0), 0L, Some(0.0))))
  }
}
