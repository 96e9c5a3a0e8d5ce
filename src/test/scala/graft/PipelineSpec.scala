package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline compositions (SURVEY.md §2 #49–50). The DuckDB
  * oracle gate value-checks them; these assert the structural invariants.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("split_train_val: deterministic, total, ~95/5, stable across runs") {
    val a = PipelineQueries.splitTrainVal(spark, sf).as[(Long, String)].collect()
    val b = PipelineQueries.splitTrainVal(spark, sf).as[(Long, String)].collect()
    assert(a.toSeq == b.toSeq) // same assignment every run, no seed drift
    val n = Tables.documents(spark, sf).count()
    assert(a.length == n) // total: every doc gets exactly one bucket
    val trainFrac = a.count(_._2 == "train").toDouble / n
    assert(trainFrac > 0.85 && trainFrac < 1.0, s"train fraction $trainFrac")
    assert(a.exists(_._2 == "val"), "validation bucket empty")
  }

  test("sample_stratified: deterministic, per-language fractions track the mixture weights") {
    val a = PipelineQueries.sampleStratified(spark, sf).as[(Long, String)].collect()
    val b = PipelineQueries.sampleStratified(spark, sf).as[(Long, String)].collect()
    assert(a.toSeq == b.toSeq) // engine-portable md5 rule: no seed drift
    val totals = Tables.documents(spark, sf).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val kept = a.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    PipelineQueries.MixtureWeights.foreach { case (lang, w) =>
      val frac = kept.getOrElse(lang, 0L).toDouble / totals(lang)
      // md5 buckets are uniform; a 500-doc corpus gives ±~0.2 tolerance
      assert(math.abs(frac - w.min(1.0)) < 0.22, s"$lang: kept $frac want $w")
    }
    // language not in the mixture → dropped entirely
    assert(a.forall(r => PipelineQueries.MixtureWeights.exists(_._1 == r._2)))
  }

  test("decontaminate: flagged docs genuinely share an 8-gram with the benchmark") {
    val docs = Tables.documents(spark, sf)
    val texts = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toMap
    def shingles(t: String): Set[String] = {
      val s = t.toLowerCase.split(" ")
      if (s.length < PipelineQueries.DecontamN) Set.empty
      else s.sliding(PipelineQueries.DecontamN).map(_.mkString(" ")).toSet
    }
    val benchSh = texts.filter(_._1 < PipelineQueries.BenchDocs).values
      .flatMap(shingles).toSet
    val got = PipelineQueries.decontaminate(spark, sf).as[(Long, Long)].collect()
    got.foreach { case (id, n) =>
      assert(id >= PipelineQueries.BenchDocs)
      val overlap = shingles(texts(id)).intersect(benchSh).size
      assert(n == overlap && n >= 1, s"doc $id: reported $n, local $overlap")
    }
    // and no contaminated doc is missed
    val want = texts.filter { case (id, t) =>
      id >= PipelineQueries.BenchDocs && shingles(t).intersect(benchSh).nonEmpty
    }.keySet
    assert(got.map(_._1).toSet == want)
    // synthetic corpus embeds copied sequences: the check must be non-vacuous
    assert(got.nonEmpty, "no contamination found — operator vacuous on sf data")
  }

  test("decontaminate_bloom: identical rows to exact decontaminate; bloom genuinely prunes") {
    val exact = PipelineQueries.decontaminate(spark, sf).as[(Long, Long)].collect().toSeq
    val bloom = PipelineQueries.decontaminateBloom(spark, sf).as[(Long, Long)].collect().toSeq
    assert(bloom == exact, "bloom-pruned plan must be result-identical (fp eaten by the exact join)")
    assert(exact.nonEmpty)
    // the sketch probe is a real prune, not a pass-through: most corpus
    // shingles are NOT in the benchmark set, so the filter must reject a
    // substantial majority (fpp 1% keeps rejects >> passes on this data)
    val docs = Tables.documents(spark, sf)
    def sh(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), split(lower(col("text")), " ").as("s"))
      .where(size(col("s")) >= PipelineQueries.DecontamN)
      .select(explode(expr(
        s"transform(sequence(1, size(s) - ${PipelineQueries.DecontamN - 1}), " +
          s"i -> xxhash64(concat_ws(' ', slice(s, i, ${PipelineQueries.DecontamN}))))")).as("sh"))
    val corpusSh = sh(docs.where(col("doc_id") >= PipelineQueries.BenchDocs))
    val benchShSet = sh(docs.where(col("doc_id") < PipelineQueries.BenchDocs))
      .distinct().as[Long].collect().toSet
    val total = corpusSh.count()
    val bf = sh(docs.where(col("doc_id") < PipelineQueries.BenchDocs)).distinct()
      .stat.bloomFilter("sh", math.max(benchShSet.size, 1).toLong, 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val passed = corpusSh.where(graft.functions.VectorFunctions
      .bloomMightContainLong(col("sh"), bos.toByteArray)).count()
    assert(passed < total / 2, s"bloom passed $passed of $total corpus shingles — not pruning")
    // no false negatives by construction: every truly-shared shingle passes
    val matching = corpusSh.as[Long].collect().count(benchShSet.contains)
    assert(passed >= matching, "bloom dropped a true member — impossible for a correct sketch")
  }

  test("bloom_might_contain_long: exact-false / probabilistic-true contract on raw ids") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    (0L until 1000L).foreach(i => bf.putLong(i * 7919L))
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val ids = spark.range(0, 5000).select((col("id") * 7919L).as("v"))
    val hits = ids.where(graft.functions.VectorFunctions
      .bloomMightContainLong(col("v"), bos.toByteArray)).as[Long].collect()
    // every inserted id passes (no false negatives)…
    assert((0L until 1000L).map(_ * 7919L).forall(hits.contains))
    // …and the 4000 absent ids mostly fail (fpp 1% → expect ~40, allow 10×)
    assert(hits.length <= 1000 + 400, s"${hits.length - 1000} false positives of 4000 absent")
  }

  test("sample_upweight: copies match floor(w) + md5-fraction rule exactly") {
    val rows = PipelineQueries.sampleUpweight(spark, sf)
      .as[(Long, String, Int)].collect()
    assert(rows.nonEmpty)
    def md5hex4(id: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .take(2).map("%02x".format(_)).mkString
    val w = PipelineQueries.UpweightFactors.toMap
    val langs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect().toMap
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet == langs.keySet, "every doc appears (weights are all >= 1)")
    byDoc.foreach { case (id, cs) =>
      val wt = w.getOrElse(langs(id), 1.0)
      val frac = wt - wt.toInt
      val thr = if (frac == 0.0) "0000" else f"${(frac * 65536).toInt}%04x"
      val want = wt.toInt + (if (md5hex4(id) < thr) 1 else 0)
      assert(cs.length == want, s"doc $id lang ${langs(id)}: ${cs.length} != $want")
      assert(cs.map(_._3).sorted.toSeq == (1 to want), s"doc $id copy ids not 1..$want")
    }
    // aggregate sanity: per-language copy rate tracks the weight within
    // the md5 bucketing's resolution
    PipelineQueries.UpweightFactors.foreach { case (lg, wt) =>
      val ids = langs.collect { case (id, l) if l == lg => id }
      if (ids.nonEmpty) {
        val rate = ids.map(byDoc(_).length).sum.toDouble / ids.size
        assert(math.abs(rate - wt) < 0.25, s"$lg copy rate $rate vs weight $wt")
      }
    }
  }

  test("corpus_shuffle: a true deterministic permutation with sane shards") {
    val a = PipelineQueries.corpusShuffle(spark, sf)
      .as[(Long, String, Int)].collect()
    val n = Tables.documents(spark, sf).count()
    // permutation: every doc exactly once
    assert(a.length == n && a.map(_._1).distinct.length == n)
    // the output order IS the key order (the sort survived to the result)
    val keys = a.map(r => (r._2, r._1)).toSeq
    assert(keys == keys.sorted, "rows not in shuffle_key order")
    // shard = first key nibble, always in [0, 16)
    a.foreach { case (_, k, s) =>
      assert(s == "0123456789abcdef".indexOf(k.head) && s >= 0 && s < 16)
    }
    // deterministic: a rerun reproduces the identical order
    val b = PipelineQueries.corpusShuffle(spark, sf).as[(Long, String, Int)].collect()
    assert(a.toSeq == b.toSeq)
    // and it actually shuffles: the id order and the key order disagree
    assert(a.map(_._1).toSeq != a.map(_._1).sorted.toSeq)
  }

  test("sample_temperature: alpha=0.5 factors flatten the mixture; copies realize f exactly") {
    val docs = Tables.documents(spark, sf)
    val langCounts = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val n = langCounts.values.sum.toDouble
    val z = langCounts.values.map(c => math.sqrt(c.toDouble)).sum
    def f(lang: String): Double =
      graft.search.VecMath.round6(
        n * math.sqrt(langCounts(lang).toDouble) / z / langCounts(lang))
    // temperature flattening: the head language down-weights, the tail
    // languages up-weight
    val (head, _) = langCounts.maxBy(_._2)
    val (tail, _) = langCounts.minBy(_._2)
    assert(f(head) < 1.0 && f(tail) > 1.0)
    val out = PipelineQueries.sampleTemperature(spark, sf)
      .as[(Long, String, Int)].collect()
    // per-doc copies is floor(f) or floor(f)+1, copy_ids contiguous from 0
    val byDoc = out.groupBy(_._1)
    byDoc.foreach { case (_, rows) =>
      val lang = rows.head._2
      val fl = f(lang)
      assert(rows.length == fl.floor.toInt || rows.length == fl.floor.toInt + 1)
      assert(rows.map(_._3).sorted.toSeq == (0 until rows.length))
    }
    // total realized size: locally recompute the exact md5 rule
    val md = java.security.MessageDigest.getInstance("MD5")
    def h4(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8"))
        .take(2).map(b => f"${b & 0xff}%02x").mkString
    val docLangs = docs.select("doc_id", "lang").as[(Long, String)].collect()
    val wantTotal = docLangs.map { case (id, lang) =>
      val fl = f(lang)
      val thr = f"${((fl - fl.floor) * 65536).floor.toInt}%04x"
      fl.floor.toInt + (if (h4(id) < thr) 1 else 0)
    }.sum
    assert(out.length == wantTotal)
    // deterministic
    assert(PipelineQueries.sampleTemperature(spark, sf)
      .as[(Long, String, Int)].collect().toSeq == out.toSeq)
  }

  test("corpus_curate: kept docs pass every gate; dropped dup members absent") {
    val docs = Tables.documents(spark, sf)
    val kept = PipelineQueries.corpusCurate(spark, sf)
      .as[(Long, Double, String)].collect()
    assert(kept.nonEmpty)
    kept.foreach { case (_, q, l) => assert(q >= 0.6 && l == "en") }
    // no kept doc is a non-representative member of a dup cluster
    val dropped = graft.dedup.Dedup.clusters(
        graft.dedup.Dedup.jaccardPairs(docs, queries.DedupQueries.JaccardTau))
      .where(col("cluster_id") =!= col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept.forall(k => !dropped(k._1)))
    // and it's a strict filter: fewer rows than the corpus
    assert(kept.length < docs.count())
  }

  test("pipeline_e2e: manifest conserves the curated corpus; packing arithmetic holds per cell") {
    val rows = PipelineQueries.pipelineE2e(spark, sf)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    // stage conservation: manifest docs == curated docs (split is total,
    // packing reassigns but never drops)
    val curated = PipelineQueries.corpusCurate(spark, sf).count()
    assert(rows.map(_._3).sum == curated)
    rows.foreach { case (split, source, nDocs, nPacks, nTokens, fill) =>
      assert(Set("train", "val")(split), s"unknown split $split")
      assert(nDocs >= 1 && nPacks >= 1 && nPacks <= nDocs)
      // budget arithmetic: nPacks can't exceed what the token mass plus
      // one-doc-per-pack overflow allows, and fill is the recomputable ratio
      assert(nTokens >= nPacks - 1, s"$split/$source: $nTokens tokens, $nPacks packs")
      assert(math.abs(fill -
        nTokens.toDouble / (nPacks * PipelineQueries.PackBudget)) < 1e-5)
    }
    // deterministic: a rerun reproduces the manifest exactly
    val again = PipelineQueries.pipelineE2e(spark, sf)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("pipeline_ingest: batch conserved; every doc lands on its FIRST failing stage") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString

    val got = PipelineQueries.pipelineIngest(spark, sf)
      .as[(String, Long)].collect().toMap
    // independent replay: derive the per-doc stage with Scala set logic
    // (no joins), then compare the rollup — catches join-type/null bugs
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val mx = docs.map(_._1).max
    val (batch, resident) = docs.partition { case (id, _) => id * 5 >= mx * 4 }
    val residentFp = resident.map(r => md5hex(r._2)).toSet
    val clusterOf = queries.DedupQueries.minedClusters(spark, sf)
      .select(col("doc_id"), col("cluster_id")).as[(Long, Long)].collect().toMap
    val q = graft.text.TextAnalysis.withQuality(Tables.documents(spark, sf))
      .select(col("doc_id"), col("quality_score")).as[(Long, Double)].collect().toMap
    val l = graft.text.TextAnalysis.withLangId(Tables.documents(spark, sf))
      .select(col("doc_id"), col("lang_pred")).as[(Long, String)].collect().toMap
    val want = batch.map { case (id, text) =>
      if (residentFp(md5hex(text))) "dropped_exact"
      else if (clusterOf.get(id).exists(root => root * 5 < mx * 4)) "dropped_neardup"
      else if (q(id) < 0.6) "dropped_quality"
      else if (l(id) != "en") "dropped_lang"
      else if (md5hex(id.toString).substring(0, 2) < "f3") "admitted_train"
      else "admitted_val"
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == want, s"stage rollup: got $got want $want")
    // conservation: every batch doc counted exactly once
    assert(got.values.sum == batch.length)
    // the funnel actually discriminates at sf0.001: something admitted,
    // something dropped
    assert(got.keys.exists(_.startsWith("admitted_")))
    assert(got.keys.exists(_.startsWith("dropped_")))
  }

  test("corpus_release: conserves docs and token mass; stage precedence replayed independently") {
    val got = PipelineQueries.corpusRelease(spark, sf)
      .as[(String, String, Long, Long)].collect()
    val docs = Tables.documents(spark, sf)
      .where(col("doc_id") >= PipelineQueries.BenchDocs)
      .select(col("doc_id"), col("source"), size(split(col("text"), " ")).as("nt"))
      .as[(Long, String, Int)].collect()
    // conservation of docs AND token mass across the funnel
    assert(got.map(_._3).sum == docs.length)
    assert(got.map(_._4).sum == docs.map(_._3.toLong).sum)
    // independent set-logic replay of the first-failing-stage rule
    val dup = queries.DedupQueries.minedClusters(spark, sf)
      .where(col("cluster_id") =!= col("doc_id")).select("doc_id")
      .as[Long].collect().toSet
    val q = graft.text.TextAnalysis.withQuality(Tables.documents(spark, sf))
      .select(col("doc_id"), col("quality_score")).as[(Long, Double)].collect().toMap
    val l = graft.text.TextAnalysis.withLangId(Tables.documents(spark, sf))
      .select(col("doc_id"), col("lang_pred")).as[(Long, String)].collect().toMap
    val cont = PipelineQueries.decontaminate(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val want = docs.map { case (id, src, nt) =>
      val stage =
        if (dup(id)) "dropped_dup"
        else if (q(id) < 0.6) "dropped_quality"
        else if (l(id) != "en") "dropped_lang"
        else if (cont(id)) "dropped_contaminated"
        else "released"
      (src, stage) -> nt.toLong
    }.groupBy(_._1).map { case (k, v) => (k._1, k._2, v.size.toLong, v.map(_._2).sum) }
      .toSeq.sortBy(r => (r._1, r._2))
    assert(got.toSeq == want, s"rollup mismatch:\n got ${got.toSeq}\nwant $want")
    // the audit discriminates at sf0.001
    assert(got.exists(_._2 == "released") && got.exists(_._2.startsWith("dropped_")))
  }

  test("split_cluster: leakage-proof by construction; singletons match the plain md5 rule") {
    val got = PipelineQueries.splitCluster(spark, sf)
      .as[(Long, Long, String)].collect()
    val n = Tables.documents(spark, sf).count()
    assert(got.length == n) // total: every doc assigned exactly once
    val splitOf = got.map(r => r._1 -> r._3).toMap
    // ZERO mined pairs cross the boundary — the whole point
    val pairs = queries.DedupQueries.minedJaccardPairs(spark, sf)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "no mined pairs at sf0.001 — vacuous test")
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b), s"pair ($a,$b) straddles the split")
    }
    // singletons (not in any cluster) root at themselves = the #49 rule
    val clustered = queries.DedupQueries.minedClusters(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val plain = PipelineQueries.splitTrainVal(spark, sf)
      .as[(Long, String)].collect().toMap
    got.filterNot(r => clustered(r._1)).foreach { case (id, root, s) =>
      assert(root == id && s == plain(id))
    }
    // both buckets are populated and the split skews ~95/5
    val trainFrac = got.count(_._3 == "train").toDouble / n
    assert(trainFrac > 0.85 && trainFrac < 1.0, s"train fraction $trainFrac")
  }

  test("sample_cap_source: cap respected; survivors are the per-source longest; caps bind at sf0.01") {
    val cap = PipelineQueries.CapPerSource
    // sf0.01 has 25 docs per source, so the cap actually cuts there
    val big = "/root/testdata/sf0.01"
    val got = PipelineQueries.sampleCapSource(spark, big)
      .as[(Long, String, Long, Int)].collect().toSeq
    val bySource = got.groupBy(_._2)
    assert(bySource.values.forall(_.length <= cap), "cap exceeded")
    assert(bySource.values.exists(_.length == cap), "cap never binds — test data too small")
    // survivors = local top-cap per source by (n_chars desc, doc_id asc)
    val docs = Tables.documents(spark, big)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)].collect().toSeq
    docs.groupBy(_._2).foreach { case (src, rows) =>
      val want = rows.sortBy { case (id, _, nc) => (-nc, id) }.take(cap)
        .map(r => (r._1, r._3)).toSet
      val have = bySource.getOrElse(src, Seq.empty).map(r => (r._1, r._3)).toSet
      assert(have == want, s"source $src survivor set")
    }
    // ranks are contiguous 1..|survivors| within each source
    bySource.values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length).toSeq)
    }
  }

  test("sample_weighted: ES selection matches driver recomputation; weighting biases toward longer docs") {
    val k = PipelineQueries.WeightedPerSource
    val big = "/root/testdata/sf0.01"
    val got = PipelineQueries.sampleWeighted(spark, big)
      .select("doc_id", "source", "n_chars", "es_key", "rk")
      .as[(Long, String, Long, Double, Int)].collect().toSeq
    val bySource = got.groupBy(_._2)
    assert(bySource.values.forall(_.length <= k))
    assert(bySource.values.exists(_.length == k), "k never binds — data too small")
    // exact replay of the ES key on the driver selects the same docs
    val docs = Tables.documents(spark, big)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)].collect().toSeq
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    def esKey(id: Long, nChars: Long): Double = {
      val h = java.lang.Long.parseLong(md5hex(id.toString).take(8), 16).toDouble
      val u = (h + 1.0) / 4294967296.0
      math.rint(1e6 * math.log(u) / (nChars + 1.0) * 1e6) / 1e6
    }
    docs.groupBy(_._2).foreach { case (src, rows) =>
      val want = rows.map { case (id, _, nc) => (id, esKey(id, nc)) }
        .sortBy { case (id, key) => (-key, id) }.take(k).map(_._1).toSet
      val have = bySource.getOrElse(src, Seq.empty).map(_._1).toSet
      assert(have == want, s"source $src ES selection")
    }
    // the weight does its job: selected docs are longer than average
    val corpusMean = docs.map(_._3.toDouble).sum / docs.length
    val selMean = got.map(_._3.toDouble).sum / got.length
    assert(selMean > corpusMean,
      s"selected mean length $selMean not above corpus mean $corpusMean")
  }

  test("corpus_prune_quantile: ~90% kept per language; nothing below its language threshold") {
    val big = "/root/testdata/sf0.01"
    val got = PipelineQueries.corpusPruneQuantile(spark, big)
      .select("doc_id", "lang", "quality_score", "lang_p10")
      .as[(Long, String, Double, Double)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.forall { case (_, _, q, t) => q >= t })
    // per-lang kept fraction sits in the p10-cut band (ties can hold a
    // little more than 90%, never less)
    val totals = Tables.documents(spark, big).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val frac = rows.length.toDouble / totals(lang)
      assert(frac >= 0.88 && frac <= 1.0, s"$lang kept $frac")
    }
    // threshold equals the driver-interpolated p10 of the same scores
    val all = graft.text.TextAnalysis.withQuality(Tables.documents(spark, big))
      .join(Tables.documents(spark, big).select("doc_id", "lang"), "doc_id")
      .select("lang", "quality_score").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val v = all(lang)
      val idx = 0.1 * (v.length - 1)
      val lo = math.floor(idx).toInt
      val want = math.rint((v(lo) + (v(math.ceil(idx).toInt) - v(lo)) * (idx - lo)) * 1e6) / 1e6
      assert(rows.head._4 == want, s"$lang threshold ${rows.head._4} != $want")
    }
  }

  test("corpus_dsir: total, deterministic, and the target slice scores higher") {
    val a = PipelineQueries.corpusDsir(spark, sf)
      .as[(Long, Long, Double)].collect()
    val b = PipelineQueries.corpusDsir(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(a.toSeq == b.toSeq) // md5 buckets + rounded ratios: no drift
    val n = Tables.documents(spark, sf).count()
    assert(a.length == n, "every raw doc must get a score exactly once")
    // n_features = unigrams + adjacent bigrams = 2*tokens - 1 per doc
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(lower(col("text")), " ")).as("nt"))
      .as[(Long, Int)].collect().toMap
    a.foreach { case (id, nf, _) =>
      assert(nf == 2L * toks(id) - 1, s"doc $id: $nf features for ${toks(id)} tokens")
    }
    // the importance weight must actually separate the target domain:
    // en docs (the target slice) average materially above every other lang
    val lang = Tables.documents(spark, sf).select("doc_id", "lang")
      .as[(Long, String)].collect().toMap
    val byLang = a.groupBy(r => lang(r._1))
      .view.mapValues(rs => rs.map(_._3).sum / rs.length).toMap
    val others = byLang.filterNot(_._1 == "en").values
    assert(others.forall(_ < byLang("en") - 1.0),
      s"DSIR failed to separate target: $byLang")
  }

  test("corpus_schedule: schedule arithmetic replays from the engine's own features") {
    val got = PipelineQueries.corpusSchedule(spark, sf)
      .as[(String, String, Long, Long, Double, Long, Double)].collect().toSeq
    def r6(x: Double) = graft.search.VecMath.round6(x)

    // replay the SCHEDULE layer locally from the (separately oracle-checked)
    // per-doc features: token counts + the shared quality score
    val feats = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        graft.text.TextAnalysis.qualityScore(col("text")).as("q"))
      .as[(Long, String, Long, Double)].collect()
    val per = feats.groupBy(_._2).map { case (src, rows) =>
      val toks = rows.map(_._3).sum
      val wq = rows.map(r => BigInt(math.floor(r._4 * 1e6 + 0.5).toLong) * BigInt(r._3)).sum
      (src, rows.length.toLong, toks, wq)
    }.toSeq.sortBy(_._1)
    val tTok = per.map(_._3).sum
    val tWq = per.map(_._4).sum
    val tBudget = tTok * 2
    val bMain = tBudget * 4 / 5
    val bAnneal = tBudget - bMain
    val want = (per.map { case (src, nd, toks, _) =>
      val share = r6(toks.toDouble / tTok.toDouble)
      val budget = math.floor(share * bMain.toDouble + 0.5).toLong
      ("main", src, nd, toks, share, budget, r6(budget.toDouble / toks))
    } ++ per.map { case (src, nd, toks, wq) =>
      val share = r6(wq.toDouble / tWq.toDouble)
      val budget = math.floor(share * bAnneal.toDouble + 0.5).toLong
      ("anneal", src, nd, toks, share, budget, r6(budget.toDouble / toks))
    }).sortBy(r => (r._1, r._2))
    assert(got == want, s"got:\n${got.mkString("\n")}\nwant:\n${want.mkString("\n")}")

    // invariants: per-phase shares ≈ 1, budgets conserve the phase budget
    // up to per-source rounding, and the 80/20 split is exact
    Seq("main" -> bMain, "anneal" -> bAnneal).foreach { case (ph, pb) =>
      val rows = got.filter(_._1 == ph)
      assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-5 * rows.length)
      assert(math.abs(rows.map(_._6).sum - pb) <= rows.length)
    }
    // the anneal phase upweights the highest-mean-quality source
    val bestSrc = per.maxBy(p => p._4.toDouble / p._3.toDouble)._1
    val mainShare = got.find(r => r._1 == "main" && r._2 == bestSrc).get._5
    val annealShare = got.find(r => r._1 == "anneal" && r._2 == bestSrc).get._5
    assert(annealShare >= mainShare,
      s"$bestSrc: anneal $annealShare < main $mainShare")
  }
}
