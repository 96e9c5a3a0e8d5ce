package graft.queries

import graft.Tables
import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2 #49–50: end-to-end training-data pipeline compositions —
  * the queries a 100 TB curation run actually ships, built entirely from
  * the library's own operators and oracle-checked as whole pipelines.
  */
object PipelineQueries {

  /** #49 Deterministic, ENGINE-PORTABLE train/val split: bucket on the
    * first md5 hex byte of the doc id. A split contract shared across
    * teams/engines must reproduce anywhere — Spark's seeded sample() is
    * engine-specific, while md5 is identical everywhere (asserted here by
    * the DuckDB oracle computing the same assignment). 'f3' = 243/256 ≈
    * 95% train. Pure projection: scan-speed at any scale, no shuffle. */
  def splitTrainVal(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      when(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2) < "f3",
        "train").otherwise("val").as("split"))
      .orderBy("doc_id")

  val splitTrainValSql: String =
    """SELECT doc_id,
      |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
      |       THEN 'train' ELSE 'val' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  /** #50 The pipeline's end product: the curated corpus. Quality gate +
    * language gate + near-dup keep-list (only cluster representatives
    * survive), composed from the library's quality, langid and cluster
    * operators. Plan shape: two scan-only column pipelines joined on
    * doc_id, minus an anti-join against the drop-list (broadcast when the
    * drop-list is small, shuffle otherwise — AQE decides at runtime).
    *
    * `clusters` is the PRECOMPUTED (doc_id, cluster_id) resolution — the
    * pair graph is the pipeline's dominant cost, and a real curation run
    * mines it once and feeds every consumer (curate, cluster report,
    * pair audit) from the same table, not once per consumer. */
  def corpusCurate(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val q = TextAnalysis.withQuality(docs).select(col("doc_id"), col("quality_score"))
    val l = TextAnalysis.withLangId(docs).select(col("doc_id"), col("lang_pred"))
    val dropped = clusters
      .where(col("cluster_id") =!= col("doc_id")).select("doc_id")
    q.join(l, "doc_id")
      .join(dropped, Seq("doc_id"), "left_anti")
      .where(col("quality_score") >= 0.6 && col("lang_pred") === "en")
      .orderBy("doc_id")
  }

  /** The registered query: curate against the shared mined cluster table
    * (computed once per corpus across dedup_jaccard/dedup_clusters/
    * corpus_curate — see DedupQueries.minedClusters). */
  def corpusCurate(s: SparkSession, d: String): DataFrame =
    corpusCurate(Tables.documents(s, d), DedupQueries.minedClusters(s, d))

  val corpusCurateSql: String =
    s"""WITH q AS (${TextQueries.textQualityBodySql}),
       |l AS (${TextQueries.textLangidBodySql}),
       |cl AS (${DedupQueries.dedupClustersBodySql})
       |SELECT q.doc_id, q.quality_score, l.lang_pred
       |FROM q JOIN l ON q.doc_id = l.doc_id
       |LEFT JOIN cl ON q.doc_id = cl.doc_id AND cl.cluster_id <> cl.doc_id
       |WHERE cl.doc_id IS NULL AND q.quality_score >= 0.6 AND l.lang_pred = 'en'
       |ORDER BY q.doc_id""".stripMargin

  /** #61 Data-mixture resampling weights: the per-language keep fraction
    * a training run's mixing config specifies. One source of truth for
    * the Spark plan AND the oracle SQL. */
  val MixtureWeights: Seq[(String, Double)] =
    Seq("en" -> 1.0, "de" -> 0.5, "es" -> 0.5, "fr" -> 0.25, "zh" -> 0.1)

  /** Keep-threshold as a lexicographic hex string: a doc survives iff the
    * first 4 md5 hex chars of its id fall BELOW the threshold (the
    * splitTrainVal trick — string compare, no hex→int, identical in any
    * engine). w ≥ 1 → "g", which is above every hex digit. */
  private def hexThreshold(w: Double): String =
    if (w >= 1.0) "g" else f"${(w * 65536).toInt}%04x"

  /** #61 Deterministic, engine-portable stratified mixture sampling:
    * per-language keep fractions via the md5-bucket rule. The mixing
    * step every multi-source training corpus ships — and it must
    * reproduce bit-for-bit across engines and reruns, which seeded
    * `sample()` cannot. Pure projection filter: scan-speed, no shuffle.
    * Unknown languages get threshold "0" (dropped). */
  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    val thr = MixtureWeights.foldRight(lit("0")) { case ((lg, w), els) =>
      when(col("lang") === lg, lit(hexThreshold(w))).otherwise(els)
    }
    Tables.documents(s, d)
      .where(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4) < thr)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  val sampleStratifiedSql: String = {
    val arms = MixtureWeights
      .map { case (lg, w) => s"WHEN '$lg' THEN '${hexThreshold(w)}'" }.mkString(" ")
    s"""SELECT doc_id, lang FROM documents
       |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
       |  CASE lang $arms ELSE '0' END
       |ORDER BY doc_id""".stripMargin
  }

  /** #131 temperature (α) mixture sampling — the ACTUAL multilingual
    * mixing formula LLM corpora ship (XLM-R / mT5 style: target share
    * q_l ∝ p_l^α with α = 0.5 here, so minority languages up-weight and
    * the head down-weights, total expected size preserved): keep factor
    * f_l = N·q_l/n_l computed FROM THE CORPUS ITSELF (one tiny lang
    * aggregate, broadcast back — unlike sample_stratified's fixed
    * config), then the sampleUpweight mechanism realizes it exactly —
    * floor(f) copies plus one more iff the doc's md5 bucket falls below
    * the fractional part's threshold, rendered %04x so the compare is
    * the same lexicographic-hex rule everywhere. Deterministic,
    * engine-portable, expected copies = f exactly; f is rounded 6 dp
    * before the floor/threshold split so both engines derive identical
    * arithmetic (round-before-branch). Scale shape: stats agg +
    * broadcast join + row-local sequence/explode — no shuffle of the
    * corpus, no RNG state. */
  val TemperatureAlpha = 0.5

  def sampleTemperature(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val stats = docs.groupBy("lang").agg(count(lit(1)).cast("double").as("n_l"))
    val z = stats.agg(sum(sqrt(col("n_l"))).as("z"), sum(col("n_l")).as("n_tot"))
    val f = stats.crossJoin(broadcast(z))
      .withColumn("f", round(col("n_tot") * sqrt(col("n_l")) / col("z") / col("n_l"), 6))
      .select(col("lang"), col("f"))
    val h = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4)
    val thr = format_string("%04x",
      floor((col("f") - floor(col("f"))) * 65536).cast("int"))
    docs.join(broadcast(f), "lang")
      .withColumn("copies",
        floor(col("f")).cast("int") + when(h < thr, 1).otherwise(0))
      .where(col("copies") > 0)
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(0), col("copies") - 1)).as("copy_id"))
      .orderBy("doc_id", "copy_id")
  }

  val sampleTemperatureSql: String =
    """WITH st AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n_l FROM documents GROUP BY lang),
      |z AS (SELECT sum(sqrt(n_l)) AS z, sum(n_l) AS n_tot FROM st),
      |f AS (SELECT lang, round(n_tot * sqrt(n_l) / z / n_l, 6) AS f FROM st, z),
      |j AS (
      |  SELECT d.doc_id, d.lang, f.f,
      |         substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS h,
      |         printf('%04x', CAST(floor((f.f - floor(f.f)) * 65536) AS INT)) AS thr
      |  FROM documents d JOIN f USING (lang)),
      |c AS (
      |  SELECT doc_id, lang,
      |         CAST(floor(f) AS INT) + CASE WHEN h < thr THEN 1 ELSE 0 END AS copies
      |  FROM j)
      |SELECT doc_id, lang, CAST(unnest(range(copies)) AS INT) AS copy_id
      |FROM c WHERE copies > 0
      |ORDER BY doc_id, copy_id""".stripMargin

  /** #99 per-language up-sampling factors: the >1 half of mixture
    * reweighting (sample_stratified is the <1 half). Languages absent
    * here repeat once (weight 1.0). */
  val UpweightFactors: Seq[(String, Double)] =
    Seq("de" -> 1.25, "fr" -> 2.0, "zh" -> 3.5)

  /** #99 Deterministic, engine-portable up-sampling: doc repeated
    * floor(w) times, plus one more iff its md5 bucket falls below the
    * FRACTIONAL part's threshold (the same lexicographic-hex rule the
    * splits and the down-sampler use — so expected copies = w exactly,
    * and every engine/rerun materializes the identical multiset).
    * Replication is a row-local sequence + explode: no shuffle, no RNG
    * state, output rows ≈ Σ w·n_lang. copy_id makes the multiset a set
    * (downstream shuffles/joins stay key-unique); pair with
    * corpus_shuffle so repeats spread through the training order. */
  def sampleUpweight(s: SparkSession, d: String): DataFrame = {
    val h = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4)
    val base = UpweightFactors.foldRight(lit(1)) { case ((lg, w), els) =>
      when(col("lang") === lg, lit(w.toInt)).otherwise(els)
    }
    val extra = UpweightFactors.foldRight(lit(0)) { case ((lg, w), els) =>
      when(col("lang") === lg,
        when(h < lit(hexThreshold(w - w.toInt)), 1).otherwise(0)).otherwise(els)
    }
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), (base + extra).as("nc"))
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1), col("nc"))).as("copy_id"))
      .orderBy("doc_id", "copy_id")
  }

  val sampleUpweightSql: String = {
    val baseArms = UpweightFactors
      .map { case (lg, w) => s"WHEN '$lg' THEN ${w.toInt}" }.mkString(" ")
    val fracArms = UpweightFactors
      .map { case (lg, w) => s"WHEN '$lg' THEN '${hexThreshold(w - w.toInt)}'" }.mkString(" ")
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lang,
       |    CASE lang $baseArms ELSE 1 END
       |      + CASE WHEN h < CASE lang $fracArms ELSE '0000' END THEN 1 ELSE 0 END AS nc
       |  FROM t)
       |SELECT doc_id, lang, CAST(unnest(range(1, nc + 1)) AS INT) AS copy_id
       |FROM c ORDER BY doc_id, copy_id""".stripMargin
  }

  /** #90 fold count for cross-validation splits. */
  val KFolds = 5

  /** Fold boundaries as lexicographic hex thresholds over the first 4 md5
    * hex chars (the [[sampleStratified]] trick — string compare, no
    * hex→int, identical in any engine). */
  private def foldThresholds: Seq[String] =
    (1 until KFolds).map(i => f"${i * 65536 / KFolds}%04x")

  /** #90 Deterministic, engine-portable k-fold assignment: the
    * cross-validation twin of [[splitTrainVal]]. Every engine (and every
    * rerun) must place each doc in the same fold, which seeded sample()
    * cannot guarantee — md5 on the id can. Pure projection: scan-speed
    * at any scale, no shuffle. */
  def splitKfold(s: SparkSession, d: String): DataFrame = {
    val h = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4)
    val fold = foldThresholds.zipWithIndex.foldRight(lit(KFolds - 1)) {
      case ((t, i), els) => when(h < t, i).otherwise(els)
    }
    Tables.documents(s, d)
      .select(col("doc_id"), fold.cast("int").as("fold"))
      .orderBy("doc_id")
  }

  val splitKfoldSql: String = {
    val arms = foldThresholds.zipWithIndex
      .map { case (t, i) => s"WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '$t' THEN $i" }
      .mkString("\n      |  ", "\n      |  ", "")
    s"""SELECT doc_id,
       |  CAST(CASE $arms
       |  ELSE ${KFolds - 1} END AS INT) AS fold
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Shingle window for decontamination (the standard 8-gram rule). */
  val DecontamN = 8

  /** #62 Benchmark decontamination: report every corpus doc sharing an
    * 8-token shingle with the benchmark set — the check every lab runs
    * before training (benchmark text inside the training corpus
    * invalidates the eval). The join runs on xxhash64 shingle IDS, not
    * strings — the 100 TB shape (a ~6× narrower shuffle; a 64-bit
    * collision needs ~2³² distinct shingles to become likely, and the
    * string-exact DuckDB oracle re-verifies every count). Blocking
    * shape: distinct benchmark shingle ids (broadcast when small, AQE
    * decides) ⋈ exploded corpus shingle ids → per-doc overlap count —
    * never an all-pairs document comparison. */
  private def shingleIds(df: DataFrame): DataFrame = df
    // codegen'd distinct shingle ids (r21): TokenSetIds hashes the SAME
    // lowercased ' '-joined 8-token shingle strings with the same
    // xxhash64 seed (TokenSets.xxh64 doc), so the ids — and the joins
    // built on them — are value-identical to the transform lambda this
    // replaces, which was CodegenFallback and broke the scan's codegen
    .select(col("doc_id"), explode(graft.functions.VectorFunctions
      .tokenSetIds(col("text"), DecontamN)).as("sh"))

  def decontaminate(docs: DataFrame, bench: DataFrame): DataFrame = {
    val benchSh = shingleIds(bench).select("sh").distinct()
    shingleIds(docs)
      .join(benchSh, "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
      .orderBy("doc_id")
  }

  /** #133 Bloom-pruned decontamination — [[decontaminate]]'s 100 TB serving
    * shape, byte-for-byte identical results. The contaminant (benchmark)
    * shingle set is SMALL by definition, so a driver-built Bloom sketch of
    * its ids (~1.2 MB per million shingles at 1% fpp) ships to every task
    * and prunes the corpus shingle stream INSIDE the scan stage — the
    * shuffle then carries only matching shingles + the fpp sliver instead
    * of every 8-gram in the corpus (at 100 TB that is the difference
    * between shuffling terabytes and shuffling megabytes). The exact
    * hash-id join downstream eats the false positives, so the result —
    * and the DuckDB oracle — are exactly [[decontaminate]]'s. */
  def decontaminateBloom(docs: DataFrame, bench: DataFrame): DataFrame = {
    val benchSh = shingleIds(bench).select("sh").distinct()
    // two tiny bench-side jobs (count + sketch aggregate); the corpus side
    // — the one that matters at scale — is touched exactly once
    val bloom = benchSh.stat.bloomFilter("sh",
      math.max(benchSh.count(), 1L), 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    shingleIds(docs)
      .where(graft.functions.VectorFunctions.bloomMightContainLong(
        col("sh"), bos.toByteArray))
      .join(benchSh, "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
      .orderBy("doc_id")
  }

  def decontaminateBloom(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    decontaminateBloom(docs.where(col("doc_id") >= BenchDocs),
      docs.where(col("doc_id") < BenchDocs))
  }

  /** The registered query: benchmark = the first 100 docs (a stand-in
    * for a held-out eval table), corpus = the rest. */
  val BenchDocs = 100L

  def decontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    decontaminate(docs.where(col("doc_id") >= BenchDocs),
      docs.where(col("doc_id") < BenchDocs))
  }

  val decontaminateSql: String = {
    val n = DecontamN
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS s FROM documents),
       |sh AS (SELECT doc_id,
       |         list_distinct([list_aggregate(s[i:i+${n - 1}], 'string_agg', ' ')
       |                        FOR i IN range(1, len(s) - ${n - 2})]) AS g
       |       FROM t WHERE len(s) >= $n),
       |bench AS (SELECT DISTINCT unnest(g) AS sg FROM sh WHERE doc_id < $BenchDocs)
       |SELECT c.doc_id, count(*) AS n_overlap
       |FROM (SELECT doc_id, unnest(g) AS sg FROM sh WHERE doc_id >= $BenchDocs) c
       |JOIN bench USING (sg)
       |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin
  }

  /** #87 token-budget sequence packing: assign contiguous docs (doc_id
    * order, within their source shard) to training packs of ~`PackBudget`
    * BPE tokens — the pack a doc lands in is determined by the tokens
    * accumulated BEFORE it, so every engine that agrees on token counts
    * agrees on the packing (no greedy state machine, just a prefix sum).
    * Packing is inherently sequential per shard, so the window partitions
    * by source — shards pack in parallel, per-shard state is one running
    * sum. At 100 TB the shard key would be (source, file-range); the
    * shape is unchanged. Output is the pack manifest a trainer consumes:
    * docs per pack, token total, id range. */
  val PackBudget = 1024L

  def packSequences(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, d).select(col("doc_id"), col("source"),
      size(regexp_extract_all(col("text"), lit(TextAnalysis.BpePattern), lit(0)))
        .cast("long").as("n_tokens"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("before") / PackBudget.toDouble).cast("long"))
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).as("pack_tokens"),
           min(col("doc_id")).as("first_doc"),
           max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("pack_id"))
  }

  val packSequencesSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    CAST(len(regexp_extract_all(text, '${TextAnalysis.BpePattern}')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source, n_tokens,
       |    coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bf
       |  FROM t)
       |SELECT source, CAST(floor(bf / $PackBudget.0) AS BIGINT) AS pack_id,
       |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY 1, 2 ORDER BY source, pack_id""".stripMargin

  /** #97 deterministic training-order shuffle: the global document order
    * a trainer reads, as data — shuffle_key = md5 of the id (the same
    * engine-portable rule the splits use, so a rerun on ANY engine
    * reproduces the byte-identical order), shard = first key nibble (the
    * writer-parallelism bucket; at 100 TB each shard is one output
    * stream). The ORDER BY here is the honest distributed plan: a
    * range-partitioned sort (sample → range exchange → per-partition
    * sort), NEVER a single-task window — there is no row_number because
    * a global dense position would serialize the write; byte-ordered
    * keys + in-file order ARE the permutation. */
  def corpusShuffle(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(col("doc_id").cast("string").cast("binary")).as("shuffle_key"))
      .withColumn("shard",
        (expr("locate(substring(shuffle_key, 1, 1), '0123456789abcdef')") - 1)
          .cast("int"))
      .orderBy(col("shuffle_key"), col("doc_id"))

  val corpusShuffleSql: String =
    """SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
      |  CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INT) AS shard
      |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin

  /** #122 layout_zorder: Morton-order clustering key for 2-D scan
    * pruning (graft.sources.ZOrder — the Delta/Iceberg OPTIMIZE ZORDER
    * idea as plain Spark). The z math is one quantize (subtract/divide/
    * multiply/floor, IEEE-identical across engines) + an unrolled bit
    * interleave, so the key itself is HASH-CHECKED against DuckDB running
    * the same generated expression; bounds are discovered in-plan by both
    * engines (one tiny aggregate), no literals baked in. ZOrderSpec pins
    * the layout property this key buys: a 2-D box predicate touches far
    * fewer range-partitions than under a 1-D sort when the box is thin in
    * the non-sorted dimension. */
  def layoutZorder(s: SparkSession, d: String): DataFrame =
    graft.sources.ZOrder.withZ(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice")),
        "l_quantity", "l_extendedprice")
      .select(col("l_orderkey"), col("l_linenumber"), col("z"))
      .orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))
      .limit(500)

  val layoutZorderSql: String = {
    val terms = graft.sources.ZOrder.interleaveSql("qx", "qy", 16)
    s"""WITH b AS (
       |  SELECT min(l_quantity) AS xlo, max(l_quantity) AS xhi,
       |         min(l_extendedprice) AS ylo, max(l_extendedprice) AS yhi
       |  FROM lineitem),
       |q AS (
       |  SELECT l_orderkey, l_linenumber,
       |    CAST(floor((l_quantity - xlo) / (xhi - xlo) * 65535) AS BIGINT) AS qx,
       |    CAST(floor((l_extendedprice - ylo) / (yhi - ylo) * 65535) AS BIGINT) AS qy
       |  FROM lineitem, b)
       |SELECT l_orderkey, l_linenumber, $terms AS z
       |FROM q ORDER BY z, l_orderkey, l_linenumber LIMIT 500""".stripMargin
  }

  /** #177 layout_hilbert: Hilbert-curve clustering key (graft.sources.
    * Hilbert) — layout_zorder's sibling with strictly better locality
    * (consecutive curve positions are adjacent cells; Morton jumps
    * quadrants), i.e. Delta liquid clustering / Iceberg's hilbert
    * transform as plain Spark. The walk is iterative per level, so the
    * Spark side is a native codegen expression (LayoutExpressions.scala)
    * and the oracle REPLAYS the same per-level rotate/reflect as a
    * generated materialized CTE chain — the key is hash-checked cell for
    * cell. Same in-plan bounds discovery as z-order; HilbertSpec pins
    * the curve properties (bijectivity, unit-step adjacency, pruning
    * advantage). */
  def layoutHilbert(s: SparkSession, d: String): DataFrame =
    graft.sources.Hilbert.withH(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice")),
        "l_quantity", "l_extendedprice")
      .select(col("l_orderkey"), col("l_linenumber"), col("h"))
      .orderBy(col("h"), col("l_orderkey"), col("l_linenumber"))
      .limit(500)

  val layoutHilbertSql: String = {
    val chain = graft.sources.Hilbert.chainSql(
      Seq("l_orderkey", "l_linenumber"), "q", 16)
    s"""WITH b AS (
       |  SELECT min(l_quantity) AS xlo, max(l_quantity) AS xhi,
       |         min(l_extendedprice) AS ylo, max(l_extendedprice) AS yhi
       |  FROM lineitem),
       |q AS (
       |  SELECT l_orderkey, l_linenumber,
       |    CAST(floor((l_quantity - xlo) / (xhi - xlo) * 65535) AS BIGINT) AS qx,
       |    CAST(floor((l_extendedprice - ylo) / (yhi - ylo) * 65535) AS BIGINT) AS qy
       |  FROM lineitem, b),
       |$chain
       |SELECT l_orderkey, l_linenumber, CAST(d AS BIGINT) AS h
       |FROM hlvl0 ORDER BY h, l_orderkey, l_linenumber LIMIT 500""".stripMargin
  }

  /** #179 corpus_drift: Population-Stability-Index drift report — the
    * monitoring readout a continuously-ingesting training pipeline runs
    * between corpus snapshots (here the deterministic doc_id-parity
    * cohorts, the events_ab assignment shape, so the expected answer is
    * ≈0 drift and any structure is real): per (dimension, category),
    * cohort counts, add-1-smoothed shares, and the PSI contribution
    * (p0−p1)·ln(p0/p1) whose per-dimension sum is the PSI. Both watched
    * dimensions (lang, source) ride ONE scan — a row-local
    * explode(array(struct…)) fans each doc into its dimension cells, so
    * the plan is one scan + one (dim,category) aggregate + a broadcast
    * join of the tiny per-dim totals; category cardinality bounds
    * everything after the first aggregate. Shares are rounded 6 dp
    * BEFORE the contribution (round-before-branch) so both engines
    * derive contrib from identical doubles. */
  def corpusDrift(s: SparkSession, d: String): DataFrame =
    corpusDriftOf(Tables.documents(s, d))

  def corpusDriftOf(documents: DataFrame): DataFrame = {
    val cells = documents.select(pmod(col("doc_id"), lit(2L)).as("cohort"),
      explode(array(
        struct(lit("lang").as("dim"), col("lang").as("category")),
        struct(lit("source").as("dim"), col("source").as("category")))).as("c"))
      .select(col("cohort"), col("c.dim").as("dim"), col("c.category").as("category"))
    val counts = cells.groupBy("dim", "category")
      .agg(sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("n1"))
    val dims = counts.groupBy("dim")
      .agg(sum("n0").as("t0"), sum("n1").as("t1"), count(lit(1)).as("ncat"))
    counts.join(broadcast(dims), "dim")
      .withColumn("p0", round((col("n0") + 1).cast("double") / (col("t0") + col("ncat")), 6))
      .withColumn("p1", round((col("n1") + 1).cast("double") / (col("t1") + col("ncat")), 6))
      .withColumn("contrib", round((col("p0") - col("p1")) * log(col("p0") / col("p1")), 6))
      .select(col("dim"), col("category"), col("n0"), col("n1"),
        col("p0"), col("p1"), col("contrib"))
      .orderBy("dim", "category")
  }

  val corpusDriftSql: String =
    """WITH cells AS (
      |  SELECT doc_id % 2 AS cohort, 'lang' AS dim, lang AS category FROM documents
      |  UNION ALL
      |  SELECT doc_id % 2, 'source', source FROM documents),
      |counts AS (
      |  SELECT dim, category,
      |    CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |    CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      |  FROM cells GROUP BY 1, 2),
      |dims AS (
      |  SELECT dim, CAST(sum(n0) AS BIGINT) AS t0, CAST(sum(n1) AS BIGINT) AS t1,
      |         count(*) AS ncat
      |  FROM counts GROUP BY dim),
      |pr AS (
      |  SELECT c.dim, c.category, c.n0, c.n1,
      |    round(CAST(c.n0 + 1 AS DOUBLE) / (d.t0 + d.ncat), 6) AS p0,
      |    round(CAST(c.n1 + 1 AS DOUBLE) / (d.t1 + d.ncat), 6) AS p1
      |  FROM counts c JOIN dims d USING (dim))
      |SELECT dim, category, n0, n1, p0, p1,
      |  round((p0 - p1) * ln(p0 / p1), 6) AS contrib
      |FROM pr ORDER BY dim, category""".stripMargin

  /** #189 corpus_manifest: the data-card reproducibility manifest — per
    * source, row count, total chars, and an ORDER-INDEPENDENT content
    * fingerprint: bit_xor of each doc's 60-bit md5 prefix. XOR is
    * commutative/associative, so the fingerprint is invariant to row
    * order, partitioning, and executor count (what makes it usable as a
    * cross-engine, cross-run corpus identity check at any scale — two
    * pipelines produced the same corpus iff the manifests match), while
    * any single-character change flips it. One map-side-combined
    * aggregate over one scan; the md5-hex → BIGINT bridge is the
    * engine-portable sample_weighted trick, so the whole manifest is
    * hash-checked against DuckDB. */
  def corpusManifest(s: SparkSession, d: String): DataFrame =
    corpusManifestOf(Tables.documents(s, d))

  def corpusManifestOf(documents: DataFrame): DataFrame =
    documents.select(col("source"), col("n_chars"),
      conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        expr("bit_xor(h)").as("content_hash"))
      .orderBy("source")

  val corpusManifestSql: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)) AS content_hash
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** #265 corpus_release: the PRE-RELEASE audit — the sign-off report a
    * data lead reads before a corpus ships to training: every non-bench
    * doc lands on its FIRST failing gate (near-dup non-representative →
    * quality < 0.6 → non-English → benchmark 8-gram contamination) or is
    * `released`, rolled up per (source, stage) with doc and whitespace
    * token mass — so "how many tokens does source X actually contribute,
    * and where do the rest go?" is ONE bounded (≤ sources×5 rows) table.
    * Composes four library operators (mined clusters, quality, langid,
    * decontaminate) in one hash-checked row — the contamination stage is
    * what pipeline_e2e's curation deliberately omits. Scale shapes are
    * the parts' own: the dup sliver left-join, two scan-only column
    * pipelines, the shingle-id contamination join (Bloom drop-in at
    * 100 TB), a ≤5-way rollup. */
  def corpusRelease(s: SparkSession, d: String): DataFrame = {
    val all = Tables.documents(s, d)
    corpusReleaseOf(all.where(col("doc_id") >= BenchDocs),
      all.where(col("doc_id") < BenchDocs), DedupQueries.minedClusters(s, d))
  }

  def corpusReleaseOf(docs: DataFrame, bench: DataFrame,
                      clusters: DataFrame): DataFrame = {
    val dup = clusters.where(col("cluster_id") =!= col("doc_id"))
      .select("doc_id").withColumn("is_dup", lit(true))
    val q = TextAnalysis.withQuality(docs).select(col("doc_id"), col("quality_score"))
    val l = TextAnalysis.withLangId(docs).select(col("doc_id"), col("lang_pred"))
    val cont = decontaminate(docs, bench)
      .select("doc_id").withColumn("is_cont", lit(true))
    docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).as("n_tok"))
      .join(dup, Seq("doc_id"), "left")
      .join(q, "doc_id").join(l, "doc_id")
      .join(cont, Seq("doc_id"), "left")
      .select(col("source"),
        when(col("is_dup"), "dropped_dup")
          .when(col("quality_score") < 0.6, "dropped_quality")
          .when(col("lang_pred") =!= "en", "dropped_lang")
          .when(col("is_cont"), "dropped_contaminated")
          .otherwise("released").as("stage"),
        col("n_tok"))
      .groupBy("source", "stage")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy("source", "stage")
  }

  val corpusReleaseSql: String = {
    val n = DecontamN
    s"""WITH cl AS (${DedupQueries.dedupClustersBodySql}),
       |q AS (${TextQueries.textQualityBodySql}),
       |l AS (${TextQueries.textLangidBodySql}),
       |t AS (SELECT doc_id, string_split(lower(text), ' ') AS s FROM documents),
       |sh AS (SELECT doc_id,
       |         list_distinct([list_aggregate(s[i:i+${n - 1}], 'string_agg', ' ')
       |                        FOR i IN range(1, len(s) - ${n - 2})]) AS g
       |       FROM t WHERE len(s) >= $n),
       |bench AS (SELECT DISTINCT unnest(g) AS sg FROM sh WHERE doc_id < $BenchDocs),
       |cont AS (
       |  SELECT DISTINCT c.doc_id
       |  FROM (SELECT doc_id, unnest(g) AS sg FROM sh WHERE doc_id >= $BenchDocs) c
       |  JOIN bench USING (sg)),
       |staged AS (
       |  SELECT d.source,
       |    CASE WHEN cl.doc_id IS NOT NULL AND cl.cluster_id <> d.doc_id
       |           THEN 'dropped_dup'
       |         WHEN q.quality_score < 0.6 THEN 'dropped_quality'
       |         WHEN l.lang_pred <> 'en' THEN 'dropped_lang'
       |         WHEN d.doc_id IN (SELECT doc_id FROM cont)
       |           THEN 'dropped_contaminated'
       |         ELSE 'released' END AS stage,
       |    len(string_split(d.text, ' ')) AS n_tok
       |  FROM documents d
       |  JOIN q ON d.doc_id = q.doc_id JOIN l ON d.doc_id = l.doc_id
       |  LEFT JOIN cl ON d.doc_id = cl.doc_id
       |  WHERE d.doc_id >= $BenchDocs)
       |SELECT source, stage, count(*) AS n_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
       |FROM staged GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** #264 split_cluster: the LEAKAGE-PROOF split — the constructive twin
    * of split_leakage's audit. split_train_val hashes the doc id, so a
    * τ≥0.95 near-dup pair can straddle train/val (exactly what
    * split_leakage counts); this operator hashes the doc's CLUSTER ROOT
    * instead (its component id in the shared mined cluster table;
    * singletons root at themselves), so every near-dup component lands
    * in ONE split atomically and cross-boundary leakage is ZERO by
    * construction — the standard dedup-aware split every eval-hygiene
    * pipeline runs (and what split_leakage verifies after the fact).
    * Plan shape: ids-only scan, ONE left join against the pre-mined
    * (doc_id, cluster_id) table (the dup sliver — broadcast or shuffle,
    * AQE decides), then the same engine-portable md5 projection as #49.
    * No new shuffle class at 100 TB; the mining cost is the shared
    * artifact every dedup consumer already pays once. */
  def splitCluster(s: SparkSession, d: String): DataFrame =
    splitClusterOf(Tables.documents(s, d), DedupQueries.minedClusters(s, d))

  def splitClusterOf(docs: DataFrame, clusters: DataFrame): DataFrame =
    docs.select(col("doc_id"))
      .join(clusters.select(col("doc_id"), col("cluster_id")), Seq("doc_id"), "left")
      .withColumn("root_id", coalesce(col("cluster_id"), col("doc_id")))
      .select(col("doc_id"), col("root_id"),
        when(substring(md5(col("root_id").cast("string").cast("binary")), 1, 2) < "f3",
          "train").otherwise("val").as("split"))
      .orderBy("doc_id")

  val splitClusterSql: String =
    s"""WITH cl AS (${DedupQueries.dedupClustersBodySql}),
       |r AS (
       |  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS root_id
       |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id)
       |SELECT doc_id, root_id,
       |  CASE WHEN substring(md5(CAST(root_id AS VARCHAR)), 1, 2) < 'f3'
       |       THEN 'train' ELSE 'val' END AS split
       |FROM r ORDER BY doc_id""".stripMargin

  /** #199 split_leakage: the eval-leakage audit — near-dup pairs that
    * CROSS the train/val boundary: a val doc with a τ≥0.95 train twin
    * leaks the benchmark into training even after exact decontamination,
    * which is why split audits must run on the MINED pair table, not on
    * ids. Composition: the shared mined Jaccard pairs (computed once per
    * corpus — the corpus_curate discipline) joined twice against the
    * deterministic md5 split rule (#49), pair types normalized
    * least-greatest so the report is orientation-free; counts + shares
    * over the ≤3-row type table. The oracle recomputes pairs AND splits
    * from scratch, so the audit's whole pipeline is hash-checked. */
  def splitLeakage(s: SparkSession, d: String): DataFrame = {
    val pairs = DedupQueries.minedJaccardPairs(s, d).select(col("doc_a"), col("doc_b"))
    val split = Tables.documents(s, d).select(col("doc_id"),
      when(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2) < "f3",
        "train").otherwise("val").as("split"))
    val typed = pairs
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .withColumn("pair_type",
        concat_ws("-", least(col("sa"), col("sb")), greatest(col("sa"), col("sb"))))
      .groupBy("pair_type").agg(count(lit(1)).as("n_pairs"))
    val total = typed.agg(sum(col("n_pairs")).as("total"))
    typed.crossJoin(broadcast(total))
      .withColumn("share", round(col("n_pairs").cast("double") / col("total"), 6))
      .select(col("pair_type"), col("n_pairs"), col("share"))
      .orderBy("pair_type")
  }

  val splitLeakageSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS ts
       |  FROM documents),
       |blocked AS (
       |  SELECT doc_id, ts,
       |         list_aggregate(list_apply(ts, t -> md5(t)), 'min') AS blk
       |  FROM toks),
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.doc_id < b.doc_id
       |  WHERE round(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
       |              / len(list_distinct(a.ts || b.ts)), 6) >= ${DedupQueries.JaccardTau}),
       |sp AS (
       |  SELECT doc_id,
       |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
       |         THEN 'train' ELSE 'val' END AS split
       |  FROM documents),
       |j AS (
       |  SELECT least(sa.split, sb.split) || '-' || greatest(sa.split, sb.split) AS pair_type
       |  FROM p JOIN sp sa ON p.doc_a = sa.doc_id JOIN sp sb ON p.doc_b = sb.doc_id),
       |c AS (SELECT pair_type, count(*) AS n_pairs FROM j GROUP BY 1),
       |t AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS total FROM c)
       |SELECT pair_type, n_pairs,
       |  round(CAST(n_pairs AS DOUBLE) / t.total, 6) AS share
       |FROM c, t ORDER BY pair_type""".stripMargin

  /** Per-source contribution cap — the "domain cap" every web-scale
    * curation run applies (RefinedWeb/C4 shape: no single domain may
    * dominate the corpus): keep at most CapPerSource docs per source,
    * preferring the LONGEST (ties to the lower doc_id) — length is the
    * deterministic quality proxy both engines compute identically.
    *
    * Plan: the custom TopKPerKey physical operator — a bounded per-key
    * heap on both the map and reduce side, so a source with a billion
    * docs ships CapPerSource rows per task, never a full per-source sort
    * (the window-function formulation sorts EVERY doc in every source;
    * this one is O(n log cap) and shuffles only survivors). The ≤cap
    * survivors then take their rank from a window over the tiny result. */
  val CapPerSource = 15

  def sampleCapSource(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
    val top = org.apache.spark.sql.graft.TopKPerKey(
      docs, Seq(col("source")), Seq(desc("n_chars"), col("doc_id")), CapPerSource)
    val w = Window.partitionBy("source").orderBy(desc("n_chars"), col("doc_id"))
    top.withColumn("rk", row_number().over(w))
      .orderBy("doc_id")
  }

  val sampleCapSourceSql: String =
    s"""WITH ranked AS (
       |  SELECT doc_id, source, n_chars,
       |    CAST(row_number() OVER (PARTITION BY source
       |         ORDER BY n_chars DESC, doc_id) AS INT) AS rk
       |  FROM documents)
       |SELECT doc_id, source, n_chars, rk FROM ranked
       |WHERE rk <= $CapPerSource ORDER BY doc_id""".stripMargin

  /** #139 Efraimidis–Spirakis weighted sampling WITHOUT replacement
    * (IPL 2006): per source, the k docs with the largest u^(1/w) — here
    * ranked by the monotone-equivalent ln(u)/w — where u is the doc's
    * md5 bucket mapped to (0,1] and w = n_chars+1 (longer docs
    * proportionally likelier). THE distributed weighted-reservoir
    * primitive: engine-portable (no RNG state, u from the same md5-hex
    * rule as the other samplers), one scan, and the per-source top-k runs
    * on the bounded-heap TopKPerKey operator — a billion-doc source ships
    * k rows per task, never a per-source sort. The key is scaled ×1e6
    * before the 6 dp round so small-|ln(u)|/large-w keys keep 12
    * significant decimals (rank margins stay ~10⁶ × the rounding grain —
    * both engines' ln agree to ulps, far inside it). */
  val WeightedPerSource = 5

  def sampleWeighted(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
    val h = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
      16, 10).cast("double")
    val keyed = docs.withColumn("es_key",
      round(lit(1e6) * log((h + 1.0) / 4294967296.0) /
        (col("n_chars").cast("double") + 1.0), 6))
    val top = org.apache.spark.sql.graft.TopKPerKey(
      keyed, Seq(col("source")), Seq(desc("es_key"), col("doc_id")), WeightedPerSource)
    val w = Window.partitionBy("source").orderBy(desc("es_key"), col("doc_id"))
    top.withColumn("rk", row_number().over(w))
      .orderBy("doc_id")
  }

  val sampleWeightedSql: String =
    s"""WITH k AS (
       |  SELECT doc_id, source, n_chars,
       |    round(1e6 * ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0)
       |          / 4294967296.0) / (n_chars + 1.0), 6) AS es_key
       |  FROM documents),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY source
       |       ORDER BY es_key DESC, doc_id) AS INT) AS rk
       |  FROM k)
       |SELECT doc_id, source, n_chars, es_key, rk FROM ranked
       |WHERE rk <= $WeightedPerSource ORDER BY doc_id""".stripMargin

  /** #143 corpus_prune_quantile: drop the worst decile PER LANGUAGE by
    * quality score — the adaptive-threshold curation gate (a fixed global
    * cutoff over-prunes whichever language scores systematically lower;
    * the per-stratum percentile is how real corpus filters set floors).
    * The p10 threshold is EXACT rank-selection interpolation (the
    * events_quantiles shape — value-grain percentile with sort-window
    * state only, never a buffer-everything aggregate), broadcast back as
    * a tiny per-lang table; one scan of the quality pipeline feeds both
    * the window and the filter. Threshold ties keep the doc (>= at 6 dp,
    * identical rule both engines). */
  def corpusPruneQuantile(s: SparkSession, d: String): DataFrame = {
    val q = graft.text.TextAnalysis.withQuality(Tables.documents(s, d))
      .join(Tables.documents(s, d).select("doc_id", "lang"), "doc_id")
      .select(col("doc_id"), col("lang"), col("quality_score"))
    val thr = graft.operators.Quantiles
      .perGroup(q, "lang", "quality_score", Seq(0.1))
      .select(col("lang"), col("q").as("lang_p10"))
    q.join(broadcast(thr), "lang")
      .where(col("quality_score") >= col("lang_p10"))
      .select(col("doc_id"), col("lang"), col("quality_score"), col("lang_p10"))
      .orderBy("doc_id")
  }

  val corpusPruneQuantileSql: String =
    s"""WITH q AS (${TextQueries.textQualityBodySql}),
       |ql AS (
       |  SELECT q.doc_id, d.lang, q.quality_score
       |  FROM q JOIN documents d ON q.doc_id = d.doc_id),
       |thr AS (
       |  SELECT lang, round(quantile_cont(quality_score, 0.1), 6) AS lang_p10
       |  FROM ql GROUP BY lang)
       |SELECT ql.doc_id, ql.lang, ql.quality_score, thr.lang_p10
       |FROM ql JOIN thr USING (lang)
       |WHERE ql.quality_score >= thr.lang_p10
       |ORDER BY ql.doc_id""".stripMargin

  /** #154 corpus_mix: the mixing PLAN table a multi-source training run
    * ships — per source: size (docs, whitespace tokens), natural token
    * share, temperature-target share (q_s ∝ tokens_s^α, α = 0.5 — the
    * same XLM-R/mT5 rule sample_temperature realizes per-language, here
    * produced as the PLAN artifact over sources), the token budget each
    * source gets out of one corpus-epoch-equivalent total, and the
    * resulting epochs (passes over that source). This is the table a
    * run's data card publishes and the sampler consumes. Plan shape: one
    * scan → per-source aggregate (tiny) → broadcast total → arithmetic;
    * at 100 TB the only full-data touch is the one scan, and the plan
    * itself is O(sources). Determinism: shares rounded 6 dp BEFORE the
    * budget multiply (round-before-branch, the sample_temperature rule),
    * budget floored — identical arithmetic in any engine. */
  val MixAlpha = 0.5

  def corpusMix(s: SparkSession, d: String): DataFrame = {
    val per = Tables.documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
    // corpus totals as an unpartitioned window over the ALREADY-AGGREGATED
    // per-source table (O(sources) rows — the documented bounded-window
    // exception): the corpus is scanned ONCE; the agg-then-crossJoin
    // alternative re-scans the full input for the totals branch
    val all = graft.operators.BoundedWindow.keyed(col("source"))
    per
      .withColumn("t_tokens", sum(col("tokens")).over(all))
      .withColumn("t_pow",
        sum(pow(col("tokens").cast("double"), MixAlpha)).over(all))
      .withColumn("natural_share",
        round(col("tokens").cast("double") / col("t_tokens"), 6))
      .withColumn("target_share",
        round(pow(col("tokens").cast("double"), MixAlpha) / col("t_pow"), 6))
      .withColumn("budget_tokens",
        floor(col("t_tokens") * col("target_share")).cast("long"))
      .withColumn("epochs",
        round(col("budget_tokens").cast("double") / col("tokens"), 6))
      .select("source", "docs", "tokens", "natural_share", "target_share",
        "budget_tokens", "epochs")
      .orderBy("source")
  }

  val corpusMixSql: String =
    """WITH per AS (
      |  SELECT source, count(*) AS docs,
      |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY source),
      |tot AS (
      |  SELECT CAST(sum(tokens) AS BIGINT) AS t_tokens,
      |         sum(pow(CAST(tokens AS DOUBLE), 0.5)) AS t_pow
      |  FROM per),
      |sh AS (
      |  SELECT source, docs, tokens, t_tokens,
      |         round(CAST(tokens AS DOUBLE) / t_tokens, 6) AS natural_share,
      |         round(pow(CAST(tokens AS DOUBLE), 0.5) / t_pow, 6) AS target_share
      |  FROM per, tot)
      |SELECT source, docs, tokens, natural_share, target_share,
      |  CAST(floor(t_tokens * target_share) AS BIGINT) AS budget_tokens,
      |  round(CAST(floor(t_tokens * target_share) AS BIGINT) / CAST(tokens AS DOUBLE), 6) AS epochs
      |FROM sh ORDER BY source""".stripMargin

  /** #162 corpus_dsir: Data Selection via Importance Resampling (Xie et
    * al. 2023, arXiv:2302.03169) — score every raw document by how much
    * it resembles a TARGET domain under hashed n-gram bag models, the
    * data-selection rule behind domain-matched pretraining corpora. The
    * feature space is unigrams + adjacent bigrams of the whitespace
    * tokenization hashed to 4096 md5 buckets (first 3 hex chars — the
    * engine-portable bucket rule the sample_* family uses); the target
    * here is the corpus's own `lang = 'en'` slice, the raw distribution
    * the whole corpus. Per bucket, Laplace-smoothed probabilities over
    * the FIXED 4096-bucket space give a log-ratio model; a document's
    * log importance weight is the sum of its features' log-ratios
    * (selection = downstream `corpus_prune_quantile`-style thresholding
    * on `log_w`, or weighted draw via the md5 rule — both already in the
    * library). Plan shape for 100 TB: the token stream is exploded twice
    * (model pass, scoring pass — the paper's own two-pass shape); the
    * histogram is a map-side-combined aggregate onto ≤4096 keys (tiny
    * shuffle); corpus totals are a bounded window over the aggregated
    * bucket table; the model joins back as a BROADCAST (≤4096 rows) so
    * exploded features never shuffle; the per-doc sum partial-aggregates
    * before its one doc_id-keyed shuffle. Determinism: log-ratios are
    * rounded 8 dp BEFORE the per-doc sum (round-before-branch) and the
    * sum 6 dp after, so both engines derive identical values — full
    * hash-pass. */
  val DsirBuckets = 4096

  /** (doc_id, lang, b): one md5-bucketed feature row per unigram +
    * adjacent bigram — the shared feature stage of corpus_dsir and its
    * streaming twin. */
  private[graft] def dsirFeatures(docs: DataFrame): DataFrame = {
    val arr = split(lower(col("text")), " ")
    val bigrams = zip_with(
      slice(arr, lit(1), size(arr) - 1), slice(arr, lit(2), size(arr) - 1),
      (a, b) => concat(a, lit("_"), b))
    docs
      .select(col("doc_id"), col("lang"),
        explode(concat(arr, bigrams)).as("f"))
      .select(col("doc_id"), col("lang"),
        substring(md5(col("f").cast("binary")), 1, 3).as("b"))
  }

  /** (b, cq, cp): the ≤4096-row bucket histogram — DSIR's ENTIRE model
    * state, and ADDITIVE (integer counts), so incremental maintenance is
    * exact (streaming/DsirStreaming.scala). */
  private[graft] def dsirHistogram(feats: DataFrame): DataFrame =
    feats.groupBy("b").agg(
      count(lit(1)).as("cq"),
      count(when(col("lang") === "en", 1)).as("cp"))

  /** (b, lr): Laplace-smoothed log-ratio per bucket, rounded 8 dp
    * (round-before-branch). Totals via a window over the
    * ALREADY-AGGREGATED ≤4096-row bucket table (the documented
    * bounded-window exception — corpus_mix's shape). */
  private[graft] def dsirRatio(hist: DataFrame): DataFrame = {
    val all = graft.operators.BoundedWindow.keyed(col("b"))
    hist.select(col("b"),
      round(
        log((col("cp") + 1).cast("double") /
            (sum("cp").over(all) + DsirBuckets).cast("double")) -
        log((col("cq") + 1).cast("double") /
            (sum("cq").over(all) + DsirBuckets).cast("double")), 8).as("lr"))
  }

  /** Per-doc log importance weight under a ratio model (broadcast). */
  private[graft] def dsirScore(feats: DataFrame, ratio: DataFrame): DataFrame =
    feats.join(broadcast(ratio), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_features"), round(sum("lr"), 6).as("log_w"))

  def corpusDsir(s: SparkSession, d: String): DataFrame = {
    val feats = dsirFeatures(Tables.documents(s, d))
    dsirScore(feats, dsirRatio(dsirHistogram(feats))).orderBy("doc_id")
  }

  val corpusDsirSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, lang, unnest(list_concat(toks,
      |    list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i+1]))) AS f
      |  FROM t),
      |fb AS (SELECT doc_id, lang, substr(md5(f), 1, 3) AS b FROM f),
      |h AS (
      |  SELECT b, count(*) AS cq,
      |         count(CASE WHEN lang = 'en' THEN 1 END) AS cp
      |  FROM fb GROUP BY b),
      |r AS (
      |  SELECT b, round(
      |    ln(CAST(cp + 1 AS DOUBLE) / (sum(cp) OVER () + 4096))
      |    - ln(CAST(cq + 1 AS DOUBLE) / (sum(cq) OVER () + 4096)), 8) AS lr
      |  FROM h)
      |SELECT fb.doc_id, count(*) AS n_features, round(sum(r.lr), 6) AS log_w
      |FROM fb JOIN r USING (b)
      |GROUP BY fb.doc_id ORDER BY fb.doc_id""".stripMargin


  /** #210 corpus_ccnet_buckets: the CCNet head/middle/tail split — rank
    * each document WITHIN ITS LANGUAGE by LM perplexity (text_perplexity,
    * the shared bigram-LM signal) and cut per-language terciles: head =
    * the cleanest third, tail = the noisiest, the standard
    * quality-stratified sampling substrate for web-crawl curation.
    * Scale shapes: the per-language rank is AnalyticsQueries.
    * groupedRowNumber (range partition on (lang, ppl) so a big language
    * spans many partitions; offsets per (shard, lang) — never a
    * one-partition-per-language window), language sizes broadcast, and
    * the tercile from (rank, n) arithmetic replayed identically in the
    * oracle. Docs with <2 tokens have no bigram score and are excluded,
    * matching text_perplexity. */
  def corpusCcnetBuckets(s: SparkSession, d: String): DataFrame =
    corpusCcnetBucketsOf(Tables.documents(s, d))

  def corpusCcnetBucketsOf(documents: DataFrame): DataFrame = {
    val ppl = TextQueries.textPerplexityOf(documents)
      .select(col("doc_id"), col("ppl"))
    val withLang = ppl.join(documents.select(col("doc_id"), col("lang")), "doc_id")
    val ranked = AnalyticsQueries.groupedRowNumber(withLang, "__rk",
      col("lang"), col("ppl").asc, col("doc_id").asc)
    // sizes from the RANKED side: groupedRowNumber localCheckpoints its
    // input, so this counts the materialized rows instead of re-running
    // the whole perplexity lineage a second time
    val sizes = ranked.groupBy(col("lang")).agg(count(lit(1)).as("__n"))
    ranked.join(broadcast(sizes), "lang")
      .withColumn("__b", expr(AnalyticsQueries.ntileExpr("__rk", "__n", 3)))
      .withColumn("bucket", expr(
        "CASE __b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("ppl")).as("min_ppl"),
        max(col("ppl")).as("max_ppl"),
        round((sum(col("ppl").cast("decimal(18,6)")) / count(lit(1)))
          .cast("double"), 6).as("avg_ppl"))
      .orderBy("lang", "bucket")
  }

  val corpusCcnetBucketsSql: String = {
    val b = AnalyticsQueries.ntileSqlExpr("rk", "n", 3)
    s"""WITH ${TextQueries.perplexityCte},
       |wl AS (
       |  SELECT p.doc_id, p.ppl, d.lang FROM ppl p
       |  JOIN documents d ON p.doc_id = d.doc_id),
       |rk AS (
       |  SELECT wl.*,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY ppl, doc_id) AS BIGINT) AS rk,
       |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
       |  FROM wl),
       |bk AS (
       |  SELECT lang, ppl,
       |    CASE $b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
       |  FROM rk)
       |SELECT lang, bucket, count(*) AS n_docs,
       |  min(ppl) AS min_ppl, max(ppl) AS max_ppl,
       |  round(CAST(sum(CAST(ppl AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_ppl
       |FROM bk GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin
  }


  /** #219 split_ks: the exact two-sample Kolmogorov–Smirnov distance
    * between the train and val length (n_chars) distributions — the
    * IID-split audit published next to split_leakage: a D near 0 says
    * the md5 split didn't bias the folds on the watched covariate; a
    * structured D says the split leaked a correlate. Exact, not sampled:
    * per-value counts per split (one map-side-combined aggregate on the
    * value key), cumulative shares via a DISTINCT-VALUE-bounded sweep
    * (the orders_backlog sweep-line discipline — the window runs over
    * value cardinality, never rows), D = max |F_train - F_val| with the
    * smallest achieving value reported. Single-step divisions of exact
    * integers — engine-identical. */
  def splitKs(s: SparkSession, d: String): DataFrame =
    splitKsOf(Tables.documents(s, d))

  def splitKsOf(documents: DataFrame): DataFrame = {
    val tagged = documents.select(col("n_chars"),
      when(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2) < "f3",
        "train").otherwise("val").as("split"))
    val perValue = tagged.groupBy(col("n_chars"))
      .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("c_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("c_val"))
    val w = graft.operators.BoundedWindow.keyed(col("n_chars")).orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = perValue.agg(sum(col("c_train")).as("n_train"),
      sum(col("c_val")).as("n_val"))
    perValue
      .withColumn("cum_train", sum(col("c_train")).over(w))
      .withColumn("cum_val", sum(col("c_val")).over(w))
      .crossJoin(broadcast(totals))
      .withColumn("diff", round(abs(
        col("cum_train").cast("double") / col("n_train") -
        col("cum_val").cast("double") / col("n_val")), 6))
      .orderBy(desc("diff"), col("n_chars"))
      .limit(1)
      .select(col("n_train"), col("n_val"),
        col("diff").as("ks_d"), col("n_chars").as("at_value"))
  }

  val splitKsSql: String =
    """WITH tagged AS (
      |  SELECT n_chars,
      |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
      |         THEN 'train' ELSE 'val' END AS split
      |  FROM documents),
      |pv AS (
      |  SELECT n_chars,
      |    sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS c_train,
      |    sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS c_val
      |  FROM tagged GROUP BY 1),
      |cum AS (
      |  SELECT n_chars,
      |    CAST(sum(c_train) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_train,
      |    CAST(sum(c_val) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_val
      |  FROM pv),
      |tot AS (
      |  SELECT CAST(sum(c_train) AS BIGINT) AS n_train,
      |    CAST(sum(c_val) AS BIGINT) AS n_val FROM pv)
      |SELECT n_train, n_val,
      |  round(abs(CAST(cum_train AS DOUBLE) / n_train
      |    - CAST(cum_val AS DOUBLE) / n_val), 6) AS ks_d,
      |  n_chars AS at_value
      |FROM cum, tot
      |ORDER BY ks_d DESC, at_value LIMIT 1""".stripMargin


  /** #235 corpus_vocab_drift: token-level PSI between corpus cohorts —
    * corpus_drift's vocabulary-grain sibling: the lang/source PSI can
    * read ~0 while the WORD distribution shifts (a new crawl slice, a
    * template flood); this watches the top-200 global tokens directly.
    * Shapes: one token explode with map-side-combined (token, cohort)
    * counts, the vocabulary bounded via TakeOrdered top-200 (the
    * text_zipf heap discipline), broadcast join back, per-cohort totals
    * broadcast; add-1 shares rounded 6 dp BEFORE the contribution
    * (corpus_drift's round-before-branch) — full hash-pass. */
  def corpusVocabDrift(s: SparkSession, d: String): DataFrame =
    corpusVocabDriftOf(Tables.documents(s, d))

  def corpusVocabDriftOf(documents: DataFrame): DataFrame = {
    val toks = documents.select(pmod(col("doc_id"), lit(2L)).as("cohort"),
      explode(split(lower(col("text")), " ")).as("token"))
    val counts = toks.groupBy(col("token"), col("cohort")).agg(count(lit(1)).as("n"))
    val top = counts.groupBy(col("token")).agg(sum(col("n")).as("tf"))
      .orderBy(desc("tf"), col("token")).limit(200).select(col("token"))
    val inTop = counts.join(broadcast(top), "token")
    val totals = inTop.groupBy(col("cohort")).agg(sum(col("n")).as("tot"))
    val t0 = totals.where(col("cohort") === 0).select(col("tot").as("t0"))
    val t1 = totals.where(col("cohort") === 1).select(col("tot").as("t1"))
    inTop.groupBy(col("token"))
      .agg(sum(when(col("cohort") === 0, col("n")).otherwise(0L)).as("n0"),
        sum(when(col("cohort") === 1, col("n")).otherwise(0L)).as("n1"))
      .crossJoin(broadcast(t0)).crossJoin(broadcast(t1))
      .withColumn("p0", round((col("n0") + 1).cast("double") / (col("t0") + 200), 6))
      .withColumn("p1", round((col("n1") + 1).cast("double") / (col("t1") + 200), 6))
      .withColumn("psi_contrib",
        round((col("p0") - col("p1")) * log(col("p0") / col("p1")), 6))
      .select(col("token"), col("n0"), col("n1"), col("p0"), col("p1"), col("psi_contrib"))
      .orderBy("token")
  }

  val corpusVocabDriftSql: String =
    """WITH toks AS (
      |  SELECT doc_id % 2 AS cohort, unnest(string_split(lower(text), ' ')) AS token
      |  FROM documents),
      |c AS (SELECT token, cohort, count(*) AS n FROM toks GROUP BY 1, 2),
      |top AS (
      |  SELECT token FROM (
      |    SELECT token, sum(n) AS tf FROM c GROUP BY 1
      |    ORDER BY tf DESC, token LIMIT 200)),
      |it AS (SELECT c.* FROM c JOIN top ON c.token = top.token),
      |g AS (
      |  SELECT token,
      |    CAST(sum(CASE WHEN cohort = 0 THEN n ELSE 0 END) AS BIGINT) AS n0,
      |    CAST(sum(CASE WHEN cohort = 1 THEN n ELSE 0 END) AS BIGINT) AS n1
      |  FROM it GROUP BY 1),
      |t AS (
      |  SELECT CAST(sum(CASE WHEN cohort = 0 THEN n ELSE 0 END) AS BIGINT) AS t0,
      |    CAST(sum(CASE WHEN cohort = 1 THEN n ELSE 0 END) AS BIGINT) AS t1
      |  FROM it),
      |p AS (
      |  SELECT token, n0, n1,
      |    round(CAST(n0 + 1 AS DOUBLE) / (t0 + 200), 6) AS p0,
      |    round(CAST(n1 + 1 AS DOUBLE) / (t1 + 200), 6) AS p1
      |  FROM g, t)
      |SELECT token, n0, n1, p0, p1,
      |  round((p0 - p1) * ln(p0 / p1), 6) AS psi_contrib
      |FROM p ORDER BY token""".stripMargin


  /** #239 split_balance: the categorical balance audit between train and
    * val — per (split, lang) observed vs expected counts and the
    * chi-square contribution: split_ks watches a numeric covariate,
    * this watches the categorical one (an unbalanced language split
    * biases eval). Emitted PER CELL (bounded by splits x langs) so
    * every number is one exact-integer expression or a single division
    * — no cross-row double sum to drift. */
  def splitBalance(s: SparkSession, d: String): DataFrame =
    splitBalanceOf(Tables.documents(s, d))

  def splitBalanceOf(documents: DataFrame): DataFrame = {
    val tagged = documents.select(col("lang"),
      when(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2) < "f3",
        "train").otherwise("val").as("split"))
    val cells = tagged.groupBy(col("split"), col("lang")).agg(count(lit(1)).as("observed"))
    val bySplit = cells.groupBy(col("split")).agg(sum(col("observed")).as("n_split"))
    val byLang = cells.groupBy(col("lang")).agg(sum(col("observed")).as("n_lang"))
    val total = cells.agg(sum(col("observed")).as("n_total"))
    cells.join(broadcast(bySplit), "split").join(broadcast(byLang), "lang")
      .crossJoin(broadcast(total))
      .withColumn("expected",
        round((col("n_split") * col("n_lang")).cast("double") / col("n_total"), 6))
      .withColumn("chisq_contrib", round(
        (col("observed") - col("expected")) * (col("observed") - col("expected"))
          / col("expected"), 6))
      .select(col("split"), col("lang"), col("observed"), col("expected"),
        col("chisq_contrib"))
      .orderBy("split", "lang")
  }

  val splitBalanceSql: String =
    """WITH tagged AS (
      |  SELECT lang,
      |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
      |         THEN 'train' ELSE 'val' END AS split
      |  FROM documents),
      |c AS (SELECT split, lang, count(*) AS observed FROM tagged GROUP BY 1, 2),
      |bs AS (SELECT split, CAST(sum(observed) AS BIGINT) AS n_split FROM c GROUP BY 1),
      |bl AS (SELECT lang, CAST(sum(observed) AS BIGINT) AS n_lang FROM c GROUP BY 1),
      |t AS (SELECT CAST(sum(observed) AS BIGINT) AS n_total FROM c),
      |e AS (
      |  SELECT c.split, c.lang, observed,
      |    round(CAST(n_split * n_lang AS DOUBLE) / n_total, 6) AS expected
      |  FROM c JOIN bs ON c.split = bs.split JOIN bl ON c.lang = bl.lang, t)
      |SELECT split, lang, observed, expected,
      |  round((observed - expected) * (observed - expected) / expected, 6) AS chisq_contrib
      |FROM e ORDER BY split, lang""".stripMargin

  /** #244 split_temporal: time-based train/test split with a 30-day
    * embargo gap (the purged-CV discipline from financial ML — a model
    * trained through day T and tested from day T+1 leaks any label or
    * feature computed over windows that straddle T; the embargo buys
    * the window length). The cutoff is the EXACT 80th-percentile order
    * day, found on the calendar-bounded daily rollup (running count ×5
    * ≥ total ×4 — an integer decision, no quantile interpolation), so
    * both engines pick the identical day; the per-split audit (orders,
    * distinct customers, decimal-exact value, date range) is one
    * aggregate over the tagged frame. Scale: the only fact-sized ops
    * are the daily rollup and the final aggregate — the cutoff is a
    * broadcast one-row frame. */
  def splitTemporal(s: SparkSession, d: String): DataFrame =
    splitTemporalOf(Tables.orders(s, d))

  def splitTemporalOf(ord: DataFrame): DataFrame = {
    val base = ord.select(to_date(col("o_orderdate")).as("day"),
      col("o_custkey"), col("o_totalprice"))
    val daily = base.groupBy("day").agg(count(lit(1)).as("n"))
    // unpartitioned window over the AGGREGATED ~2.5k-day frame only
    val wc = graft.operators.BoundedWindow.keyed(col("day")).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = daily.agg(sum(col("n")).as("tot"))
    val cutoff = daily.withColumn("cum", sum(col("n")).over(wc))
      .crossJoin(broadcast(tot))
      .where(col("cum") * 5 >= col("tot") * 4)
      .agg(min(col("day")).as("cutoff"))
    base.crossJoin(broadcast(cutoff))
      .withColumn("split",
        when(col("day") <= col("cutoff"), "train")
          .when(col("day") <= date_add(col("cutoff"), 30), "embargo")
          .otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        // exact decimal sum, rendered as double (decimal-vs-float64
        // parquet/fetchdf rendering would hash-flake on trailing zeros)
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("value"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .orderBy("split")
  }

  val splitTemporalSql: String =
    """WITH d AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, o_custkey, o_totalprice
      |  FROM orders),
      |daily AS (SELECT day, count(*) AS n FROM d GROUP BY 1),
      |c AS (
      |  SELECT day,
      |    CAST(sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM daily),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM daily),
      |k AS (SELECT min(day) AS cutoff FROM c, t WHERE cum * 5 >= tot * 4),
      |tagged AS (
      |  SELECT CASE WHEN day <= cutoff THEN 'train'
      |              WHEN day <= cutoff + 30 THEN 'embargo'
      |              ELSE 'test' END AS split, o_custkey, o_totalprice, day
      |  FROM d, k)
      |SELECT split, count(*) AS n_orders,
      |  count(DISTINCT o_custkey) AS n_customers,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS value,
      |  min(day) AS min_day, max(day) AS max_day
      |FROM tagged GROUP BY 1 ORDER BY 1""".stripMargin

  /** #260 split_runs_test: the Wald–Wolfowitz runs test on the train/val
    * assignment along the contiguous doc_id order — the IID audit that
    * catches a streaky split (id-correlated assignment) that per-class
    * counts can't see: split_balance checks HOW MANY landed in each
    * side, this checks WHERE. Runs are counted with an equi-join on
    * (doc_id, doc_id−1) — contiguous ids are the reference's data model
    * — never a global-order window; the z-score's μ and σ come from
    * exact integer n0·n1 (DECIMAL — the product passes int64 at ~3·10⁹
    * per side) through one identically-written double expression. */
  def splitRunsTest(s: SparkSession, d: String): DataFrame =
    splitRunsTestOf(Tables.documents(s, d))

  def splitRunsTestOf(documents: DataFrame): DataFrame = {
    val tagged = documents.select(col("doc_id"),
      when(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2) < "f3",
        lit(1L)).otherwise(lit(0L)).as("t"))
    val diffs = tagged.as("a")
      .join(tagged.select((col("doc_id") + 1).as("doc_id"), col("t").as("pt")).as("b"),
        "doc_id")
      .agg(sum(when(col("t") =!= col("pt"), 1L).otherwise(0L)).as("switches"))
    val counts = tagged.agg(sum(col("t")).as("n1"),
      sum(lit(1L) - col("t")).as("n0"), count(lit(1)).as("n"))
    counts.crossJoin(broadcast(diffs))
      .withColumn("runs", col("switches") + 1)
      .withColumn("a",
        (col("n0").cast("decimal(19,0)") * col("n1").cast("decimal(19,0)"))
          .cast("double"))
      .select(col("n0"), col("n1"), col("runs"),
        when(col("n") > 1 && col("n0") > 0 && col("n1") > 0,
          round((col("runs").cast("double") -
            (lit(1.0) + lit(2.0) * col("a") / col("n"))) /
            sqrt(lit(2.0) * col("a") * (lit(2.0) * col("a") - col("n")) /
              (col("n").cast("double") * col("n") * (col("n") - lit(1.0)))), 6))
          .as("z"))
  }

  val splitRunsTestSql: String =
    """WITH tagged AS (
      |  SELECT doc_id,
      |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
      |         THEN 1 ELSE 0 END AS t
      |  FROM documents),
      |d AS (
      |  SELECT CAST(sum(CASE WHEN a.t <> b.t THEN 1 ELSE 0 END) AS BIGINT)
      |    AS switches
      |  FROM tagged a JOIN tagged b ON a.doc_id = b.doc_id + 1),
      |c AS (
      |  SELECT CAST(sum(t) AS BIGINT) AS n1,
      |    CAST(sum(1 - t) AS BIGINT) AS n0, CAST(count(*) AS BIGINT) AS n
      |  FROM tagged),
      |x AS (
      |  SELECT n0, n1, n, switches + 1 AS runs,
      |    CAST(CAST(n0 AS DECIMAL(19,0)) * CAST(n1 AS DECIMAL(19,0)) AS DOUBLE) AS a
      |  FROM c, d)
      |SELECT n0, n1, runs,
      |  CASE WHEN n > 1 AND n0 > 0 AND n1 > 0 THEN
      |    round((CAST(runs AS DOUBLE) - (1.0 + 2.0 * a / n)) /
      |      sqrt(2.0 * a * (2.0 * a - n) /
      |        (CAST(n AS DOUBLE) * n * (n - 1.0))), 6)
      |  END AS z
      |FROM x""".stripMargin

  /** #262 pipeline_e2e: the WHOLE curation pipeline as one artifact —
    * curate (quality ≥ 0.6 + lang=en + near-dup keep-list, the
    * corpusCurate composition) → split (md5 train/val, the
    * splitTrainVal rule) → pack (token-budget prefix-sum packing per
    * (source, split) shard, the packSequences rule) — reduced to the
    * manifest a training launch reads: per (split, source) doc/pack/
    * token totals and the mean pack fill. This is the end-to-end gate
    * row: one hash compare pins the composed semantics of quality,
    * langid, cluster resolution, split and packing simultaneously.
    * Scale shape is the union of its parts' (each individually
    * 100×-probed): scan-only quality/langid columns, one anti-join
    * against the pre-mined cluster table, shard-parallel packing
    * windows, and a ≤(splits×sources) bounded final rollup — no new
    * shuffle class is introduced by the composition. */
  def pipelineE2e(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val curated = corpusCurate(docs, DedupQueries.minedClusters(s, d))
      .select("doc_id")
    val toks = docs.select(col("doc_id"), col("source"),
      size(regexp_extract_all(col("text"), lit(TextAnalysis.BpePattern), lit(0)))
        .cast("long").as("n_tokens"))
    val base = curated.join(toks, "doc_id")
      .withColumn("split",
        when(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2) < "f3",
          "train").otherwise("val"))
    val w = Window.partitionBy("source", "split").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("before") / PackBudget.toDouble).cast("long"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("pack_id")).as("n_packs"),
        sum(col("n_tokens")).as("n_tokens"))
      .withColumn("fill",
        round(col("n_tokens").cast("double") /
          (col("n_packs") * lit(PackBudget)).cast("double"), 6))
      .orderBy("split", "source")
  }

  val pipelineE2eSql: String =
    s"""WITH q AS (${TextQueries.textQualityBodySql}),
       |l AS (${TextQueries.textLangidBodySql}),
       |cl AS (${DedupQueries.dedupClustersBodySql}),
       |cur AS (
       |  SELECT q.doc_id FROM q JOIN l ON q.doc_id = l.doc_id
       |  LEFT JOIN cl ON q.doc_id = cl.doc_id AND cl.cluster_id <> cl.doc_id
       |  WHERE cl.doc_id IS NULL AND q.quality_score >= 0.6 AND l.lang_pred = 'en'),
       |t AS (
       |  SELECT d.doc_id, d.source,
       |    CAST(len(regexp_extract_all(d.text, '${TextAnalysis.BpePattern}')) AS BIGINT) AS n_tokens,
       |    CASE WHEN substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) < 'f3'
       |         THEN 'train' ELSE 'val' END AS split
       |  FROM documents d JOIN cur ON d.doc_id = cur.doc_id),
       |c AS (
       |  SELECT split, source, doc_id, n_tokens,
       |    coalesce(sum(n_tokens) OVER (PARTITION BY source, split ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bf
       |  FROM t),
       |p AS (
       |  SELECT split, source, n_tokens,
       |    CAST(floor(bf / $PackBudget.0) AS BIGINT) AS pack_id
       |  FROM c)
       |SELECT split, source, count(*) AS n_docs,
       |  CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  round(CAST(sum(n_tokens) AS DOUBLE)
       |    / CAST(count(DISTINCT pack_id) * $PackBudget AS DOUBLE), 6) AS fill
       |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** #263 pipeline_ingest: the DAILY-INGEST admission funnel — what a
    * continuously-fed training corpus runs on every new batch: the last
    * 20% of the book by doc_id (exact integer rule doc_id·5 ≥ max·4, a
    * broadcast one-row max) is admitted against the resident 80% through
    * exact-dup (content md5 vs the resident fingerprint set), near-dup
    * (the shared mined cluster table: a batch doc matches resident
    * content iff its cluster ROOT — the min doc id — is resident),
    * quality (≥ 0.6), language (en) and finally the md5 split rule, each
    * doc counted once under its FIRST failing stage. Output is the
    * bounded admission report (≤6 rows) a data-ops rotation reads.
    * Scale shapes: fingerprint membership is a key-only join (16-byte
    * keys; at 100 TB the decontaminate_bloom in-scan sketch is the
    * drop-in prune), the cluster table is the pre-mined shared artifact
    * every dedup consumer reuses, quality/langid are scan-only column
    * pipelines, and the rollup is stage-bounded. Within-batch dups are
    * deliberately NOT dropped here — that's dedup_canonical's job at
    * merge time; this operator answers "what does this batch add against
    * what we already hold". */
  def pipelineIngest(s: SparkSession, d: String): DataFrame =
    pipelineIngestOf(Tables.documents(s, d), DedupQueries.minedClusters(s, d))

  def pipelineIngestOf(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val mx = docs.agg(max(col("doc_id")).as("mx"))
    val tagged = docs.crossJoin(broadcast(mx))
      .withColumn("is_batch", col("doc_id") * 5 >= col("mx") * 4)
    val resFp = tagged.where(!col("is_batch"))
      .select(md5(col("text").cast("binary")).as("fp")).distinct()
      .withColumn("fp_hit", lit(true))
    val residentCluster = clusters.crossJoin(broadcast(mx))
      .where(col("cluster_id") * 5 < col("mx") * 4)
      .select(col("doc_id")).withColumn("near_res", lit(true))
    val q = TextAnalysis.withQuality(docs).select(col("doc_id"), col("quality_score"))
    val l = TextAnalysis.withLangId(docs).select(col("doc_id"), col("lang_pred"))
    tagged.where(col("is_batch"))
      .withColumn("fp", md5(col("text").cast("binary")))
      .join(resFp, Seq("fp"), "left")
      .join(residentCluster, Seq("doc_id"), "left")
      .join(q, "doc_id").join(l, "doc_id")
      .select(
        when(col("fp_hit"), "dropped_exact")
          .when(col("near_res"), "dropped_neardup")
          .when(col("quality_score") < 0.6, "dropped_quality")
          .when(col("lang_pred") =!= "en", "dropped_lang")
          .when(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2) < "f3",
            "admitted_train")
          .otherwise("admitted_val").as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_docs"))
      .orderBy("stage")
  }

  val pipelineIngestSql: String =
    s"""WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
       |q AS (${TextQueries.textQualityBodySql}),
       |l AS (${TextQueries.textLangidBodySql}),
       |cl AS (${DedupQueries.dedupClustersBodySql}),
       |bat AS (
       |  SELECT d.doc_id, d.text FROM documents d, mx WHERE d.doc_id * 5 >= mx * 4),
       |resfp AS (
       |  SELECT DISTINCT md5(d.text) AS fp
       |  FROM documents d, mx WHERE d.doc_id * 5 < mx * 4),
       |nearres AS (
       |  SELECT cl.doc_id FROM cl, mx WHERE cl.cluster_id * 5 < mx * 4),
       |staged AS (
       |  SELECT b.doc_id,
       |    CASE WHEN md5(b.text) IN (SELECT fp FROM resfp) THEN 'dropped_exact'
       |         WHEN b.doc_id IN (SELECT doc_id FROM nearres) THEN 'dropped_neardup'
       |         WHEN q.quality_score < 0.6 THEN 'dropped_quality'
       |         WHEN l.lang_pred <> 'en' THEN 'dropped_lang'
       |         WHEN substring(md5(CAST(b.doc_id AS VARCHAR)), 1, 2) < 'f3'
       |           THEN 'admitted_train'
       |         ELSE 'admitted_val' END AS stage
       |  FROM bat b JOIN q ON b.doc_id = q.doc_id JOIN l ON b.doc_id = l.doc_id)
       |SELECT stage, count(*) AS n_docs FROM staged GROUP BY 1 ORDER BY 1""".stripMargin

  /** #271 corpus_schedule: the TWO-PHASE TRAINING MIXTURE SCHEDULE — the
    * data-card artifact of the now-standard "anneal on quality" recipe
    * (MiniCPM's decay-phase upweighting; Llama-3-style final-stage
    * high-quality mixes): a fixed token budget (2× the corpus — a
    * 2-epoch-equivalent run) splits 80/20 into a MAIN phase mixed by
    * natural token mass and an ANNEAL phase mixed by quality-weighted
    * token mass (Σ quality·tokens per source), emitting per (phase,
    * source) the share, the integer token budget and the implied epochs
    * (>1 = oversampling, the flag a data card must disclose). Exactness
    * discipline: quality is the row-local 6-dp score scaled to integer
    * micro-units (floor(q·1e6 + 0.5) — the round-scaling trap), weights
    * accumulate as exact DECIMAL products, every share/epoch is ONE
    * double division of exact values, budgets use integer floor-division
    * and floor(x+0.5) — both engines land on identical rendered values.
    * Scale shape: one scan with row-local features → a ≤|sources|
    * map-side-combined rollup → broadcast one-row totals; nothing after
    * the rollup is data-sized. */
  def corpusSchedule(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val base = docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      .withColumn("qmu", floor(col("q") * 1e6 + 0.5).cast("long"))
    val per = base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tok")).as("tokens_avail"),
      sum(col("qmu").cast("decimal(8,0)") * col("n_tok").cast("decimal(14,0)")).as("wq"))
    val tot = per.agg(sum(col("tokens_avail")).as("t_tokens"),
      sum(col("wq")).as("t_wq"))
    val j = per.crossJoin(broadcast(tot))
      .withColumn("t_budget", col("t_tokens") * 2)
      .withColumn("b_main", expr("(t_budget * 4) div 5"))
      .withColumn("b_anneal", col("t_budget") - col("b_main"))
    val main = j.select(lit("main").as("phase"), col("source"), col("n_docs"),
      col("tokens_avail"),
      round(col("tokens_avail").cast("double") / col("t_tokens").cast("double"), 6)
        .as("share"),
      col("b_main").as("pb"))
    val anneal = j.select(lit("anneal").as("phase"), col("source"), col("n_docs"),
      col("tokens_avail"),
      round(col("wq").cast("double") / col("t_wq").cast("double"), 6).as("share"),
      col("b_anneal").as("pb"))
    main.unionAll(anneal)
      .withColumn("token_budget",
        floor(col("share") * col("pb").cast("double") + 0.5).cast("long"))
      .withColumn("epochs",
        round(col("token_budget").cast("double") / col("tokens_avail"), 6))
      .select(col("phase"), col("source"), col("n_docs"), col("tokens_avail"),
        col("share"), col("token_budget"), col("epochs"))
      .orderBy("phase", "source")
  }

  val corpusScheduleSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok FROM documents),
      |q AS (${TextQueries.textQualityBodySql}),
      |b AS (
      |  SELECT t.source, t.n_tok,
      |         CAST(floor(q.quality_score * 1000000 + 0.5) AS BIGINT) AS qmu
      |  FROM t JOIN q USING (doc_id)),
      |per AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(n_tok) AS BIGINT) AS tokens_avail,
      |         sum(qmu * n_tok) AS wq
      |  FROM b GROUP BY 1),
      |tot AS (SELECT CAST(sum(tokens_avail) AS BIGINT) AS t_tokens,
      |               sum(wq) AS t_wq FROM per),
      |ph AS (
      |  SELECT 'main' AS phase, source, n_docs, tokens_avail,
      |    round(CAST(tokens_avail AS DOUBLE) / CAST(t_tokens AS DOUBLE), 6) AS share,
      |    (t_tokens * 2 * 4) // 5 AS pb
      |  FROM per, tot
      |  UNION ALL
      |  SELECT 'anneal', source, n_docs, tokens_avail,
      |    round(CAST(wq AS DOUBLE) / CAST(t_wq AS DOUBLE), 6),
      |    t_tokens * 2 - (t_tokens * 2 * 4) // 5
      |  FROM per, tot)
      |SELECT phase, source, n_docs, tokens_avail, share,
      |  CAST(floor(share * CAST(pb AS DOUBLE) + 0.5) AS BIGINT) AS token_budget,
      |  round(CAST(floor(share * CAST(pb AS DOUBLE) + 0.5) AS DOUBLE) / tokens_avail, 6)
      |    AS epochs
      |FROM ph ORDER BY phase, source""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_schedule" -> (corpusSchedule _),
    "corpus_release" -> (corpusRelease _),
    "split_cluster" -> (splitCluster _),
    "pipeline_ingest" -> (pipelineIngest _),
    "pipeline_e2e" -> (pipelineE2e _),
    "split_runs_test" -> (splitRunsTest _),
    "split_temporal" -> (splitTemporal _),
    "split_ks" -> (splitKs _),
    "split_balance" -> (splitBalance _),
    "corpus_ccnet_buckets" -> (corpusCcnetBuckets _),
    "corpus_vocab_drift" -> (corpusVocabDrift _),
    "corpus_mix" -> (corpusMix _),
    "corpus_dsir" -> (corpusDsir _),
    "layout_zorder" -> (layoutZorder _),
    "layout_hilbert" -> (layoutHilbert _),
    "corpus_drift" -> (corpusDrift _),
    "corpus_manifest" -> (corpusManifest _),
    "split_leakage" -> (splitLeakage _),
    "corpus_shuffle" -> (corpusShuffle _),
    "pack_sequences" -> (packSequences _),
    "split_kfold" -> (splitKfold _),
    "split_train_val" -> (splitTrainVal _),
    "sample_stratified" -> (sampleStratified _),
    "sample_temperature" -> (sampleTemperature _),
    "sample_upweight" -> (sampleUpweight _),
    "sample_cap_source" -> (sampleCapSource _),
    "sample_weighted" -> (sampleWeighted _),
    "corpus_prune_quantile" -> (corpusPruneQuantile _),
    "decontaminate" -> ((s: SparkSession, d: String) => decontaminate(s, d)),
    "decontaminate_bloom" -> ((s: SparkSession, d: String) => decontaminateBloom(s, d)),
    "corpus_curate" -> (corpusCurate _)
  )

  val oracles: Map[String, String] = Map(
    "corpus_schedule" -> corpusScheduleSql,
    "corpus_release" -> corpusReleaseSql,
    "split_cluster" -> splitClusterSql,
    "pipeline_ingest" -> pipelineIngestSql,
    "pipeline_e2e" -> pipelineE2eSql,
    "split_runs_test" -> splitRunsTestSql,
    "split_temporal" -> splitTemporalSql,
    "split_ks" -> splitKsSql,
    "split_balance" -> splitBalanceSql,
    "corpus_ccnet_buckets" -> corpusCcnetBucketsSql,
    "corpus_vocab_drift" -> corpusVocabDriftSql,
    "corpus_mix" -> corpusMixSql,
    "corpus_dsir" -> corpusDsirSql,
    "layout_zorder" -> layoutZorderSql,
    "layout_hilbert" -> layoutHilbertSql,
    "corpus_drift" -> corpusDriftSql,
    "corpus_manifest" -> corpusManifestSql,
    "split_leakage" -> splitLeakageSql,
    "corpus_shuffle" -> corpusShuffleSql,
    "pack_sequences" -> packSequencesSql,
    "split_kfold" -> splitKfoldSql,
    "split_train_val" -> splitTrainValSql,
    "sample_stratified" -> sampleStratifiedSql,
    "sample_temperature" -> sampleTemperatureSql,
    "sample_upweight" -> sampleUpweightSql,
    "sample_cap_source" -> sampleCapSourceSql,
    "sample_weighted" -> sampleWeightedSql,
    "corpus_prune_quantile" -> corpusPruneQuantileSql,
    "decontaminate" -> decontaminateSql,
    // identical semantics by contract (bloom is a pre-shuffle prune, the
    // exact join removes fp) — the SAME oracle hash-checks both plans
    "decontaminate_bloom" -> decontaminateSql,
    "corpus_curate" -> corpusCurateSql
  )
}
