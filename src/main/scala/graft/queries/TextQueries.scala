package graft.queries

import graft.Tables
import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2 #26–29: text analysis over documents.parquet, each with a
  * DuckDB oracle computing the identical formula (same doubles, 6 dp).
  */
object TextQueries {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  def textTokens(s: SparkSession, d: String): DataFrame =
    TextAnalysis.withTokenCounts(docs(s, d)).orderBy("doc_id")

  val textTokensSql: String =
    s"""SELECT doc_id,
       |  len(string_split(text, ' ')) AS n_ws_tokens,
       |  len(regexp_extract_all(text, '${TextAnalysis.BpePattern}')) AS n_bpe_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  def textQuality(s: SparkSession, d: String): DataFrame =
    TextAnalysis.withQuality(docs(s, d)).orderBy("doc_id")

  /** ORDER-BY-free body, reusable as a CTE in composed oracles. */
  val textQualityBodySql: String = {
    val stop = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(",")
    s"""WITH f AS (
       |  SELECT doc_id,
       |    CAST(length(text) AS DOUBLE) AS len,
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS ntok,
       |    CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stop))) AS DOUBLE) AS stophits,
       |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) AS alpha
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len AS BIGINT) AS len_chars,
       |  CAST(ntok AS BIGINT) AS n_tokens,
       |  round((len - ntok + 1.0) / ntok, 6) AS avg_token_len,
       |  round(stophits / ntok, 6) AS stopword_ratio,
       |  round(alpha / len, 6) AS alpha_ratio,
       |  round(least(1.0, ntok / 100.0) * 0.4
       |        + least(1.0, (stophits / ntok) * 10.0) * 0.3
       |        + (alpha / len) * 0.3, 6) AS quality_score
       |FROM f""".stripMargin
  }

  val textQualitySql: String = textQualityBodySql + "\nORDER BY doc_id"

  def textLangid(s: SparkSession, d: String): DataFrame =
    TextAnalysis.withLangId(docs(s, d)).orderBy("doc_id")

  /** ORDER-BY-free body, reusable as a CTE in composed oracles. */
  val textLangidBodySql: String = {
    val scoreExprs = TextAnalysis.LangMarkers.map { case (lang, ws) =>
      val lst = ws.map(w => s"'$w'").mkString(",")
      s"CAST(len(list_filter(ts, t -> t IN ($lst))) AS DOUBLE) / ntok AS s_$lang"
    }.mkString(",\n    ")
    val bestExpr = TextAnalysis.LangMarkers.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
    val caseArms = TextAnalysis.LangMarkers.map { case (l, _) =>
      s"WHEN s_$l = best AND best > 0.0 THEN '$l'"
    }.mkString("\n    ")
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS ts,
       |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS ntok
       |  FROM documents),
       |sc AS (
       |  SELECT doc_id,
       |    $scoreExprs
       |  FROM t),
       |b AS (SELECT *, $bestExpr AS best FROM sc)
       |SELECT doc_id,
       |  CASE $caseArms ELSE 'und' END AS lang_pred,
       |  round(best, 6) AS lang_score
       |FROM b""".stripMargin
  }

  val textLangidSql: String = textLangidBodySql + "\nORDER BY doc_id"

  def textFingerprint(s: SparkSession, d: String): DataFrame =
    TextAnalysis.withFingerprint(docs(s, d)).orderBy("doc_id")

  val textFingerprintSql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    [CAST(0 AS BIGINT)] || list_apply(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
      |    (h, c) -> (h * 31 + c) % 4294967296) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Corpus vocabulary: top-100 tokens by document frequency (with term
    * frequency) — the corpus-level statistic behind stopword lists, BPE
    * vocab seeding, and quality heuristics. One map-side-combined
    * aggregate + a TakeOrdered; never a global sort. */
  def textVocab(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(desc("df"), desc("tf"), col("token"))
      .limit(100)

  val textVocabSql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      |  FROM documents)
      |SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
      |FROM t GROUP BY token
      |ORDER BY df DESC, tf DESC, token LIMIT 100""".stripMargin

  /** #116 text_logprob: unigram language-model score per document — the
    * KenLM-style curation signal without a model artifact: score each doc
    * by the mean natural-log probability of its tokens under the corpus's
    * OWN unigram distribution (docs of improbable tokens — noise, other
    * languages, mojibake — score low; self-trained, so no OOV). Shapes:
    * one token explode (linear), one map-side-combined frequency
    * aggregate, one token-keyed join (AQE broadcasts the vocab when it
    * fits), one per-doc aggregate. The mean is the one double-summed
    * term (order-dependent at the last ulp); round(·,6) sits ~6 orders
    * above ulp noise at ≤1e6-token docs — the jacCol discipline. */
  def textLogprob(s: SparkSession, d: String): DataFrame = {
    val toks = docs(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("token"))
    val freq = toks.groupBy("token").agg(count(lit(1)).as("tf"))
    val total = freq.agg(sum(col("tf")).cast("double").as("total"))
    toks.join(freq, "token")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("tf").cast("double") / col("total"))), 6).as("mean_logprob"))
      .orderBy("doc_id")
  }

  val textLogprobSql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      |  FROM documents),
      |f AS (SELECT token, count(*) AS tf FROM t GROUP BY token),
      |tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS total FROM f)
      |SELECT doc_id, count(*) AS n_tokens,
      |  round(avg(ln(CAST(tf AS DOUBLE) / total)), 6) AS mean_logprob
      |FROM t JOIN f USING (token), tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** #120 text_tfidf: top-3 TF-IDF terms per document — the keyword-
    * extraction primitive (the classic curation/labeling signal next to
    * the unigram LM score). Shapes: ONE token explode feeds both grains
    * (per-doc tf and corpus df), the df side joins back token-keyed
    * (AQE broadcasts the vocab when it fits), the per-doc top-3 is a
    * row_number window over the doc partition — never a global sort.
    * Ranking compares the ROUNDED score (6 dp) with the token as
    * tiebreak, so the cross-engine rank can't flip on last-ulp ln()
    * differences between the JVM and libm (the round-before-rank
    * discipline; ties at equal rounded score break lexically). */
  def textTfidf(s: SparkSession, d: String): DataFrame = {
    val toks = docs(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = toks.select("doc_id", "token").distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs(s, d).agg(count(lit(1)).cast("double").as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("tfidf"), col("token"))
    tf.join(df, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf").cast("double") * log(col("n_docs") / col("df")), 6))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("doc_id"), col("token"), col("tfidf"))
      .orderBy(col("doc_id"), desc("tfidf"), col("token"))
  }

  val textTfidfSql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY doc_id, token),
      |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM t GROUP BY token),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
      |s AS (
      |  SELECT doc_id, token,
      |    round(CAST(tf AS DOUBLE) * ln(n_docs / df), 6) AS tfidf
      |  FROM tf JOIN df USING (token), n),
      |r AS (
      |  SELECT doc_id, token, tfidf,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rk
      |  FROM s)
      |SELECT doc_id, token, tfidf FROM r WHERE rk <= 3
      |ORDER BY doc_id, tfidf DESC, token""".stripMargin

  /** #123 text_bm25: Okapi BM25 keyword retrieval — the SPARSE half of
    * hybrid search (fused with the dense side in hybrid_rrf; Bm25 doc for
    * the 100 TB shapes: term-filtered postings scan, one-row stats
    * broadcast, TakeOrdered top-K). Fixed 4-term query over the corpus
    * vocab; hash-checked against the DuckDB twin computing the identical
    * doubles (round-before-rank, doc_id tiebreak). */
  def textBm25(s: SparkSession, d: String): DataFrame =
    graft.text.Bm25.topK(docs(s, d), graft.text.Bm25.DefaultTerms, 20)

  val textBm25Sql: String = graft.text.Bm25.oracleSql(graft.text.Bm25.DefaultTerms, 20)

  /** Corpus length profile: exact quartiles/p95 of document length plus
    * totals — the distribution snapshot a curation run reports before and
    * after filtering. Spark's exact `percentile` and DuckDB's
    * `quantile_cont` share linear interpolation, so the compare is exact
    * at 6 dp. One aggregate; at 100 TB swap in percentile_approx (a
    * mergeable sketch) and declare the op rows-only. */
  def textStats(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(length(col("text")).as("len"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("len")).cast("long").as("total_chars"),
        round(expr("percentile(len, 0.25)"), 6).as("p25"),
        round(expr("percentile(len, 0.5)"), 6).as("p50"),
        round(expr("percentile(len, 0.75)"), 6).as("p75"),
        round(expr("percentile(len, 0.95)"), 6).as("p95"))

  val textStatsSql: String =
    """SELECT count(*) AS n_docs,
      |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
      |  round(quantile_cont(length(text), 0.25), 6) AS p25,
      |  round(quantile_cont(length(text), 0.5), 6) AS p50,
      |  round(quantile_cont(length(text), 0.75), 6) AS p75,
      |  round(quantile_cont(length(text), 0.95), 6) AS p95
      |FROM documents""".stripMargin

  /** #56 PII/URL/number scrub + per-row match counts, over the raw event
    * payloads (the log→training-corpus cleaning pass; the documents table
    * is pure a-z text, so events.props is where maskable content lives —
    * non-vacuous masking on every row). The URL/email arms are exercised
    * by TextSpec on constructed rows. */
  def textScrub(s: SparkSession, d: String): DataFrame =
    TextAnalysis.withScrub(Tables.events(s, d), "event_id", "props")
      .orderBy("event_id")

  val textScrubSql: String = {
    val (u, e, n) = (TextAnalysis.UrlPattern, TextAnalysis.EmailPattern, TextAnalysis.NumPattern)
    s"""SELECT event_id,
       |  regexp_replace(regexp_replace(regexp_replace(props,
       |    '$u', '<URL>', 'g'), '$e', '<EMAIL>', 'g'), '$n', '<NUM>', 'g') AS scrubbed,
       |  len(regexp_extract_all(props, '$u')) AS n_urls,
       |  len(regexp_extract_all(props, '$e')) AS n_emails,
       |  len(regexp_extract_all(props, '$n')) AS n_nums
       |FROM events ORDER BY event_id""".stripMargin
  }

  /** #57 Gopher-style repetition signals per doc. */
  def textRepetition(s: SparkSession, d: String): DataFrame =
    TextAnalysis.withRepetition(docs(s, d)).orderBy("doc_id")

  val textRepetitionSql: String =
    """WITH s AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)
      |SELECT doc_id,
      |  round(1.0 - len(list_distinct(t)) / CAST(len(t) AS DOUBLE), 6) AS dup_token_frac,
      |  round(CASE WHEN len(t) >= 2 THEN
      |      1.0 - len(list_distinct([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]))
      |          / CAST(len(t) - 1 AS DOUBLE)
      |    ELSE 0.0 END, 6) AS dup_bigram_frac,
      |  round(list_max(list_apply(list_distinct(t), x -> len(list_filter(t, y -> y = x))))
      |        / CAST(len(t) AS DOUBLE), 6) AS top_token_frac
      |FROM s ORDER BY doc_id""".stripMargin

  /** Duplicated 13-gram span mass per doc (Lee et al. 2021 exact-substring
    * detection shape — TextAnalysis.withDupSpans doc). The registered plan
    * is the HASHED-key one (8-byte shuffle keys + Bloom flag-back,
    * result-identical by construction — the decontaminate_bloom
    * discipline); the oracle SQL below literally computes the string-keyed
    * twin, so the hash check pins the identity per run. Long/double casts
    * chosen so both engines emit identical types. */
  def textDupSpans(s: SparkSession, d: String): DataFrame =
    TextAnalysis.withDupSpans(docs(s, d)).orderBy("doc_id")

  val textDupSpansSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |grams AS (
      |  SELECT doc_id, array_to_string(t[i:i+12], ' ') AS gram
      |  FROM toks, unnest(generate_series(1, len(t) - 12)) AS u(i)
      |),
      |dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) > 1),
      |perdoc AS (SELECT doc_id, count(*) AS dup_grams
      |           FROM grams JOIN dup USING (gram) GROUP BY doc_id)
      |SELECT toks.doc_id,
      |  CAST(greatest(len(t) - 12, 0) AS BIGINT) AS n_grams,
      |  CAST(coalesce(perdoc.dup_grams, 0) AS BIGINT) AS dup_grams,
      |  CASE WHEN len(t) - 12 > 0
      |       THEN round(coalesce(perdoc.dup_grams, 0) / (len(t) - 12.0), 6)
      |       ELSE 0.0 END AS dup_frac
      |FROM toks LEFT JOIN perdoc USING (doc_id)
      |ORDER BY toks.doc_id""".stripMargin

  /** #152 text_dedup_spans: the REMOVAL half of exact-substring dedup
    * (Lee et al. 2021; TextAnalysis.withDedupSpans doc) — every token
    * covered by a non-canonical duplicated 13-gram window is deleted,
    * canonical = first occurrence by (doc_id, position). Full hash-pass:
    * the selection rule is deterministic integer/string logic, so the
    * DuckDB twin computes the identical cleaned text. */
  def textDedupSpans(s: SparkSession, d: String): DataFrame =
    TextAnalysis.withDedupSpans(docs(s, d)).orderBy("doc_id")

  val textDedupSpansSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |pos AS (
      |  SELECT doc_id, i, array_to_string(t[i:i+12], ' ') AS g
      |  FROM toks, unnest(generate_series(1, len(t) - 12)) AS u(i)
      |),
      |marked AS (
      |  SELECT doc_id, i,
      |    count(*) OVER (PARTITION BY g) AS c,
      |    row_number() OVER (PARTITION BY g ORDER BY doc_id, i) AS rn
      |  FROM pos),
      |del AS (
      |  SELECT DISTINCT doc_id, j
      |  FROM marked, unnest(generate_series(i, i + 12)) AS v(j)
      |  WHERE c > 1 AND rn >= 2),
      |tokpos AS (
      |  SELECT doc_id, j, t[j] AS tok
      |  FROM toks, unnest(generate_series(1, len(t))) AS s(j)),
      |kept AS (
      |  SELECT tp.doc_id, count(*) AS kept_n,
      |         string_agg(tp.tok, ' ' ORDER BY tp.j) AS clean
      |  FROM tokpos tp ANTI JOIN del d ON tp.doc_id = d.doc_id AND tp.j = d.j
      |  GROUP BY tp.doc_id)
      |SELECT toks.doc_id,
      |  CAST(len(t) AS BIGINT) AS n_tokens,
      |  CAST(len(t) - coalesce(kept.kept_n, 0) AS BIGINT) AS n_removed,
      |  coalesce(kept.clean, '') AS text_clean
      |FROM toks LEFT JOIN kept USING (doc_id)
      |ORDER BY toks.doc_id""".stripMargin

  /** #58 per-(source, lang) curation report: doc counts, char volume and
    * mean quality — the breakdown a curation run publishes per slice.
    * Quality sums go through DECIMAL so both engines divide the same
    * exact sum (double summation order would wobble the 6th dp). */
  def corpusReport(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    val q = TextAnalysis.withQuality(dd).select(col("doc_id"), col("quality_score"))
    dd.join(q, "doc_id")
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("total_chars"),
        round(sum(length(col("text"))).cast("double") / count(lit(1)), 6).as("mean_chars"),
        round(sum(col("quality_score").cast("decimal(18,6)")).cast("double") / count(lit(1)), 6)
          .as("mean_quality"))
      .orderBy("source", "lang")
  }

  val corpusReportSql: String =
    s"""WITH q AS ($textQualityBodySql)
       |SELECT d.source, d.lang,
       |  count(*) AS n_docs,
       |  CAST(sum(length(d.text)) AS BIGINT) AS total_chars,
       |  round(CAST(sum(length(d.text)) AS DOUBLE) / count(*), 6) AS mean_chars,
       |  round(CAST(sum(CAST(q.quality_score AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_quality
       |FROM documents d JOIN q ON d.doc_id = q.doc_id
       |GROUP BY d.source, d.lang
       |ORDER BY d.source, d.lang""".stripMargin

  /** #98 document chunking: split every doc into fixed-width token
    * windows with overlap — the standard pre-training chunker (context-
    * window packing feeds on these). Width 64 / stride 48 (16-token
    * overlap); every token is covered; short docs yield one whole-doc
    * chunk. Pure row-local array math (transform over a sequence +
    * posexplode) — scan-speed at any scale, output rows ≈ tokens/stride.
    * The chunk loop is a codegen'd higher-order function, NOT a UDF, and
    * there is no shuffle: each doc's chunks are emitted where the doc is
    * read. */
  val ChunkWidth = 64
  val ChunkStride = 48

  /** The chunk projection itself — stateless and shuffle-free, so the
    * SAME plan runs unchanged on a stream (StreamingSpec twin). Input
    * needs (doc_id, text). */
  def chunked(docs: DataFrame): DataFrame = {
    val (w, st) = (ChunkWidth, ChunkStride)
    val chunks = expr(
      s"""transform(sequence(0, greatest(1, cast(ceil((size(split(text, ' ')) - ${w - st}) / $st.0) as int)) - 1),
         |  i -> struct(
         |    array_join(slice(split(text, ' '), i * $st + 1, $w), ' ') AS chunk_text,
         |    least($w, size(split(text, ' ')) - i * $st) AS chunk_tokens))""".stripMargin)
    docs
      .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_id", "ch")))
      .select(col("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
        col("ch.chunk_tokens").cast("long").as("chunk_tokens"),
        col("ch.chunk_text"))
  }

  def textChunks(s: SparkSession, d: String): DataFrame =
    chunked(Tables.documents(s, d)).orderBy("doc_id", "chunk_id")

  val textChunksSql: String = {
    val (w, st) = (ChunkWidth, ChunkStride)
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
       |c AS (SELECT doc_id, len(s) AS n,
       |        greatest(1, CAST(ceil((len(s) - ${w - st}) / $st.0) AS BIGINT)) AS nc, s
       |      FROM t),
       |x AS (SELECT doc_id,
       |        unnest([{'chunk_id': i - 1,
       |                 'chunk_tokens': least($w, n - (i - 1) * $st),
       |                 'chunk_text': list_aggregate(s[(i - 1) * $st + 1 : (i - 1) * $st + $w], 'string_agg', ' ')}
       |                FOR i IN range(1, nc + 1)]) AS ch
       |      FROM c)
       |SELECT doc_id, CAST(ch.chunk_id AS INT) AS chunk_id,
       |  CAST(ch.chunk_tokens AS BIGINT) AS chunk_tokens, ch.chunk_text
       |FROM x ORDER BY doc_id, chunk_id""".stripMargin
  }

  /** #108 text_embed: distributed document encoding — the artifacts.py
    * build_embeddings step (text → sentence embedding per doc) through
    * MiniLm.embedTable: weights broadcast once, one encoder per
    * partition, forward pass per row. A deterministic 1-in-10 doc_id
    * sample keeps the transformer cost out of bench's critical path while
    * still crossing partitions; output is the per-doc embedding summary
    * (dim + 6dp norm — unit by construction). Rows-only: no SQL oracle
    * can run a transformer; per-row distributed-vs-driver parity is
    * spec-pinned (MiniLmSpec), and the tiny model's weights are seeded so
    * rows are identical across JVMs. */
  def textEmbed(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, pmod, lit, size, round}
    val sample = Tables.documents(s, d).where(pmod(col("doc_id"), lit(10)) === 0)
    graft.encode.MiniLm.embedTable(sample, "text", "doc_id",
        graft.encode.MiniLm.seededTiny(), maxLen = 64)
      .select(col("doc_id"), size(col("embedding")).as("d"),
        round(graft.functions.VectorFunctions.l2Norm(col("embedding")), 6).as("norm"))
      .orderBy("doc_id")
  }

  /** #155 text_bpe_train: BPE tokenizer training (Sennrich et al. 2016 —
    * the vocabulary-learning step of every GPT/BERT-family pipeline) via
    * the word-histogram bridge: ONE distributed word count capped
    * deterministically, merge loop on the compact histogram driver-side
    * (the HuggingFace-tokenizers shape — see graft.text.Bpe). Output is
    * the merge table artifact (rank, left, right, freq). Rows-only: the
    * merge loop is inherently iterative (each merge rewrites the symbol
    * sequences the next merge counts), not SQL-expressible; determinism
    * + classic-corpus goldens + histogram parity are spec-pinned
    * (BpeSpec). */
  val BpeMerges = 200
  val BpeMaxWords = 50000

  def textBpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.text.Bpe.trainedFor(s, d, BpeMerges, BpeMaxWords)
      .map(m => (m.rank, m.left, m.right, m.freq))
      .toDF("rank", "left", "right", "freq")
      .orderBy("rank")
  }

  /** #156 text_bpe_encode: tokenize the corpus with the learned merges —
    * ranks broadcast once (KBs), greedy lowest-rank merge applied
    * row-locally with a per-partition distinct-word memo; scan-only, no
    * shuffle (the token-counting step a 100 TB run prices its batches
    * with). Per-doc whitespace vs BPE token counts + fertility
    * (bpe_per_word). Rows-only: encoding needs the iterative merge
    * order; encode goldens + distributed-vs-driver parity spec-pinned
    * (BpeSpec). */
  def textBpeEncode(s: SparkSession, d: String): DataFrame = {
    val merges = graft.text.Bpe.trainedFor(s, d, BpeMerges, BpeMaxWords)
    graft.text.Bpe.encodeDocs(Tables.documents(s, d), merges)
      .orderBy("doc_id")
  }

  /** #168 text_phrase: exact PHRASE search — the proximity half of the IR
    * family next to text_bm25's bag-of-words ranking: per (phrase, doc),
    * the number of positions where the full consecutive token sequence
    * matches. Shape: ONE corpus scan, ZERO shuffle — each doc's token
    * array is tested row-locally with codegen'd higher-order functions
    * (`filter` over a position `sequence`), all phrases emitted from one
    * `explode(array(struct…))` so the scan is never repeated per phrase
    * (a per-phrase union would re-read the corpus |phrases| times). The
    * known-phrase case needs no postings index — a scan IS the right
    * 100 TB plan; the postings-join shape lives in text_bm25. Guarded
    * `when(size ≥ k)` because Spark's `sequence(1, 0)` counts DOWN.
    * Oracle generated from the same phrase list (one source of truth). */
  val DefaultPhrases: Seq[String] =
    Seq("table hash", "merge group", "stream table hash")

  /** Test seam: the exact phrase-count column the query uses (TextSpec). */
  private[graft] def phraseCountForTest(s: Column, terms: Seq[String]): Column =
    phraseCount(s, terms)

  private def phraseCount(s: Column, terms: Seq[String]): Column = {
    val k = terms.length
    val hits = filter(
      sequence(lit(1), size(s) - (k - 1)),
      i => terms.zipWithIndex.map { case (t, j) =>
        element_at(s, (i + j).cast("int")) === t
      }.reduce(_ && _))
    when(size(s) >= k, size(hits)).otherwise(0).cast("long")
  }

  def textPhrase(s: SparkSession, d: String): DataFrame = {
    val lowered = lower(col("text"))
    val toks = split(lowered, " ")
    val perPhrase = DefaultPhrases.map { p =>
      // codegen'd substring prefilter in front of the interpreted
      // higher-order count: Spark HOFs (filter/transform) don't join
      // whole-stage codegen, so evaluating phraseCount on every doc costs
      // ~interpreted-eval × positions (measured 7.3 s at sf0.1). A
      // consecutive token sequence IS a substring of the space-joined
      // text, so contains() is a sound superset gate ("stable hash" ⊇
      // "table hash" false-positives are killed by the exact count) and
      // CaseWhen's lazy branches keep the HOF off the non-matching docs.
      struct(lit(p).as("phrase"),
        when(lowered.contains(p), phraseCount(toks, p.split(" ").toSeq))
          .otherwise(lit(0L)).as("n_matches"))
    }
    Tables.documents(s, d)
      .select(col("doc_id"), explode(array(perPhrase: _*)).as("m"))
      .select(col("m.phrase").as("phrase"), col("doc_id"),
        col("m.n_matches").as("n_matches"))
      .where(col("n_matches") > 0)
      .orderBy("phrase", "doc_id")
  }

  val textPhraseSql: String = {
    val branches = DefaultPhrases.map { p =>
      val terms = p.split(" ")
      val k = terms.length
      val cond = terms.zipWithIndex
        .map { case (t, j) => s"s[i + $j] = '$t'" }.mkString(" AND ")
      s"""SELECT '$p' AS phrase, doc_id,
         |  CAST(len(list_filter(range(1, len(s) - ${k - 2}), i -> $cond)) AS BIGINT) AS n_matches
         |FROM t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH t AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS s FROM documents),
       |m AS (
       |$branches)
       |SELECT phrase, doc_id, n_matches FROM m WHERE n_matches > 0
       |ORDER BY phrase, doc_id""".stripMargin
  }

  /** #164 corpus_quality_probe: the TRAINED quality/domain linear probe
    * (QualityProbe doc — normal-equations ridge fit in two scans, zero
    * shuffle; GPT-3's trained-filter slot next to the heuristic
    * text_quality). Target class here = the corpus's `lang='en'` slice,
    * mirroring corpus_dsir's target. Rows-only: the Cholesky solve is
    * linear algebra no SQL oracle replicates; distributed==driver
    * parity, AUC separation, determinism and totality are spec-pinned
    * (TextSpec). */
  def corpusQualityProbe(s: SparkSession, d: String): DataFrame =
    graft.text.QualityProbe
      .trainAndScore(Tables.documents(s, d), col("lang") === "en")
      .orderBy("doc_id")

  /** #171 text_unigram_train: the unigram-LM (SentencePiece) tokenizer
    * trainer next to BPE (graft.text.Unigram doc — seed → Viterbi-EM →
    * prune on the SAME capped word-histogram bridge). Output: the
    * (piece, logprob, count) vocabulary artifact, ordered by
    * (count DESC, piece ASC). Rows-only (iterative EM); goldens,
    * coverage, Viterbi optimality, determinism spec-pinned
    * (UnigramSpec). */
  val UnigramTarget = 400

  def textUnigramTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.text.Unigram.train(Tables.documents(s, d), UnigramTarget, BpeMaxWords)
      .map(p => (p.piece, p.logprob, p.count))
      .toDF("piece", "logprob", "count")
  }

  /** #174 text_collocations: PMI-scored bigram collocation mining — the
    * corpus statistic behind phrase vocabularies ("new york"-style merges
    * for tokenizer seeding) and MWE detection. Bigram extraction is
    * ROW-LOCAL (a `transform` over the token array pairs each token with
    * its successor — no posexplode + per-doc window sort), so the only
    * shuffles are the two vocab-bounded count aggregates; corpus totals
    * ride a broadcast 1-row crossJoin, and the unigram re-joins key on
    * the vocabulary (bounded, not corpus-sized). PMI = ln(c_xy·Nu²
    * / (Nb·c_x·c_y)) computed with the identical association order in
    * both engines, rounded 6 dp before the rank; min support 5, top-100
    * by (pmi desc, w1, w2) via TakeOrdered — never a global sort. */
  def textCollocations(s: SparkSession, d: String): DataFrame =
    textCollocationsOf(docs(s, d))

  def textCollocationsOf(documents: DataFrame): DataFrame = {
    val toks = documents.select(split(lower(col("text")), " ").as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    // codegen'd bigram strings (r21): the struct-building transform lambda
    // was CodegenFallback (textNoveltyOf doc); tokens are space-split so
    // substring_index recovers w1/w2 exactly
    val bi = documents.select(explode(graft.functions.VectorFunctions
        .tokenGrams(col("text"), 2, lower = true)).as("bg"))
      .select(substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
    val nu = uni.agg(sum(col("cw")).cast("double").as("nu"))
    val nb = bi.agg(sum(col("n")).cast("double").as("nb"))
    bi.where(col("n") >= 5)
      .join(uni.select(col("w").as("w1"), col("cw").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("cw").as("c2")), "w2")
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .withColumn("pmi", round(
        log((col("n") * col("nu") * col("nu")) /
          (col("nb") * col("c1") * col("c2"))), 6))
      .select(col("w1"), col("w2"), col("n"), col("pmi"))
      .orderBy(desc("pmi"), col("w1"), col("w2")).limit(100)
  }

  val textCollocationsSql: String =
    """WITH tk AS (SELECT string_split(lower(text), ' ') AS toks FROM documents),
      |uc AS (SELECT w, count(*) AS cw
      |       FROM (SELECT unnest(toks) AS w FROM tk) GROUP BY w),
      |bc AS (SELECT w1, w2, count(*) AS n FROM (
      |         SELECT toks[i + 1] AS w1, toks[i + 2] AS w2
      |         FROM (SELECT toks, unnest(range(len(toks) - 1)) AS i
      |               FROM tk WHERE len(toks) >= 2))
      |       GROUP BY w1, w2),
      |nu AS (SELECT CAST(sum(cw) AS DOUBLE) AS nu FROM uc),
      |nb AS (SELECT CAST(sum(n) AS DOUBLE) AS nb FROM bc)
      |SELECT bc.w1, bc.w2, bc.n,
      |  round(ln((bc.n * nu.nu * nu.nu) / (nb.nb * c1.cw * c2.cw)), 6) AS pmi
      |FROM bc
      |JOIN uc c1 ON bc.w1 = c1.w
      |JOIN uc c2 ON bc.w2 = c2.w
      |CROSS JOIN nu CROSS JOIN nb
      |WHERE bc.n >= 5
      |ORDER BY pmi DESC, w1, w2 LIMIT 100""".stripMargin

  /** #176 text_winnowing: winnowing fingerprint selection (Schleimer,
    * Wilkerson & Aiken, SIGMOD'03 — the MOSS algorithm): hash every
    * k-gram (k=8 chars, the same 31-polynomial mod 2^32 as
    * text_fingerprint), slide a w=4 window over the hash sequence, and
    * keep the window minimum (rightmost on ties — the robust-winnowing
    * rule), deduplicated. Guarantees a shared substring of length
    * k+w-1 = 11 yields a shared fingerprint, with ~2/(w+1) density —
    * the local-selection upgrade over text_fingerprint's one-hash-per-doc
    * and the standard prefilter for plagiarism/overlap mining. The whole
    * selection is ROW-LOCAL (nested Catalyst HOFs over the char array);
    * the only non-scan work is the output ordering. The DuckDB twin
    * replays the identical arithmetic with list lambdas, so selection is
    * hash-checked end to end. */
  def textWinnowing(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.graft.WinnowFingerprints
    docs(s, d)
      .select(col("doc_id"), explode(GraftBridge.column(
        WinnowFingerprints(GraftBridge.expression(col("text")), 8, 4))).as("packed"))
      .select(col("doc_id"),
        expr("packed div 4294967296").as("pos"),
        expr("packed % 4294967296").as("fp"))
      .orderBy("doc_id", "pos")
  }

  val textWinnowingSql: String =
    """WITH cs AS (
      |  SELECT doc_id,
      |    list_transform(string_split(text, ''), ch -> CAST(ascii(ch) AS BIGINT)) AS c
      |  FROM documents),
      |hs AS (
      |  SELECT doc_id,
      |    list_transform(range(len(c) - 7), i ->
      |      list_reduce([CAST(0 AS BIGINT)] || c[i + 1:i + 8],
      |                  (h, x) -> (h * 31 + x) % 4294967296)) AS h
      |  FROM cs WHERE len(c) >= 8),
      |wj AS (
      |  SELECT doc_id, h, unnest(range(len(h) - 3)) AS j
      |  FROM hs WHERE len(h) >= 4),
      |p AS (
      |  SELECT doc_id, h,
      |    list_max(list_transform(range(4), o ->
      |      CASE WHEN h[CAST(j + o + 1 AS INT)] = list_min(h[j + 1:j + 4])
      |           THEN j + o ELSE -1 END)) AS pos
      |  FROM wj)
      |SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos,
      |  h[CAST(pos + 1 AS INT)] AS fp
      |FROM p ORDER BY doc_id, pos""".stripMargin

  /** #178 text_perplexity: bigram-LM score per document — text_logprob's
    * (#116) conditional upgrade and the self-trained stand-in for the
    * KenLM perplexity filter every web-scale curation run applies
    * (CCNet's quality signal): score each doc by the mean ln of add-1-
    * smoothed transition probabilities P(w2|w1) = (c12+1)/(c1+V) under
    * the corpus's OWN bigram counts, plus ppl = exp(−mean). Repetitive
    * machine text scores high-probability; incoherent token soup scores
    * low — complementary failure modes to the unigram score. Shapes:
    * row-local bigram extraction (the #174 transform), one bigram-count
    * aggregate (vocab²-bounded), one (w1,w2)-keyed join back (the BM25
    * postings discipline — AQE broadcasts when the count table fits),
    * one per-doc aggregate. Mean is double-summed (round(·,6) sits ~6
    * orders above ulp noise — the text_logprob discipline); ppl is
    * exp of the ROUNDED mean (round-before-branch) so both engines
    * derive it from the identical double. */
  def textPerplexity(s: SparkSession, d: String): DataFrame =
    textPerplexityOf(docs(s, d))

  def textPerplexityOf(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
    // codegen'd bigram strings (textCollocationsOf doc)
    val bi = documents.select(col("doc_id"),
        explode(graft.functions.VectorFunctions
          .tokenGrams(col("text"), 2, lower = true)).as("bg"))
      .select(col("doc_id"),
        substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
    val bc = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).cast("double").as("v"))
    bi.join(bc, Seq("w1", "w2"))
      .join(uni.select(col("w").as("w1"), col("c1")), "w1")
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log((col("c12") + 1).cast("double") / (col("c1") + col("v")))), 6)
          .as("mean_logprob"))
      .withColumn("ppl", round(exp(-col("mean_logprob")), 6))
      .orderBy("doc_id")
  }

  /** The shared bigram-LM perplexity CTE chain for the DuckDB twins
    * (#178 text_perplexity, #210 corpus_ccnet_buckets — the cdcChunksCte
    * discipline: one replay definition, two consumers). Ends with
    * ppl(doc_id, n_bigrams, mean_logprob, ppl). */
  private[queries] val perplexityCte: String =
    """tk AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |bi AS (SELECT doc_id, toks[i + 1] AS w1, toks[i + 2] AS w2
      |       FROM (SELECT doc_id, toks, unnest(range(len(toks) - 1)) AS i
      |             FROM tk WHERE len(toks) >= 2)),
      |bc AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
      |uni AS (SELECT w, count(*) AS c1
      |        FROM (SELECT unnest(toks) AS w FROM tk) GROUP BY w),
      |vc AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
      |sc AS (
      |  SELECT bi.doc_id,
      |    ln(CAST(bc.c12 + 1 AS DOUBLE) / (uni.c1 + vc.v)) AS lp
      |  FROM bi
      |  JOIN bc ON bi.w1 = bc.w1 AND bi.w2 = bc.w2
      |  JOIN uni ON bi.w1 = uni.w
      |  CROSS JOIN vc),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 6) AS mean_logprob
      |  FROM sc GROUP BY doc_id),
      |ppl AS (
      |  SELECT doc_id, n_bigrams, mean_logprob,
      |    round(exp(-mean_logprob), 6) AS ppl FROM agg)""".stripMargin

  val textPerplexitySql: String =
    s"""WITH $perplexityCte
       |SELECT doc_id, n_bigrams, mean_logprob, ppl
       |FROM ppl ORDER BY doc_id""".stripMargin




  /** #180 text_entropy: per-document codepoint-distribution Shannon
    * entropy (nats) + the bits/char form — the compression-ratio quality
    * signal (base64 blobs ≈ ln|alphabet|, repeated padding ≈ 0, natural
    * text between) completing the quality family next to #27/#116/#178.
    * ONE native codegen expression per row (TextExpressions.scala): the
    * explode-per-char + groupBy formulation would shuffle one row PER
    * CHARACTER — the shuffle would be the corpus itself; here the
    * histogram lives in a per-row map, zero shuffle, scan-speed at any
    * scale. Native sums in codepoint order; the oracle's GROUP BY sum
    * differs only at ulp, absorbed by round(·,6) (the text_logprob
    * discipline). */
  def textEntropy(s: SparkSession, d: String): DataFrame =
    textEntropyOf(docs(s, d))

  def textEntropyOf(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.graft.CharEntropy
    documents.where(length(col("text")) > 0)
      .select(col("doc_id"),
        round(GraftBridge.column(CharEntropy(GraftBridge.expression(col("text")))), 6)
          .as("entropy"))
      .withColumn("bits_per_char", round(col("entropy") / lit(math.log(2.0)), 6))
      .orderBy("doc_id")
  }

  val textEntropySql: String =
    s"""WITH ch AS (
       |  SELECT doc_id, unnest(string_split(text, '')) AS c
       |  FROM documents WHERE len(text) > 0),
       |hist AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2),
       |n AS (SELECT doc_id, len(text) AS n FROM documents WHERE len(text) > 0),
       |e AS (
       |  SELECT h.doc_id,
       |    round(-sum((CAST(h.k AS DOUBLE) / n.n) * ln(CAST(h.k AS DOUBLE) / n.n)), 6) AS entropy
       |  FROM hist h JOIN n ON h.doc_id = n.doc_id GROUP BY h.doc_id)
       |SELECT doc_id, entropy,
       |  round(entropy / CAST(${math.log(2.0)} AS DOUBLE), 6) AS bits_per_char
       |FROM e ORDER BY doc_id""".stripMargin

  /** #184 text_langid_eval: classifier evaluation readout — per-class
    * precision / recall / F1 of the language-ID heuristic (#28) against
    * the corpus's labeled `lang` column: the evaluation harness every
    * model-derived curation signal needs before it gates a corpus (the
    * recall-eval idea of #18 applied to a classifier). Plan: the langid
    * projection joins truth on doc_id (one corpus-sized equi-join), then
    * EVERYTHING is class-bounded — a |classes|² confusion aggregate,
    * truth- and prediction-grain rollups of it, one full-outer join so
    * classes seen only in truth or only in prediction both surface.
    * Metrics: zero denominators → NULL in both engines; F1 from the
    * ROUNDED precision/recall (round-before-branch). */
  def textLangidEval(s: SparkSession, d: String): DataFrame =
    textLangidEvalOf(docs(s, d))

  def textLangidEvalOf(documents: DataFrame): DataFrame = {
    val joined = TextAnalysis.withLangId(documents)
      .select(col("doc_id"), col("lang_pred"))
      .join(documents.select(col("doc_id"), col("lang")), "doc_id")
    val conf = joined.groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
    val truth = conf.groupBy("lang")
      .agg(sum(col("n")).as("support"),
        sum(when(col("lang") === col("lang_pred"), col("n")).otherwise(0L)).as("tp"))
    val predicted = conf.groupBy(col("lang_pred"))
      .agg(sum(col("n")).as("predicted"))
    truth.join(predicted, col("lang") === col("lang_pred"), "full_outer")
      .select(coalesce(col("lang"), col("lang_pred")).as("cls"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("predicted"), lit(0L)).as("predicted"))
      .withColumn("precision", when(col("predicted") === 0, lit(null).cast("double"))
        .otherwise(round(col("tp").cast("double") / col("predicted"), 6)))
      .withColumn("recall", when(col("support") === 0, lit(null).cast("double"))
        .otherwise(round(col("tp").cast("double") / col("support"), 6)))
      .withColumn("f1", when(col("precision").isNull || col("recall").isNull ||
          col("precision") + col("recall") === 0.0, lit(null).cast("double"))
        .otherwise(round(lit(2.0) * col("precision") * col("recall") /
          (col("precision") + col("recall")), 6)))
      .orderBy("cls")
  }

  val textLangidEvalSql: String =
    s"""WITH pred AS ($textLangidBodySql),
       |j AS (
       |  SELECT p.doc_id, p.lang_pred, d.lang
       |  FROM pred p JOIN documents d ON p.doc_id = d.doc_id),
       |conf AS (SELECT lang, lang_pred, count(*) AS n FROM j GROUP BY 1, 2),
       |truth AS (
       |  SELECT lang,
       |    CAST(sum(n) AS BIGINT) AS support,
       |    CAST(sum(CASE WHEN lang = lang_pred THEN n ELSE 0 END) AS BIGINT) AS tp
       |  FROM conf GROUP BY lang),
       |pr AS (
       |  SELECT lang_pred, CAST(sum(n) AS BIGINT) AS predicted
       |  FROM conf GROUP BY lang_pred),
       |m AS (
       |  SELECT coalesce(t.lang, p.lang_pred) AS cls,
       |    coalesce(t.support, 0) AS support, coalesce(t.tp, 0) AS tp,
       |    coalesce(p.predicted, 0) AS predicted
       |  FROM truth t FULL OUTER JOIN pr p ON t.lang = p.lang_pred),
       |pm AS (
       |  SELECT cls, support, tp, predicted,
       |    CASE WHEN predicted = 0 THEN NULL
       |         ELSE round(CAST(tp AS DOUBLE) / predicted, 6) END AS precision,
       |    CASE WHEN support = 0 THEN NULL
       |         ELSE round(CAST(tp AS DOUBLE) / support, 6) END AS recall
       |  FROM m)
       |SELECT cls, support, tp, predicted, precision, recall,
       |  CASE WHEN precision IS NULL OR recall IS NULL
       |            OR precision + recall = 0.0 THEN NULL
       |       ELSE round(CAST(2 AS DOUBLE) * precision * recall / (precision + recall), 6)
       |  END AS f1
       |FROM pm ORDER BY cls""".stripMargin

  /** #191 text_readability: Flesch Reading Ease per document — the
    * classic readability signal (206.835 − 1.015·words/sentences −
    * 84.6·syllables/word) with the standard corpus-scale proxies:
    * sentences = runs of [.!?] (floored at 1), syllables = vowel-group
    * count (the rule-based approximation every readability library uses
    * when no dictionary is available). Complements the quality family
    * (#27 surface ratios, #180 entropy, #178 perplexity) with the one
    * signal teachers of the genre actually quote. Scan-only row-local
    * regex counting (patterns valid in BOTH Java regex and RE2 — the
    * scrub discipline), zero shuffle; ratios computed double with the
    * identical association order, 6 dp. */
  def textReadability(s: SparkSession, d: String): DataFrame =
    textReadabilityOf(docs(s, d))

  def textReadabilityOf(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        size(split(lower(col("text")), " ")).cast("long").as("n_words"),
        greatest(size(expr("regexp_extract_all(text, '[.!?]+', 0)")), lit(1))
          .cast("long").as("n_sentences"),
        size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
          .cast("long").as("n_syllables"))
      .where(col("n_words") > 0)
      .withColumn("fre", round(
        lit(206.835) -
          lit(1.015) * (col("n_words").cast("double") / col("n_sentences")) -
          lit(84.6) * (col("n_syllables").cast("double") / col("n_words")), 6))
      .orderBy("doc_id")

  val textReadabilitySql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_words,
      |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
      |  FROM documents)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |  round(CAST(206.835 AS DOUBLE)
      |    - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE) / n_sentences)
      |    - CAST(84.6 AS DOUBLE) * (CAST(n_syllables AS DOUBLE) / n_words), 6) AS fre
      |FROM f WHERE n_words > 0 ORDER BY doc_id""".stripMargin

  /** #200 corpus_scorecard: the per-document curation FEATURE VECTOR —
    * every row-local quality signal joined into one row per doc (token
    * count, composite quality score, predicted language, codepoint
    * entropy, Flesch reading ease): the sheet a labeling UI or a
    * downstream filter model actually consumes, and the composition
    * proof that the signal family shares one doc_id grain. Each
    * component is a scan-only pipeline; Catalyst plans the joins on the
    * common key (broadcast/shuffle per AQE) and the oracle recomputes
    * every signal from scratch in one WITH chain — the whole feature
    * vector is hash-checked per document. */
  def corpusScorecard(s: SparkSession, d: String): DataFrame =
    corpusScorecardOf(docs(s, d))

  def corpusScorecardOf(documents: DataFrame): DataFrame = {
    val q = TextAnalysis.withQuality(documents)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val l = TextAnalysis.withLangId(documents)
      .select(col("doc_id"), col("lang_pred"))
    val e = textEntropyOf(documents).select(col("doc_id"), col("entropy"))
    val r = textReadabilityOf(documents).select(col("doc_id"), col("fre"))
    q.join(l, "doc_id").join(e, "doc_id").join(r, "doc_id")
      .orderBy("doc_id")
  }

  val corpusScorecardSql: String =
    s"""WITH q AS (${textQualityBodySql}),
       |l AS (${textLangidBodySql}),
       |ech AS (
       |  SELECT doc_id, unnest(string_split(text, '')) AS c
       |  FROM documents WHERE len(text) > 0),
       |ehist AS (SELECT doc_id, c, count(*) AS k FROM ech GROUP BY 1, 2),
       |en AS (SELECT doc_id, len(text) AS n FROM documents WHERE len(text) > 0),
       |e AS (
       |  SELECT h.doc_id,
       |    round(-sum((CAST(h.k AS DOUBLE) / en.n) * ln(CAST(h.k AS DOUBLE) / en.n)), 6) AS entropy
       |  FROM ehist h JOIN en ON h.doc_id = en.doc_id GROUP BY h.doc_id),
       |r AS (
       |  SELECT doc_id,
       |    round(CAST(206.835 AS DOUBLE)
       |      - CAST(1.015 AS DOUBLE) * (CAST(len(string_split(lower(text), ' ')) AS DOUBLE)
       |          / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
       |      - CAST(84.6 AS DOUBLE) * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
       |          / len(string_split(lower(text), ' '))), 6) AS fre
       |  FROM documents WHERE len(string_split(lower(text), ' ')) > 0)
       |SELECT q.doc_id, q.n_tokens, q.quality_score, l.lang_pred, e.entropy, r.fre
       |FROM q
       |JOIN l ON q.doc_id = l.doc_id
       |JOIN e ON q.doc_id = e.doc_id
       |JOIN r ON q.doc_id = r.doc_id
       |ORDER BY q.doc_id""".stripMargin


  /** #206 text_zipf: the rank-frequency (Zipf) readout of the corpus
    * vocabulary — the one-glance sanity check that a crawl slice has a
    * natural-language token distribution (a flat curve means boilerplate
    * or spam; a cliff means template text). Scale shape: one token
    * explode, one map-side-combined frequency aggregate, top-200 via
    * TakeOrdered (per-partition heaps, no global sort); the rank and
    * cumulative-share window then runs over the BOUNDED 200-row survivor
    * set only (the Fusion bounded-window discipline). Integer
    * frequencies and one rounded division keep it engine-exact. */
  def textZipf(s: SparkSession, d: String): DataFrame =
    textZipfOf(docs(s, d))

  def textZipfOf(documents: DataFrame): DataFrame = {
    val toks = documents.select(explode(split(lower(col("text")), " ")).as("token"))
    val total = toks.agg(count(lit(1)).as("__t"))
    val top = toks.groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("token")).limit(200)
    val w = graft.operators.BoundedWindow.keyed(col("token")).orderBy(desc("freq"), col("token"))
    top.crossJoin(broadcast(total))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("__cum",
        sum(col("freq")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rnk"), col("token"), col("freq"),
        round(col("__cum").cast("double") / col("__t"), 6).as("cum_share"))
      .orderBy("rnk")
  }

  val textZipfSql: String =
    """WITH t AS (
      |  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents),
      |top AS (
      |  SELECT token, count(*) AS freq FROM t GROUP BY 1
      |  ORDER BY freq DESC, token LIMIT 200),
      |tot AS (SELECT count(*) AS n FROM t)
      |SELECT CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rnk,
      |  token, freq,
      |  round(CAST(sum(freq) OVER (ORDER BY freq DESC, token
      |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / n, 6) AS cum_share
      |FROM top, tot ORDER BY rnk""".stripMargin


  /** #212 text_heaps: vocabulary-growth health per source — token count,
    * type count, hapax legomena (freq-1 types), hapax share and
    * type/token ratio: the Heaps'-law readout that separates natural
    * prose (hapax share ~0.4-0.6) from template/boilerplate slices
    * (tiny TTR) and random noise (TTR ~1). Shapes: one token explode,
    * one (source, token) aggregate (map-side combined), one bounded
    * per-source rollup. Integer counts, two rounded divisions. */
  def textHeaps(s: SparkSession, d: String): DataFrame =
    textHeapsOf(docs(s, d))

  def textHeapsOf(documents: DataFrame): DataFrame =
    documents
      .select(col("source"), explode(split(lower(col("text")), " ")).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("tf"))
      .groupBy("source")
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("tf") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("hapax_share",
        round(col("n_hapax").cast("double") / col("n_types"), 6))
      .withColumn("type_token_ratio",
        round(col("n_types").cast("double") / col("n_tokens"), 6))
      .orderBy("source")

  val textHeapsSql: String =
    """WITH t AS (
      |  SELECT source, unnest(string_split(lower(text), ' ')) AS token
      |  FROM documents),
      |tf AS (SELECT source, token, count(*) AS tf FROM t GROUP BY 1, 2)
      |SELECT source,
      |  CAST(sum(tf) AS BIGINT) AS n_tokens,
      |  count(*) AS n_types,
      |  CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  round(CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS hapax_share,
      |  round(CAST(count(*) AS DOUBLE) / sum(tf), 6) AS type_token_ratio
      |FROM tf GROUP BY source ORDER BY source""".stripMargin


  /** #215 text_cdc_chunks: content-defined chunking — the rsync/LBFS/
    * casync boundary rule re-expressed engine-portably: a position is a
    * chunk boundary iff the md5 of the TRAILING 16-char window opens
    * below 0x04 (p = 4/256, mean chunk ~64 chars). Because boundaries
    * depend only on LOCAL content, an insertion early in a document
    * shifts every fixed-size shingle but leaves all later CDC chunks
    * (and their hashes) IDENTICAL — the property that makes chunk-hash
    * dedup robust where offset-based shingles break. Entirely row-local
    * (one HOF filter over positions + one explode): zero shuffle, scan
    * cost O(chars × window). No min/max clamps — clamps reintroduce a
    * sequential cut dependency; the raw rule keeps every position
    * independent, which is exactly what makes it replayable as a plain
    * list expression in BOTH engines (full hash-pass). */
  def textCdcChunks(s: SparkSession, d: String): DataFrame =
    textCdcChunksOf(docs(s, d))

  def textCdcChunksOf(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val cuts = GraftBridge.column(org.apache.spark.sql.graft.CdcBoundaries(
      GraftBridge.expression(col("text"))))
    documents
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("bigint").as("n"))
      .withColumn("bs", concat(array(lit(1L)), cuts, array(col("n") + 1)))
      .select(col("doc_id"), col("text"), col("bs"),
        explode(expr("sequence(0L, size(bs) - 2)")).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        expr("element_at(bs, CAST(chunk_idx AS INT) + 1)").as("start_pos"),
        expr("element_at(bs, CAST(chunk_idx AS INT) + 2) - element_at(bs, CAST(chunk_idx AS INT) + 1)").as("chunk_len"),
        expr("md5(substring(text, CAST(element_at(bs, CAST(chunk_idx AS INT) + 1) AS INT), CAST(element_at(bs, CAST(chunk_idx AS INT) + 2) - element_at(bs, CAST(chunk_idx AS INT) + 1) AS INT)))").as("chunk_md5"))
      .where(col("chunk_len") > 0)
      .orderBy("doc_id", "chunk_idx")
  }

  /** The shared CDC chunk CTE for the DuckDB twins (#215/#216). */
  private[queries] val cdcChunksCte: String =
    """b AS (SELECT doc_id, text, len(text) AS n FROM documents),
      |cuts AS (
      |  SELECT doc_id, text, n,
      |    list_filter(range(16, n + 1),
      |      i -> CAST(('0x' || substr(md5(substr(text, CAST(i - 15 AS INT), 16)), 1, 2)) AS BIGINT) < 4) AS cs
      |  FROM b),
      |bounds AS (
      |  SELECT doc_id, text, n,
      |    list_prepend(CAST(1 AS BIGINT), list_append(cs, CAST(n + 1 AS BIGINT))) AS bs
      |  FROM cuts),
      |ch AS (
      |  SELECT doc_id, i AS chunk_idx, bs[i + 1] AS start_pos,
      |    bs[i + 2] - bs[i + 1] AS chunk_len,
      |    md5(substr(text, CAST(bs[i + 1] AS INT), CAST(bs[i + 2] - bs[i + 1] AS INT))) AS chunk_md5
      |  FROM bounds, unnest(range(len(bs) - 1)) AS t(i))""".stripMargin

  val textCdcChunksSql: String =
    s"""WITH $cdcChunksCte
       |SELECT doc_id, chunk_idx, start_pos, chunk_len, chunk_md5
       |FROM ch WHERE chunk_len > 0 ORDER BY doc_id, chunk_idx""".stripMargin


  /** #227 text_novelty: per-document 8-gram novelty — the share of a
    * doc's distinct shingles whose FIRST corpus occurrence (min doc_id)
    * is this document: the curriculum/freshness signal that separates
    * novel contributions from recombinations of already-seen text (a
    * near-dup scores ~0 without any pair mining). Shapes: one shingle
    * explode to (gram, doc) DISTINCT grain, one min-doc_id aggregate on
    * the gram key (map-side combined), one gram-keyed join back, one
    * per-doc rollup — the decontaminate machinery pointed at the corpus
    * itself. Exact integer counts, one rounded division. */
  def textNovelty(s: SparkSession, d: String): DataFrame =
    textNoveltyOf(docs(s, d))

  def textNoveltyOf(documents: DataFrame): DataFrame = {
    // codegen'd gram strings (r21): the transform+slice lambda was
    // CodegenFallback and broke the scan stage's codegen; tokenGrams
    // emits the identical ' '-joined 8-token windows (empty when < 8
    // tokens — the old CASE guard is built in)
    val grams = documents
      .select(col("doc_id"),
        explode(graft.functions.VectorFunctions
          .tokenGrams(col("text"), 8, lower = true)).as("gram"))
      .distinct()
    val firstSeen = grams.groupBy(col("gram")).agg(min(col("doc_id")).as("first_doc"))
    grams.join(firstSeen, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", round(col("n_novel").cast("double") / col("n_grams"), 6))
      .orderBy("doc_id")
  }

  val textNoveltySql: String =
    """WITH g AS (
      |  SELECT DISTINCT doc_id, gram FROM (
      |    SELECT doc_id,
      |      array_to_string(toks[i:i+7], ' ') AS gram
      |    FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |      unnest(range(1, greatest(1, len(toks) - 6))) AS t(i))),
      |fs AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1)
      |SELECT g.doc_id, count(*) AS n_grams,
      |  CAST(sum(CASE WHEN fs.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  round(CAST(sum(CASE WHEN fs.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS novelty
      |FROM g JOIN fs ON g.gram = fs.gram
      |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin


  /** #230 text_script: per-document character-class profile — Latin
    * letters, CJK, digits, whitespace, other — the script-mix signal a
    * multilingual curation pass cuts on (a "lang=en" doc that is 40%
    * CJK is mislabeled; a 30%-digit doc is a table dump). Counts via
    * the length-minus-regexp_replace trick (one scan, zero shuffle, no
    * per-char explode); the SAME character classes are rendered in both
    * engines' regexes, shares rounded 6 dp. */
  def textScript(s: SparkSession, d: String): DataFrame =
    textScriptOf(docs(s, d))

  def textScriptOf(documents: DataFrame): DataFrame = {
    def cnt(re: String) =
      (length(col("text")) - length(regexp_replace(col("text"), re, ""))).cast("long")
    documents
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        cnt("[A-Za-z]").as("n_latin"),
        cnt("[\\u4e00-\\u9fff\\u3040-\\u30ff]").as("n_cjk"),
        cnt("[0-9]").as("n_digit"),
        cnt("[ ]").as("n_space"))
      .where(col("n_chars") > 0)
      .withColumn("latin_share", round(col("n_latin").cast("double") / col("n_chars"), 6))
      .withColumn("cjk_share", round(col("n_cjk").cast("double") / col("n_chars"), 6))
      .orderBy("doc_id")
  }

  val textScriptSql: String =
    """SELECT doc_id, length(text) AS n_chars,
      |  length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_latin,
      |  length(text) - length(regexp_replace(text, '[\u4e00-\u9fff\u3040-\u30ff]', '', 'g')) AS n_cjk,
      |  length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
      |  length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS n_space,
      |  round(CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
      |    / length(text), 6) AS latin_share,
      |  round(CAST(length(text) - length(regexp_replace(text, '[\u4e00-\u9fff\u3040-\u30ff]', '', 'g')) AS DOUBLE)
      |    / length(text), 6) AS cjk_share
      |FROM documents WHERE length(text) > 0 ORDER BY doc_id""".stripMargin

  /** #267 text_fertility: the TOKENIZER-FERTILITY audit — BPE-ish tokens
    * per whitespace word and chars per BPE token, by language. Fertility
    * is the number labs track per language before fixing a tokenizer
    * (high fertility = the vocabulary fragments that language, inflating
    * its effective cost per document); chars/token is the compression
    * ratio that converts corpus bytes to training-token budgets. Exact
    * integer sums (the #26 token-count ingredients) with one double
    * division per output cell; ONE scan, two row-local projections, a
    * ≤|langs| map-side-combined rollup — scan-speed at any scale. */
  def textFertility(s: SparkSession, d: String): DataFrame = {
    val t = TextAnalysis.withTokenCounts(docs(s, d))
    docs(s, d).select(col("doc_id"), col("lang"), col("n_chars"))
      .join(t, "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_ws_tokens")).as("ws_tokens"),
        sum(col("n_bpe_tokens")).as("bpe_tokens"),
        sum(col("n_chars")).as("chars"))
      .select(col("lang"), col("n_docs"), col("ws_tokens"), col("bpe_tokens"),
        round(col("bpe_tokens").cast("double") / col("ws_tokens"), 6).as("fertility"),
        round(col("chars").cast("double") / col("bpe_tokens"), 6).as("chars_per_bpe"))
      .orderBy("lang")
  }

  val textFertilitySql: String =
    s"""WITH t AS (
       |  SELECT lang, n_chars,
       |    len(string_split(text, ' ')) AS ws,
       |    len(regexp_extract_all(text, '${TextAnalysis.BpePattern}')) AS bpe
       |  FROM documents)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(ws) AS BIGINT) AS ws_tokens,
       |  CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
       |  round(CAST(sum(bpe) AS DOUBLE) / sum(ws), 6) AS fertility,
       |  round(CAST(sum(n_chars) AS DOUBLE) / sum(bpe), 6) AS chars_per_bpe
       |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_fertility" -> (textFertility _),
    "text_script" -> (textScript _),
    "text_novelty" -> (textNovelty _),
    "text_cdc_chunks" -> (textCdcChunks _),
    "text_heaps" -> (textHeaps _),
    "text_zipf" -> (textZipf _),
    "corpus_scorecard" -> (corpusScorecard _),
    "text_readability" -> (textReadability _),
    "text_langid_eval" -> (textLangidEval _),
    "text_entropy" -> (textEntropy _),
    "text_perplexity" -> (textPerplexity _),
    "text_winnowing" -> (textWinnowing _),
    "text_collocations" -> (textCollocations _),
    "corpus_quality_probe" -> (corpusQualityProbe _),
    "text_phrase" -> (textPhrase _),
    "text_unigram_train" -> (textUnigramTrain _),
    "text_bpe_train" -> (textBpeTrain _),
    "text_bpe_encode" -> (textBpeEncode _),
    "text_embed" -> (textEmbed _),
    "text_chunks" -> (textChunks _),
    "text_stats" -> (textStats _),
    "text_tokens" -> (textTokens _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    "text_fingerprint" -> (textFingerprint _),
    "text_vocab" -> (textVocab _),
    "text_logprob" -> (textLogprob _),
    "text_bm25" -> (textBm25 _),
    "text_tfidf" -> (textTfidf _),
    "text_scrub" -> (textScrub _),
    "text_repetition" -> (textRepetition _),
    "text_dup_spans" -> (textDupSpans _),
    "text_dedup_spans" -> (textDedupSpans _),
    "corpus_report" -> (corpusReport _)
  )

  val oracles: Map[String, String] = Map(
    "text_fertility" -> textFertilitySql,
    "text_script" -> textScriptSql,
    "text_novelty" -> textNoveltySql,
    "text_cdc_chunks" -> textCdcChunksSql,
    "text_heaps" -> textHeapsSql,
    "text_zipf" -> textZipfSql,
    "corpus_scorecard" -> corpusScorecardSql,
    "text_readability" -> textReadabilitySql,
    "text_langid_eval" -> textLangidEvalSql,
    "text_entropy" -> textEntropySql,
    "text_perplexity" -> textPerplexitySql,
    "text_winnowing" -> textWinnowingSql,
    "text_collocations" -> textCollocationsSql,
    "text_phrase" -> textPhraseSql,
    "text_chunks" -> textChunksSql,
    "text_stats" -> textStatsSql,
    "text_tokens" -> textTokensSql,
    "text_quality" -> textQualitySql,
    "text_langid" -> textLangidSql,
    "text_fingerprint" -> textFingerprintSql,
    "text_vocab" -> textVocabSql,
    "text_logprob" -> textLogprobSql,
    "text_bm25" -> textBm25Sql,
    "text_tfidf" -> textTfidfSql,
    "text_scrub" -> textScrubSql,
    "text_repetition" -> textRepetitionSql,
    "text_dup_spans" -> textDupSpansSql,
    "text_dedup_spans" -> textDedupSpansSql,
    "corpus_report" -> corpusReportSql
  )
}
