package graft.queries

import graft.Tables
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats" -> (textStats _),
    "text_tokens" -> (textTokens _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    "text_fingerprint" -> (textFingerprint _),
    "text_vocab" -> (textVocab _)
  )

  val oracles: Map[String, String] = Map(
    "text_stats" -> textStatsSql,
    "text_tokens" -> textTokensSql,
    "text_quality" -> textQualitySql,
    "text_langid" -> textLangidSql,
    "text_fingerprint" -> textFingerprintSql,
    "text_vocab" -> textVocabSql
  )
}
