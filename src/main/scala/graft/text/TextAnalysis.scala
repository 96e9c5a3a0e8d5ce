package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators (LLM-pipeline extension; SURVEY.md §2 #26–29).
  *
  * All pure `functions._` column pipelines — no UDFs, fully codegen'd,
  * no shuffle at all (row-local transforms): at 100 TB these run at scan
  * speed with predicate/column pruning intact. Every formula is chosen to
  * be expressible identically in ANSI SQL so the DuckDB oracle computes
  * the same doubles.
  */
object TextAnalysis {

  /** Whitespace tokens (not deduplicated — counting semantics). */
  private def toks(c: Column): Column = split(c, " ")

  /** BPE-ish segmentation: runs of lowercase alphanumerics, or a single
    * non-alphanumeric non-space character. */
  val BpePattern = "[a-z0-9]+|[^a-z0-9 ]"

  /** #26 token counting: whitespace tokens + BPE-ish regex pieces. */
  def withTokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(toks(col("text"))).as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).as("n_bpe_tokens"))

  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to")

  /** #27 quality features: length, token stats, stopword/alpha ratios and
    * a bounded composite score — the usual cheap pre-training heuristics
    * (length / stopword-density / alphabetic-fraction). */
  def withQuality(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t).cast("double")
    val stopHits = size(filter(t, x => x.isin(Stopwords: _*))).cast("double")
    val alpha = length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
    val len = length(col("text")).cast("double")
    val stopRatio = stopHits / nTok
    val alphaRatio = alpha / len
    val sLen = least(lit(1.0), nTok / 100.0)
    val sStop = least(lit(1.0), stopRatio * 10.0)
    docs.select(
      col("doc_id"),
      len.cast("long").as("len_chars"),
      nTok.cast("long").as("n_tokens"),
      round((len - nTok + 1.0) / nTok, 6).as("avg_token_len"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(alphaRatio, 6).as("alpha_ratio"),
      round(sLen * 0.4 + sStop * 0.3 + alphaRatio * 0.3, 6).as("quality_score"))
  }

  /** Per-language marker words (classic stopword-hit language ID). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "es" -> Seq("el", "la", "que", "de", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  /** #28 language ID: marker-hit density per language, argmax with a fixed
    * priority order tiebreak; no hits at all → "und". */
  def withLangId(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t).cast("double")
    val scores = LangMarkers.map { case (lang, ws) =>
      lang -> (size(filter(t, x => x.isin(ws: _*))).cast("double") / nTok)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pred = scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s === best && best > 0.0, lit(lang)).otherwise(els)
    }
    // foldRight makes the FIRST matching language win ties (priority order)
    docs.select(
      col("doc_id"),
      pred.as("lang_pred"),
      round(best, 6).as("lang_score"))
  }

  /** #29 document fingerprint: polynomial rolling hash over the raw chars,
    * h ← (h·31 + code(c)) mod 2³², the classic Rabin–Karp shape. Kept in
    * Long arithmetic (31·2³² < 2⁶³) so both engines compute exactly. */
  def withFingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      aggregate(
        split(col("text"), ""),
        lit(0L),
        (h, c) => pmod(h * 31 + ascii(c), lit(4294967296L))).as("fp"))
}
