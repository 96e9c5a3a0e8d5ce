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

  /** The composite quality score as ONE row-local Column — shared by the
    * batch table (withQuality) and the streaming curation gate, so the
    * two can never drift. */
  def qualityScore(text: Column): Column = {
    val t = toks(text)
    val nTok = size(t).cast("double")
    val stopHits = size(filter(t, x => x.isin(Stopwords: _*))).cast("double")
    val alpha = length(regexp_replace(text, "[^a-z]", "")).cast("double")
    val len = length(text).cast("double")
    val sLen = least(lit(1.0), nTok / 100.0)
    val sStop = least(lit(1.0), (stopHits / nTok) * 10.0)
    round(sLen * 0.4 + sStop * 0.3 + (alpha / len) * 0.3, 6)
  }

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
    docs.select(
      col("doc_id"),
      len.cast("long").as("len_chars"),
      nTok.cast("long").as("n_tokens"),
      round((len - nTok + 1.0) / nTok, 6).as("avg_token_len"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(alphaRatio, 6).as("alpha_ratio"),
      qualityScore(col("text")).as("quality_score"))
  }

  /** Per-language marker words (classic stopword-hit language ID). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "es" -> Seq("el", "la", "que", "de", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  /** The predicted language as ONE row-local Column (same sharing logic
    * as qualityScore). foldRight makes the FIRST matching language win
    * ties (priority order). */
  def langPred(text: Column): Column = {
    val t = toks(text)
    val nTok = size(t).cast("double")
    val scores = LangMarkers.map { case (lang, ws) =>
      lang -> (size(filter(t, x => x.isin(ws: _*))).cast("double") / nTok)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s === best && best > 0.0, lit(lang)).otherwise(els)
    }
  }

  /** #28 language ID: marker-hit density per language, argmax with a fixed
    * priority order tiebreak; no hits at all → "und". */
  def withLangId(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t).cast("double")
    val scores = LangMarkers.map { case (lang, ws) =>
      lang -> (size(filter(t, x => x.isin(ws: _*))).cast("double") / nTok)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    docs.select(
      col("doc_id"),
      langPred(col("text")).as("lang_pred"),
      round(best, 6).as("lang_score"))
  }

  /** #56 scrubbing patterns — deliberately simple expressions valid in
    * BOTH Java regex and RE2 (DuckDB), so the oracle masks identically.
    * Order matters: URLs and emails are masked BEFORE digit runs (both
    * contain digits that must not be double-masked). */
  val UrlPattern = "https?://[^ ]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val NumPattern = "[0-9]+"

  /** #56 PII/URL scrub: the cleaning pass every training pipeline ships —
    * mask URLs, emails and digit runs with typed placeholders and report
    * per-row match counts (the counts feed quality gates; a doc that is
    * mostly URLs is boilerplate, a payload dense in digit runs carries
    * identifiers). Works over any (id, text) pair — documents, raw event
    * payloads, log lines. Row-local regexp projections: scan speed, no
    * shuffle, pushdown intact. */
  def withScrub(df: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, UrlPattern, "<URL>"),
          EmailPattern, "<EMAIL>"),
        NumPattern, "<NUM>").as("scrubbed"),
      size(regexp_extract_all(t, lit(UrlPattern), lit(0))).as("n_urls"),
      size(regexp_extract_all(t, lit(EmailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(t, lit(NumPattern), lit(0))).as("n_nums"))
  }

  /** #57 repetition signals (the Gopher-rule family): duplicate-token
    * fraction, duplicate-bigram fraction, and the top token's share of
    * the doc. High values flag boilerplate/spam for the quality gate.
    * Row-local array math (the per-doc token count bounds the O(u·n)
    * top-token scan); zero shuffle. */
  def withRepetition(docs: DataFrame): DataFrame = {
    // codegen'd signals (r21): the old bigram/top-token lambdas were
    // CodegenFallback, and the top-token one scanned O(distinct · tokens)
    // — TokenSetSize(·, n) counts the same distinct n-shingles and
    // TopTokenCount the same max multiplicity in one compiled pass each
    val f = graft.functions.VectorFunctions
    val nTok = size(split(lower(col("text")), " ")).cast("double")
    docs.select(
      col("doc_id"),
      round(lit(1.0) - f.tokenSetSize(col("text"), 1) / nTok, 6)
        .as("dup_token_frac"),
      round(when(nTok >= 2,
        lit(1.0) - f.tokenSetSize(col("text"), 2) / (nTok - 1))
        .otherwise(0.0), 6).as("dup_bigram_frac"),
      round(f.topTokenCount(col("text")) / nTok, 6).as("top_token_frac"))
  }

  /** #29 document fingerprint: polynomial rolling hash over the raw chars,
    * h ← (h·31 + code(c)) mod 2³², the classic Rabin–Karp shape. Kept in
    * Long arithmetic (31·2³² < 2⁶³) so both engines compute exactly. */
  def withFingerprint(docs: DataFrame): DataFrame =
    // codegen'd rolling hash (r21): the per-character aggregate lambda
    // was CodegenFallback; rollingFp computes the identical
    // (h·31 + codepoint) mod 2³² fold (RollingFingerprint doc)
    docs.select(
      col("doc_id"),
      graft.functions.VectorFunctions.rollingFp(col("text")).as("fp"))

  /** Duplicated-span mass per document: the fraction of each doc's token
    * n-gram positions whose n-gram occurs more than once ANYWHERE in the
    * corpus (within the same doc or across docs) — the detection half of
    * exact-substring deduplication (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better", which dedups 50-BPE-token
    * spans; n=13 whitespace tokens is the common MinHash-era shingle width
    * and what this corpus' token density supports). Reference twin: the
    * repo's near-dup miners flag whole documents; this flags the SPAN
    * mass inside otherwise-unique documents — the memorization signal.
    *
    * Plan shape, and why it holds at 100 TB (the DEFAULT, hashed-key
    * plan — the decontaminate_bloom discipline, result-identical to the
    * string-keyed twin by construction):
    *  - n-gram generation is a row-local codegen HOF (sequence→transform→
    *    slice→array_join) — no shuffle, scan speed;
    *  - the full-volume duplicated-gram aggregate keys on
    *    `xxhash64(gram)` — the ONLY corpus-sized shuffle carries 8-byte
    *    keys instead of ~80+-byte 13-token strings (map-side partials
    *    don't help here: grams are near-unique, so key WIDTH is the
    *    volume), `count > 1` survivors only;
    *  - the flag-back is a driver-built Bloom sketch of the duplicated
    *    hashes probed by the codegen'd BloomMightContainLong INSIDE the
    *    scan stage — row-local, no join shuffle of gram strings;
    *  - an exact string recount over the surviving sliver eats BOTH the
    *    Bloom false positives and 64-bit hash collisions: every position
    *    of a gram survives together (same gram ⇒ same hash ⇒ same probe),
    *    so the survivor-set count of each surviving gram IS its corpus
    *    count, and a truly-duplicated gram always survives (its hash
    *    count ≥ 2 ⇒ in the sketch) — no false negatives, identical
    *    output;
    *  - the per-doc rollup re-aggregates on doc_id. Nothing is ever
    *    materialized per PAIR of occurrences (a gram seen k times costs
    *    k rows, not k² — degenerate grams cannot blow up the join).
    * [[withDupSpansStringKeyed]] is the oracle twin (the plan DuckDB's
    * SQL computes literally); DupSpansSpec pins row-for-row equality. */
  def withDupSpans(docs: DataFrame, n: Int = 13): DataFrame =
    dupSpans(docs, n, hashedKeys = true)

  /** The string-keyed twin of [[withDupSpans]]: aggregate and flag-back
    * both carry the gram STRING — the literal shape of the DuckDB oracle
    * SQL. Kept for the result-identity spec; the hashed plan is the
    * registered default. */
  def withDupSpansStringKeyed(docs: DataFrame, n: Int = 13): DataFrame =
    dupSpans(docs, n, hashedKeys = false)

  private def dupSpans(docs: DataFrame, n: Int, hashedKeys: Boolean): DataFrame = {
    val t = toks(col("text"))
    val perDoc =
      if (hashedKeys) {
        // Gram fingerprints WITHOUT gram strings: xxhash64 hashes the
        // token-array WINDOW directly (Spark's XxHash64 walks array
        // elements) — measured, the string plan's cost is dominated by
        // array_join BUILDING ~80-byte gram strings for every position,
        // not by the shuffle; this pass allocates no strings. Strings are
        // built post-filter for the dup sliver alone.
        // Spread (r21): the gram-hash projection is the scan stage's
        // dominant per-row cost and the driver testdata is one split —
        // without it the whole pass runs on one core (Spread doc; skipped
        // at scale where the input is already parallel).
        // gramHashes (r21): codegen'd window fingerprints — the previous
        // transform(sequence, i -> xxhash64(slice(t, i, n))) lambda is
        // CodegenFallback and dropped the whole scan→explode→aggregate
        // pipeline out of whole-stage codegen (~5× on the explode stage);
        // fingerprint VALUES may differ, output cannot (same gram ⇒ same
        // fingerprint; collisions/fps die in the string recount below,
        // and the hashed≡string-keyed spec pins it).
        val base = graft.operators.Spread(
          docs.select(col("doc_id"), col("text")), "doc_id")
          .select(col("doc_id"), t.as("t"),
            graft.functions.VectorFunctions.gramHashes(col("text"), n).as("ghs"))
        val posH = base.select(col("doc_id"), col("t"),
          posexplode(col("ghs")).as(Seq("i", "gh")))
        // stage 1: the corpus-sized shuffle, 8-byte keys only
        val dupH = posH.select("gh").groupBy("gh").agg(count(lit(1)).as("c"))
          .where(col("c") > 1).select("gh")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nDup = dupH.count()
        val bloom = dupH.stat.bloomFilter("gh", math.max(nDup, 1L), 0.01)
        val bos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(bos)
        val sketch = bos.toByteArray
        dupH.unpersist()
        // stage 2: row-local probe BEFORE any string exists; the gram
        // string materializes only for survivors (posexplode index i is
        // 0-based, slice is 1-based). The exact recount and the per-doc
        // rollup ride ONE pass: aggregate to the (gram, doc_id) grain
        // (map-side combine eats within-doc repetition — skew-safe),
        // attach each gram's corpus count as a window over that much
        // smaller grain, keep t > 1, sum per-doc position counts.
        // Exactness: same gram ⇒ same token window ⇒ same fingerprint, so
        // every position of a truly-duplicated gram survives together and
        // t IS its corpus count; fingerprint collisions and Bloom fps are
        // killed by the string-keyed grouping (t stays 1 for a unique
        // gram colliding with another).
        val surv = posH
          .where(graft.functions.VectorFunctions
            .bloomMightContainLong(col("gh"), sketch))
          .select(col("doc_id"),
            expr(s"array_join(slice(t, i + 1, $n), ' ')").as("gram"))
        val g = surv.groupBy("gram", "doc_id").agg(count(lit(1)).as("m"))
        val byGram = org.apache.spark.sql.expressions.Window.partitionBy("gram")
        g.withColumn("t", sum("m").over(byGram))
          .where(col("t") > 1)
          .groupBy("doc_id").agg(sum("m").cast("long").as("dup_grams"))
      } else {
        // empty-array guard: sequence(1, k) DESCENDS when k < 1, so short
        // docs must produce zero positions, not a descending range
        val grams = graft.operators.Spread(
          docs.select(col("doc_id"), col("text")), "doc_id").select(
          col("doc_id"),
          when(size(t) >= n,
            transform(sequence(lit(1), size(t) - n + 1),
              i => array_join(slice(t, i, lit(n)), " ")))
            .otherwise(array().cast("array<string>")).as("grams"))
        val pos = grams.select(col("doc_id"), explode(col("grams")).as("gram"))
        val dup = pos.groupBy("gram").agg(count(lit(1)).as("c"))
          .where(col("c") > 1).select("gram")
        pos.join(dup, Seq("gram"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("dup_grams"))
      }
    docs.select(col("doc_id"),
      greatest(size(t) - n + 1, lit(0)).cast("long").as("n_grams"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_grams"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"),
        when(col("n_grams") > 0,
          round(coalesce(col("dup_grams"), lit(0L)) / col("n_grams"), 6))
          .otherwise(lit(0.0)).as("dup_frac"))
  }

  /** The REMOVAL half of exact-substring deduplication (Lee et al. 2021
    * delete all-but-one occurrence of each duplicated span;
    * [[withDupSpans]] is the measurement half): every token covered by a
    * NON-CANONICAL duplicated n-gram window is deleted, where the
    * canonical occurrence of a gram is its first by (doc_id, position) —
    * a verbatim re-post keeps its first copy and loses the rest, a
    * within-doc self-repeat keeps its first span. Output per doc:
    * (doc_id, n_tokens, n_removed, text_clean).
    *
    * Plan: the [[withDupSpans]] fingerprint discipline end to end — the
    * volume pass aggregates xxhash64 window fingerprints (no strings),
    * a Bloom sketch of duplicated fingerprints probes inside the scan,
    * and only the surviving sliver carries gram strings, where ONE
    * gram-window pass attaches both the corpus count and the canonical
    * rank (collisions/fps die exactly as in withDupSpans: a unique gram
    * sharing a fingerprint keeps t = 1). The delete set explodes each
    * non-canonical window to its ≤ n covered positions (bounded by
    * dup-sliver × n), and reconstruction is one posexplode anti-join +
    * per-doc sorted re-join — token order restored by array_sort over
    * (position, token) structs, never a global sort. */
  def withDedupSpans(docs: DataFrame, n: Int = 13): DataFrame = {
    val t = toks(col("text"))
    // Spread (r21): same unsplittable-input fix as dupSpans — the hash
    // projection and the tokpos posexplode below otherwise run one-core
    val sdocs = graft.operators.Spread(
      docs.select(col("doc_id"), col("text")), "doc_id")
    // codegen'd window fingerprints (dupSpans doc: the transform lambda
    // was CodegenFallback and poisoned the volume pass's codegen)
    val base = sdocs.select(col("doc_id"), t.as("t"),
      graft.functions.VectorFunctions.gramHashes(col("text"), n).as("ghs"))
    val posH = base.select(col("doc_id"), col("t"),
      posexplode(col("ghs")).as(Seq("i", "gh")))
    val dupH = posH.select("gh").groupBy("gh").agg(count(lit(1)).as("c"))
      .where(col("c") > 1).select("gh")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDup = dupH.count()
    val bloom = dupH.stat.bloomFilter("gh", math.max(nDup, 1L), 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val sketch = bos.toByteArray
    dupH.unpersist()
    // survivors with 1-based window start; exact count + canonical rank
    // per STRING gram in one window pass
    val surv = posH
      .where(graft.functions.VectorFunctions
        .bloomMightContainLong(col("gh"), sketch))
      .select(col("doc_id"), (col("i") + 1).as("w"),
        expr(s"array_join(slice(t, i + 1, $n), ' ')").as("gram"))
    val byGram = org.apache.spark.sql.expressions.Window.partitionBy("gram")
    val byGramAll = byGram.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val nonCanon = surv
      .withColumn("cnt", count(lit(1)).over(byGramAll))
      .withColumn("rn", row_number().over(byGram.orderBy(col("doc_id"), col("w"))))
      .where(col("cnt") > 1 && col("rn") >= 2)
    // positions covered by any non-canonical duplicated window
    val del = nonCanon
      .select(col("doc_id"),
        explode(sequence(col("w"), col("w") + lit(n - 1))).as("j"))
      .distinct()
    // reconstruct: anti-join the delete set at token grain, re-join in
    // position order (1-based j matches the oracle's generate_series)
    val tokpos = sdocs.select(col("doc_id"), posexplode(t).as(Seq("p", "tok")))
      .select(col("doc_id"), (col("p") + 1).as("j"), col("tok"))
    val kept = tokpos.join(del, Seq("doc_id", "j"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("kept_n"),
        array_join(
          transform(array_sort(collect_list(struct(col("j"), col("tok")))),
            x => x.getField("tok")), " ").as("clean"))
    docs.select(col("doc_id"), size(t).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("kept_n"), lit(0L))).cast("long").as("n_removed"),
        coalesce(col("clean"), lit("")).as("text_clean"))
  }
}
