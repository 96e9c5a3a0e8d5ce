package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Okapi BM25 keyword retrieval over a document table — the SPARSE half of
  * industry hybrid search (dense vectors + keyword scores fused per query;
  * the reference's hybrid is vector+metadata-filter, this adds the
  * vector+lexical axis the same user population expects; fusion lives in
  * graft.search.Fusion).
  *
  * Scale shapes (the 100 TB contract):
  *   - The token explode is FILTERED to the query's terms BEFORE any
  *     shuffle: the corpus scan emits only matching postings, so shuffle
  *     volume is O(matching postings), never O(total tokens). This is the
  *     inverted-index probe expressed as a scan — on a real cluster the
  *     same plan runs against a pre-materialized postings table
  *     (token-bucketed) and the filter becomes partition pruning.
  *   - Corpus stats (N, avgdl) are ONE aggregate-only pass (column-pruned
  *     to the text length) joined back as a one-row broadcast — the
  *     repo's decorrelated-scalar idiom, never a driver collect in the
  *     plan.
  *   - df joins back term-keyed: at most |query terms| rows, always
  *     broadcast.
  *   - Per-doc score is a sum over ≤ |terms| rows; top-K is an orderBy +
  *     limit → TakeOrderedAndProject, never a global sort.
  *
  * Formula (Lucene's non-negative idf variant):
  *   idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   score(d)  = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  * with k1 = 1.2, b = 0.75.
  *
  * Tokenization is the corpus contract (whitespace split, matching
  * text_tokens/text_tfidf); real text swaps the splitter, nothing else
  * changes. The DuckDB oracle in TextQueries computes the identical
  * doubles with the round-before-rank discipline (6 dp, doc_id tiebreak).
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Per-(query, doc) BM25 for a BATCH of term queries — the batched
    * serving shape (one postings pass amortized over every query in the
    * batch, the knnJoin symmetry on the sparse side):
    * (qid, idCol, bm25 ROUNDED 6 dp, n_terms). Only (query, doc) pairs
    * matching ≥1 term appear. The (qid, token) mapping is broadcast;
    * corpus-grain work (tf, df, dl, stats) is computed ONCE regardless of
    * batch size — df per token over the tf table itself via a window
    * (O(matching postings) shuffle; a groupBy-and-join-back would re-run
    * the filtered explode, i.e. a second corpus scan at 100 TB). */
  def batchScores(docs: DataFrame, queryTerms: Seq[(Long, Seq[String])],
                  idCol: String = "doc_id", textCol: String = "text",
                  k1: Double = K1, b: Double = B): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.forall(_._2.nonEmpty),
      "bm25: every query needs at least one term")
    val spark = docs.sparkSession
    import spark.implicits._
    val allTerms = queryTerms.flatMap(_._2).distinct
    val qt = queryTerms.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("qid", "token")
    val toks = docs
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .select(col(idCol), size(col("toks")).cast("double").as("dl"),
        explode(col("toks")).as("token"))
      .where(col("token").isin(allTerms: _*)) // pushed below the shuffle
    // dl is constant per doc, so first() is deterministic here
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    val withDf = tf.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("token"))
        .cast("double"))
    val stats = docs
      .select(size(split(col(textCol), " ")).cast("double").as("ndl"))
      .agg(count(lit(1)).cast("double").as("n_docs"), avg(col("ndl")).as("avgdl"))
    withDf
      .join(broadcast(qt), "token")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w",
        col("idf") * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("qid"), col(idCol))
      .agg(round(sum(col("w")), 6).as("bm25"), count(lit(1)).as("n_terms"))
  }

  /** Per-doc BM25 of one term query: (idCol, bm25, n_terms) — the
    * single-query view of batchScores. */
  def scores(docs: DataFrame, terms: Seq[String], idCol: String = "doc_id",
             textCol: String = "text", k1: Double = K1, b: Double = B): DataFrame =
    batchScores(docs, Seq(0L -> terms), idCol, textCol, k1, b).drop("qid")

  /** Top-k docs by BM25, rounded-score rank with id tiebreak. */
  def topK(docs: DataFrame, terms: Seq[String], k: Int, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame =
    scores(docs, terms, idCol, textCol)
      .orderBy(desc("bm25"), col(idCol))
      .limit(k)

  /** The canonical demo query — terms from the synthetic corpus vocab,
    * shared by text_bm25 and the hybrid_rrf sparse side. */
  val DefaultTerms: Seq[String] = Seq("vector", "merge", "stream", "filter")

  /** DuckDB CTE chain computing the identical doubles as scores(); the
    * final CTE `bm` holds (doc_id, bm25 ROUNDED 6 dp, n_terms). Exposed as
    * a body (not a full statement) so composed oracles (hybrid_rrf) can
    * extend the chain. All literals are forced to DOUBLE before any lossy
    * op so DuckDB's DECIMAL literal arithmetic can't diverge from Spark's
    * all-double pipeline. */
  def oracleCtes(terms: Seq[String], from: String = "documents",
                 k1: Double = K1, b: Double = B): String = {
    // terms are rendered as SQL literals: constrain to the tokenizer's
    // own alphabet so a quoted term can't break the oracle statement
    require(terms.forall(_.matches("[A-Za-z0-9_-]+")),
      s"bm25 oracle: non-alphanumeric term in ${terms.mkString(",")}")
    val inList = terms.map(t => s"'$t'").mkString(",")
    s"""t AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |         unnest(string_split(text, ' ')) AS token
       |  FROM $from),
       |m AS (SELECT * FROM t WHERE token IN ($inList)),
       |tf AS (
       |  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf,
       |         CAST(min(dl) AS DOUBLE) AS dl
       |  FROM m GROUP BY doc_id, token),
       |df AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY token),
       |st AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |         avg(len(string_split(text, ' '))) AS avgdl
       |  FROM $from),
       |w AS (
       |  SELECT doc_id,
       |    ln(1 + (n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
       |      * tf * CAST(${k1 + 1.0} AS DOUBLE) /
       |      (tf + CAST($k1 AS DOUBLE) *
       |        (CAST(${1.0 - b} AS DOUBLE) + CAST($b AS DOUBLE) * dl / avgdl)) AS w
       |  FROM tf JOIN df USING (token), st),
       |bm AS (
       |  SELECT doc_id, round(sum(w), 6) AS bm25, count(*) AS n_terms
       |  FROM w GROUP BY doc_id)""".stripMargin
  }

  /** Full DuckDB twin of topK(). */
  def oracleSql(terms: Seq[String], k: Int, from: String = "documents"): String =
    s"""WITH ${oracleCtes(terms, from)}
       |SELECT doc_id, bm25, n_terms FROM bm
       |ORDER BY bm25 DESC, doc_id LIMIT $k""".stripMargin

  /** DuckDB twin of batchScores(): CTE chain ending in
    * `bm(qid, doc_id, bm25, n_terms)`. df is computed by grouping the tf
    * table — same values as the window formulation (tf rows are distinct
    * (doc, term)). */
  def batchOracleCtes(queryTerms: Seq[(Long, Seq[String])],
                      from: String = "documents",
                      k1: Double = K1, b: Double = B): String = {
    require(queryTerms.flatMap(_._2).forall(_.matches("[A-Za-z0-9_-]+")),
      "bm25 oracle: non-alphanumeric term")
    val allTerms = queryTerms.flatMap(_._2).distinct
    val inList = allTerms.map(t => s"'$t'").mkString(",")
    val qtValues = queryTerms
      .flatMap { case (q, ts) => ts.map(t => s"(CAST($q AS BIGINT), '$t')") }
      .mkString(",\n    ")
    s"""qt(qid, token) AS (VALUES
       |    $qtValues),
       |t AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |         unnest(string_split(text, ' ')) AS token
       |  FROM $from),
       |m AS (SELECT * FROM t WHERE token IN ($inList)),
       |tf AS (
       |  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf,
       |         CAST(min(dl) AS DOUBLE) AS dl
       |  FROM m GROUP BY doc_id, token),
       |df AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY token),
       |st AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |         avg(len(string_split(text, ' '))) AS avgdl
       |  FROM $from),
       |w AS (
       |  SELECT qt.qid, tf.doc_id,
       |    ln(1 + (n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
       |      * tf * CAST(${k1 + 1.0} AS DOUBLE) /
       |      (tf + CAST($k1 AS DOUBLE) *
       |        (CAST(${1.0 - b} AS DOUBLE) + CAST($b AS DOUBLE) * dl / avgdl)) AS w
       |  FROM tf JOIN df USING (token) JOIN qt USING (token), st),
       |bm AS (
       |  SELECT qid, doc_id, round(sum(w), 6) AS bm25, count(*) AS n_terms
       |  FROM w GROUP BY qid, doc_id)""".stripMargin
  }
}
