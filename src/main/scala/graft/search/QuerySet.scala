package graft.search

import graft.filters.FilterDsl
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's query-table-driven execution (artifacts/artifacts.py
  * writes queries.parquet with qid / qtext / filters JSON / K; the harness
  * in src/harness/run.py executes each row). The driver testdata ships no
  * query table, so the equivalent set is derived deterministically: seeded
  * query vectors + JSON filter specs, carried with the DuckDB predicate
  * twin so the whole batch is oracle-checkable.
  */
final case class HybridQuery(qid: Long, qvec: Array[Float], filters: String,
                             sqlWhere: String, k: Int, qtext: String = "")

object QuerySet {

  /** Six hybrid queries spanning the reference's filter ops over the
    * embeddings table (label is the only filterable metadata column).
    * Each carries a qtext (the reference's queries.parquet always has
    * one — run.py embeds it); the explicit qvec wins wherever both are
    * set (RunHarness resolution rule), so these vectors stay the
    * oracle-checked search inputs while the qtext feeds the encode-seam
    * paths (hybrid_qtext, the --queries CLI). */
  val default: Seq[HybridQuery] = Seq(
    HybridQuery(0, QueryVectors.qvec(0), "{}", "TRUE", 10,
      "best rated restaurant nearby"),
    HybridQuery(1, QueryVectors.qvec(1), """{"label":{"in":[0,1,2]}}""", "label IN (0,1,2)", 10,
      "affordable italian dinner with outdoor seating"),
    HybridQuery(2, QueryVectors.qvec(2), """{"label":{"ge":5}}""", "label >= 5", 5,
      "late night coffee and dessert"),
    HybridQuery(3, QueryVectors.qvec(3), """{"label":{"eq":7}}""", "label = 7", 5,
      "vegan friendly brunch spot"),
    HybridQuery(4, QueryVectors.qvec(4), """{"label":{"between":[2,6]}}""", "label BETWEEN 2 AND 6", 8,
      "family owned bakery fresh bread"),
    HybridQuery(5, QueryVectors.qvec(5), """{"label":{"ne":3}}""", "label IS NOT NULL AND label <> 3", 10,
      "quiet bookstore cafe with wifi"))

  /** Resolve each query's search vector through the encode seam — the
    * reference's run.py rule: an explicit qvec wins; else non-empty qtext
    * is encoded; else the caller's fallback (RunHarness uses the dataset
    * vector at qid). Returns queries whose qvec is always set. */
  def resolved(qs: Seq[HybridQuery], encoder: QueryEncoder): Seq[HybridQuery] =
    qs.map { hq =>
      if (hq.qvec.nonEmpty) hq
      else if (hq.qtext.nonEmpty) hq.copy(qvec = encoder.encode(hq.qtext))
      else throw new IllegalArgumentException(
        s"query ${hq.qid}: neither qvec nor qtext (dataset-vector fallback is a harness rule)")
    }

  /** Scored top-K of one hybrid query, pre_filter backend: DSL-compiled
    * predicate (pushed to the scan) → TakeOrdered top-K, qid attached. */
  private def topKFor(emb: DataFrame, hq: HybridQuery): DataFrame = {
    val spec = FilterDsl.parseJson(hq.filters)
    val pred = if (spec.isEmpty) None else Some(FilterDsl.compile(emb, spec))
    VectorSearch.topK(emb, hq.qvec, hq.k, pred).withColumn("qid", lit(hq.qid))
  }

  /** Execute one hybrid query, ranked. (With a single query the window's
    * qid partition key is one literal — a single-partition WindowExec over
    * ≤K rows, harmless at that size; batch callers go through runAll where
    * qid genuinely varies.) */
  def run(emb: DataFrame, hq: HybridQuery): DataFrame = runAll(emb, Seq(hq))

  /** Execute the whole query table (one union'd plan, still one scan per
    * query — the reference harness is a per-query loop too). Ranking runs
    * ONCE over the union, where qid is a genuine non-constant column:
    * ranking inside each branch would hand WindowExec a constant-folded
    * partition spec (single-partition window), which is harmless on ≤K
    * rows but floods the log with the exact warning that should be
    * flagging real regressions. */
  def runAll(emb: DataFrame, qs: Seq[HybridQuery] = default): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(desc("score"), col("vec_id"))
    qs.map(topKFor(emb, _)).reduce(_ unionAll _)
      .withColumn("rank", row_number().over(w)) // ≤ ΣK rows by now
      .select(col("qid"), col("rank"), col("vec_id"), col("score"))
      .orderBy(col("qid"), col("rank"))
  }

  /** DuckDB twin of runAll for the oracle gate. `from` defaults to the
    * raw embeddings table; geo/like batches pass the derived-metadata
    * subquery (Tables.embeddingsMetaSql) instead. */
  def oracleSql(qs: Seq[HybridQuery] = default, from: String = "embeddings"): String =
    qs.map { hq =>
      s"""SELECT qid, rank, vec_id, score FROM (
         |  SELECT CAST(${hq.qid} AS BIGINT) AS qid,
         |    CAST(row_number() OVER (ORDER BY round(list_dot_product(CAST(embedding AS DOUBLE[]), ${QueryVectors.sqlLit(hq.qvec)}), 6) DESC, vec_id) AS INT) AS rank,
         |    vec_id,
         |    round(list_dot_product(CAST(embedding AS DOUBLE[]), ${QueryVectors.sqlLit(hq.qvec)}), 6) AS score
         |  FROM $from WHERE ${hq.sqlWhere})
         |WHERE rank <= ${hq.k}""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY qid, rank")

  /** The reference's richer query mix (validators.py:289-329 builds geo
    * boxes, likes and compounds, not just label predicates): geo-box +
    * case-insensitive substring + a three-way compound, over the derived
    * metadata columns (Tables.embeddingsMeta). Same qvec/sqlWhere twin
    * discipline as `default`, so the whole batch hash-passes. */
  val geo: Seq[HybridQuery] = Seq(
    HybridQuery(6, QueryVectors.qvec(6),
      """{"lat_between":[0,40],"lon_between":[-60,60]}""",
      "latitude BETWEEN 0 AND 40 AND longitude BETWEEN -60 AND 60", 10,
      "waterfront seafood shack"),
    HybridQuery(7, QueryVectors.qvec(7),
      """{"city":{"like":"SPRING"}}""",
      "lower(city) LIKE '%spring%'", 8,
      "live music dive bar"),
    HybridQuery(8, QueryVectors.qvec(8),
      """{"label":{"ge":3},"city":{"like":"ton"},"lat_between":[-20,50],"lon_between":[-120,30]}""",
      "label >= 3 AND lower(city) LIKE '%ton%' AND latitude BETWEEN -20 AND 50 AND longitude BETWEEN -120 AND 30", 10,
      "rooftop cocktail lounge downtown"))
}
