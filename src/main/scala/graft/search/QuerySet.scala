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
    * embeddings table (label is the only filterable metadata column). */
  val default: Seq[HybridQuery] = Seq(
    HybridQuery(0, QueryVectors.qvec(0), "{}", "TRUE", 10),
    HybridQuery(1, QueryVectors.qvec(1), """{"label":{"in":[0,1,2]}}""", "label IN (0,1,2)", 10),
    HybridQuery(2, QueryVectors.qvec(2), """{"label":{"ge":5}}""", "label >= 5", 5),
    HybridQuery(3, QueryVectors.qvec(3), """{"label":{"eq":7}}""", "label = 7", 5),
    HybridQuery(4, QueryVectors.qvec(4), """{"label":{"between":[2,6]}}""", "label BETWEEN 2 AND 6", 8),
    HybridQuery(5, QueryVectors.qvec(5), """{"label":{"ne":3}}""", "label IS NOT NULL AND label <> 3", 10))

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

  /** DuckDB twin of runAll for the oracle gate. */
  def oracleSql(qs: Seq[HybridQuery] = default): String =
    qs.map { hq =>
      s"""SELECT qid, rank, vec_id, score FROM (
         |  SELECT CAST(${hq.qid} AS BIGINT) AS qid,
         |    CAST(row_number() OVER (ORDER BY round(list_dot_product(CAST(embedding AS DOUBLE[]), ${QueryVectors.sqlLit(hq.qvec)}), 6) DESC, vec_id) AS INT) AS rank,
         |    vec_id,
         |    round(list_dot_product(CAST(embedding AS DOUBLE[]), ${QueryVectors.sqlLit(hq.qvec)}), 6) AS score
         |  FROM embeddings WHERE ${hq.sqlWhere})
         |WHERE rank <= ${hq.k}""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY qid, rank")
}
