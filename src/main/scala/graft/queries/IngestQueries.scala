package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest/validation surface (reference artifacts/artifacts.py): the
  * id-contiguity + row-count gate every artifact must pass, run over the
  * testdata tables as one aggregate per table. JSON→parquet building and
  * schema validation themselves are exercised in IngestSpec (they write
  * files, so they live in tests, not queries).
  */
object IngestQueries {

  private def summary(df: DataFrame, tbl: String, idCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("n"),
      min(col(idCol)).as("min_id"),
      max(col(idCol)).as("max_id"),
      count_distinct(col(idCol)).as("n_distinct"))
      .select(lit(tbl).as("tbl"), col("n"), col("min_id"), col("max_id"), col("n_distinct"))

  /** Contiguous-id validation summary (reference validate_schema:
    * "id must be contiguous 0..N-1") for the two artifact-like tables. */
  def ingestCheck(s: SparkSession, d: String): DataFrame =
    summary(Tables.documents(s, d), "documents", "doc_id")
      .unionAll(summary(Tables.embeddings(s, d), "embeddings", "vec_id"))
      .orderBy("tbl")

  val ingestCheckSql: String =
    """SELECT 'documents' AS tbl, count(*) AS n, min(doc_id) AS min_id,
      |       max(doc_id) AS max_id, count(DISTINCT doc_id) AS n_distinct
      |FROM documents
      |UNION ALL
      |SELECT 'embeddings', count(*), min(vec_id), max(vec_id), count(DISTINCT vec_id)
      |FROM embeddings
      |ORDER BY tbl""".stripMargin

  /** Random baseline (reference src/backends/random.py): deterministic
    * seeded K ids — the recall floor. */
  def vecRandom(s: SparkSession, d: String): DataFrame =
    graft.search.VectorSearch.randomK(Tables.embeddings(s, d), 10)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ingest_check" -> (ingestCheck _),
    "vec_random" -> (vecRandom _)
  )

  val oracles: Map[String, String] = Map(
    "ingest_check" -> ingestCheckSql
  )
}
