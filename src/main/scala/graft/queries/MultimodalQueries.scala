package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY.md §2 #37: multimodal binary-column plumbing. The DuckDB oracle
  * reproduces the deterministic stub decode (sha256-derived features), so
  * the whole payload→decode→features path is value-checked end to end.
  */
object MultimodalQueries {

  def mmFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.withPayload(Tables.documents(s, d)))
      .orderBy("doc_id")

  val mmFeaturesSql: String =
    """WITH h AS (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS byte_len,
      |                  sha256(text) AS sha FROM documents)
      |SELECT doc_id, byte_len, sha,
      |  (ascii(substr(sha,1,1)) * 256 + ascii(substr(sha,2,1))) % 1280 AS width,
      |  (ascii(substr(sha,3,1)) * 256 + ascii(substr(sha,4,1))) % 720 AS height,
      |  round(ascii(substr(sha,5,1)) / 255.0, 6) AS f0,
      |  round(ascii(substr(sha,6,1)) / 255.0, 6) AS f1,
      |  round(ascii(substr(sha,7,1)) / 255.0, 6) AS f2,
      |  round(ascii(substr(sha,8,1)) / 255.0, 6) AS f3
      |FROM h ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] =
    Map("mm_features" -> (mmFeatures _))

  val oracles: Map[String, String] =
    Map("mm_features" -> mmFeaturesSql)
}
