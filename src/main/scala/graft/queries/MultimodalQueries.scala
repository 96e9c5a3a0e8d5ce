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

  /** Byte-level frame sampling over the binary payload (every 64th offset,
    * 16-byte frames). The Spark side is byte-exact (length/substring on
    * BINARY); the oracle's VARCHAR substring is character-based, which
    * coincides on this corpus (verified 0 rows with octet_length <>
    * length at both sf0.01 and sf0.1 — DuckDB has no BLOB substring). */
  def mmFrameSample(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.withPayload(Tables.documents(s, d)))
      .orderBy("doc_id", "frame_idx")

  val mmFrameSampleSql: String =
    """WITH b AS (
      |  SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS nb
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, text,
      |         CAST(CASE WHEN nb >= 16 THEN (nb - 16) // 64 + 1 ELSE 0 END AS INT) AS nf
      |  FROM b),
      |idx AS (
      |  SELECT doc_id, text, unnest(range(nf)) AS frame_idx FROM f WHERE nf > 0)
      |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
      |       frame_idx * 64 AS byte_off,
      |       hex(CAST(substring(text, CAST(frame_idx * 64 + 1 AS INT), 16) AS BLOB)) AS frame_hex
      |FROM idx ORDER BY doc_id, frame_idx""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] =
    Map("mm_features" -> (mmFeatures _),
        "mm_frame_sample" -> (mmFrameSample _))

  val oracles: Map[String, String] =
    Map("mm_features" -> mmFeaturesSql,
        "mm_frame_sample" -> mmFrameSampleSql)
}
