package graft.queries

import graft.Tables
import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2 #49–50: end-to-end training-data pipeline compositions —
  * the queries a 100 TB curation run actually ships, built entirely from
  * the library's own operators and oracle-checked as whole pipelines.
  */
object PipelineQueries {

  /** #49 Deterministic, ENGINE-PORTABLE train/val split: bucket on the
    * first md5 hex byte of the doc id. A split contract shared across
    * teams/engines must reproduce anywhere — Spark's seeded sample() is
    * engine-specific, while md5 is identical everywhere (asserted here by
    * the DuckDB oracle computing the same assignment). 'f3' = 243/256 ≈
    * 95% train. Pure projection: scan-speed at any scale, no shuffle. */
  def splitTrainVal(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      when(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2) < "f3",
        "train").otherwise("val").as("split"))
      .orderBy("doc_id")

  val splitTrainValSql: String =
    """SELECT doc_id,
      |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
      |       THEN 'train' ELSE 'val' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  /** #50 The pipeline's end product: the curated corpus. Quality gate +
    * language gate + near-dup keep-list (only cluster representatives
    * survive), composed from the library's quality, langid and cluster
    * operators. Plan shape: two scan-only column pipelines joined on
    * doc_id, minus an anti-join against the drop-list (broadcast when the
    * drop-list is small, shuffle otherwise — AQE decides at runtime).
    *
    * `clusters` is the PRECOMPUTED (doc_id, cluster_id) resolution — the
    * pair graph is the pipeline's dominant cost, and a real curation run
    * mines it once and feeds every consumer (curate, cluster report,
    * pair audit) from the same table, not once per consumer. */
  def corpusCurate(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val q = TextAnalysis.withQuality(docs).select(col("doc_id"), col("quality_score"))
    val l = TextAnalysis.withLangId(docs).select(col("doc_id"), col("lang_pred"))
    val dropped = clusters
      .where(col("cluster_id") =!= col("doc_id")).select("doc_id")
    q.join(l, "doc_id")
      .join(dropped, Seq("doc_id"), "left_anti")
      .where(col("quality_score") >= 0.6 && col("lang_pred") === "en")
      .orderBy("doc_id")
  }

  /** The registered query: curate against the shared mined cluster table
    * (computed once per corpus across dedup_jaccard/dedup_clusters/
    * corpus_curate — see DedupQueries.minedClusters). */
  def corpusCurate(s: SparkSession, d: String): DataFrame =
    corpusCurate(Tables.documents(s, d), DedupQueries.minedClusters(s, d))

  val corpusCurateSql: String =
    s"""WITH q AS (${TextQueries.textQualityBodySql}),
       |l AS (${TextQueries.textLangidBodySql}),
       |cl AS (${DedupQueries.dedupClustersBodySql})
       |SELECT q.doc_id, q.quality_score, l.lang_pred
       |FROM q JOIN l ON q.doc_id = l.doc_id
       |LEFT JOIN cl ON q.doc_id = cl.doc_id AND cl.cluster_id <> cl.doc_id
       |WHERE cl.doc_id IS NULL AND q.quality_score >= 0.6 AND l.lang_pred = 'en'
       |ORDER BY q.doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "split_train_val" -> (splitTrainVal _),
    "corpus_curate" -> (corpusCurate _)
  )

  val oracles: Map[String, String] = Map(
    "split_train_val" -> splitTrainValSql,
    "corpus_curate" -> corpusCurateSql
  )
}
