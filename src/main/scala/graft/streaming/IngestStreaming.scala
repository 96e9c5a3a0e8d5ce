package graft.streaming

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental admission funnel (queries.PipelineQueries.pipelineIngest's
  * twin — the one r14 composition without a streaming twin): documents
  * arrive in micro-batches, in any order, with duplicate deliveries; the
  * per-doc sufficient statistic is the row-local feature triple
  * (content md5, quality_score, lang_pred) — deterministic functions of
  * the text, computed DISTRIBUTED per batch by the very same TextAnalysis
  * columns the batch operator uses, so the values cannot drift. `report()`
  * re-derives the whole funnel from the accumulated state: the 80/20
  * boundary (doc_id·5 ≥ max·4) is recomputed from the CURRENT max doc_id,
  * so a late batch that RAISES the max moves the boundary and
  * reclassifies every document — resident docs become batch docs, the
  * resident fingerprint set shrinks, near-dup roots change residency —
  * exactly the absorption a fixed-boundary incremental funnel could never
  * reopen. Stage assignment replays the batch operator's first-failing-
  * stage CASE bit-for-bit (same md5 membership, same cluster-ROOT
  * residency rule, same 0.6/en/md5-prefix thresholds).
  *
  * The near-dup input is the PUBLISHED mined cluster artifact
  * (DedupQueries.minedClusters' table — every dedup consumer's shared
  * build artifact), passed to `report()` as-of read time; a production
  * stream refreshes it from the incremental miner (#102/#103).
  *
  * State is doc-grain — (16-byte fp + double + short string) per
  * document: the fingerprint table a production funnel keeps resident
  * anyway (the decontaminate_bloom sketch is the documented 100 TB
  * prune for the membership side). */
final class StreamingIngest {

  // doc_id -> (fp, quality_score, lang_pred); deterministic values, so
  // duplicate delivery is an idempotent overwrite
  private val state =
    scala.collection.mutable.HashMap.empty[Long, (String, Double, String)]

  def processBatch(batch: DataFrame): Unit = synchronized {
    // the same feature derivations the batch operator joins (withQuality
    // and withLangId each project text away, so they run side by side)
    val q = TextAnalysis.withQuality(batch).select(col("doc_id"), col("quality_score"))
    val l = TextAnalysis.withLangId(batch).select(col("doc_id"), col("lang_pred"))
    batch.select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .join(q, "doc_id").join(l, "doc_id")
      .collect()
      .foreach(r => state.update(r.getLong(0),
        (r.getString(1), r.getDouble(2), r.getString(3))))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** (stage, n_docs) — the #263 admission-report schema, ordered by
    * stage; `clusters` is the shared mined cluster table (doc_id,
    * cluster_id) as-of now. */
  def report(clusters: DataFrame): Seq[(String, Long)] = synchronized {
    if (state.isEmpty) return Seq.empty
    val mx = state.keysIterator.max
    def isBatch(id: Long) = id * 5 >= mx * 4
    val resFp = state.iterator
      .collect { case (id, (fp, _, _)) if !isBatch(id) => fp }.toSet
    // a batch doc matches resident content iff its cluster ROOT (the min
    // doc id) is resident — the batch operator's residentCluster rule
    val nearRes = clusters.select(col("doc_id"), col("cluster_id")).collect()
      .collect { case r if r.getLong(1) * 5 < mx * 4 => r.getLong(0) }.toSet
    state.iterator
      .collect { case (id, (fp, q, lang)) if isBatch(id) =>
        if (resFp(fp)) "dropped_exact"
        else if (nearRes(id)) "dropped_neardup"
        else if (q < 0.6) "dropped_quality"
        else if (lang != "en") "dropped_lang"
        else if (md5Hex(id.toString).substring(0, 2) < "f3") "admitted_train"
        else "admitted_val"
      }
      .toSeq.groupBy(identity).toSeq
      .map { case (st, xs) => (st, xs.length.toLong) }
      .sortBy(_._1)
  }
}
