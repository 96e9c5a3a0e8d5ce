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
  * document — and lives as a DISTRIBUTED DataFrame, never on the driver
  * heap (r15 verdict #5): each micro-batch's feature triples merge into
  * the state table by an idempotent doc_id upsert (values are
  * deterministic, so last-write-wins ≡ first-write-wins), lineage is
  * truncated per batch with a localCheckpoint (the micro-batch
  * state-store discipline — in a production job this table is a parquet
  * / state-store sink, exactly the fingerprint table a funnel keeps
  * anyway), and `report()` replays the batch funnel's joins OVER the
  * table — the boundary max is a one-row broadcast, fingerprint
  * membership a key-only join, the rollup stage-bounded (≤6 rows ever
  * reach the driver). At 100 TB the only driver-resident data is the
  * report itself.
  *
  * Honesty notes on the state mechanism, for anyone promoting this twin
  * to a long-lived production job: (1) `localCheckpoint(true)` REWRITES
  * the full state table every micro-batch — O(|state|) work per batch,
  * quadratic total over a stream's lifetime — where a production sink
  * would APPEND the batch partition and compact periodically (the
  * parquet/state-store shape the paragraph above names); and (2) the
  * checkpointed blocks live on executors with no fault tolerance, so an
  * executor loss fails every later processBatch/report for this stream —
  * a reliable `checkpoint()` or the parquet sink closes that too. Both
  * are the right trade for the bench twin (bounded batches, single JVM),
  * wrong for a real stream. */
final class StreamingIngest {

  // (doc_id, fp, quality_score, lang_pred) — the distributed state table;
  // deterministic values, so duplicate delivery is an idempotent upsert
  private var state: Option[DataFrame] = None

  def processBatch(batch: DataFrame): Unit = synchronized {
    // batch-local dedup FIRST, before deriving features: an
    // at-least-once source can redeliver a doc_id inside one
    // micro-batch, and the anti-join below only guards against resident
    // state — two copies would both survive the union and double-count
    // in report(). Dedup before the joins keeps k redeliveries at k
    // rows; after them the q/l/fp sides would each carry k copies and
    // the joins would explode to k³ rows per doc before collapsing.
    // localCheckpoint materializes the dedup ONCE — the three feature
    // branches below each re-execute their input otherwise (different
    // pruned column sets defeat ReuseExchange), tripling the shuffle.
    val b = batch.dropDuplicates("doc_id").localCheckpoint(true)
    // the same feature derivations the batch operator joins (withQuality
    // and withLangId each project text away, so they run side by side)
    val q = TextAnalysis.withQuality(b).select(col("doc_id"), col("quality_score"))
    val l = TextAnalysis.withLangId(b).select(col("doc_id"), col("lang_pred"))
    val feats = b.select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .join(q, "doc_id").join(l, "doc_id")
    val merged = state match {
      case None => feats
      // upsert WITHOUT shuffling the resident state: the batch is small
      // by premise, so a broadcast anti-join on its doc_ids drops the
      // redelivered rows map-side (values are deterministic, so either
      // copy is correct) — a dropDuplicates over the union would instead
      // re-shuffle the ENTIRE accumulated table every batch, quadratic
      // work across a stream's lifetime
      case Some(st) =>
        st.join(broadcast(feats.select(col("doc_id"))), Seq("doc_id"), "left_anti")
          .unionByName(feats)
    }
    // materialize + truncate lineage so state cost stays one table, not
    // a per-batch plan chain (eager: the batch's work happens at arrival
    // time, like a state-store commit)
    state = Some(merged.localCheckpoint(true))
  }

  /** (stage, n_docs) — the #263 admission-report schema, ordered by
    * stage; `clusters` is the shared mined cluster table (doc_id,
    * cluster_id) as-of now. The whole funnel is the batch operator's
    * plan over the state table: one-row max broadcast, left joins for
    * fingerprint / cluster-root residency, first-failing-stage CASE,
    * stage-bounded rollup. */
  def report(clusters: DataFrame): Seq[(String, Long)] = synchronized {
    state match {
      case None => Seq.empty
      case Some(st) =>
        val mx = st.agg(max(col("doc_id")).as("mx"))
        val tagged = st.crossJoin(broadcast(mx))
          .withColumn("is_batch", col("doc_id") * 5 >= col("mx") * 4)
        val resFp = tagged.where(!col("is_batch"))
          .select(col("fp")).distinct().withColumn("fp_hit", lit(true))
        // a batch doc matches resident content iff its cluster ROOT (the
        // min doc id) is resident — the batch operator's residentCluster rule
        val residentCluster = clusters.crossJoin(broadcast(mx))
          .where(col("cluster_id") * 5 < col("mx") * 4)
          .select(col("doc_id")).withColumn("near_res", lit(true))
        tagged.where(col("is_batch"))
          .join(resFp, Seq("fp"), "left")
          .join(residentCluster, Seq("doc_id"), "left")
          .select(
            when(col("fp_hit"), "dropped_exact")
              .when(col("near_res"), "dropped_neardup")
              .when(col("quality_score") < 0.6, "dropped_quality")
              .when(col("lang_pred") =!= "en", "dropped_lang")
              .when(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2) < "f3",
                "admitted_train")
              .otherwise("admitted_val").as("stage"))
          .groupBy("stage").agg(count(lit(1)).as("n_docs"))
          .orderBy("stage")
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
  }
}
