package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Incremental / streaming exact-substring span REMOVAL — the
  * dedup_incremental symmetry for [[graft.text.TextAnalysis.withDedupSpans]]
  * (#152): each arriving batch is cleaned against the ACCUMULATED corpus
  * without ever re-processing it, then contributes its own grams to the
  * store.
  *
  * Rule equivalence with the batch operator (spec-pinned): the batch rule
  * deletes tokens under non-canonical duplicated windows, canonical =
  * first occurrence by (doc_id, position). When doc ids are increasing
  * across batches (ordered replay — the EventStreaming twin discipline),
  * a new window is non-canonical exactly when its gram either already
  * exists in the store (the canonical lies in an earlier unit) or repeats
  * within the batch behind an earlier (doc_id, position). So sequential
  * `cleanBatch` calls produce row-for-row the cleaned text the batch
  * operator produces on the union, restricted to each batch's docs.
  *
  * State: the store holds each DISTINCT gram once as (gh, gram) — the
  * fingerprint for the cheap probe join, the string so fingerprint
  * collisions cannot delete an innocent span (the batch plan's exact
  * string verify, persisted). Growth is bounded by distinct grams, not
  * occurrences — re-posts and boilerplate contribute nothing after their
  * first appearance. The BATCH side builds gram strings eagerly: a
  * micro-batch is bounded by contract, so its string volume is too (the
  * corpus-sized side — the store — never re-materializes strings from
  * text).
  */
object DedupSpansStreaming {

  private val storeSchema = StructType(Seq(
    StructField("gh", LongType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  /** An empty gram store. */
  def emptyStore(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], storeSchema)

  /** Batch positions with 1-based window start, fingerprint AND string. */
  private def positions(batch: DataFrame, n: Int): DataFrame = {
    val t = split(col("text"), " ")
    batch.select(col("doc_id"), t.as("t"))
      .withColumn("ghs", expr(
        s"""CASE WHEN size(t) >= $n THEN
           |  transform(sequence(1, size(t) - ${n - 1}),
           |    i -> xxhash64(slice(t, i, $n)))
           |ELSE cast(array() AS array<bigint>) END""".stripMargin))
      .select(col("doc_id"), col("t"), posexplode(col("ghs")).as(Seq("i", "gh")))
      .select(col("doc_id"), (col("i") + 1).as("w"), col("gh"),
        expr(s"array_join(slice(t, i + 1, $n), ' ')").as("gram"))
  }

  /** Clean one batch against the store: returns (cleaned, newStore).
    * `cleaned` has the batch operator's schema (doc_id, n_tokens,
    * n_removed, text_clean); `newStore` = store ∪ the batch's distinct
    * grams. Both are plans — persist `newStore` between calls (the
    * corpusBands discipline) so the lineage doesn't re-grow. */
  def cleanBatch(batch: DataFrame, store: DataFrame, n: Int = 13): (DataFrame, DataFrame) = {
    val pos = positions(batch, n)
    // windows whose gram already exists in earlier units: probe on the
    // 8-byte fingerprint, exact string verify in the SAME equi-join
    val storeHit = pos.join(store, Seq("gh", "gram"), "left_semi")
      .select("doc_id", "w")
    // windows repeating WITHIN the batch behind an earlier occurrence
    val byGram = org.apache.spark.sql.expressions.Window.partitionBy("gram")
    val byGramAll = byGram.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val batchNonCanon = pos
      .withColumn("cnt", count(lit(1)).over(byGramAll))
      .withColumn("rn", row_number().over(byGram.orderBy(col("doc_id"), col("w"))))
      .where(col("cnt") > 1 && col("rn") >= 2)
      .select("doc_id", "w")
    val del = storeHit.unionAll(batchNonCanon)
      .select(col("doc_id"), explode(sequence(col("w"), col("w") + lit(n - 1))).as("j"))
      .distinct()
    val t = split(col("text"), " ")
    val tokpos = batch.select(col("doc_id"), posexplode(t).as(Seq("p", "tok")))
      .select(col("doc_id"), (col("p") + 1).as("j"), col("tok"))
    val kept = tokpos.join(del, Seq("doc_id", "j"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("kept_n"),
        array_join(
          transform(array_sort(collect_list(struct(col("j"), col("tok")))),
            x => x.getField("tok")), " ").as("clean"))
    val cleaned = batch.select(col("doc_id"), size(t).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("kept_n"), lit(0L))).cast("long").as("n_removed"),
        coalesce(col("clean"), lit("")).as("text_clean"))
    val newStore = store.unionAll(pos.select("gh", "gram")).distinct()
    (cleaned, newStore)
  }

  /** foreachBatch writer over a streaming frame of (doc_id, text):
    * `sink` receives each batch's cleaned rows; the store accumulates
    * across batches (persisted per step so lineage stays flat). */
  def writer(stream: DataFrame, spark: SparkSession, n: Int = 13)
            (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    // one store handle per writer; foreachBatch runs sequentially
    var store = emptyStore(spark)
    stream.writeStream
      .outputMode("append")
      .foreachBatch((df: Dataset[Row], batchId: Long) => {
        val (cleaned, next) = cleanBatch(df.toDF(), store, n)
        val mat = next.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        mat.count() // materialize before the old store unpersists
        sink(cleaned, batchId)
        store.unpersist()
        store = mat
      })
  }
}
