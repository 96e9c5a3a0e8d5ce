package graft.streaming

import graft.text.QualityProbe
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming twin of corpus_quality_probe (SURVEY.md §2 #164): the
  * trained ridge quality/domain probe maintained over an unbounded
  * document stream — recursive least squares expressed as sufficient
  * statistics.
  *
  * The probe's entire trained state is the packed normal-equation
  * moments (XᵀX, Xᵀy — QualityProbe.Moments), which ADD: absorbing
  * micro-batches then solving equals fitting on the union (up to
  * summation-order ulps — the PcaState discipline; spec-pinned,
  * StreamingSpec). Per-batch cost is ONE moments pass over the batch
  * (zero shuffle, ~1 MB of state returned) plus a millisecond driver
  * Cholesky — the accumulated corpus is never re-read, no gradient
  * replay, no parameter server.
  *
  * foreachBatch, not a stateful aggregation: the model is global state
  * (every score changes when the weights update). Batches are scored
  * PREQUENTIALLY (under the post-absorb model); re-score any corpus on
  * demand with [[scoreWith]].
  */
final class IncrementalQualityProbe(positive: Column) {

  @volatile private var momentsCur: QualityProbe.Moments =
    QualityProbe.Moments.zero
  @volatile private var modelCur: Option[QualityProbe.Model] = None

  /** The current weights (None until the first batch lands). */
  def model: Option[QualityProbe.Model] = modelCur

  /** Absorb one micro-batch of documents; returns the batch scored
    * under the post-absorb model. */
  def processBatch(batch: DataFrame): DataFrame = synchronized {
    momentsCur = momentsCur.absorb(QualityProbe.moments(batch, positive))
    val m = momentsCur.toModel
    modelCur = Some(m)
    QualityProbe.score(batch, m)
  }

  /** Score any corpus under the CURRENT streamed model — equals the
    * batch trainAndScore when the stream has absorbed exactly that
    * corpus (moment additivity). */
  def scoreWith(docs: DataFrame): DataFrame =
    QualityProbe.score(docs,
      modelCur.getOrElse(throw new IllegalStateException(
        "quality probe stream: no batch absorbed yet")))

  /** foreachBatch writer over a streaming documents frame; `sink`
    * receives each micro-batch's prequential scores. */
  def writer(docStream: DataFrame,
             sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch((df: Dataset[Row], batchId: Long) =>
        sink(processBatch(df.toDF()), batchId))
}
