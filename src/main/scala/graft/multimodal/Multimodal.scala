package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2 #37).
  *
  * Media is carried as an opaque `binary` payload column plus a typed
  * metadata struct — the schema a real image/audio pipeline uses. The
  * decode step is a clearly-marked deterministic STUB (sha256-derived
  * pseudo-features): the container has no media libs, so what is real and
  * tested here is the Spark-side plumbing — schema, per-partition batch
  * iteration, feature schema, partitioning behaviour. Swapping
  * `stubDecode` for a JNI/ONNX decoder changes no plan shape.
  *
  * The per-partition iterator (not a per-row UDF) is deliberate: real
  * decoders amortize model/codec init per batch, exactly like a
  * `mapInPandas` batch UDF would.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("sha", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("f0", DoubleType, nullable = false),
    StructField("f1", DoubleType, nullable = false),
    StructField("f2", DoubleType, nullable = false),
    StructField("f3", DoubleType, nullable = false)))

  /** Attach the opaque payload + typed metadata columns (here: utf-8 text
    * bytes standing in for media bytes). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        col("source").as("origin"),
        length(col("text")).as("n_bytes")).as("media_meta"))

  /** STUB decoder: sha256 of the payload → deterministic pseudo "image"
    * dimensions and a 4-dim feature vector. A real implementation replaces
    * only the body of this function. */
  def stubDecode(docId: Long, payload: Array[Byte]): Row = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val sha = md.digest(payload).map("%02x".format(_)).mkString
    def a(i: Int): Int = sha.charAt(i).toInt
    Row(docId, payload.length, sha,
      (a(0) * 256 + a(1)) % 1280,
      (a(2) * 256 + a(3)) % 720,
      graft.search.VecMath.round6(a(4) / 255.0),
      graft.search.VecMath.round6(a(5) / 255.0),
      graft.search.VecMath.round6(a(6) / 255.0),
      graft.search.VecMath.round6(a(7) / 255.0))
  }

  /** Frame sampling over the opaque payload — the video/audio "sample
    * every k-th frame" plumbing, byte-level: frames of `frameBytes` at
    * offsets 0, stride, 2·stride … while they fit. Pure codegen'd column
    * ops (sequence + explode + binary substring): a narrow per-row
    * expansion, no shuffle — the shape that holds when payloads are GB
    * media blobs and this runs over 100 TB. A real decoder replaces the
    * byte slice with a codec frame fetch; the schema (media id, frame
    * index, byte offset, frame bytes) is the real contract. */
  def sampleFrames(withBytes: DataFrame, frameBytes: Int = 16, stride: Int = 64): DataFrame =
    withBytes
      // length(binary) is BYTE length — frame math must use the payload's
      // own bytes, not media_meta.n_bytes (a character count for text
      // stand-ins, which diverges on any non-ASCII payload)
      .select(col("doc_id"), col("payload"), length(col("payload")).as("nb"))
      .withColumn("nf",
        when(col("nb") >= frameBytes,
          floor((col("nb") - frameBytes) / stride) + 1).otherwise(0L).cast("int"))
      .where(col("nf") > 0)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), col("nf") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * stride).cast("long").as("byte_off"),
        hex(expr(s"substring(payload, frame_idx * $stride + 1, $frameBytes)")).as("frame_hex"))

  /** Decode/feature-extract over per-partition batches. */
  def extractFeatures(withBytes: DataFrame): DataFrame = {
    val spark = withBytes.sparkSession
    val rdd = withBytes.select(col("doc_id"), col("payload")).rdd
      .mapPartitions { it =>
        // real decoders init codecs/models once per partition, here
        it.map(r => stubDecode(r.getLong(0), r.getAs[Array[Byte]](1)))
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}
