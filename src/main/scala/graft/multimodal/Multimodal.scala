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

  /** 64-bit average-hash perceptual fingerprint of an opaque payload:
    * the byte stream is cut into 64 equal cells (the 1-D analogue of
    * aHash's 8×8 luma grid); bit c is set iff cell c's mean byte value
    * exceeds the payload's overall mean. Integer-only compare
    * (sum_c·n > total·count_c — exact up to ~1.5 GB payloads, 4n² < 2^63)
    * so any engine derives the identical hash — the DuckDB oracle
    * recomputes it byte for byte (mm_phash is FULL hash-pass).
    *
    * Same-length local edits flip few cells → few bits, so near-identical
    * payloads land within small hamming distance and feed the SAME
    * chunk-blocked join the text SimHash path uses (Dedup.hammingPairs).
    * Byte INSERTIONS shift every later byte across cell boundaries —
    * variable-length media must be decoded to a fixed grid first (what a
    * real decoder does; stubDecode's slot), exactly why aHash is defined
    * over resized frames, not containers. */
  def aHash64(payload: Array[Byte]): Long = {
    val n = payload.length
    if (n == 0) return 0L
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var i = 0
    while (i < n) {
      val c = ((i.toLong * 64) / n).toInt
      sums(c) += payload(i) & 0xff
      cnts(c) += 1
      i += 1
    }
    var total = 0L
    var c = 0
    while (c < 64) { total += sums(c); c += 1 }
    var h = 0L
    c = 0
    while (c < 64) {
      if (cnts(c) > 0 && sums(c) * n > total * cnts(c)) h |= (1L << c)
      c += 1
    }
    h
  }

  /** (doc_id, phash) over per-partition batches — the decode idiom
    * (codec init amortized per partition; a real pipeline hashes the
    * DECODED fixed-grid frame in the same pass as extractFeatures).
    * Empty payloads are dropped (no content to fingerprint — and the
    * SQL twin's per-byte unnest produces no rows for them). */
  def withPerceptualHash(withBytes: DataFrame): DataFrame = {
    val spark = withBytes.sparkSession
    val rdd = withBytes.select(col("doc_id"), col("payload")).rdd
      .mapPartitions { it =>
        it.flatMap { row =>
          val p = row.getAs[Array[Byte]]("payload")
          if (p == null || p.isEmpty) None
          else Some(Row(row.getLong(0), aHash64(p)))
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = false))))
  }

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
