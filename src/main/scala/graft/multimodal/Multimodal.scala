package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2 #37).
  *
  * Media is carried as an opaque `binary` payload column plus a typed
  * metadata struct — the schema a real image/audio pipeline uses. The
  * IMAGE decode step is REAL since round 18 (javax.imageio — the JDK's
  * public, dependency-free PNG/BMP/GIF codec; see [[decodeImage]] and
  * the mm_decode round-trip row): image payloads decode, opaque/
  * non-image payloads fall back to the deterministic byte-level stub
  * (sha256-derived pseudo-features), so audio/video feature extraction
  * remains the clearly-marked stub seam. Swapping the fallback for a
  * JNI/ONNX decoder changes no plan shape.
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

  /** The deterministic image slice of the mixed-payload corpus: docs with
    * `doc_id % ImageSliceMod == ImageSliceRem` carry REAL PNG bytes (their
    * [[encodeCardPng]] test card); the rest keep the utf-8 text stand-in.
    * The rule is pure doc_id arithmetic so the DuckDB oracles CASE on the
    * same predicate — every production consumer of [[withMixedPayload]]
    * hash-checks BOTH the real-codec branch and the stub branch in one
    * gate row (r18 verdict #2; before this, the gate corpus' all-text
    * payloads meant the real branch was gate-exercised only by the
    * synthetic mm_decode row). */
  val ImageSliceMod = 7L
  val ImageSliceRem = 3L

  def isImageDoc(docId: Long): Boolean =
    docId % ImageSliceMod == ImageSliceRem

  /** [[withPayload]] with the image slice materialized as real PNG bytes
    * (mime "image/png"; n_bytes = the container's byte length). PNG
    * encoding is executor-side per-partition work (the decode idiom in
    * reverse), not a column expression — the per-partition iterator
    * matches every other codec touchpoint in this module. */
  def withMixedPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col("doc_id"), col("text"), col("source")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val payload =
            if (isImageDoc(id)) encodeCardPng(id)
            else r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val mime = if (isImageDoc(id)) "image/png" else "application/octet-stream"
          Row(id, payload, Row(mime, r.getString(2), payload.length))
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("media_meta", StructType(Seq(
        StructField("mime", StringType, nullable = false),
        StructField("origin", StringType, nullable = true),
        StructField("n_bytes", IntegerType, nullable = false))), nullable = false))))
  }

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

  // ---- real-codec path (r17 verdict #7): the JDK's javax.imageio is a
  // public, dependency-free PNG/BMP/GIF codec, so the decode seam no
  // longer needs external fixtures — the library DECODES REAL IMAGE
  // BYTES wherever a payload carries them, and falls back to the
  // deterministic byte-level stub for opaque/non-image payloads (the
  // gate corpus' text stand-ins take the fallback, so every existing
  // oracle is unchanged). Fixtures are SYNTHESIZED with the same codec
  // (ImageIO.write), so specs and the mm_decode gate row exercise a
  // true encode → decode round-trip with zero provisioning.

  // ImageIO's default stream cache spools every decode through a temp
  // FILE — a per-row disk write in what must stay a row-local, in-memory
  // hot path (payloads here are already byte arrays). Set LAZILY on
  // first codec use (r18 advice: an object-initializer side effect
  // mutates JVM-global ImageIO state on class load, order-dependently,
  // for every other ImageIO user in the host JVM); idempotent and cheap,
  // and only a JVM that actually decodes ever touches the global.
  private lazy val imageioNoCache: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** True iff the payload starts with a known image-container signature
    * the JDK codec set handles (PNG / GIF / BMP / JPEG / TIFF). The real
    * decode path is GATED on this (r18 advice): blindly attempting
    * `ImageIO.read` on every payload lets a permissive reader (WBMP
    * accepts many short byte runs) misidentify an opaque audio/video/
    * text payload and silently divert it from the byte-level stub the
    * oracles replay — magic bytes make the branch rule deterministic
    * and engine-replayable. */
  def isImagePayload(p: Array[Byte]): Boolean = {
    if (p == null || p.length < 4) return false
    val b0 = p(0) & 0xff; val b1 = p(1) & 0xff
    val b2 = p(2) & 0xff; val b3 = p(3) & 0xff
    (b0 == 0x89 && b1 == 0x50 && b2 == 0x4e && b3 == 0x47) || // PNG
    (b0 == 0x47 && b1 == 0x49 && b2 == 0x46 && b3 == 0x38) || // GIF8
    (b0 == 0x42 && b1 == 0x4d) ||                             // BMP
    (b0 == 0xff && b1 == 0xd8 && b2 == 0xff) ||               // JPEG
    (b0 == 0x49 && b1 == 0x49 && b2 == 0x2a && b3 == 0x00) || // TIFF LE
    (b0 == 0x4d && b1 == 0x4d && b2 == 0x00 && b3 == 0x2a)    // TIFF BE
  }

  /** Decode an image payload via the JDK codec; None for non-image
    * bytes (ImageIO returns null or throws on undecodable input —
    * either way the caller falls back to the byte-level path). */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    imageioNoCache
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: Throwable => None }
  }

  /** Deterministic RGB test-card pixel for doc `id` — the mm_decode
    * identity. Pure integer arithmetic, so the DuckDB oracle derives the
    * EXPECTED pixels from the same formula while the Spark side actually
    * round-trips them through the PNG codec (lossless: decode(encode(p))
    * == p, so a hash-pass proves the codec plumbing end to end). */
  def cardPixel(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((id * 31 + x * 7 + y * 13) % 256).toInt,
    ((id * 17 + x * 11 + y * 3) % 256).toInt,
    ((id * 23 + x * 5 + y * 19) % 256).toInt)

  val CardW = 16
  val CardH = 16

  /** Encode doc `id`'s test card as real PNG bytes (executor-side; the
    * encoder is JVM-local and headless-safe). */
  def encodeCardPng(id: Long): Array[Byte] = {
    imageioNoCache
    val img = new java.awt.image.BufferedImage(
      CardW, CardH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < CardH) {
      var x = 0
      while (x < CardW) {
        val (r, g, b) = cardPixel(id, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 64-bit average-hash of a DECODED image: the 2-D original of
    * [[aHash64]]'s 1-D byte analogue — pixels bin into an 8×8 grid by
    * the same integer rule (cell = (y·8)/h · 8 + (x·8)/w), gray is the
    * integer mean (r+g+b)/3, and bit c is set iff cell c's mean gray
    * exceeds the image's overall mean (cross-multiplied, integer-exact:
    * sum_c·n > total·count_c). Any engine replays it exactly from the
    * pixel values. */
  def imageAHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    if (w == 0 || h == 0) return 0L
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val gray = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        val c = ((y.toLong * 8 / h) * 8 + (x.toLong * 8 / w)).toInt
        sums(c) += gray
        cnts(c) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    var total = 0L
    var c = 0
    while (c < 64) { total += sums(c); c += 1 }
    var hash = 0L
    c = 0
    while (c < 64) {
      if (cnts(c) > 0 && sums(c) * n > total * cnts(c)) hash |= (1L << c)
      c += 1
    }
    hash
  }

  /** Canonical row-major pixel string of a decoded image — "r,g,b"
    * cells joined by ";" in (y, x) order. The decoded image's CONTENT
    * identity: two encoders produce different container bytes for
    * identical pixels (deflate strategy, chunk layout), so hashing the
    * container would make the "same image" question encoder-dependent;
    * hashing the canonical pixel serialization is the image analogue of
    * normalizing text before fingerprinting, and any engine derives the
    * identical string from the pixel values (the DuckDB twin uses
    * string_agg over the same formula). */
  def pixelString(img: java.awt.image.BufferedImage): String = {
    val sb = new java.lang.StringBuilder(img.getWidth * img.getHeight * 12)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        if (sb.length > 0) sb.append(';')
        val rgb = img.getRGB(x, y)
        sb.append((rgb >> 16) & 0xff).append(',')
          .append((rgb >> 8) & 0xff).append(',')
          .append(rgb & 0xff)
        x += 1
      }
      y += 1
    }
    sb.toString
  }

  /** Decoded-image features for [[extractFeatures]]'s real path: the
    * stub's schema with REAL width/height and f0–f3 as the four
    * quadrant gray means scaled to [0,1] (round6 — the corpus-wide
    * numeric convention). For a DECODED payload, content identity and
    * size are properties of the PIXELS, not the container (the same
    * image re-encoded by a different PNG writer yields different bytes):
    * sha is the digest of [[pixelString]]'s canonical serialization and
    * byte_len the decoded RGB volume (w·h·3) — both exactly replayable
    * by an oracle from the pixel values, where a container digest never
    * could be. */
  private def decodedRow(docId: Long, payload: Array[Byte],
                         img: java.awt.image.BufferedImage): Row = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val sha = md.digest(pixelString(img).getBytes(
      java.nio.charset.StandardCharsets.UTF_8)).map("%02x".format(_)).mkString
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](4)
    val cnts = new Array[Long](4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val gray = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        val q = ((y.toLong * 2 / h) * 2 + (x.toLong * 2 / w)).toInt
        sums(q) += gray
        cnts(q) += 1
        x += 1
      }
      y += 1
    }
    def f(q: Int): Double =
      if (cnts(q) == 0) 0.0
      else graft.search.VecMath.round6(sums(q).toDouble / (cnts(q) * 255.0))
    Row(docId, w * h * 3, sha, w, h, f(0), f(1), f(2), f(3))
  }

  /** (doc_id, phash) over per-partition batches — the decode idiom
    * (codec init amortized per partition; a real pipeline hashes the
    * DECODED fixed-grid frame in the same pass as extractFeatures).
    * Image payloads hash the decoded 8×8 grid ([[imageAHash64]] — the
    * REAL perceptual hash); opaque payloads keep the byte-level
    * analogue. Empty payloads are dropped (no content to fingerprint —
    * and the SQL twin's per-byte unnest produces no rows for them). */
  def withPerceptualHash(withBytes: DataFrame): DataFrame = {
    val spark = withBytes.sparkSession
    val rdd = withBytes.select(col("doc_id"), col("payload")).rdd
      .mapPartitions { it =>
        it.flatMap { row =>
          val p = row.getAs[Array[Byte]]("payload")
          if (p == null || p.isEmpty) None
          else Some(Row(row.getLong(0),
            // magic-byte gate first (r18 advice): only a payload that
            // DECLARES an image container may take the decoded-grid
            // path; opaque bytes keep the byte-level analogue even if a
            // permissive reader could misparse them
            (if (isImagePayload(p)) decodeImage(p).map(imageAHash64) else None)
              .getOrElse(aHash64(p))))
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = false))))
  }

  /** mm_decode's pipeline body: synthesize each doc's test-card PNG on
    * the executors, decode it back through the SAME JDK codec, and emit
    * integer-exact pixel stats plus the decoded-grid aHash — all
    * derivable by the oracle from [[cardPixel]]'s formula because PNG is
    * lossless (decode ∘ encode = identity on pixels). Per-partition
    * iteration (the decode idiom); a failed round-trip is a hard error,
    * never a silent fallback — the row IS the codec evidence. */
  def decodeRoundTrip(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val png = encodeCardPng(id)
        val img = decodeImage(png).getOrElse(throw new IllegalStateException(
          s"PNG round-trip failed for doc $id (${png.length} bytes)"))
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        Row(id, img.getWidth, img.getHeight, sr, sg, sb, imageAHash64(img))
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false),
      StructField("phash", LongType, nullable = false))))
  }

  /** Decode/feature-extract over per-partition batches: image payloads
    * take the REAL codec path (decoded width/height, quadrant gray
    * means); opaque payloads keep the deterministic stub. */
  def extractFeatures(withBytes: DataFrame): DataFrame = {
    val spark = withBytes.sparkSession
    val rdd = withBytes.select(col("doc_id"), col("payload")).rdd
      .mapPartitions { it =>
        // real decoders init codecs/models once per partition, here
        it.map { r =>
          val p = r.getAs[Array[Byte]](1)
          // magic-byte gate first (r18 advice — see withPerceptualHash)
          (if (isImagePayload(p)) decodeImage(p) else None)
            .map(img => decodedRow(r.getLong(0), p, img))
            .getOrElse(stubDecode(r.getLong(0), p))
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}
