package graft

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the multimodal perceptual hash (SURVEY §2 #158):
  * aHash64 bit semantics, near-dup behaviour on planted payloads through
  * the shared chunk-blocked hamming join, shift sensitivity (why decode
  * precedes hashing for variable-length media), and distributed parity.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // a deterministic "frame": 4096 bytes with a slow gradient + texture
  private def frame(seed: Int): Array[Byte] =
    Array.tabulate(4096)(i => (((i / 64) + seed * 7 + (i % 13)) % 251).toByte)

  test("aHash64: bit c set iff cell mean exceeds overall mean") {
    val p = frame(1)
    val h = Multimodal.aHash64(p)
    val n = p.length
    val cells = p.zipWithIndex.groupBy { case (_, i) => (i.toLong * 64 / n).toInt }
    val total = p.map(_ & 0xff).map(_.toLong).sum
    (0 until 64).foreach { c =>
      val vs = cells(c).map(_._1 & 0xff).map(_.toLong)
      val expect = vs.sum * n > total * vs.length
      assert(((h >> c) & 1L) == (if (expect) 1L else 0L), s"cell $c")
    }
  }

  test("identical payloads hash equal; small same-length edits stay near") {
    val base = frame(2)
    val copy = base.clone()
    // perturb a handful of bytes inside ONE cell: at most that cell's
    // bit (and the global mean's marginal effect) can flip
    val edit = base.clone()
    (0 until 8).foreach(i => edit(i) = (edit(i) + 3).toByte)
    assert(hamming(Multimodal.aHash64(base), Multimodal.aHash64(copy)) == 0)
    assert(hamming(Multimodal.aHash64(base), Multimodal.aHash64(edit)) <= 3,
      "single-cell edit must stay within chunk-blocking range")
  }

  test("planted near-dups found by the shared chunk-blocked hamming join") {
    val a = frame(4)
    val b = a.clone(); (0 until 8).foreach(i => b(i) = (b(i) + 3).toByte)
    val far = frame(9).map(x => (x ^ 0x55).toByte)
    val rows = Seq((1L, a), (2L, b), (3L, far))
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, p) => Row(id, p) }, 2), schema)
    val sigs = Multimodal.withPerceptualHash(df)
      .select(col("doc_id"), col("phash").as("sig"))
    val pairs = Dedup.hammingPairs(sigs, maxHamming = 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("distributed hash matches the local model; empty payloads dropped") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(40)
    val withB = Multimodal.withPayload(docs)
    val local = withB.select(col("doc_id"), col("payload")).collect()
      .map(r => r.getLong(0) -> Multimodal.aHash64(r.getAs[Array[Byte]]("payload")))
      .toMap
    val dist = Multimodal.withPerceptualHash(withB).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == local.filter { case (_, _) => true }) // all non-empty here
    // empty payload row is dropped
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val withEmpty = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(7L, Array.empty[Byte]), Row(8L, frame(0)))),
      schema)
    assert(Multimodal.withPerceptualHash(withEmpty).collect().map(_.getLong(0)).toSeq == Seq(8L))
  }

  // ---- real-codec path (r18): JDK javax.imageio, zero external deps ----

  test("PNG round-trip is pixel-exact: decode(encodeCardPng(id)) reproduces cardPixel") {
    val id = 1234567L
    val img = Multimodal.decodeImage(Multimodal.encodeCardPng(id))
      .getOrElse(fail("JDK PNG codec failed to decode its own output"))
    assert(img.getWidth == Multimodal.CardW && img.getHeight == Multimodal.CardH)
    for (y <- 0 until Multimodal.CardH; x <- 0 until Multimodal.CardW) {
      val rgb = img.getRGB(x, y)
      val got = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      assert(got == Multimodal.cardPixel(id, x, y), s"pixel ($x,$y)")
    }
  }

  test("decodeImage: non-image payloads fall back (None), never throw") {
    assert(Multimodal.decodeImage("just some text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
    // 'BM' magic lures the BMP reader into a malformed header — must
    // still land on the fallback, not an exception
    assert(Multimodal.decodeImage("BM not a bitmap at all".getBytes("UTF-8")).isEmpty)
  }

  test("imageAHash64: bit c set iff 8x8 cell mean exceeds overall gray mean") {
    val id = 42L
    val img = Multimodal.decodeImage(Multimodal.encodeCardPng(id)).get
    val grays = for (y <- 0 until 16; x <- 0 until 16) yield {
      val (r, g, b) = Multimodal.cardPixel(id, x, y)
      ((y * 8 / 16) * 8 + (x * 8 / 16), (r + g + b) / 3)
    }
    val total = grays.map(_._2.toLong).sum
    val h = Multimodal.imageAHash64(img)
    grays.groupBy(_._1).foreach { case (c, vs) =>
      val s = vs.map(_._2.toLong).sum
      val expect = s * 256 > total * vs.length
      assert(((h >> c) & 1L) == (if (expect) 1L else 0L), s"cell $c")
    }
  }

  test("near-dup images land near in decoded-grid hash space; distinct images apart") {
    def png(id: Long, tweak: Boolean): Array[Byte] = {
      val img = Multimodal.decodeImage(Multimodal.encodeCardPng(id)).get
      if (tweak) {
        // nudge one pixel's gray by a hair — a same-cell local edit
        val rgb = img.getRGB(3, 3)
        img.setRGB(3, 3, rgb ^ 0x010101)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val a = Multimodal.imageAHash64(Multimodal.decodeImage(png(9L, tweak = false)).get)
    val b = Multimodal.imageAHash64(Multimodal.decodeImage(png(9L, tweak = true)).get)
    val c = Multimodal.imageAHash64(Multimodal.decodeImage(png(77L, tweak = false)).get)
    assert(hamming(a, b) <= 3, "one-pixel edit must stay within chunk-blocking range")
    assert(hamming(a, c) > 3, "distinct cards must not collide as near-dups")
  }

  test("extractFeatures takes the real path for image payloads, the stub for text") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val textPayload = "definitely not an image".getBytes("UTF-8")
    val rows = Seq(Row(1L, Multimodal.encodeCardPng(1L)), Row(2L, textPayload))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = Multimodal.extractFeatures(df).collect().map(r => r.getLong(0) -> r).toMap
    // image row: REAL decoded dimensions, not the sha-derived pseudo ones
    assert(out(1L).getInt(3) == Multimodal.CardW && out(1L).getInt(4) == Multimodal.CardH)
    // text row: byte-identical to the stub (the fallback contract)
    assert(out(2L) == Multimodal.stubDecode(2L, textPayload))
  }

  test("isImagePayload: magic bytes gate the codec path (r18 advice)") {
    assert(Multimodal.isImagePayload(Multimodal.encodeCardPng(5L)), "real PNG")
    assert(Multimodal.isImagePayload("BM??????".getBytes("UTF-8")), "BMP magic")
    assert(Multimodal.isImagePayload(Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)), "JPEG")
    assert(Multimodal.isImagePayload("GIF89a".getBytes("UTF-8")), "GIF")
    assert(Multimodal.isImagePayload(Array(0x49, 0x49, 0x2a, 0x00).map(_.toByte)), "TIFF LE")
    assert(!Multimodal.isImagePayload("plain text payload".getBytes("UTF-8")))
    assert(!Multimodal.isImagePayload(Array.empty[Byte]))
    assert(!Multimodal.isImagePayload(Array[Byte](0, 0, 2)))
    // the advice's exact worry: a short binary run WBMP would happily
    // "decode" — without image magic it must never reach the codec, so
    // the features row is byte-identical to the stub
    val wbmpLure = Array[Byte](0, 0, 8, 8, 1, 2, 3, 4, 5, 6, 7, 8)
    assert(!Multimodal.isImagePayload(wbmpLure))
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(9L, wbmpLure))), schema)
    assert(Multimodal.extractFeatures(df).collect().head ==
      Multimodal.stubDecode(9L, wbmpLure))
  }

  test("withMixedPayload: the doc_id % 7 == 3 slice carries real PNG, the rest text") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = Multimodal.withMixedPayload(docs).collect()
    val (img, txt) = rows.partition(r => Multimodal.isImageDoc(r.getLong(0)))
    assert(img.nonEmpty && txt.nonEmpty, "both branches must be populated in-gate")
    // the registered gate rows cover both branches at every sf dir
    assert(img.forall { r =>
      val p = r.getAs[Array[Byte]]("payload")
      Multimodal.isImagePayload(p) &&
        java.util.Arrays.equals(p, Multimodal.encodeCardPng(r.getLong(0))) &&
        r.getStruct(2).getString(0) == "image/png"
    })
    assert(txt.forall { r =>
      val p = r.getAs[Array[Byte]]("payload")
      !Multimodal.isImagePayload(p) &&
        r.getStruct(2).getString(0) == "application/octet-stream"
    })
    // branch-split arithmetic: the slice rule, nothing else, decides
    val expectImg = docs.collect().count(r =>
      Multimodal.isImageDoc(r.getAs[Long]("doc_id")))
    assert(img.length == expectImg)
  }

  test("mixed-corpus features and phash take the REAL branch on the image slice") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(120)
    val mixed = Multimodal.withMixedPayload(docs)
    val feats = Multimodal.extractFeatures(mixed).collect()
      .map(r => r.getLong(0) -> r).toMap
    val hashes = Multimodal.withPerceptualHash(mixed).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = feats.keySet
    assert(ids.exists(Multimodal.isImageDoc) && ids.exists(!Multimodal.isImageDoc(_)))
    ids.foreach { id =>
      if (Multimodal.isImageDoc(id)) {
        val img = Multimodal.decodeImage(Multimodal.encodeCardPng(id)).get
        val f = feats(id)
        // decoded dimensions + pixel-derived size/sha (content identity
        // is the PIXELS for a decoded payload — encoder-independent)
        assert(f.getInt(3) == Multimodal.CardW && f.getInt(4) == Multimodal.CardH)
        assert(f.getInt(1) == Multimodal.CardW * Multimodal.CardH * 3)
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val sha = md.digest(Multimodal.pixelString(img)
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(f.getString(2) == sha)
        assert(hashes(id) == Multimodal.imageAHash64(img))
      } else {
        val payload = docs.where(col("doc_id") === id)
          .collect().head.getAs[String]("text").getBytes("UTF-8")
        assert(feats(id) == Multimodal.stubDecode(id, payload))
        assert(hashes(id) == Multimodal.aHash64(payload))
      }
    }
  }

  test("decodeRoundTrip matches the oracle arithmetic (the mm_decode identity)") {
    val schema = StructType(Seq(StructField("doc_id", LongType, nullable = false)))
    val ids = Seq(0L, 3L, 999999L)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(ids.map(Row(_))), schema)
    val out = Multimodal.decodeRoundTrip(df).collect().map(r => r.getLong(0) -> r).toMap
    ids.foreach { id =>
      val px = for (y <- 0 until 16; x <- 0 until 16) yield Multimodal.cardPixel(id, x, y)
      val r = out(id)
      assert(r.getInt(1) == 16 && r.getInt(2) == 16)
      assert(r.getLong(3) == px.map(_._1.toLong).sum, s"sum_r for $id")
      assert(r.getLong(4) == px.map(_._2.toLong).sum, s"sum_g for $id")
      assert(r.getLong(5) == px.map(_._3.toLong).sum, s"sum_b for $id")
      // phash from the decoded image equals the formula-derived hash
      val img = Multimodal.decodeImage(Multimodal.encodeCardPng(id)).get
      assert(r.getLong(6) == Multimodal.imageAHash64(img))
    }
  }
}
