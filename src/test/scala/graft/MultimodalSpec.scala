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
}
