package graft

import java.io.{ByteArrayInputStream, DataInputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sources.{Ingest, NpyIO}
import org.scalatest.funsuite.AnyFunSuite

/** NpyIO — the reference's vectors.npy artifact format (loaders.py:73-80),
  * a public binary spec (numpy.lib.format / NEP-1). */
class NpySpec extends AnyFunSuite {

  private lazy val spark = SparkTest.session

  private def tmpFile(name: String): String = {
    val dir = Files.createTempDirectory("npy-spec").toString
    s"$dir/$name"
  }

  private def mat(n: Int, d: Int, seed: Long = 7L): Array[Array[Float]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(d)(rng.nextFloat() * 2f - 1f))
  }

  /** Hand-build a .npy byte stream (any version/descr) for parser tests. */
  private def npyBytes(descr: String, shape: String, data: Array[Byte],
                       major: Int = 1, fortran: String = "False"): Array[Byte] = {
    val dict = s"{'descr': '$descr', 'fortran_order': $fortran, 'shape': $shape, }"
    val lenFieldBytes = if (major == 1) 2 else 4
    val unpadded = 6 + 2 + lenFieldBytes + dict.length + 1
    val pad = (64 - unpadded % 64) % 64
    val header = dict + (" " * pad) + "\n"
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y'), 0, 6)
    out.write(major); out.write(0)
    val lenB = ByteBuffer.allocate(lenFieldBytes).order(ByteOrder.LITTLE_ENDIAN)
    if (major == 1) lenB.putShort(header.length.toShort) else lenB.putInt(header.length)
    out.write(lenB.array(), 0, lenFieldBytes)
    out.write(header.getBytes(StandardCharsets.US_ASCII), 0, header.length)
    out.write(data, 0, data.length)
    out.toByteArray
  }

  private def parseHeader(bytes: Array[Byte]): NpyIO.NpyHeader =
    NpyIO.readHeader(new DataInputStream(new ByteArrayInputStream(bytes)))

  test("write → loadMatrix round-trips a float32 matrix exactly") {
    val m = mat(257, 19)
    val path = tmpFile("a.npy")
    NpyIO.write(path, m.iterator, m.length, 19)
    val got = NpyIO.loadMatrix(spark, path).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    assert(got.length == 257)
    got.foreach { case (id, v) =>
      assert(v.sameElements(m(id.toInt)), s"row $id differs")
    }
  }

  test("data offset is 64-byte aligned (numpy.lib.format contract)") {
    val path = tmpFile("aligned.npy")
    NpyIO.write(path, mat(3, 5).iterator, 3, 5)
    val h = NpyIO.readHeader(path)
    assert(h.dataOffset % 64 == 0, s"offset ${h.dataOffset}")
    // and the file is exactly header + N*D*4 bytes
    assert(Files.size(Paths.get(path)) == h.dataOffset + 3L * 5 * 4)
  }

  test("small targetPartitionBytes splits into many byte-range tasks, same result") {
    val m = mat(100, 8, seed = 11L)
    val path = tmpFile("split.npy")
    NpyIO.write(path, m.iterator, 100, 8)
    val df = NpyIO.loadMatrix(spark, path, targetPartitionBytes = 8 * 4 * 7) // 7 rows/task
    assert(df.rdd.getNumPartitions == 15, "ceil(100/7) = 15 range tasks")
    val got = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    assert(got.length == 100 && got.map(_._1).sameElements(0L until 100L))
    got.foreach { case (id, v) => assert(v.sameElements(m(id.toInt))) }
  }

  test("<f8 matrix reads with doubles narrowed to float") {
    val vals = Array(1.5, -2.25, math.Pi, 0.0, 1e-9, -1e9)
    val bb = ByteBuffer.allocate(vals.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    vals.foreach(bb.putDouble)
    val path = tmpFile("f8.npy")
    Files.write(Paths.get(path), npyBytes("<f8", "(3, 2)", bb.array()))
    val got = NpyIO.loadMatrix(spark, path).collect()
      .sortBy(_.getLong(0)).flatMap(_.getSeq[Float](1))
    assert(got.sameElements(vals.map(_.toFloat)))
  }

  test("<i8 and 1-D shapes: ids column loads as single-col float matrix") {
    val ids = Array(0L, 5L, 42L, 1000L)
    val bb = ByteBuffer.allocate(ids.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    ids.foreach(bb.putLong)
    val path = tmpFile("i8.npy")
    Files.write(Paths.get(path), npyBytes("<i8", "(4,)", bb.array()))
    val h = NpyIO.readHeader(path)
    assert(h.rows == 4 && h.cols == 1)
    val got = NpyIO.loadMatrix(spark, path).collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Float](1).head)
    assert(got.sameElements(ids.map(_.toFloat)))
  }

  test("v2.0 header (4-byte length field) parses") {
    val bb = ByteBuffer.allocate(2 * 4).order(ByteOrder.LITTLE_ENDIAN)
    Seq(1f, 2f).foreach(bb.putFloat)
    val h = parseHeader(npyBytes("<f4", "(2, 1)", bb.array(), major = 2))
    assert(h.rows == 2 && h.cols == 1 && h.descr == "<f4")
  }

  test("rejects: bad magic, fortran order, unsupported dtype, 3-D shape") {
    intercept[IllegalArgumentException] {
      parseHeader("not numpy at all........".getBytes)
    }
    intercept[IllegalArgumentException] {
      parseHeader(npyBytes("<f4", "(2, 1)", new Array[Byte](8), fortran = "True"))
    }
    intercept[IllegalArgumentException] {
      parseHeader(npyBytes("<c16", "(2, 1)", new Array[Byte](32)))
    }
    intercept[IllegalArgumentException] {
      parseHeader(npyBytes("<f4", "(2, 1, 3)", new Array[Byte](24)))
    }
  }

  test("truncated data section fails loudly, not with silent short rows") {
    val path = tmpFile("trunc.npy")
    // header promises (4, 2) f4 = 32 data bytes; provide 20
    Files.write(Paths.get(path), npyBytes("<f4", "(4, 2)", new Array[Byte](20)))
    val e = intercept[Exception] { NpyIO.loadMatrix(spark, path).collect() }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c =>
      c.getMessage != null && (c.getMessage.contains("truncated") || c.getMessage.contains("EOF"))),
      s"unexpected failure chain: $e")
  }

  test("Ingest.writeVectorsNpy → loadVectorsNpy round-trips the embeddings schema") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(0.6f, 0.8f), 1), (1L, Array(1.0f, 0.0f), 2),
      (2L, Array(0.0f, -1.0f), 1)).toDF("vec_id", "embedding", "label")
    val path = tmpFile("vectors.npy")
    Ingest.writeVectorsNpy(emb, path)
    val got = Ingest.loadVectorsNpy(spark, path)
    assert(got.columns.toSeq == Seq("vec_id", "embedding"))
    val rows = got.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    assert(rows.map(_._1).sameElements(Array(0L, 1L, 2L)))
    assert(rows(0)._2.sameElements(Array(0.6f, 0.8f)))
    assert(rows(2)._2.sameElements(Array(0.0f, -1.0f)))
  }

  test("ingest_npy summary matches a direct summary of the source table") {
    val d = "/root/testdata/sf0.001"
    val r = graft.queries.IngestQueries.ingestNpy(spark, d).collect()(0)
    val emb = Tables.embeddings(spark, d)
    val n = emb.count()
    assert(r.getLong(0) == n, "n")
    assert(r.getLong(2) == 0L && r.getLong(3) == n - 1, "contiguous ids")
    assert(r.getLong(4) == n, "distinct")
    assert(r.getLong(5) == n, "all unit-norm survived the binary round-trip")
  }
}
