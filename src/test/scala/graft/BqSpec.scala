package graft

import graft.functions.VectorFunctions._
import graft.search._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binary-quantization contracts: the sign-bit encode layout, Hamming
  * symmetry with the driver-side query encode, exactness at full
  * shortlist, a recall floor for the default shortlist, and the
  * append/remove maintenance identities (exact here — the quantizer is
  * stateless, so append can never drift).
  */
class BqSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, sf)
  private val q0 = QueryVectors.qvec(0)
  private lazy val model = Bq.build(emb)

  test("encode sets exactly the positive-dim bits, LSB-first, zero padding") {
    val rows = model.codes.join(emb, "vec_id").limit(50)
      .select(col("embedding"), col("bq_codes"))
      .as[(Array[Float], Array[Byte])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (v, code) =>
      assert(code.length == (v.length + 7) / 8)
      v.indices.foreach { i =>
        val bit = (code(i >> 3) >> (i & 7)) & 1
        assert(bit == (if (v(i) > 0f) 1 else 0), s"dim $i sign bit")
      }
      // pad bits beyond dim stay zero
      (v.length until code.length * 8).foreach { i =>
        assert(((code(i >> 3) >> (i & 7)) & 1) == 0, s"pad bit $i")
      }
    }
  }

  test("bqHamming matches a local popcount and the query-side encode agrees") {
    val qcode = model.encodeQuery(q0)
    val rows = model.codes.limit(50)
      .select(col("bq_codes"), bqHamming(col("bq_codes"), qcode).as("h"))
      .as[(Array[Byte], Int)].collect()
    rows.foreach { case (code, h) =>
      val want = code.zip(qcode)
        .map { case (a, b) => Integer.bitCount((a ^ b) & 0xFF) }.sum
      assert(h == want)
    }
    // self-distance zero: encoding a corpus vector and comparing to its own
    // code row must give hamming 0
    val (vid, v) = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].first()
    val self = model.codes.where(col("vec_id") === vid)
      .select(bqHamming(col("bq_codes"), model.encodeQuery(v)).as("h"))
      .as[Int].first()
    assert(self == 0)
  }

  test("search at full shortlist equals exact topK (refine sees everything)") {
    val n = emb.count().toInt
    val got = model.search(q0, 10, shortlist = n).as[(Long, Double)].collect().toSeq
    val want = VectorSearch.topK(emb, q0, 10).as[(Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("recall floor at the default shortlist") {
    val got = model.search(q0, 10, shortlist = 100)
      .select("vec_id").as[Long].collect().toSet
    val want = VectorSearch.topK(emb, q0, 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = (got & want).size.toDouble / want.size
    // sign-bit codes are the coarsest tier: floor is deliberately modest,
    // the refine step recovers exact order within the shortlist
    assert(recall >= 0.5, s"bq recall $recall below floor")
  }

  test("append(batch) over a split corpus is IDENTICAL to building on the union") {
    val resident = emb.where(pmod(col("vec_id"), lit(10)) =!= 0)
    val batch = emb.where(pmod(col("vec_id"), lit(10)) === 0)
    val appended = Bq.build(resident).append(batch)
    val full = Bq.build(emb)
    // stateless quantizer: code tables agree row-for-row, not just search
    val a = appended.codes.as[(Long, Array[Byte])].collect()
      .map { case (id, c) => id -> c.toSeq }.toMap
    val f = full.codes.as[(Long, Array[Byte])].collect()
      .map { case (id, c) => id -> c.toSeq }.toMap
    assert(a == f)
    val got = appended.search(q0, 10, shortlist = 100).as[(Long, Double)].collect().toSeq
    val want = full.search(q0, 10, shortlist = 100).as[(Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("remove tombstones ids out of search results; full shortlist stays exact") {
    val tomb = emb.select(col("vec_id")).where(pmod(col("vec_id"), lit(10)) === 0)
    val n = emb.count().toInt
    val removed = model.remove(tomb)
    val got = removed.search(q0, 10, shortlist = n).as[(Long, Double)].collect().toSeq
    val want = VectorSearch
      .topK(emb.where(pmod(col("vec_id"), lit(10)) =!= 0), q0, 10)
      .as[(Long, Double)].collect().toSeq
    assert(got == want)
    assert(got.forall { case (id, _) => id % 10 != 0 })
  }

  test("persisted round-trip serves identical results; stats geometry sane") {
    val dir = java.nio.file.Files.createTempDirectory("bq-spec").toString
    Bq.write(model, s"$dir/idx")
    val loaded = Bq.load(spark, s"$dir/idx", emb)
    val got = loaded.search(q0, 10, shortlist = 100).as[(Long, Double)].collect().toSeq
    val want = model.search(q0, 10, shortlist = 100).as[(Long, Double)].collect().toSeq
    assert(got == want)
    val st = model.stats().collect()(0)
    assert(st.getAs[Long]("n_vectors") == emb.count())
    assert(st.getAs[Int]("code_bytes_per_vec") == (QueryVectors.Dim + 7) / 8)
    assert(st.getAs[Int]("raw_bytes_per_vec") ==
      st.getAs[Int]("code_bytes_per_vec") * 32)
    val mp = st.getAs[Double]("mean_popcount")
    assert(mp > 0 && mp < QueryVectors.Dim)
  }
}
