package graft

import graft.search._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQ8 (scalar quantization) contracts: the per-dimension reconstruction
  * bound, the asymmetric-score identity, exactness at full shortlist,
  * near-exact ADC recall, deterministic encode, and the append/remove
  * maintenance semantics shared with the other index tiers.
  */
class SqSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, sf)
  private val q0 = QueryVectors.qvec(0)
  // train on the FULL corpus (n ≤ maxTrainRows at sf0.001) so every value
  // is inside the trained range and the delta/2 bound is unconditional
  private lazy val model = Sq.build(emb)

  private def decode(m: SqModel, code: Array[Byte]): Array[Float] =
    Array.tabulate(m.dim)(i => m.vmin(i) + (code(i) & 0xFF) * m.delta(i))

  test("reconstruction error is bounded by delta/2 per dimension in-range") {
    val rows = model.codes.join(emb, "vec_id")
      .select(col("embedding"), col("sq_codes"))
      .as[(Array[Float], Array[Byte])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (v, code) =>
      val dec = decode(model, code)
      var i = 0
      while (i < model.dim) {
        // rounding to the nearest of 256 levels: error ≤ half a step
        // (+ulp slack for the f32 grid arithmetic)
        assert(math.abs(v(i) - dec(i)) <= model.delta(i) / 2 + 1e-6,
          s"dim $i: |${v(i)} - ${dec(i)}| > ${model.delta(i) / 2}")
        i += 1
      }
    }
  }

  test("adcScore equals the exact dot product against the decoded vector") {
    val rows = model.codes.limit(50)
      .select(col("sq_codes"), round(model.adcScore(q0), 6).as("s"))
      .as[(Array[Byte], Double)].collect()
    rows.foreach { case (code, s) =>
      val want = VecMath.round6(VecMath.dot(decode(model, code), q0))
      assert(math.abs(s - want) <= 1e-6, s"adc $s != decoded-dot $want")
    }
  }

  test("search at full shortlist equals exact topK (refine sees everything)") {
    val n = emb.count().toInt
    val got = model.search(q0, 10, shortlist = n).as[(Long, Double)].collect().toSeq
    val want = VectorSearch.topK(emb, q0, 10).as[(Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("ADC-only recall@10 is near-exact (8 bits/dim barely perturbs ranking)") {
    val got = model.searchNoRefine(q0, 10)
      .select(lit(0L).as("qid"), col("vec_id"))
    val exact = VectorSearch.topK(emb, q0, 10)
      .select(lit(0L).as("qid"), col("vec_id"))
    val r = VectorSearch.recallAtK(got, exact, 10)
      .select("recall").first().getDouble(0)
    assert(r >= 0.9, s"sq adc recall $r < 0.9")
  }

  test("encode is deterministic: two builds produce identical code tables") {
    val again = Sq.build(emb)
    assert(model.vmin.sameElements(again.vmin) && model.delta.sameElements(again.delta))
    val diff = model.codes.withColumnRenamed("sq_codes", "a")
      .join(again.codes.withColumnRenamed("sq_codes", "b"), "vec_id")
      .where(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("append encodes with frozen params; full-shortlist search covers the union") {
    val base = emb.where(col("vec_id") < 400)
    val batch = emb.where(col("vec_id") >= 400)
    val m = Sq.build(base).append(batch)
    // frozen quantizer: params are the base fit, untouched by append
    val baseOnly = Sq.build(base)
    assert(m.vmin.sameElements(baseOnly.vmin) && m.delta.sameElements(baseOnly.delta))
    val n = emb.count().toInt
    val got = m.search(q0, 10, shortlist = n).as[(Long, Double)].collect().toSeq
    val want = VectorSearch.topK(emb, q0, 10).as[(Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("remove tombstones both tables; search equals exact over survivors") {
    val exactAll = VectorSearch.topK(emb, q0, 10).as[(Long, Double)].collect().toSeq
    val dropIds = exactAll.take(3).map(_._1)
    val m = model.remove(dropIds.toDF("vec_id"))
    val n = emb.count().toInt
    val got = m.search(q0, 10, shortlist = n).as[(Long, Double)].collect().toSeq
    val want = VectorSearch.topK(emb.where(!col("vec_id").isin(dropIds: _*)), q0, 10)
      .as[(Long, Double)].collect().toSeq
    assert(got == want)
    assert(got.map(_._1).intersect(dropIds).isEmpty)
  }

  test("stats invariants: counts conserved, 4x compression geometry") {
    val r = model.stats().first()
    assert(r.getAs[Long]("n_vectors") == emb.count())
    assert(r.getAs[Int]("dim") == model.dim)
    assert(r.getAs[Int]("code_bytes_per_vec") * 4 == r.getAs[Int]("raw_bytes_per_vec"))
    assert(r.getAs[Int]("n_const_dims") >= 0)
  }

  test("persist round-trip: load serves the same full-shortlist results") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sq-spec").toString
    val path = s"$dir/sq"
    Sq.write(model, path)
    val loaded = Sq.load(spark, path, emb)
    assert(loaded.vmin.sameElements(model.vmin) && loaded.delta.sameElements(model.delta))
    val n = emb.count().toInt
    val got = loaded.search(q0, 10, shortlist = n).as[(Long, Double)].collect().toSeq
    val want = VectorSearch.topK(emb, q0, 10).as[(Long, Double)].collect().toSeq
    assert(got == want)
  }
}
