package graft

import graft.sources.Ingest
import graft.sources.Ingest.SchemaError
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ingest pipeline contracts (reference artifacts/artifacts.py): raw
  * JSON-lines → typed validated parquet, contiguous ids, normalization,
  * queries.parquet round trip.
  */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def tmpDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_ingest")

  private val rawLines = Seq(
    """{"state":"FL","city":"Miami","stars":4.5,"review_count":12,"attributes":{"RestaurantsPriceRange2":"2"},"categories":"Food","latitude":25.7,"longitude":-80.2,"is_open":1}""",
    """{"state":"TN","city":"Nash","stars":3.0,"review_count":7,"attributes":{"RestaurantsPriceRange2":"None"},"categories":null,"latitude":36.1,"longitude":-86.7,"is_open":0}""",
    """{"state":null,"city":"X","stars":1.0,"review_count":1,"attributes":null}""",
    """{"state":"CA","city":"LA","stars":null,"review_count":3,"attributes":null}""",
    """{"state":"WA","city":"Sea","stars":2.5,"review_count":9,"attributes":{"RestaurantsPriceRange2":"1"}}""")

  test("buildMetadata: typed columns, price derived, null-required dropped, ids contiguous") {
    val dir = tmpDir()
    val p = dir.resolve("raw.json").toString
    java.nio.file.Files.write(dir.resolve("raw.json"),
      rawLines.mkString("\n").getBytes)
    val meta = Ingest.buildMetadata(spark, p)
    Ingest.validateMetadata(meta) // must not throw
    val rows = meta.orderBy("id").collect()
    assert(rows.length == 3) // null state and null stars rows dropped
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    val byState = meta.select("state", "price_range").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(byState("FL").contains(2.toByte))
    assert(byState("TN").isEmpty)  // "None" price → null
    assert(byState("WA").contains(1.toByte))
  }

  test("validateMetadata rejects missing columns, wrong types, gapped ids") {
    val good = Ingest.buildMetadata(spark, {
      val dir = tmpDir()
      java.nio.file.Files.write(dir.resolve("raw.json"), rawLines.mkString("\n").getBytes)
      dir.resolve("raw.json").toString
    })
    intercept[SchemaError] { Ingest.validateMetadata(good.drop("stars")) }
    intercept[SchemaError] {
      Ingest.validateMetadata(good.withColumn("stars", col("stars").cast("double")))
    }
    intercept[SchemaError] {
      Ingest.validateMetadata(good.withColumn("id", col("id") + 5))
    }
    intercept[SchemaError] {
      Ingest.validateMetadata(good.withColumn("state",
        when(col("id") === 0, lit(null)).otherwise(col("state"))))
    }
  }

  test("normalized rescales off-unit vectors, keeps unit ones bitwise") {
    val df = Seq(
      (0L, Array(3.0f, 4.0f)),          // norm 5 → rescale
      (1L, Array(0.6f, 0.8f)),          // unit → untouched
      (2L, Array(0.0f, 0.0f))           // zero → null
    ).toDF("vec_id", "embedding")
    val out = Ingest.normalized(df).orderBy("vec_id")
      .as[(Long, Option[Array[Float]])].collect()
    assert(out(0)._2.get.toSeq == Seq(0.6f, 0.8f))
    assert(out(1)._2.get.toSeq == Seq(0.6f, 0.8f))
    assert(out(2)._2.isEmpty)
  }

  test("vectors.meta.json records N/D/normalized like the reference artifact") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val p = tmpDir().resolve("vectors.meta.json")
    Ingest.writeVectorsMeta(emb, p.toString, model = "seeded-gaussian-64")
    val json = java.nio.file.Files.readString(p)
    assert(json.contains("\"N\": 500") && json.contains("\"D\": 64"))
    assert(json.contains("\"normalized\": true"))
    assert(json.contains("\"model\": \"seeded-gaussian-64\""))
  }

  test("queries.parquet round trip preserves the query set") {
    val dir = tmpDir().resolve("queries.parquet").toString
    Ingest.writeQueries(spark, dir)
    val back = Ingest.readQueries(spark, dir)
    val want = graft.search.QuerySet.default
    assert(back.length == want.length)
    back.zip(want).foreach { case (b, w) =>
      assert(b.qid == w.qid && b.filters == w.filters && b.k == w.k)
      assert(b.qvec.toSeq == w.qvec.toSeq)
      assert(b.qtext == w.qtext) // reference schema carries qtext (encode seam)
    }
    // a qtext-only query round-trips and resolves through the encoder
    val dir2 = tmpDir().resolve("queries_text.parquet").toString
    Ingest.writeQueries(spark, dir2, Seq(
      graft.search.HybridQuery(5, Array.empty[Float], "{}", "TRUE", 5, qtext = "find widgets")))
    val b2 = Ingest.readQueries(spark, dir2)
    assert(b2.head.qtext == "find widgets" && b2.head.qvec.isEmpty)
    val rows = graft.harness.RunHarness.runMany(
      spark, "/root/testdata/sf0.001", Seq("exact"), b2)
    assert(rows.head.recallAtK == 1.0)
  }

  test("random baseline is deterministic, K distinct in-range ids") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = graft.search.VectorSearch.randomK(emb, 10).as[Long].collect()
    val b = graft.search.VectorSearch.randomK(emb, 10).as[Long].collect()
    assert(a.toSeq == b.toSeq && a.distinct.length == 10)
    assert(a.forall(id => id >= 0 && id < 500))
    val other = graft.search.VectorSearch.randomK(emb, 10, seed = 1L).as[Long].collect()
    assert(other.toSeq != a.toSeq)
  }

  test("Ivf.auto falls back to exact (None) when the corpus is too small") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    assert(graft.search.Ivf.auto(emb).isEmpty) // 500 rows < 64 lists * 8
    assert(graft.search.Ivf.auto(emb, minPerList = 1).isDefined)
  }
}
