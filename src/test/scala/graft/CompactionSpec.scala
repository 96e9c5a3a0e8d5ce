package graft

import graft.search.{Ivf, QueryVectors, VectorSearch}
import graft.sources.Compaction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction contracts: file-layout collapse, row/content conservation,
  * search reload-equivalence over a compacted persisted index, and the
  * restore-on-failed-publish discipline. */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, sf)
  private val q0 = QueryVectors.qvec(0)

  private def stageAppendedIndex(): (graft.search.IvfModel, String) = {
    val model = Ivf.build(emb.where(pmod(col("vec_id"), lit(10)) =!= 0),
      nlist = 8, maxIter = 5)
    val tmp = java.nio.file.Files.createTempDirectory("compact-spec").toString
    model.indexed.repartition(col("list_id"))
      .write.partitionBy("list_id").parquet(s"$tmp/data")
    Ivf.appendToPath(model, emb.where(pmod(col("vec_id"), lit(20)) === 0), tmp)
    Ivf.appendToPath(model, emb.where(pmod(col("vec_id"), lit(20)) === 10), tmp)
    (model, tmp)
  }

  test("compaction collapses append files; rows and content conserved") {
    val (_, tmp) = stageAppendedIndex()
    val before = spark.read.parquet(s"$tmp/data")
      .select("vec_id", "list_id").as[(Long, Int)].collect().sorted.toSeq
    val rep = Compaction.compactPartitioned(spark, s"$tmp/data", "list_id")
    // three writes (resident + 2 appends) → strictly more files than lists;
    // after: at most one data file per list partition
    assert(rep.filesBefore > rep.partitions)
    assert(rep.filesAfter <= rep.partitions)
    val after = spark.read.parquet(s"$tmp/data")
      .select("vec_id", "list_id").as[(Long, Int)].collect().sorted.toSeq
    assert(after == before)
  }

  test("a reloaded compacted index serves identical full-probe results") {
    val (model, tmp) = stageAppendedIndex()
    val nlist = model.centroids.length
    val loadedBefore = graft.search.IvfModel(
      model.centroids, spark.read.parquet(s"$tmp/data"))
    val want = loadedBefore.search(q0, nprobe = nlist, k = 10)
      .as[(Long, Double)].collect().toSeq
    Compaction.compactPartitioned(spark, s"$tmp/data", "list_id")
    val loadedAfter = graft.search.IvfModel(
      model.centroids, spark.read.parquet(s"$tmp/data"))
    val got = loadedAfter.search(q0, nprobe = nlist, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(got == want)
    // and full-probe over the appended+compacted table == exact over the union
    val exact = VectorSearch.topK(emb, q0, 10).as[(Long, Double)].collect().toSeq
    assert(got == exact)
  }

  test("compacting a non-directory fails fast") {
    intercept[IllegalArgumentException] {
      Compaction.compactPartitioned(spark, "/does/not/exist", "list_id")
    }
  }
}
