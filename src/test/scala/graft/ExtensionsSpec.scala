package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions registers the native expressions as SQL functions
  * (spark.sql.extensions=graft.GraftExtensions in SparkTest's builder —
  * the same string-config path a cluster deployment uses). */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  test("dot_f32 / l2_norm_f32 callable from SQL") {
    val r = spark.sql(
      """SELECT dot_f32(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       l2_norm_f32(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
  }

  test("sorted_intersect_size callable from SQL") {
    val r = spark.sql(
      "SELECT sorted_intersect_size(array(1L, 3L, 5L), array(1L, 2L, 3L)) AS s")
      .collect()(0)
    assert(r.getInt(0) == 2)
  }

  test("token_set_* / simhash64 callable from SQL (literal shingle size)") {
    val r = spark.sql(
      """SELECT token_set_size('B b apple b', 1) AS n,
        |       token_set_min_md5('b apple', 1) AS blk,
        |       simhash64(token_set_ids('b apple', 1)) AS sig""".stripMargin)
      .collect()(0)
    assert(r.getInt(0) == 2)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getString(1) == Seq("b", "apple").map(md5hex).min)
    // signature matches the batch expression over the same text
    import org.apache.spark.sql.functions.{col, lit}
    import graft.functions.VectorFunctions._
    import spark.implicits._
    val batch = Seq("b apple").toDF("text")
      .select(simHash64(tokenSetIds(col("text"), 1))).collect()(0).getLong(0)
    assert(r.getLong(2) == batch)
    // non-literal shingle size is rejected at registration contract
    intercept[Exception] {
      spark.sql("SELECT token_set_size('x', CAST(rand() * 2 AS INT) + 1)").collect()
    }
  }

  test("sql query over parquet embeddings with registered functions") {
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb_sql")
    val bad = spark.sql(
      "SELECT count(*) FROM emb_sql WHERE abs(l2_norm_f32(embedding) - 1.0) > 0.001")
      .collect()(0).getLong(0)
    assert(bad == 0)
  }

  test("char_entropy / cdc_boundaries callable from SQL") {
    val e = spark.sql("SELECT char_entropy('aabb') AS e").collect().head.getDouble(0)
    assert(math.abs(e - math.log(2)) < 1e-12)
    val text = Seq.fill(40)("alpha beta gamma delta").mkString(" ")
    val bs = spark.sql(s"SELECT cdc_boundaries('$text') AS b")
      .collect().head.getSeq[Long](0)
    // matches the operator's rule: every boundary indexes a window whose
    // md5 opens below 0x04
    val md = java.security.MessageDigest.getInstance("MD5")
    bs.foreach { i =>
      md.reset()
      val d = md.digest(text.substring(i.toInt - 16, i.toInt)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      assert((d(0) & 0xFF) < 4)
    }
    assert(bs == bs.sorted)
  }
}
