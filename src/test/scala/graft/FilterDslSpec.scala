package graft

import graft.filters.FilterDsl
import graft.filters.FilterDsl.FilterSpecError
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class FilterDslSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def df = Seq(
    (0L, "FL", Some(4.5), 10),
    (1L, "TN", Some(3.0), 200),
    (2L, "FL", None, 50),
    (3L, "fl", Some(5.0), 500)
  ).toDF("id", "state", "stars", "review_count")

  test("eq matches exactly, case-sensitive") {
    val got = FilterDsl.applyJson(df, """{"state":{"eq":"FL"}}""")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(0L, 2L))
  }

  test("null fails predicates including ne") {
    // id=2 has NULL stars: must be excluded by both ge and ne
    assert(FilterDsl.applyJson(df, """{"stars":{"ge":0}}""").count() == 3)
    assert(FilterDsl.applyJson(df, """{"stars":{"ne":3.0}}""")
      .select("id").as[Long].collect().sorted.toSeq == Seq(0L, 3L))
  }

  test("between is inclusive") {
    val got = FilterDsl.applyJson(df, """{"review_count":{"between":[50,200]}}""")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("like is case-insensitive substring") {
    val got = FilterDsl.applyJson(df, """{"state":{"like":"fl"}}""").count()
    assert(got == 3)
  }

  test("in with mixed castable values") {
    val got = FilterDsl.applyJson(df, """{"review_count":{"in":[10,"500"]}}""")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(0L, 3L))
  }

  test("cast failure excludes all rows") {
    assert(FilterDsl.applyJson(df, """{"review_count":{"eq":"notanumber"}}""").count() == 0)
  }

  test("unknown field is a hard error") {
    intercept[FilterSpecError] {
      FilterDsl.applyJson(df, """{"nope":{"eq":1}}""").count()
    }
  }

  test("unknown operator is a hard error") {
    intercept[FilterSpecError] {
      FilterDsl.parseJson("""{"state":{"regex":"F.*"}}""")
    }
  }

  test("geo requires both lat and lon") {
    intercept[FilterSpecError] {
      FilterDsl.parseJson("""{"stars":{"lat_between":[0,1]}}""")
    }
  }

  test("geo ops on non-latitude/longitude columns are a hard error") {
    // reference validators.py:153-156 rejects geo ops on other columns
    intercept[FilterSpecError] {
      FilterDsl.parseJson(
        """{"stars":{"lat_between":[0,1]},"review_count":{"lon_between":[0,1]}}""")
    }
    val geoDf = df.withColumnRenamed("stars", "latitude")
      .withColumnRenamed("review_count", "longitude")
    val ok = FilterDsl.applyJson(geoDf,
      """{"latitude":{"lat_between":[3,5]},"longitude":{"lon_between":[0,600]}}""")
    assert(ok.count() == 3) // NULL latitude row fails
  }

  test("geo filter requires the latitude/longitude columns to exist") {
    // reference validators.py:161-165: missing geo columns are an error
    intercept[FilterSpecError] {
      FilterDsl.applyJson(df,
        """{"latitude":{"lat_between":[0,1]},"longitude":{"lon_between":[0,1]}}""").count()
    }
  }

  test("like on array columns pipe-joins values (reference validators.py:219)") {
    import org.apache.spark.sql.functions._
    val arrDf = df.withColumn("tags", array(col("state"), lit("xyz")))
    // "FL|xyz" contains "l|x" after lowering — a plain cast would render
    // "[FL, xyz]" and match ", " patterns instead
    assert(FilterDsl.applyJson(arrDf, """{"tags":{"like":"l|x"}}""").count() == 3)
    assert(FilterDsl.applyJson(arrDf, """{"tags":{"like":", "}}""").count() == 0)
  }

  test("non-finite numeric literals are cast failures on integer columns") {
    assert(FilterDsl.applyJson(df, """{"review_count":{"eq":1e999}}""").count() == 0)
  }

  test("malformed json is a hard error") {
    intercept[FilterSpecError] {
      FilterDsl.parseJson("""{"state": {""")
    }
  }

  test("empty filter selects everything; selectivity 1.0") {
    assert(FilterDsl.applyJson(df, "{}").count() == 4)
    val sel = FilterDsl.selectivity(df, FilterDsl.parseJson("{}"))
      .as[Double].head()
    assert(sel == 1.0)
  }

  test("selectivity fraction") {
    val sel = FilterDsl.selectivity(df, FilterDsl.parseJson("""{"state":{"eq":"FL"}}"""))
      .as[Double].head()
    assert(sel == 0.5)
  }
}
