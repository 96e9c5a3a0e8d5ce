package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table storage for co-located fact-fact joins (SURVEY.md §2
  * #54). At 100 TB the lineitem⋈orders join's shuffle IS the cost; when
  * both tables are written bucketed (and sorted) by the join key with the
  * same bucket count, Spark plans the join with NO Exchange on either
  * side — each task reads matching bucket files directly. This is the
  * storage-layout decision a warehouse makes ONCE at ingest to make every
  * later join on that key shuffle-free.
  */
object Bucketing {

  /** Write `df` as a bucketed (+sorted) table in the session catalog.
    * The session catalog is in-memory, but managed-table DIRECTORIES
    * survive the JVM — CTAS refuses to reuse one (LOCATION_ALREADY_
    * EXISTS), so a stale location from a previous run is dropped first. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:").replaceAll("^//", "/")
    val loc = new java.io.File(wh, table.toLowerCase(java.util.Locale.ROOT))
    if (loc.exists()) {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(del)); f.delete(); ()
      }
      del(loc)
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Bucket-aware join of two previously bucketed tables: with matching
    * bucket counts on the join keys, the planner needs no shuffle (and
    * with sortBy, no extra sort) — assert via `.explain`. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
  }
}
