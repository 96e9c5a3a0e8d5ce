package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Test seam for the CacheManager-empty invariant (operators.Pin doc):
  * the CacheManager is private[sql], so the PinSpec leak gate reads it
  * through this accessor. */
object CacheIntrospect {
  def cacheEmpty(spark: SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty

  /** Number of cached plans. The suite's leak gate asserts PER-CALL
    * growth (a leak adds an entry every call; a legitimate one-time
    * session pin — the LSH signature table — stays flat), so it needs
    * the count, which the CacheManager only exposes privately. */
  def cachedCount(spark: SparkSession): Int = {
    val cm = spark.sharedState.cacheManager
    val f = cm.getClass.getDeclaredField("cachedData")
    f.setAccessible(true)
    f.get(cm).asInstanceOf[scala.collection.immutable.IndexedSeq[_]].size
  }
}
