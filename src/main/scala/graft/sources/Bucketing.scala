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

  /** The shared bucket-count sizing rule for every bucketed layout
    * (#294 fact tables, #299 simhash chunk table, #302 minhash band
    * table): CEILING power of two of exploded-rows/1M (exact powers
    * stay put — 64M rows → 64, not 128), floored at 8 so small corpora
    * still parallelize. The ceiling is CLUSTER-PROPORTIONAL (r17
    * verdict #5, closing the 10,000× write-side watch): the largest
    * power of two ≤ 8 × defaultParallelism, never below the historical
    * 256 (so local[32] and the test JVMs behave exactly as before). At
    * a fixed 256 clamp the per-bucket-file write sort grows linearly
    * with the corpus (~23M rows ≈ 4.7 GB of row format per file at
    * 10,000× lineitem) and — worse — the join's read parallelism is
    * capped at 256 tasks no matter how many executors the cluster has;
    * tying the ceiling to defaultParallelism keeps bucket files ≈ task
    * sized (8 files/core) on any cluster, exactly the band-table
    * discipline of sizing layout state to the data AND the machine
    * (arithmetic in BASELINE §3k). */
  def pickBuckets(spark: SparkSession, explodedRows: Long): Int =
    pickBucketsFor(spark.sparkContext.defaultParallelism, explodedRows)

  private[graft] def pickBucketsFor(parallelism: Int, explodedRows: Long): Int = {
    // ceil-pow2 in LONG end to end: the old Int narrowing overflowed past
    // ~2.1e15 exploded rows and the Int shift hit the sign bit past
    // ~1.07e15 — outside the stated 100 TB regime, but the guard is free
    val x = math.max(1L, explodedRows / 1000000L)
    val ceilPow2 = if (x <= 1L) 1L else java.lang.Long.highestOneBit(x - 1L) << 1
    val ceiling = math.max(256L, java.lang.Long.highestOneBit(8L * math.max(1, parallelism)))
    // 2^30 hard cap keeps the Int conversion exact even for absurd
    // parallelism×volume combinations (no real layout wants a billion buckets)
    math.min(1L << 30, math.min(ceiling, math.max(8L, ceilPow2))).toInt
  }

  /** Write `df` as a bucketed (+sorted) table in the session catalog,
    * with the artifact publish discipline: CTAS lands in a pid/tid tmp
    * table first, then one catalog RENAME (a filesystem dir rename)
    * publishes it — a crash mid-write can never leave a HALF-WRITTEN
    * live table. The swap itself (drop live, then rename tmp→live) is
    * not atomic: a crash between the two leaves NO live table (the
    * complete tmp table is still on disk), and a reader racing the swap
    * can see the table missing for the gap. Both are tolerated here
    * because every consumer rebuilds through the memoizing
    * `bucketedTables`-style entry points rather than reading the
    * catalog name raw; the tmp table is verified complete before the
    * live one is dropped so the worst case is a rebuild, never data
    * loss. The session catalog is in-memory but managed-table
    * DIRECTORIES survive the JVM (CTAS refuses to reuse one —
    * LOCATION_ALREADY_EXISTS), so stale locations are removed via the
    * URI-correct warehouse path (a hand-parsed prefix-strip misreads
    * percent-encoded dirs and the guard silently misses). Concurrent
    * same-table writers remain unsupported, as in a real warehouse
    * where the ingest job owns the layout. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    writeBucketed(df, table, Seq(key), buckets)

  /** Multi-key variant: the join that should be co-located must cluster
    * on ALL bucket keys (Spark's default requireAllClusterKeysForCoPartition
    * rejects a bucket-key subset — a cval-only layout under a (cid, cval)
    * join plans `Bucketed: false (disabled by query planner)`). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit = {
    require(keys.nonEmpty, "bucketed write needs at least one key column")
    val spark = df.sparkSession
    def drop(name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS `$name`")
      val loc = new java.io.File(
        LocalArtifacts.asFile(spark.conf.get("spark.sql.warehouse.dir")),
        name.toLowerCase(java.util.Locale.ROOT))
      if (loc.exists()) LocalArtifacts.deleteRecursively(loc)
    }
    val tmp = s"${table}_tmp_${ProcessHandle.current().pid()}_${Thread.currentThread().getId}"
    drop(tmp)
    df.write.bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*).saveAsTable(tmp)
    // only retire the live table once the replacement is verifiably
    // complete — never trade a good table for a failed write
    require(spark.catalog.tableExists(tmp),
      s"bucketed publish: tmp table $tmp missing after CTAS")
    drop(table)
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
  }

  /** Drop every OTHER generation of a bucket-count-named layout before
    * publishing `keep` (r18 advice: a source regeneration that changes
    * the row count can change `pickBuckets`, renaming the table — the
    * previous generation `graft_b<oldN>_<suffix>` and its warehouse
    * directory would otherwise linger forever, since the mtime memo only
    * knows the NEW name). Matches `graft_b<digits>_<suffix>` exactly in
    * both the session catalog and the warehouse directory listing
    * (managed-table dirs survive the JVM without a catalog entry), so a
    * rebuild garbage-collects its own family and nothing else; the
    * pid/tid `_tmp_` names never match the anchored pattern. */
  private[graft] def dropSiblings(spark: SparkSession, suffix: String,
                                  keep: String): Unit = {
    val re = ("^graft_b\\d+_" + java.util.regex.Pattern.quote(
      suffix.toLowerCase(java.util.Locale.ROOT)) + "$").r
    val keepLc = keep.toLowerCase(java.util.Locale.ROOT)
    def stale(name: String): Boolean = {
      val n = name.toLowerCase(java.util.Locale.ROOT)
      n != keepLc && re.findFirstIn(n).isDefined
    }
    spark.catalog.listTables().collect().map(_.name).filter(stale)
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS `$n`"))
    val wh = LocalArtifacts.asFile(spark.conf.get("spark.sql.warehouse.dir"))
    Option(wh.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && stale(f.getName))
      .foreach(LocalArtifacts.deleteRecursively)
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
