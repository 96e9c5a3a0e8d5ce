package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence probe: the five heaviest bench queries at 1× (sf0.1)
  * and R× (default 10×, the sf1 equivalent the driver testdata doesn't
  * ship), to record how their cost actually scales — the numbers
  * BASELINE.md §3 quotes.
  *
  * The R× corpus is SYNTHESIZED from sf0.1 under /tmp (testdata is
  * read-only): R replicas with offset ids. Text replicas are passed
  * through a PER-REPLICA TOKEN BIJECTION (a `translate` over the full
  * lowercase alphabet — see `perm`): within a replica every pairwise
  * token-set Jaccard is EXACTLY preserved (both docs map through the
  * same bijection, and the corpus text is all-lowercase), while across
  * replicas token collisions are rare and unbiased (seeded permutations
  * do have fixed points and pairwise agreements — two perms agree on a
  * 2-letter token with prob ≈ 1/650 — but a band key needs 8 minhash
  * agreements, so cross-replica candidates stay negligible) — so the
  * near-dup pair structure scales linearly (R× pairs), not quadratically
  * (naive
  * copies would make every doc an R-way exact dup and explode candidate
  * pairs ~R², measuring the data's degeneracy rather than the
  * operator's scaling).
  * Embedding replicas pass through a per-replica cyclic dimension
  * rotation (see `rot`) — orthogonal, so within-replica geometry is
  * exact while cross-replica similarity decorrelates; vec_ids offset.
  *
  * Timing mirrors Bench: noop sink, JIT-warm at sf0.001, index/serving
  * tiers warmed OUTSIDE the timed region at each scale (the reference
  * also excludes FAISS build time). Prints ONE JSON line:
  * {"metric":"scale_ratio", "queries": {name: {"t1":s, "tR":s,
  * "ratio":r}}, "replicas":R}.
  */
object ScaleBench {

  private val DefaultHeavy = Seq("corpus_curate", "dedup_minhash_lsh",
    "hybrid_stats", "decontaminate", "text_repetition")

  /** Probe-only queries — resolvable by SPARK_GRAFT_SCALE_QUERIES but
    * never registered in SparkEntry (no gate rows). The r17 verdict-#1
    * design-regime probe for #302: the registered dedup_incremental /
    * dedup_minhash_bucketed mine a batch that scales WITH the corpus
    * (doc_id % 10 == 0 holds at every replica offset), so the §3m probe
    * measured a growing batch against a growing corpus and the
    * exact-verify stage dominated. The 100 TB claim is about a FIXED
    * daily batch against a corpus-sized band table — these variants pin
    * the batch to replica 0's (ids below the replica offset, which is
    * byte-identical to the base corpus' batch since perm(0) is the
    * identity) while the corpus side keeps growing with R, so the pair's
    * shuffle/wall delta isolates the corpus-side Exchange the bucketed
    * layout removes. Both run the IDENTICAL production mining code
    * (Dedup.minhashIncrementalPairs[Bucketed]) — only the batch
    * predicate is probe-specific. */
  private val FixedBatchProbes
      : Map[String, (SparkSession, String) => DataFrame] = {
    def fixedBatch(docs: DataFrame): DataFrame =
      docs.where(pmod(col("doc_id"), lit(10)) === 0 && col("doc_id") < IdOffset)
    Map(
      "dedup_incremental_fixed" -> ((s, d) => {
        val docs = graft.Tables.documents(s, d)
        graft.dedup.Dedup.minhashIncrementalPairs(
          docs, graft.queries.DedupQueries.corpusBands(s, d),
          fixedBatch(docs), graft.queries.DedupQueries.JaccardTau)
      }),
      "dedup_minhash_bucketed_fixed" -> ((s, d) => {
        val docs = graft.Tables.documents(s, d)
        val (nb, nr, sd, sub) = graft.queries.DedupQueries.BandGeom
        graft.dedup.Dedup.minhashIncrementalPairsBucketed(
          docs,
          s.table(graft.queries.DedupQueries.minhashBandTable(s, d)),
          graft.dedup.Dedup.minhashBands(fixedBatch(docs), nb, nr, sd, sub),
          graft.queries.DedupQueries.JaccardTau)
      }))
  }

  /** De-aliased geo probe metadata (r19 verdict #2): the production
    * embeddingsMeta derives lat/lon as `vec_id % 180` / `(vec_id*7) % 320`
    * — under the replica offset 10M those alias hard (7·10M ≡ 0 mod 320,
    * so every replica lands on the IDENTICAL longitudes, and gcd(10M mod
    * 180, 180) = 20 leaves only 9 distinct latitude shifts), stacking
    * ~R/9 exact co-located copies per point and measuring the synthetic's
    * degeneracy, not the operator. Here lat/lon derive from xxhash64 of
    * the full vec_id, so replica points spread UNIFORMLY over a 496×960
    * quarter-degree grid (no replica structure survives the hash);
    * density grows linearly in R and the radius-join's candidate set
    * grows with density × points — the honest quadratic the WORKLOAD
    * carries (a fixed territory at growing density; the real 100 TB geo
    * axis is more territory at ~constant density, which this blocking
    * serves cluster-linearly). Latitude capped at |62|°: one 0.5° lon
    * cell is 25/(111.32·cos 62°) = 0.478° ≥ the 25 km radius, so the
    * 3×3 neighborhood stays COMPLETE (the geo_pairs contract). */
  private[graft] def uniformGeoMeta(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      (lit(-62.0) + pmod(xxhash64(col("vec_id"), lit(1)), lit(496))
        .cast("double") * 0.25).as("latitude"),
      (lit(-120.0) + pmod(xxhash64(col("vec_id"), lit(2)), lit(960))
        .cast("double") * 0.25).as("longitude"))

  /** Constant-DENSITY geo probe metadata — the §3r workload note turned
    * into a measurable synthetic: territory GROWS with the corpus. Grid
    * AREA scales ~linearly with the replica factor (√R per axis from a
    * 16×30 quarter-degree base, capped at [[uniformGeoMeta]]'s full
    * 496×960 completeness band), so per-cell occupancy stays the base
    * corpus' at every R — the real 100 TB geo axis (more territory at
    * ~constant density; uniformGeoMeta is the other axis, fixed
    * territory at growing density, the radius join's worst case). Same
    * hash derivation, grid centered on the equator so the |lat| ≤ 62°
    * 3×3-completeness cap holds at every grid size (496·0.25/2 = 62). */
  private[graft] def uniformGeoMetaCd(emb: DataFrame, replicas: Int): DataFrame = {
    val s = math.sqrt(replicas.toDouble)
    val rows = math.min(496L, math.ceil(16 * s).toLong)
    val cols = math.min(960L, math.ceil(30 * s).toLong)
    emb.select(col("vec_id"),
      (lit(-(rows * 0.25) / 2.0) + pmod(xxhash64(col("vec_id"), lit(1)), lit(rows))
        .cast("double") * 0.25).as("latitude"),
      (lit(-(cols * 0.25) / 2.0) + pmod(xxhash64(col("vec_id"), lit(2)), lit(cols))
        .cast("double") * 0.25).as("longitude"))
  }

  /** Replica factor of a probe dir: scaled dirs follow the FULL scaleDir
    * convention `.../graft-scale/v<N>/x<R>` (see main) — a base dir that
    * merely ends in x<digits> must NOT be mistaken for a scale dir (it
    * would silently mis-size the _cd grid). Lets a dir-polymorphic probe
    * closure size its synthetic to the corpus it reads with no discovery
    * job inside the timed region. R capped at 7 digits (the 10M id
    * offset bounds usable replicas far below that). */
  private[graft] def dirReplicas(dir: String): Int = {
    val m = java.util.regex.Pattern
      .compile(".*/graft-scale/v\\d+/x(\\d{1,7})/?$").matcher(dir)
    if (m.matches()) m.group(1).toInt else 1
  }

  /** Exact candidate count of the de-aliased radius join (the blocking's
    * cost driver): Σ over probe cells of n(cell)·n(neighbor) across the
    * 3×3 neighborhood, minus the self-pairs — a cheap two-aggregate job
    * emitted alongside the timed geo probes so the §3r classification
    * can check wall tracks candidates. */
  private def geoCandCountOf(meta: DataFrame): DataFrame = {
    // cell rule + neighborhood come from VectorQueries' single
    // definition — the auditor counts the candidate set of the SAME
    // blocking the operators run, by construction
    val V = graft.queries.VectorQueries
    val cells = meta
      .groupBy(V.geoCellLat(col("latitude")).as("cl"),
        V.geoCellLon(col("longitude")).as("co"))
      .agg(count(lit(1)).as("n"))
    val probe = cells.select(col("n").as("np"), V.geoNeighborhood.as("c"))
      .select(col("np"), col("c.cl").as("cl"), col("c.co").as("co"))
    val inclSelf = probe.join(cells, Seq("cl", "co"))
      // coalesce (ADVICE r20): sum() over zero rows is NULL — an empty
      // corpus must degrade the auditor to 0 candidates, not NPE the
      // caller's getLong
      .agg(coalesce(sum(col("np") * col("n")), lit(0L)).as("cand_incl_self"))
    // id_a ≠ id_b: every point meets itself once (its home cell is in its
    // own neighborhood) — subtract the total point count
    inclSelf.crossJoin(meta.agg(count(lit(1)).as("npts")))
      .select((col("cand_incl_self") - col("npts")).as("candidates"))
  }

  /** Probe-only workload variants: the IDENTICAL production operator
    * code over a synthetic that fixes what the replica build distorts —
    * `_u` geo rows run geoPairsOf/geoKnnOf over [[uniformGeoMeta]]
    * (de-aliased, fixed territory / growing density), `_cd` rows over
    * [[uniformGeoMetaCd]] (constant density / growing territory — the
    * 100 TB axis), and `er_fuzzy_parts_g` runs the production
    * erFuzzyPartsOf over the name-GROWN part table (the §3r honesty
    * note measured: distinct names ×R; falls back to the plain part
    * table on an unbuilt/base dir, where grownPart(·, 1) is the
    * identity). Only the synthetic input ever changes. */
  private val WorkloadProbes: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo_pairs_u" -> ((s, d) => graft.queries.VectorQueries.geoPairsOf(
      uniformGeoMeta(graft.Tables.embeddings(s, d)))),
    "geo_knn_u" -> ((s, d) => graft.queries.VectorQueries.geoKnnOf(
      uniformGeoMeta(graft.Tables.embeddings(s, d)))),
    "geo_cand_u" -> ((s, d) => geoCandCountOf(
      uniformGeoMeta(graft.Tables.embeddings(s, d)))),
    "geo_pairs_cd" -> ((s, d) => graft.queries.VectorQueries.geoPairsOf(
      uniformGeoMetaCd(graft.Tables.embeddings(s, d), dirReplicas(d)))),
    "geo_cand_cd" -> ((s, d) => geoCandCountOf(
      uniformGeoMetaCd(graft.Tables.embeddings(s, d), dirReplicas(d)))),
    "er_fuzzy_parts_g" -> ((s, d) => {
      val grown = s"$d/part_g.parquet"
      if (new java.io.File(s"$grown/_SUCCESS").exists())
        graft.queries.QualityQueries.erFuzzyPartsOf(s.read.parquet(grown))
      else if (dirReplicas(d) == 1)
        // base dirs only: grownPart(·, 1) is the identity, so the plain
        // table IS the R=1 grown corpus (the probe≡production spec pin)
        graft.queries.QualityQueries.erFuzzyPartsOf(
          s.read.parquet(s"$d/part.parquet"))
      else throw new IllegalStateException(
        s"scaled dir $d has no part_g table — add part_g to " +
          "SPARK_GRAFT_SCALE_TABLES; falling back to the replicated " +
          "plain part table would silently re-measure the bounded-name " +
          "degeneracy this probe exists to fix")
    }),
    // token-REALISTIC ER growth (part_t doc): same production operator,
    // names grown over real TPC-H color words — the r20 collision
    // prediction's measurement row
    "er_fuzzy_parts_t" -> ((s, d) => {
      val grown = s"$d/part_t.parquet"
      if (new java.io.File(s"$grown/_SUCCESS").exists())
        graft.queries.QualityQueries.erFuzzyPartsOf(s.read.parquet(grown))
      else if (dirReplicas(d) == 1)
        graft.queries.QualityQueries.erFuzzyPartsOf(
          realTokenPart(s.read.parquet(s"$d/part.parquet")))
      else throw new IllegalStateException(
        s"scaled dir $d has no part_t table — add part_t to " +
          "SPARK_GRAFT_SCALE_TABLES")
    }))

  private[graft] def resolveQuery(
      name: String): (SparkSession, String) => DataFrame =
    graft.SparkEntry.queries.getOrElse(name,
      FixedBatchProbes.getOrElse(name,
        WorkloadProbes.getOrElse(name,
          throw new NoSuchElementException(
            s"unknown probe query '$name' (not registered, not probe-only)"))))

  /** Distinct bijections over the FULL lowercase alphabet, one per
    * replica: `perm(0)` is the identity (replica 0 stays byte-identical
    * to the base corpus); `perm(i)` for i ≥ 1 is a seeded Fisher–Yates
    * shuffle (deterministic, pairwise-distinct over any practical replica
    * range — spec-pinned to 500). The corpus text is all-lowercase, so a
    * lowercase-alphabet bijection preserves within-replica token equality
    * (and therefore every pairwise Jaccard) EXACTLY.
    *
    * Two earlier schemes failed at scale: a fixed 10-entry list CYCLED
    * past 10 replicas (replicas i and i+10 became exact dups), and a
    * nine-high-frequency-letter alphabet left short function words like
    * "by" INVARIANT — a doc whose min-md5 blocking token is invariant
    * lands in the same block in EVERY replica, so candidate pairs grew
    * ~R² in those blocks (measured 176× pairs at 30× data) and the probe
    * measured the synthetic corpus's degeneracy, not the operator. */
  private val Alphabet = "abcdefghijklmnopqrstuvwxyz"

  private[graft] def perm(i: Int): String = {
    require(i >= 0, s"replica index $i negative")
    if (i == 0) return Alphabet
    val a = Alphabet.toCharArray
    val rng = new scala.util.Random(i.toLong * 0x9E3779B97F4A7C15L)
    var j = a.length - 1
    while (j > 0) {
      val k = rng.nextInt(j + 1)
      val t = a(j); a(j) = a(k); a(k) = t
      j -= 1
    }
    new String(a)
  }

  private val IdOffset = 10000000L

  /** Per-replica cyclic dimension rotation for embedding replicas — the
    * vector-space analog of the token bijection. A cyclic shift is an
    * orthogonal permutation matrix, so WITHIN a replica every pairwise
    * inner product (and every norm) is preserved EXACTLY — cluster
    * geometry, near-dup structure, recall targets all carry over — while
    * ACROSS replicas the similarity of a vector to its shifted copy is
    * the embedding's autocorrelation at lag s, near zero for dense
    * embeddings. Exact copies instead make every vector an R-way exact
    * dup: SemDeDup/embedding-dedup cluster pair counts grow ~R² and the
    * probe measures the synthetic corpus's degeneracy, not the operator.
    * Stride 97 is coprime to the 384-d layout, so shifts are pairwise
    * distinct for every replica range below the dimension; rot(0) = 0
    * keeps replica 0 byte-identical (the perm(0) discipline). */
  private[graft] def rot(i: Int, dim: Int): Int = {
    require(i >= 0, s"replica index $i negative")
    (i * 97) % dim
  }

  private def built(outDir: String, table: String): Boolean =
    new java.io.File(s"$outDir/$table.parquet/_SUCCESS").exists()

  /** Build only the tables the probe's queries actually read (`want`) —
    * a high-replica single-family probe (e.g. the 1000× simhash decade,
    * which reads `documents` alone) must not pay the multi-hundred-GB
    * lineitem/events replication it never scans. Each table is lazily
    * skipped when already built, so pre-existing scale dirs upgrade in
    * place (the buildScaledRelational discipline, now uniform). */
  private def buildScaled(spark: SparkSession, baseDir: String,
                          outDir: String, replicas: Int,
                          want: String => Boolean): Unit = {
    buildScaledRelational(spark, baseDir, outDir, replicas, want)
    // replica id spaces must not collide: base ids live below the offset
    def guardIds(df: DataFrame, idCol: String): Unit = {
      val maxId = df.agg(max(col(idCol))).first().getLong(0)
      require(maxId < IdOffset,
        s"base ids reach $maxId >= offset $IdOffset — replica ids would collide")
    }
    if (want("documents") && !built(outDir, "documents")) {
      val docs = spark.read.parquet(s"$baseDir/documents.parquet")
      guardIds(docs, "doc_id")
      val docCopies = (0 until replicas).map { i =>
        docs.select(
          (col("doc_id") + lit(i.toLong * IdOffset)).as("doc_id"),
          translate(col("text"), Alphabet, perm(i)).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
      docCopies.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    }
    if (want("embeddings") && !built(outDir, "embeddings")) {
      val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
      guardIds(emb, "vec_id")
      val dim = emb.select(size(col("embedding"))).first().getInt(0)
      val embCopies = (0 until replicas).map { i =>
        val s = rot(i, dim)
        val rotated =
          if (s == 0) col("embedding")
          else concat(slice(col("embedding"), s + 1, dim - s),
                      slice(col("embedding"), 1, s))
        emb.select((col("vec_id") + lit(i.toLong * IdOffset)).as("vec_id"),
          rotated.as("embedding"), col("label"))
      }
      embCopies.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }
    // events: replica users/events get fresh id space, identical
    // timestamps/types/values — per-replica count and value distributions
    // are preserved exactly, so quantile/heavy-hitter/cohort work scales
    // with rows while each replica's answers stay the base corpus' (the
    // documents-translate discipline, numeric flavor)
    if (want("events") && !built(outDir, "events")) {
      val ev = spark.read.parquet(s"$baseDir/events.parquet")
      val evCopies = (0 until replicas).map { i =>
        ev.select(
          (col("event_id") + lit(i.toLong * IdOffset)).as("event_id"),
          col("ts"),
          (col("user_id") + lit(i.toLong * IdOffset)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }
      evCopies.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    }
    // Name-GROWN part replicas (the §3r ER honesty note, measured): the
    // keyed `part` replication reuses TPC-H's bounded name vocabulary, so
    // the er rows' name-grain collapse absorbs ANY replica factor and the
    // 1000× point certifies nothing about name-space growth. This variant
    // passes each replica's names through its alphabet bijection (the
    // documents translate discipline) — distinct names grow ×R while
    // per-replica name/block structure is preserved exactly (perm keeps
    // spaces, so the first-token blocking key translates WITH the name
    // and block-size multisets are replica-invariant). er_fuzzy's design
    // contract — blocked pairs linear in NAMES — becomes measurable.
    if (want("part_g") && !built(outDir, "part_g")) {
      val p = spark.read.parquet(s"$baseDir/part.parquet")
      guardIds(p, "p_partkey")
      grownPart(p, replicas)
        .write.mode("overwrite").parquet(s"$outDir/part_g.parquet")
    }
    // part_t (r22, VERDICT r20 #4): part_g over token-REALISTIC names —
    // base tokens are 3-6 letters, a key space small enough that
    // cross-replica letter bijections collide on ~6% of block tokens
    // (the measured ×1,143 blocked-pair excess); realTokenPart first
    // maps each base token to a real TPC-H color word (7-10 letters),
    // whose bijection images collide ~10× less. Same grownPart
    // machinery after the swap, so everything part_g pins carries over.
    if (want("part_t") && !built(outDir, "part_t")) {
      val p = spark.read.parquet(s"$baseDir/part.parquet")
      guardIds(p, "p_partkey")
      grownPart(realTokenPart(p), replicas)
        .write.mode("overwrite").parquet(s"$outDir/part_t.parquet")
    }
  }

  /** Base-token → TPC-H-color bijection (all 16 base tokens, each to a
    * distinct real color word of the 92-color P_NAME vocabulary). */
  private[graft] val RealTokenMap: Map[String, String] = Map(
    "anvil" -> "aquamarine", "blue" -> "chartreuse", "bolt" -> "burlywood",
    "cold" -> "cornflower", "gear" -> "blanched", "gizmo" -> "chocolate",
    "hot" -> "burnished", "large" -> "cornsilk", "new" -> "goldenrod",
    "old" -> "gainsboro", "plate" -> "honeydew", "red" -> "lavender",
    "ring" -> "moccasin", "rod" -> "seashell", "small" -> "turquoise",
    "widget" -> "firebrick")

  /** Swap each name token for its real color word (token-level map, not
    * translate — "old" is a substring of "goldenrod"); unknown tokens
    * pass through so the transform is total. One-off probe build, so the
    * HOF lambda is fine here. */
  private[graft] def realTokenPart(p: DataFrame): DataFrame = {
    val m = typedlit(RealTokenMap)
    p.withColumn("p_name",
      concat_ws(" ", transform(split(col("p_name"), " "),
        t => coalesce(element_at(m, t), t))))
  }

  /** The name-grown replica transform behind `part_g` (spec-pinned):
    * keys offset per replica, names passed through the replica's
    * alphabet bijection. grownPart(p, 1) ≡ p (perm(0) is the identity,
    * offset 0 — the replica-0 discipline). */
  private[graft] def grownPart(p: DataFrame, replicas: Int): DataFrame =
    (0 until replicas).map { i =>
      p.withColumn("p_partkey", col("p_partkey") + lit(i.toLong * IdOffset))
        .withColumn("p_name", translate(col("p_name"), Alphabet, perm(i)))
    }.reduce(_ unionAll _)

  /** Replicate the TPC-H side for the relational probes (pareto's rank,
    * hilbert's layout): key columns offset per replica, every value
    * column untouched — each replica reproduces the base distribution
    * exactly (the events discipline, relational flavor), so rank/layout
    * work scales with rows while per-replica answers stay the base
    * corpus'. Built lazily and independently of the three core tables
    * so pre-existing scale dirs upgrade in place. */
  private def buildScaledRelational(spark: SparkSession, baseDir: String,
                                    outDir: String, replicas: Int,
                                    want: String => Boolean): Unit = {
    if (want("orders") && !built(outDir, "orders")) {
      val o = spark.read.parquet(s"$baseDir/orders.parquet")
      // Same collision guard as the documents/embeddings path: TPC-H
      // orderkeys pass 10M around SF>=2, and colliding replica keys would
      // silently cross-join replicas and corrupt the scale evidence.
      val maxKey = o.agg(greatest(max(col("o_orderkey")), max(col("o_custkey"))))
        .first().getLong(0)
      require(maxKey < IdOffset,
        s"base orders keys reach $maxKey >= offset $IdOffset — replica ids would collide")
      (0 until replicas).map { i =>
        o.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * IdOffset))
          .withColumn("o_custkey", col("o_custkey") + lit(i.toLong * IdOffset))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    }
    if (want("lineitem") && !built(outDir, "lineitem")) {
      val li = spark.read.parquet(s"$baseDir/lineitem.parquet")
      val maxKey = li.agg(max(col("l_orderkey"))).first().getLong(0)
      require(maxKey < IdOffset,
        s"base lineitem keys reach $maxKey >= offset $IdOffset — replica ids would collide")
      (0 until replicas).map { i =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * IdOffset))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    }
    // Dimension tables for the round-13 probes (skyline, fk_audit,
    // basket_pairs): customer replicates KEYED (orders' o_custkey is
    // offset per replica, so matching customers must be too — keeps
    // fk_audit's orphan counts zero at any scale); part replicates keyed
    // for row volume (lineitem's l_partkey keeps referencing the base
    // replica — per-order join matches are unchanged, the probe scales
    // rows); supplier/nation/region are copied as-is (their keys are
    // never offset in the fact replicas).
    if (want("customer") && !built(outDir, "customer")) {
      val c = spark.read.parquet(s"$baseDir/customer.parquet")
      val maxKey = c.agg(max(col("c_custkey"))).first().getLong(0)
      require(maxKey < IdOffset,
        s"base customer keys reach $maxKey >= offset $IdOffset — replica ids would collide")
      (0 until replicas).map { i =>
        c.withColumn("c_custkey", col("c_custkey") + lit(i.toLong * IdOffset))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$outDir/customer.parquet")
    }
    if (want("part") && !built(outDir, "part")) {
      val p = spark.read.parquet(s"$baseDir/part.parquet")
      val maxKey = p.agg(max(col("p_partkey"))).first().getLong(0)
      require(maxKey < IdOffset,
        s"base part keys reach $maxKey >= offset $IdOffset — replica ids would collide")
      (0 until replicas).map { i =>
        p.withColumn("p_partkey", col("p_partkey") + lit(i.toLong * IdOffset))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$outDir/part.parquet")
    }
    Seq("supplier", "nation", "region").foreach { t =>
      if (want(t) && !built(outDir, t))
        spark.read.parquet(s"$baseDir/$t.parquet")
          .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }

  /** Families of artifact warm-up, selectable per probe run via
    * SPARK_GRAFT_SCALE_WARM (comma list of
    * vec,dedup,bucketed,simhash,minhash; default all): a high-replica probe of a relational-only subset
    * (e.g. the 1000× bucketed_join / table_profile_approx decade) must
    * not pay hours of IVF/PQ training and pair mining over a 1000×
    * corpus it never reads. NOTE (r17): two tables moved into their own
    * families — the simhash chunk table out of `bucketed` into
    * `simhash`, and the #302 minhash band table out of `dedup` into
    * `minhash` — so a simhash probe requests `simhash` and a
    * dedup_minhash_bucketed / dedup_incremental probe requests
    * `minhash` (the old `dedup`/`bucketed` spellings no longer build
    * these tables, and an unwarmed probe times the one-off build). */
  private def warm(spark: SparkSession, dir: String,
                   sel: Option[Set[String]] = None): Unit = {
    def on(f: String) = sel.forall(_.contains(f))
    if (on("vec")) {
      try { graft.queries.VectorQueries.ivfModel(spark, dir); () }
      catch { case _: Throwable => }
      try { graft.queries.VectorQueries.servingTier(spark, dir); () }
      catch { case _: Throwable => }
      try { graft.queries.VectorQueries.pqModel(spark, dir); () }
      catch { case _: Throwable => }
      try { graft.queries.VectorQueries.ivfpqModel(spark, dir); () }
      catch { case _: Throwable => }
    }
    // the published τ=0.95 pair/cluster artifact (Bench's pair_table
    // phase): consumers probed at scale (corpus_release, dedup_sweep,
    // split_signoff, pipeline_e2e) read the mined table; mining happens
    // once, outside the timed region — matching the production shape
    if (on("dedup")) {
      try { graft.queries.DedupQueries.minedClusters(spark, dir); () }
      catch { case _: Throwable => }
    }
    // #302's bucketed band table (ingest-time layout, untimed) — its own
    // family so a minhash-only probe skips the τ=0.95 jaccard mine above
    // (the known single-JVM capacity artifact at 100×, §3i)
    if (on("minhash")) {
      try { graft.queries.DedupQueries.minhashBandTable(spark, dir); () }
      catch { case _: Throwable => }
    }
    // the bucketed catalog tables (#294's ingest-time layout): the probe
    // times the co-located join, not the one-off bucketed write
    if (on("bucketed")) {
      try { graft.queries.IngestQueries.bucketedTables(spark, dir); () }
      catch { case _: Throwable => }
    }
    // #299's bucketed simhash chunk table, same discipline — its own
    // family so a simhash-only probe doesn't pay the relational
    // bucketed build over a corpus it never joins
    if (on("simhash")) {
      try { graft.queries.DedupQueries.simhashChunkTable(spark, dir); () }
      catch { case _: Throwable => }
    }
  }

  /** Spill/shuffle accounting across every task of the timed query —
    * the evidence that separates "algorithmic super-linearity" from
    * "local[32] memory pressure" in the 30×→100× interval (VERDICT r10
    * #3 asks for exactly this breakdown). */
  private[tools] class SpillListener extends org.apache.spark.scheduler.SparkListener {
    val memSpill = new java.util.concurrent.atomic.AtomicLong
    val diskSpill = new java.util.concurrent.atomic.AtomicLong
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    def reset(): Unit = { memSpill.set(0); diskSpill.set(0); shuffleWrite.set(0) }
    override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        ()
      }
    }
  }

  private case class Timing(sec: Double, memSpillMb: Long, diskSpillMb: Long,
                            shuffleMb: Long)

  private def time(spark: SparkSession, spill: SpillListener)
                  (fn: => DataFrame): Timing = {
    // drain the async listener queue at BOTH boundaries: in-flight
    // task-end events from the previous query must not land after
    // reset() (cross-attribution), and this query's tail events must
    // be delivered before the counters are read
    org.apache.spark.GraftListenerBus.drain(spark.sparkContext)
    spill.reset()
    val t0 = System.nanoTime()
    fn.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    org.apache.spark.GraftListenerBus.drain(spark.sparkContext)
    Timing(sec, spill.memSpill.get >> 20, spill.diskSpill.get >> 20,
      spill.shuffleWrite.get >> 20)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt
    // comma-separated subset override for high-replica probes (the 30–100×
    // run times only the highest-ratio queries; the default five at 100×
    // would spend most wall-clock re-proving the known-linear entries)
    val Heavy = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(DefaultHeavy)
    // artifact warm-up subset (see warm()): unset = all families
    val warmSel = sys.env.get("SPARK_GRAFT_SCALE_WARM")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // scaled-table subset (see buildScaled): unset = all tables
    val tableSel = sys.env.get("SPARK_GRAFT_SCALE_TABLES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val want: String => Boolean = t => tableSel.forall(_.contains(t))
    // v2: embedding replicas rotated (rot) — v1 dirs hold exact copies
    val scaleDir = s"${sys.props("java.io.tmpdir")}/graft-scale/v2/x$replicas"
    // the §3b root-cause knobs, overridable per run for the memory-config
    // A/B: at 100× data the per-thread SMJ sort runs exceed the 32-thread
    // budget when AQE coalesces the candidate shuffle to 64 MB partitions
    // (compressed bytes balloon ~10× as in-memory rows) — a SMALLER
    // advisory target keeps more, smaller sorts that fit the budget, the
    // exact shape a real cluster gets by spreading the same linear
    // shuffle across executors
    val initParts = sys.env.get("SPARK_GRAFT_INIT_PARTS")
    val advisoryMb = sys.env.get("SPARK_GRAFT_ADVISORY_MB")
    // the scan-stage split-size A/B (r19 verdict #1): smaller input splits
    // → more, smaller map tasks — on a real cluster the same effect falls
    // out of spreading the scan across executors, so this knob is the
    // on-box proxy for the "scan-stage spill divides by executor count"
    // clause of the §3n-text classification
    val maxPartMb = sys.env.get("SPARK_GRAFT_MAX_PARTITION_MB")
    // default session = the input-SIZED rule under validation (the
    // no-override zero-spill criterion, VERDICT r20 #1), sized to the
    // probe volume — base bytes × replicas, an upper bound when a table
    // subset is built, since the scaled dir itself is only built INSIDE
    // this session; the env knobs below still override for A/Bs
    val builder = Sessions.localSizedBytes(
      cpus, Sessions.dirBytes(baseDir) * replicas)
    initParts.foreach(p =>
      builder.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", p))
    advisoryMb.foreach(m =>
      builder.config("spark.sql.adaptive.advisoryPartitionSizeInBytes", s"${m}m"))
    maxPartMb.foreach(m =>
      builder.config("spark.sql.files.maxPartitionBytes", s"${m}m"))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    buildScaled(spark, baseDir, scaleDir, replicas, want)

    // JIT-warm the dedup/text/harness code paths at the smallest SF
    // (Bench's discipline: warm CODE, the pair caches are dir-keyed)
    val warmDir = "/root/testdata/sf0.001"
    warm(spark, warmDir, warmSel)
    Heavy.foreach { q =>
      try { resolveQuery(q)(spark, warmDir)
        .write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => }
    }

    val spill = new SpillListener
    spark.sparkContext.addSparkListener(spill)

    def runAll(dir: String): Map[String, Timing] = {
      warm(spark, dir, warmSel)
      Heavy.map(q => q -> time(spark, spill)(resolveQuery(q)(spark, dir))).toMap
    }
    val t1 = runAll(baseDir)
    val tR = runAll(scaleDir)

    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val qs = Heavy.map { q =>
      val r = if (t1(q).sec > 0) tR(q).sec / t1(q).sec else -1.0
      s""""$q":{"t1":${f2(t1(q).sec)},"tR":${f2(tR(q).sec)},"ratio":${f2(r)},""" +
        s""""tR_spill_mem_mb":${tR(q).memSpillMb},"tR_spill_disk_mb":${tR(q).diskSpillMb},""" +
        s""""tR_shuffle_mb":${tR(q).shuffleMb},"t1_shuffle_mb":${t1(q).shuffleMb},"t1_spill_mem_mb":${t1(q).memSpillMb}}"""
    }.mkString("{", ",", "}")
    val cfg = (initParts.map(p => s""""init_parts":$p""") ++
      advisoryMb.map(m => s""""advisory_mb":$m""") ++
      maxPartMb.map(m => s""""max_partition_mb":$m""")).mkString(",")
    val cfgJson = if (cfg.isEmpty) "" else s""","config":{$cfg}"""
    val line = s"""{"metric":"scale_ratio","queries":$qs,"replicas":$replicas$cfgJson}"""
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(line)
    System.out.flush()
  }
}
