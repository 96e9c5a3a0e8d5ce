package graft

import graft.tools.ScaleBench
import org.scalatest.funsuite.AnyFunSuite

/** The scale-probe's per-replica token bijections: the linear-pair-growth
  * argument in BASELINE.md §3b rests on every replica getting a DISTINCT
  * permutation (a repeat makes two replicas exact text duplicates and
  * re-introduces the quadratic candidate blowup the scheme exists to
  * avoid), and on replica 0 staying byte-identical to the base corpus.
  */
class ScaleBenchSpec extends AnyFunSuite {

  private val Alphabet = "abcdefghijklmnopqrstuvwxyz"

  test("perm(0) is the identity bijection") {
    assert(ScaleBench.perm(0) == Alphabet)
  }

  test("permutations are pairwise distinct over a 500-replica range") {
    val ps = (0 until 500).map(ScaleBench.perm)
    assert(ps.distinct.length == ps.length, "bijection repeated — replicas would be exact dups")
  }

  test("every permutation is a bijection over the full lowercase alphabet") {
    (0 until 500).foreach { i =>
      assert(ScaleBench.perm(i).sorted == Alphabet, s"perm($i) not a permutation")
    }
  }

  test("short function words are NOT invariant (the 9-letter scheme's failure)") {
    // an invariant blocking token lands in the same block in every
    // replica and grows candidate pairs ~R²; with the full alphabet no
    // letter survives perm(i) for typical words
    (1 until 50).foreach { i =>
      val p = ScaleBench.perm(i)
      def tr(w: String) = w.map(c => p(Alphabet.indexOf(c)))
      assert(tr("by") != "by" || tr("my") != "my" || tr("the") != "the",
        s"perm($i) leaves short words invariant")
    }
  }

  test("negative indices are rejected") {
    intercept[IllegalArgumentException](ScaleBench.perm(-1))
    intercept[IllegalArgumentException](ScaleBench.rot(-1, 384))
  }

  test("resolveQuery: registered names, probe-only names, unknown rejected") {
    assert(ScaleBench.resolveQuery("dedup_incremental") ne null)
    assert(ScaleBench.resolveQuery("dedup_incremental_fixed") ne null)
    assert(ScaleBench.resolveQuery("dedup_minhash_bucketed_fixed") ne null)
    intercept[NoSuchElementException](ScaleBench.resolveQuery("no_such_probe"))
  }

  test("fixed-batch probes ≡ their registered queries at 1× (all ids below the offset)") {
    // the r17 verdict-#1 probes differ from #102/#302 ONLY by capping the
    // batch at replica 0's id space; on an unreplicated dir the cap is a
    // no-op, so the probe pair must return the production rows exactly —
    // pinning that the probe measures the production plan, not a variant
    val s = SparkTest.session
    val d = "/root/testdata/sf0.001"
    def rows(q: String) =
      ScaleBench.resolveQuery(q)(s, d).collect().map(_.toString).sorted.toSeq
    assert(rows("dedup_incremental_fixed") == rows("dedup_incremental"))
    assert(rows("dedup_minhash_bucketed_fixed") == rows("dedup_minhash_bucketed"))
  }

  test("uniformGeoMeta de-aliases replicas and keeps the completeness band") {
    // the production embeddingsMeta aliases under the 10M replica offset:
    // 7·10M ≡ 0 (mod 320) pins every replica to the SAME longitudes and
    // 10M mod 180 = 100 (gcd 20) leaves 9 latitude shifts — the r19 geo
    // probes measured that degeneracy. The hash-derived probe meta must
    // (a) place replica copies of one point at DIFFERENT positions, and
    // (b) stay inside |lat| ≤ 62° where a 0.5° lon cell ≥ the 25 km
    // radius (the 3×3-neighborhood completeness contract).
    val s = SparkTest.session
    import org.apache.spark.sql.functions.col
    val offset = 10000000L
    val ids = (0 until 64).flatMap(r => (0L until 50L).map(_ + r * offset))
    val meta = ScaleBench.uniformGeoMeta(
      s.createDataFrame(ids.map(Tuple1(_))).toDF("vec_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    meta.foreach { case (id, lat, lon) =>
      assert(lat >= -62.0 && lat <= 61.75, s"$id lat $lat outside band")
      assert(lon >= -120.0 && lon <= 119.75, s"$id lon $lon outside band")
    }
    // replica copies of base id 0..49 (id + r·10M) must NOT stack on the
    // base point's position: across 64 replicas each base id's positions
    // are nearly all distinct (hash-uniform over 496·960 ≈ 476k slots;
    // the aliasing failure mode is ≤9 distinct positions)
    (0L until 50L).foreach { base =>
      val pos = meta.filter(_._1 % offset == base).map(t => (t._2, t._3)).distinct
      assert(pos.length > 32, s"base $base collapsed to ${pos.length} positions")
    }
    // and longitudes are NOT pinned: the production failure mode was one
    // shared longitude set across all replicas
    val lonsPerReplica = meta.groupBy(_._1 / offset)
      .map { case (_, ts) => ts.map(_._3).toSet }
    assert(lonsPerReplica.toSeq.distinct.length > 32,
      "replica longitude sets repeat — still aliased")
  }

  test("geo probe queries resolve; candidate count matches a local recompute") {
    val s = SparkTest.session
    val d = "/root/testdata/sf0.001"
    assert(ScaleBench.resolveQuery("geo_pairs_u") ne null)
    assert(ScaleBench.resolveQuery("geo_knn_u") ne null)
    val cand = ScaleBench.resolveQuery("geo_cand_u")(s, d)
      .collect().head.getLong(0)
    // local oracle: exact pair count of points whose 0.5° cells are within
    // one cell in both axes, id_a ≠ id_b (ordered pairs — the probe side
    // explodes, the build side is the home cell)
    val pts = ScaleBench.uniformGeoMeta(graft.Tables.embeddings(s, d))
      .collect().map(r => (math.floor(r.getDouble(1) / 0.5).toLong,
        math.floor(r.getDouble(2) / 0.5).toLong))
    val want = (for {
      a <- pts; b <- pts
      if math.abs(a._1 - b._1) <= 1 && math.abs(a._2 - b._2) <= 1
    } yield 1L).sum - pts.length
    assert(cand == want, s"probe $cand vs local $want")
  }

  test("embedding rotations: identity at 0, pairwise distinct below dim") {
    // a repeated shift makes two embedding replicas exact vector dups —
    // SemDeDup/embedding-dedup candidate pairs would grow ~R² in every
    // cluster the copies share, the degeneracy the rotation exists to kill
    assert(ScaleBench.rot(0, 384) == 0, "replica 0 must stay byte-identical")
    val shifts = (0 until 384).map(ScaleBench.rot(_, 384))
    assert(shifts.distinct.length == shifts.length,
      "rotation shift repeated — two replicas would be exact vector dups")
    assert(shifts.forall(s => s >= 0 && s < 384))
  }

  test("uniformGeoMetaCd: area grows ~linearly with R at constant density, inside the band") {
    // the constant-density workload axis (§3r): grid area must scale with
    // the replica factor (√R per axis) so per-cell occupancy stays flat,
    // and every grid size must stay inside the |lat| ≤ 62° completeness
    // band (cap: the full 496×960 uniformGeoMeta grid)
    val s = SparkTest.session
    import org.apache.spark.sql.functions.col
    val ids = s.range(200000).select(col("id").as("vec_id"))
    def cells(r: Int): Set[(Long, Long)] =
      ScaleBench.uniformGeoMetaCd(ids, r).collect().map { row =>
        val (lat, lon) = (row.getDouble(1), row.getDouble(2))
        assert(lat >= -62.0 && lat <= 61.75, s"R=$r lat $lat outside band")
        assert(lon >= -120.0 && lon <= 119.75, s"R=$r lon $lon outside band")
        (math.floor(lat / 0.25).toLong, math.floor(lon / 0.25).toLong)
      }.toSet
    // 200k points over ≤31k slots occupy nearly every slot — distinct
    // occupied cells track grid AREA: exactly ×16 and ×64 would need
    // full occupancy, so pin the ratio within a band around linear
    val (c1, c16, c64) = (cells(1).size, cells(16).size, cells(64).size)
    assert(c1 == 16 * 30, s"base grid not fully occupied: $c1") // 200k ≫ 480 slots
    assert(c16 > 11 * c1 && c16 <= 16 * c1, s"R=16 area ratio ${c16.toDouble / c1}")
    assert(c64 > 40 * c1 && c64 <= 64 * c1, s"R=64 area ratio ${c64.toDouble / c1}")
    // cap: at R ≥ 1024 the grid is uniformGeoMeta's full 496×960 band
    val capped = ScaleBench.uniformGeoMetaCd(ids, 4096).collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    assert(capped.forall { case (la, lo) =>
      la >= -62.0 && la <= 61.75 && lo >= -120.0 && lo <= 119.75 })
  }

  test("dirReplicas parses ONLY the full scaleDir convention, base dirs read 1") {
    assert(ScaleBench.dirReplicas("/tmp/graft-scale/v2/x1000") == 1000)
    assert(ScaleBench.dirReplicas("/tmp/graft-scale/v2/x10/") == 10)
    assert(ScaleBench.dirReplicas("/root/testdata/sf0.1") == 1)
    assert(ScaleBench.dirReplicas("/root/testdata/sf0.001") == 1)
    // a base dir that merely ends in x<digits> is NOT a scale dir — it
    // must not silently mis-size the _cd grid (review finding, r20)
    assert(ScaleBench.dirReplicas("/data/x25") == 1)
    assert(ScaleBench.dirReplicas("/mnt/x99999999999") == 1) // and no overflow
  }

  test("er_fuzzy_parts_g refuses a scaled dir without part_g") {
    // the plain part table on a SCALED dir is the bounded-name synthetic
    // the probe exists to fix — falling back there would emit a
    // scale_ratio line byte-indistinguishable from an honest run
    val s = SparkTest.session
    // per-test temp root that still matches the .../graft-scale/v<N>/x<R>
    // convention (ADVICE r20: the shared java.io.tmpdir path is the REAL
    // scaleDir — a prior ScaleBench run at R=3 on the same box would make
    // this suite fail spuriously)
    val bogus = java.nio.file.Files.createTempDirectory("graft-spec")
      .toString + "/graft-scale/v2/x3" // convention-matching, never built
    assert(!new java.io.File(s"$bogus/part_g.parquet/_SUCCESS").exists())
    val e = intercept[IllegalStateException] {
      ScaleBench.resolveQuery("er_fuzzy_parts_g")(s, bogus)
    }
    assert(e.getMessage.contains("part_g"))
  }

  test("grownPart grows the distinct-name space ×R with block structure preserved") {
    // the §3r ER honesty note's fix: names translate per replica, so the
    // name-grain collapse can no longer absorb the replica factor. Pins:
    // (a) replica 0 byte-identical (the perm(0) discipline), (b) distinct
    // names ≈ ×R, (c) per-replica first-token block-SIZE multisets equal
    // the base's (the bijection translates the block key with the name)
    val s = SparkTest.session
    import org.apache.spark.sql.functions.col
    val base = graft.Tables.part(s, "/root/testdata/sf0.001")
      .select(col("p_partkey"), col("p_name"))
    val offset = 10000000L
    val grown = ScaleBench.grownPart(base, 3).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val baseRows = base.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(grown.length == 3 * baseRows.length)
    // (a) replica 0 is the base table exactly
    assert(grown.filter(_._1 < offset).toSet == baseRows.toSet)
    // (b) distinct names grow ×R (bijections are pairwise distinct; a
    // cross-replica collision needs two perms to agree on a whole name)
    val baseNames = baseRows.map(_._2).distinct.length
    val grownNames = grown.map(_._2).distinct.length
    assert(grownNames > 3 * baseNames - 3 && grownNames <= 3 * baseNames,
      s"distinct names $grownNames vs base $baseNames")
    // (c) block-size multiset invariant per replica
    def blockSizes(rows: Seq[String]): Seq[Int] =
      rows.groupBy(_.takeWhile(_ != ' ')).values.map(_.size).toSeq.sorted
    val baseBlocks = blockSizes(baseRows.map(_._2).toSeq)
    (0 until 3).foreach { i =>
      val rep = grown.filter(t => t._1 >= i * offset && t._1 < (i + 1) * offset)
      assert(blockSizes(rep.map(_._2).toSeq) == baseBlocks,
        s"replica $i block-size multiset drifted")
    }
  }

  test("workload probe queries resolve; er probe equals production on a base dir") {
    // the fixed-probe discipline: on an unreplicated dir the grown-name
    // probe falls back to the plain part table (= grownPart(·, 1)), so it
    // must return the production er_fuzzy_parts rows exactly — the probe
    // measures the production plan, not a variant
    val s = SparkTest.session
    val d = "/root/testdata/sf0.001"
    def rows(q: String) =
      ScaleBench.resolveQuery(q)(s, d).collect().map(_.toString).sorted.toSeq
    assert(rows("er_fuzzy_parts_g") == rows("er_fuzzy_parts"))
    // and the cd candidate count matches a local recompute at R=1
    val cand = ScaleBench.resolveQuery("geo_cand_cd")(s, d)
      .collect().head.getLong(0)
    val pts = ScaleBench.uniformGeoMetaCd(graft.Tables.embeddings(s, d), 1)
      .collect().map(r => (math.floor(r.getDouble(1) / 0.5).toLong,
        math.floor(r.getDouble(2) / 0.5).toLong))
    val want = (for {
      a <- pts; b <- pts
      if math.abs(a._1 - b._1) <= 1 && math.abs(a._2 - b._2) <= 1
    } yield 1L).sum - pts.length
    assert(cand == want, s"probe $cand vs local $want")
  }
}
