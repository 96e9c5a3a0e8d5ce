package graft.dedup

import graft.operators.Pin.PinOps
import graft.functions.VectorFunctions.dot
import graft.search.{Ivf, IvfModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — the SemDeDup shape
  * (Abbas et al., 2023, arXiv:2303.09540): k-means clusters BOUND the
  * pairwise cosine search, then each near-duplicate component keeps one
  * representative, chosen as the member LEAST similar to its cluster
  * centroid (the paper's rule — the boundary point carries the most
  * signal; ties break on vec_id so the keep-list is deterministic).
  *
  * How this differs from Dedup.embeddingPairs (#25): that op MINES the
  * ≥τ pair graph through cosine-LSH buckets (probabilistic recall, pair
  * output); this op is the curation DECISION — learned-cluster blocking,
  * component resolution, and a kept/dropped verdict per vector, i.e. the
  * keep-list a training run applies.
  *
  * Scale shape: one k-means fit on a bounded sample (Ivf.build's capped
  * trainer), one codegen'd assignment pass, then a SELF-JOIN ON list_id
  * — the quadratic is per-cluster (E[size] = N/k; the paper's reason for
  * clustering first), the join shuffles each vector once on its list
  * key, and component resolution reuses Dedup.clusters (pointer-jumping
  * label propagation, O(log diameter) rounds, driver union-find fast
  * path for small pair graphs). Oversized clusters are the skew case:
  * AQE splits the join's hot partitions, and the k ≈ √N default keeps
  * expected cluster size √N so per-cluster work stays O(N) total.
  *
  * Incremental maintenance (`appendVerdict`) follows the lakehouse
  * partition-recompute discipline the IVF/minhash append ops use: the
  * quantizer is FROZEN, the batch assigns to existing clusters, and only
  * the TOUCHED clusters' verdicts recompute — untouched clusters pass
  * through byte-identical. Equivalence with a frozen-model full run over
  * the union is spec-pinned (SemDedupSpec); work scales with the batch's
  * cluster footprint, not the corpus.
  */
object SemDedup {

  /** k ≈ √N — expected cluster size √N, so the within-cluster quadratic
    * totals O(N·√N / √N) = O(N) comparisons in expectation. */
  def pickK(n: Long): Int =
    math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** Unit-normalized centroids so centroid_cos is a true cosine for the
    * unit-norm corpus (k-means means are NOT unit even over unit
    * inputs). */
  def unitCentroids(model: IvfModel): Array[Array[Float]] =
    model.centroids.map { c =>
      val nrm = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
      if (nrm == 0.0) c else c.map(x => (x / nrm).toFloat)
    }

  /** Assign `emb` to the model's FROZEN centroids (max-dot, the index
    * convention) and attach the centroid cosine — one codegen'd pass. */
  def assignWith(model: IvfModel, emb: DataFrame): DataFrame = {
    val cents = unitCentroids(model)
    val centsLit = typedlit(cents.map(_.toSeq).toSeq)
    model.assign(emb)
      .withColumn("centroid_cos",
        round(dot(col("embedding"), element_at(centsLit, col("list_id") + 1)), 6))
      .select("vec_id", "embedding", "list_id", "centroid_cos")
  }

  /** #172 cluster-BALANCED sampling (the DataComp/LAION curation rule
    * next to SemDeDup's near-dup rule): cap every k-means cluster at the
    * WATER-FILLING level c — the smallest cap with Σ min(sᵢ, c) ≥ budget
    * — so over-represented modes shrink while small clusters survive
    * whole. The cap search runs on the k-row cluster-size table
    * (bounded driver work — k ≈ √N is index geometry); realization is
    * deterministic: each cluster keeps its `cap` members with the
    * smallest md5(vec_id) (the sample_* family's engine-portable rule)
    * via one row_number window over the list_id partition — the one
    * corpus shuffle. Returns (vec_id, list_id, kept). */
  def balancedKeep(assigned: DataFrame, budgetFrac: Double): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1, s"budgetFrac $budgetFrac")
    val spark = assigned.sparkSession
    import spark.implicits._
    val sizes = assigned.groupBy("list_id").count()
      .as[(Int, Long)].collect().sortBy(_._1)
    val total = sizes.map(_._2).sum
    val budget = math.ceil(total * budgetFrac).toLong
    // water-filling: smallest integer cap whose kept-sum reaches budget
    var lo = 1L
    var hi = sizes.map(_._2).max
    def keptAt(c: Long) = sizes.map(s => math.min(s._2, c)).sum
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (keptAt(mid) >= budget) hi = mid else lo = mid + 1
    }
    val cap = lo
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("list_id")
      .orderBy(md5(col("vec_id").cast("string").cast("binary")), col("vec_id"))
    assigned
      .withColumn("kept", row_number().over(w) <= cap)
      .select(col("vec_id"), col("list_id"), col("kept"))
  }

  /** The verdict over an ALREADY-ASSIGNED table (vec_id, embedding,
    * list_id, centroid_cos): within-cluster ≥τ pairs, component
    * resolution, keep rule. No presentation order (callers sort). */
  def verdictFor(assigned0: DataFrame, tau: Double): DataFrame = {
    val assigned = assigned0.pin() // three consumers below

    // within-cluster ≥τ pairs: the ONLY shuffle of the corpus (list_id
    // key); per-pair work is one codegen'd dot
    val a = assigned.select(col("list_id"), col("vec_id").as("doc_a"),
      col("embedding").as("e_a"))
    val b = assigned.select(col("list_id"), col("vec_id").as("doc_b"),
      col("embedding").as("e_b"))
    val pairs = a.join(b, Seq("list_id"))
      .where(col("doc_a") < col("doc_b"))
      .where(round(dot(col("e_a"), col("e_b")), 6) >= tau)
      .select(col("doc_a"), col("doc_b"))

    val comps = Dedup.clusters(pairs) // (doc_id, cluster_id)

    val labeled = assigned.drop("embedding")
      .join(comps.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"), "left")
      .withColumn("sem_group", coalesce(col("cluster_id"), col("vec_id")))
    // keep the member LEAST similar to its centroid (paper rule); the
    // window is per-component — bounded by component size, never global
    val w = Window.partitionBy("sem_group")
      .orderBy(col("centroid_cos").asc, col("vec_id").asc)
    labeled
      .withColumn("kept", row_number().over(w) === 1)
      .select("vec_id", "list_id", "centroid_cos", "sem_group", "kept")
  }

  /** Per-vector verdict: (vec_id, list_id, centroid_cos, sem_group,
    * kept). `sem_group` is the near-dup component id (min member id —
    * Dedup.clusters' label); singletons are their own group and are
    * always kept. */
  def semanticDedup(emb: DataFrame, tau: Double, k: Int = 0,
                    seed: Long = 42L): DataFrame = {
    val n = emb.count()
    val kk = if (k > 0) k else pickK(n)
    val model = Ivf.build(emb, kk, seed)
    verdictFor(assignWith(model, emb), tau).orderBy("vec_id")
  }

  /** Incremental verdict maintenance: `resident` (with its prior
    * `residentVerdict`) plus a new `batch`, quantizer frozen. Only the
    * clusters the batch lands in recompute — resident verdicts in
    * untouched clusters pass through unchanged, so the work is bounded
    * by the batch's cluster footprint. Result == `verdictFor` over the
    * union under the same frozen model (spec-pinned), because verdicts
    * never cross cluster boundaries. */
  def appendVerdict(model: IvfModel, resident: DataFrame,
                    residentVerdict: DataFrame, batch: DataFrame,
                    tau: Double): DataFrame = {
    val aBat = assignWith(model, batch).pin()
    val affected = aBat.select("list_id").distinct()
    val aRes = assignWith(model, resident)
    val recomputed = verdictFor(
      aRes.join(broadcast(affected), Seq("list_id"), "left_semi")
        .unionByName(aBat), tau)
    residentVerdict
      .join(broadcast(affected), Seq("list_id"), "left_anti")
      .unionByName(recomputed)
      .select("vec_id", "list_id", "centroid_cos", "sem_group", "kept")
  }
}
