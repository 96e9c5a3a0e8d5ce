package graft.search

import graft.functions.VectorFunctions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-Flat index for inner-product search, Spark-native.
  *
  * Mirrors the reference's FAISS IndexIVFFlat(IP) path
  * (src/dataio/loaders.py:141 `_build_faiss_ivf_ip`, nlist≈√N clamped
  * [64,4096], nprobe default 32): k-means centroids partition the vectors
  * into nlist inverted lists; a query probes only the nprobe nearest lists.
  *
  * Spark mapping:
  *  - train: MLlib KMeans on a sample (at 100 TB, a ~1M-row sample is
  *    plenty — centroid quality converges far below full-data cost);
  *  - assign: one narrow map with the codegen'd ArgMaxDotF32 expression
  *    against broadcast centroid literals — no shuffle;
  *  - store: `write()` partitions the indexed table BY list_id, so probing
  *    nprobe/nlist lists is a partition-PRUNED scan (the 100 TB win);
  *  - probe: centroid ranking is O(nlist·D) driver math on the broadcast
  *    centroids, then a pruned scan + brute-force top-K within the lists.
  */
final case class IvfModel(centroids: Array[Array[Float]], indexed: DataFrame) {

  /** Probe list ids for a query vector: top-nprobe centroids by IP. */
  def probes(qvec: Array[Float], nprobe: Int): Seq[Int] = {
    val scores = centroids.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length && i < qvec.length) { acc += c(i).toDouble * qvec(i).toDouble; i += 1 }
      acc
    }
    scores.zipWithIndex.sortBy { case (s, i) => (-s, i) }.take(nprobe).map(_._2).toSeq
  }

  /** Top-K IP search probing nprobe lists, optional extra predicate. */
  def search(qvec: Array[Float], nprobe: Int, k: Int,
             pred: Option[Column] = None): DataFrame = {
    val lists = probes(qvec, nprobe)
    val base = indexed.where(col("list_id").isin(lists: _*))
    VectorSearch.topK(pred.map(base.where).getOrElse(base), qvec, k)
  }

  /** Persist partitioned by list_id → probe-time partition pruning. */
  def write(path: String): Unit =
    indexed.write.mode("overwrite").partitionBy("list_id").parquet(path)
}

object Ivf {

  /** nlist heuristic ≈ √N clamped [64, 4096] (reference loaders.py:170). */
  def pickNlist(n: Long): Int =
    math.max(64, math.min(4096, math.sqrt(n.toDouble).toInt))

  /** Index fallback chain (reference loaders.py builds FAISS IVF, falls
    * back to HNSW then exact when the corpus is too small to train):
    * here IVF needs a healthy points-per-centroid ratio to be worth the
    * probe machinery; below `minPerList` the exact TakeOrdered scan IS
    * the right plan, so `auto` returns None and callers use
    * VectorSearch.topK. */
  def auto(emb: DataFrame, minPerList: Int = 8, seed: Long = 42L): Option[IvfModel] = {
    val n = emb.count()
    val nlist = pickNlist(n)
    if (n < nlist.toLong * minPerList) None
    else Some(build(emb, nlist, seed))
  }

  /** Build: k-means on (a sample of) the embeddings, then assign every
    * vector to its nearest centroid. Deterministic under a fixed seed. */
  def build(emb: DataFrame, nlist: Int, seed: Long = 42L,
            trainFraction: Double = 1.0, maxIter: Int = 20): IvfModel = {
    val train0 = if (trainFraction >= 1.0) emb else emb.sample(trainFraction, seed)
    val train = train0.select(array_to_vector(col("embedding")).as("features"))
    val km = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features")
      .fit(train)
    val cents = km.clusterCenters.map(_.toArray.map(_.toFloat))
    val centsLit = typedlit(cents.map(_.toSeq).toSeq)
    val indexed = emb.withColumn("list_id", argMaxDot(col("embedding"), centsLit))
    IvfModel(cents, indexed)
  }

  def load(spark: SparkSession, path: String, centroids: Array[Array[Float]]): IvfModel =
    IvfModel(centroids, spark.read.parquet(path))
}

/** Cosine LSH (random hyperplanes): deterministic seeded planes; bucket =
  * packed sign bits. Candidates = exact-bucket match (optionally hamming-1
  * multiprobe); final ranking is exact IP within candidates.
  */
object CosineLsh {

  /** Deterministic gaussian hyperplanes. */
  def planes(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rng.nextGaussian().toFloat))
  }

  def withBucket(emb: DataFrame, planes: Array[Array[Float]]): DataFrame =
    emb.withColumn("bucket",
      hyperplaneSignature(col("embedding"), typedlit(planes.map(_.toSeq).toSeq)))

  /** Signature of a local query vector (same math as the expression). */
  def signature(qvec: Array[Float], planes: Array[Array[Float]]): Long = {
    var sig = 0L
    var j = 0
    while (j < planes.length && j < 64) {
      var acc = 0.0; var i = 0
      val p = planes(j)
      while (i < p.length && i < qvec.length) { acc += qvec(i).toDouble * p(i).toDouble; i += 1 }
      if (acc > 0.0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Buckets within hamming distance 1 of sig (multiprobe). */
  def multiprobe(sig: Long, bits: Int): Seq[Long] =
    sig +: (0 until bits).map(b => sig ^ (1L << b))

  /** Top-K within the query's (multiprobe) buckets. */
  def search(emb: DataFrame, qvec: Array[Float],
             planes: Array[Array[Float]], k: Int, probeHamming1: Boolean = true): DataFrame = {
    val sig = signature(qvec, planes)
    val buckets = if (probeHamming1) multiprobe(sig, planes.length) else Seq(sig)
    val bucketed = withBucket(emb, planes).where(col("bucket").isin(buckets: _*))
    VectorSearch.topK(bucketed, qvec, k)
  }
}
