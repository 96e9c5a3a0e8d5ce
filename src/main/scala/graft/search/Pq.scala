package graft.search

import graft.functions.VectorFunctions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) with asymmetric-distance scoring — the
  * compression tier of the ANN ladder (reference src/dataio/loaders.py
  * builds FAISS IVFFlat; PQ is that family's standard answer when even
  * the flat f32 vectors are too big to scan — FAISS IndexPQ/IVFPQ).
  *
  * Spark mapping:
  *  - train: m INDEPENDENT small k-means runs, one per dsub-dim slice of
  *    a bounded sample (the codebook is m·k·dsub floats — a few KB);
  *  - encode: per subspace, L2 assignment to the nearest codeword via the
  *    EXISTING codegen'd IP arg-max: argmin_c ‖x_s−c‖² = argmax_c (x_s·c
  *    − ‖c‖²/2) = argmax over [x_s,1]·[c,−‖c‖²/2] — augmenting the
  *    centroid literals with their −‖c‖²/2 bias and the slice with a
  *    trailing 1 makes ArgMaxDotF32 do L2 in one narrow, shuffle-free
  *    projection. 64-d f32 (256 B) → m=8 codes (8 B): 32× less scan I/O;
  *  - search (ADC): the per-query lookup table lut[s][c] = q_s·c is
  *    driver math over the codebook; scoring the corpus is m literal-
  *    array lookups summed — a pure codegen projection over the CODE
  *    column, the vectors are never read. TakeOrdered shortlist, then an
  *    exact re-rank of the shortlist only (ADC+refine): at scale the
  *    refine is a keyed fetch of `shortlist` vectors, not a second scan
  *    of the corpus — the tiny id list broadcasts into the join.
  */
final case class PqModel(m: Int, dsub: Int, kCodes: Int,
                         codebook: Array[Array[Array[Float]]],
                         codes: DataFrame, corpus: DataFrame) {

  /** Per-query ADC lookup table: lut(s)(c) = q_s · codebook(s)(c). */
  def lut(qvec: Array[Float]): Array[Array[Double]] = Array.tabulate(m) { s =>
    Array.tabulate(kCodes) { c =>
      val cent = codebook(s)(c)
      var acc = 0.0; var i = 0
      while (i < dsub) { acc += qvec(s * dsub + i).toDouble * cent(i).toDouble; i += 1 }
      acc
    }
  }

  /** ADC score column over `pq_codes`: Σ_s lut_s[code_s]. */
  def adcScore(qvec: Array[Float]): Column = {
    val t = lut(qvec)
    (0 until m).map { s =>
      element_at(typedlit(t(s).toSeq), element_at(col("pq_codes"), s + 1) + 1)
    }.reduce(_ + _)
  }

  /** Top-K via ADC shortlist + exact refine. The shortlist TakeOrdered
    * reads only (vec_id, pq_codes); the refine joins the ≤`shortlist`-row
    * id list (broadcast) back to the vector table for exact IP scoring. */
  def search(qvec: Array[Float], k: Int, shortlist: Int = 100): DataFrame = {
    // shortlist ranked on round(·,6) + vec_id, the repo-wide convention
    // (see VectorSearch doc): the boundary can't flip on last-ulp
    // differences in the LUT sum order
    val short = codes.select(col("vec_id"), round(adcScore(qvec), 6).as("adc_score"))
      .orderBy(desc("adc_score"), col("vec_id")).limit(shortlist)
    VectorSearch.topK(
      corpus.join(broadcast(short.select("vec_id")), "vec_id"), qvec, k)
  }

  /** ADC-only top-K (no refine) — the recall floor the refine pass lifts;
    * used by the recall sweep spec. */
  def searchNoRefine(qvec: Array[Float], k: Int): DataFrame =
    codes.select(col("vec_id"), round(adcScore(qvec), 6).as("score"))
      .orderBy(desc("score"), col("vec_id")).limit(k)

  /** Index-health report in ONE aggregate: code-space usage per subspace
    * (a subspace collapsing to few codes is how PQ recall dies — the
    * quantizer wasted its bits) plus the compression ratio. */
  def stats(rawBytesPerDim: Int = 4): DataFrame = {
    // bytes/code derived from kCodes (not assumed 1): a codebook loaded
    // from elsewhere may exceed the 256-code build guard
    val bytesPerCode = math.max(1, (32 - Integer.numberOfLeadingZeros(kCodes - 1) + 7) / 8)
    val perSub = (0 until m).map(s =>
      countDistinct(element_at(col("pq_codes"), s + 1)).as(s"cu$s"))
    codes.agg(count(lit(1)).as("n_vectors"), perSub: _*)
      .select(col("n_vectors"), lit(m).as("m"), lit(kCodes).as("k"),
        lit(m * bytesPerCode).as("code_bytes_per_vec"),
        lit(m * dsub * rawBytesPerDim).as("raw_bytes_per_vec"),
        least((0 until m).map(s => col(s"cu$s")): _*).as("min_codes_used"),
        greatest((0 until m).map(s => col(s"cu$s")): _*).as("max_codes_used"))
  }
}

object Pq {

  /** Centroids augmented with their −‖c‖²/2 bias term (see class doc). */
  private def augmented(cents: Array[Array[Float]]): Seq[Seq[Float]] =
    cents.toSeq.map { c =>
      val n2 = c.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      c.toSeq :+ (-0.5 * n2).toFloat
    }

  /** The m-slice encode column: array of per-subspace code ids. */
  def encodeCol(codebook: Array[Array[Array[Float]]], dsub: Int): Column =
    array(codebook.indices.map { s =>
      argMaxDot(
        concat(slice(col("embedding"), s * dsub + 1, dsub), array(lit(1.0f))),
        typedlit(augmented(codebook(s)))).cast("int")
    }: _*)

  /** Train on a bounded sample (m small k-means fits share ONE cached
    * sample pass), then encode the corpus row-locally. Deterministic
    * under a fixed seed. */
  def build(emb: DataFrame, m: Int = 8, kCodes: Int = 16, seed: Long = 42L,
            maxIter: Int = 10, maxTrainRows: Long = 100000L): PqModel = {
    require(kCodes >= 2 && kCodes <= 256,
      s"pq: kCodes $kCodes outside [2,256] — codes must fit one byte")
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    require(dim % m == 0, s"pq: dim $dim not divisible by m=$m")
    val dsub = dim / m
    val n = emb.count()
    val sample = (if (n <= maxTrainRows) emb
                  else emb.sample(maxTrainRows.toDouble / n, seed))
      .select(col("embedding")).cache()
    try {
      val codebook = Array.tabulate(m) { s =>
        val train = sample.select(
          array_to_vector(slice(col("embedding"), s * dsub + 1, dsub)).as("features"))
        new KMeans().setK(kCodes).setSeed(seed + s).setMaxIter(maxIter)
          .setFeaturesCol("features").fit(train)
          .clusterCenters.map(_.toArray.map(_.toFloat))
      }
      val codes = emb.select(col("vec_id"), encodeCol(codebook, dsub).as("pq_codes"))
      PqModel(m, dsub, kCodes, codebook, codes, emb)
    } finally { sample.unpersist(); () }
  }

  /** Persist: the code table (the index — m bytes/vector of scan I/O) and
    * the codebook. The corpus itself is NOT copied; refine reads it. */
  def write(model: PqModel, path: String): Unit = {
    model.codes.write.mode("overwrite").parquet(s"$path/codes")
    val spark = model.corpus.sparkSession
    import spark.implicits._
    model.codebook.zipWithIndex.flatMap { case (cents, s) =>
      cents.zipWithIndex.map { case (c, ci) => (s, ci, c.toSeq) }
    }.toSeq.toDF("s", "c", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
  }

  def load(spark: SparkSession, path: String, corpus: DataFrame): PqModel = {
    val rows = spark.read.parquet(s"$path/codebook")
      .orderBy("s", "c").collect()
      .map(r => (r.getInt(0), r.getAs[scala.collection.Seq[Float]]("centroid").toArray))
    val m = rows.map(_._1).max + 1
    val codebook = Array.tabulate(m)(s => rows.filter(_._1 == s).map(_._2))
    PqModel(m, codebook(0)(0).length, codebook(0).length, codebook,
      spark.read.parquet(s"$path/codes"), corpus)
  }

  /** Load the persisted index if present, else build + publish with one
    * rename (same race discipline as Ivf.buildOrLoad: a concurrent
    * builder can't interleave half-written parts; the rename loser
    * discards its copy and re-verifies the winner). */
  def buildOrLoad(spark: SparkSession, emb: DataFrame, path: String,
                  m: Int = 8, kCodes: Int = 16, seed: Long = 42L): PqModel = {
    def done(part: String) = new java.io.File(s"$path/$part/_SUCCESS").exists()
    if (done("codes") && done("codebook")) load(spark, path, emb)
    else {
      val tmp = s"$path.tmp-${ProcessHandle.current().pid()}-${Thread.currentThread().getId}"
      write(build(emb, m, kCodes, seed), tmp)
      val dst = new java.io.File(path)
      dst.getParentFile.mkdirs()
      if (!new java.io.File(tmp).renameTo(dst)) {
        deleteRecursively(new java.io.File(tmp))
        if (!(done("codes") && done("codebook")))
          throw new IllegalStateException(
            s"pq publish failed: rename to $path lost without a complete index present")
      }
      load(spark, path, emb)
    }
  }

  /** Mtime-keyed per-corpus cache path (same convention as Ivf.cached). */
  def cached(spark: SparkSession, emb: DataFrame, corpusKey: String,
             m: Int = 8, kCodes: Int = 16): PqModel = {
    val n = emb.count()
    val key = corpusKey.replaceAll("[^A-Za-z0-9.]", "_")
    val srcMtime = emb.inputFiles.map(f =>
      new java.io.File(new java.net.URI(f).getPath).lastModified()).foldLeft(0L)(math.max)
    val path = s"${sys.props("java.io.tmpdir")}/graft-pq/$key-n$n-m$srcMtime-sub$m-k$kCodes"
    buildOrLoad(spark, emb, path, m, kCodes)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }
}
