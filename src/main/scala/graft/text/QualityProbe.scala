package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** #164 Trained quality/domain classifier — the "looks like the curated
  * corpus" linear probe every large pretraining pipeline ships (GPT-3's
  * WebText-vs-CommonCrawl logistic filter; reference pipelines keep the
  * trained-filter slot even when the heuristics of `text_quality` exist):
  * a ridge LINEAR PROBE over hashed bag-of-words term frequencies,
  * trained IN the engine by normal equations.
  *
  * 100 TB shape — the whole training is TWO scans and ZERO shuffles:
  *  1. one pass accumulates the packed upper-triangular XᵀX and Xᵀy per
  *     partition (d(d+3)/2 + 1 doubles ≈ 33 KB each, independent of
  *     rows — the Pca.moments discipline), combined on the driver in
  *     partition order (deterministic for a given file layout);
  *  2. the driver solves (XᵀX + λI)w = Xᵀy by Cholesky (d = 513 —
  *     milliseconds) and broadcasts w;
  *  3. one row-local scoring pass emits margins. No gradient loop, no
  *     parameter server, no shuffle anywhere.
  *
  * Features: 512 md5-hashed unigram + adjacent-bigram buckets,
  * frequency-normalized per doc + a bias slot — deterministic and
  * engine-independent, though the SOLVE is linear algebra no SQL engine
  * replicates, so the registered query is rows-only with
  * distributed==driver parity, separation (AUC), determinism and
  * totality spec-pinned (TextSpec).
  *
  * The ridge margin approximates the class posterior in the same way
  * LS-SVM/fisher discriminants do — monotone in the log-odds under the
  * usual assumptions — which is all a THRESHOLDED curation filter
  * consumes (compose with corpus_prune_quantile / sample_weighted).
  */
object QualityProbe {

  val Dim = 512
  /** feature vector length: Dim tf buckets + bias */
  val D: Int = Dim + 1
  val Lambda = 1e-6

  final case class Model(w: Array[Double]) {
    require(w.length == D, s"probe weights ${w.length} != $D")
  }

  /** md5-bucket of a token — first 2 md5 bytes mod Dim (matches the
    * engine-portable md5 discipline; stable across JVMs/engines). */
  def bucket(token: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(token.getBytes("UTF-8"))
    (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % Dim
  }

  /** Dense tf feature vector over unigrams + adjacent bigrams (the
    * corpus_dsir feature space — bigrams carry the ORDER signal that
    * separates near-identical vocabularies), Dim buckets + trailing
    * bias 1.0, frequency-normalized per doc. */
  def features(text: String): Array[Double] = {
    val toks = text.toLowerCase.split(" ")
    val x = new Array[Double](D)
    var i = 0
    while (i < toks.length) {
      x(bucket(toks(i))) += 1.0
      if (i > 0) x(bucket(toks(i - 1) + "_" + toks(i))) += 1.0
      i += 1
    }
    i = 0
    val inv = 1.0 / (2 * toks.length - 1)
    while (i < Dim) { x(i) *= inv; i += 1 }
    x(Dim) = 1.0
    x
  }

  /** Additive normal-equation sufficient statistics — packed upper-tri
    * XᵀX + Xᵀy. Moments ADD (the PcaState discipline), so incremental /
    * streaming maintenance is exact up to summation-order ulps
    * (streaming/QualityProbeStreaming.scala). */
  final case class Moments(xtx: Array[Double], xty: Array[Double]) {
    def absorb(o: Moments): Moments = {
      val x2 = xtx.clone(); val y2 = xty.clone()
      var i = 0
      while (i < x2.length) { x2(i) += o.xtx(i); i += 1 }
      i = 0
      while (i < y2.length) { y2(i) += o.xty(i); i += 1 }
      Moments(x2, y2)
    }
    def toModel: Model = Model(solveRidge(xtx, xty, Lambda))
  }

  object Moments {
    def zero: Moments =
      Moments(new Array[Double](D * (D + 1) / 2), new Array[Double](D))
  }

  /** One pass: packed upper-tri XᵀX (d(d+1)/2) + Xᵀy (d) per partition,
    * combined in partition order on the driver. */
  def moments(docs: DataFrame,
              positive: org.apache.spark.sql.Column): Moments = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = docs.select(col("text"),
      positive.cast("int").as("y")).as[(String, Int)]
    val tri = D * (D + 1) / 2
    val parts = rows.rdd.mapPartitionsWithIndex { (pi, it) =>
      val xtx = new Array[Double](tri)
      val xty = new Array[Double](D)
      var n = 0L
      while (it.hasNext) {
        val (text, y) = it.next()
        val x = features(text)
        var i = 0
        var t = 0
        while (i < D) {
          val xi = x(i)
          if (xi != 0.0) {
            var j = i
            var tj = t
            while (j < D) { xtx(tj) += xi * x(j); j += 1; tj += 1 }
            if (y == 1) xty(i) += xi
          }
          t += D - i
          i += 1
        }
        n += 1
      }
      if (n == 0) Iterator.empty else Iterator.single((pi, xtx, xty))
    }.collect().sortBy(_._1)
    val xtx = new Array[Double](tri)
    val xty = new Array[Double](D)
    parts.foreach { case (_, px, py) =>
      var i = 0
      while (i < tri) { xtx(i) += px(i); i += 1 }
      i = 0
      while (i < D) { xty(i) += py(i); i += 1 }
    }
    Moments(xtx, xty)
  }

  /** Fit = one moments pass + the driver solve. */
  def fit(docs: DataFrame, positive: org.apache.spark.sql.Column): Model = {
    val m = moments(docs, positive)
    require(m.xtx.exists(_ != 0.0), "quality probe: empty corpus")
    m.toModel
  }

  /** Test seam: the exact solver the fit uses (TextSpec driver parity). */
  def solveRidgeForTest(packed: Array[Double], b: Array[Double],
                        lambda: Double): Array[Double] =
    solveRidge(packed, b, lambda)

  /** Cholesky solve of (A + λI)w = b with A packed upper-triangular. */
  private[text] def solveRidge(packed: Array[Double], b: Array[Double],
                               lambda: Double): Array[Double] = {
    val a = Array.ofDim[Double](D, D)
    var t = 0
    var i = 0
    while (i < D) {
      var j = i
      while (j < D) { a(i)(j) = packed(t); a(j)(i) = packed(t); j += 1; t += 1 }
      a(i)(i) += lambda
      i += 1
    }
    // in-place Cholesky A = LLᵀ
    i = 0
    while (i < D) {
      var j = 0
      while (j < i) {
        var s = a(i)(j)
        var k = 0
        while (k < j) { s -= a(i)(k) * a(j)(k); k += 1 }
        a(i)(j) = s / a(j)(j)
        j += 1
      }
      var s = a(i)(i)
      var k = 0
      while (k < i) { s -= a(i)(k) * a(i)(k); k += 1 }
      require(s > 0, s"probe normal matrix not PD at row $i (s=$s)")
      a(i)(i) = math.sqrt(s)
      i += 1
    }
    // forward then back substitution
    val yv = new Array[Double](D)
    i = 0
    while (i < D) {
      var s = b(i)
      var k = 0
      while (k < i) { s -= a(i)(k) * yv(k); k += 1 }
      yv(i) = s / a(i)(i)
      i += 1
    }
    val w = new Array[Double](D)
    i = D - 1
    while (i >= 0) {
      var s = yv(i)
      var k = i + 1
      while (k < D) { s -= a(k)(i) * w(k); k += 1 }
      w(i) = s / a(i)(i)
      i -= 1
    }
    w
  }

  /** Row-local scoring pass: margin xᵀw per doc with broadcast weights. */
  def score(docs: DataFrame, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bw = spark.sparkContext.broadcast(model.w)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val w = bw.value
        it.map { case (id, text) =>
          val x = features(text)
          var s = 0.0
          var i = 0
          while (i < D) { s += x(i) * w(i); i += 1 }
          (id, math.rint(s * 1e6) / 1e6)
        }
      }
      .toDF("doc_id", "probe_score")
  }

  /** Train on `positive` and score the whole corpus — the registered
    * query shape (two scans, zero shuffle, presentation sort only). */
  def trainAndScore(docs: DataFrame,
                    positive: org.apache.spark.sql.Column): DataFrame =
    score(docs, fit(docs, positive))
}
