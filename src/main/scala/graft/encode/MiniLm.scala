package graft.encode

import graft.search.QueryEncoder
import graft.sources.NpyIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** A pure-Scala sentence-transformer encoder with the MiniLM/BERT
  * architecture — the reference's qtext → qvec step (run.py:137-147
  * embeds query text with all-MiniLM-L6-v2 at run time; artifacts.py at
  * build time). The architecture and pooling are public (Devlin et al.
  * 2018; Wang et al. 2020 MiniLM; sentence-transformers mean-pooling +
  * L2-normalize), and the weight format here is the library's own .npy
  * reader (NpyIO) over the HF `state_dict` tensor names — a user exports
  * all-MiniLM-L6-v2 with a five-line public script
  * (`np.save(name, tensor.numpy())` per state_dict entry + vocab.txt)
  * and gets the reference's real embeddings; no model runtime ships in
  * this container, so tests drive the same forward pass with seeded
  * weights (shape/determinism/parity contracts, not fixture outputs).
  *
  * Numerics: float32 storage, double accumulation in every reduction
  * (matmul rows, layernorm mean/var, softmax sum, pooling) — the same
  * discipline as VecMath/DotProductF32. GELU is the erf form BERT uses
  * (not the tanh approximation); erf via Abramowitz–Stegun 7.1.26
  * (|err| < 1.5e-7, far inside float32 resolution).
  *
  * Scale shape: one `MiniLmWeights` is ~90 MB for the real model —
  * broadcast ONCE per job and materialized into one encoder per
  * partition (`MiniLm.embedTable`), the Multimodal decoder-amortization
  * pattern; never one instance per row.
  */
object MiniLm {

  /** One transformer layer's tensors, PyTorch Linear convention:
    * weight is (out, in), y = W·x + b. */
  final case class Layer(
      wq: Array[Array[Float]], bq: Array[Float],
      wk: Array[Array[Float]], bk: Array[Float],
      wv: Array[Array[Float]], bv: Array[Float],
      wo: Array[Array[Float]], bo: Array[Float],
      lnAttnG: Array[Float], lnAttnB: Array[Float],
      w1: Array[Array[Float]], b1: Array[Float], // H → F
      w2: Array[Array[Float]], b2: Array[Float], // F → H
      lnOutG: Array[Float], lnOutB: Array[Float]) extends Serializable

  final case class MiniLmWeights(
      vocab: Map[String, Int],
      heads: Int,
      wordEmb: Array[Array[Float]], // V×H
      posEmb: Array[Array[Float]],  // P×H
      typeEmb: Array[Array[Float]], // T×H (type 0 used — single segment)
      lnEmbG: Array[Float], lnEmbB: Array[Float],
      layers: IndexedSeq[Layer]) extends Serializable {
    val hidden: Int = wordEmb(0).length
    require(hidden % heads == 0, s"hidden $hidden not divisible by $heads heads")
    require(posEmb(0).length == hidden && typeEmb(0).length == hidden)
  }

  // ---- math kernels ------------------------------------------------------

  /** y = W·x + b with W (out, in); double accumulation per output row. */
  private[graft] def linear(w: Array[Array[Float]], b: Array[Float],
                             x: Array[Float]): Array[Float] = {
    val out = new Array[Float](w.length)
    var i = 0
    while (i < w.length) {
      val row = w(i)
      var acc: Double = b(i)
      var j = 0
      while (j < row.length) { acc += row(j).toDouble * x(j); j += 1 }
      out(i) = acc.toFloat
      i += 1
    }
    out
  }

  private[graft] def layerNorm(x: Array[Float], g: Array[Float], b: Array[Float],
                                eps: Double = 1e-12): Array[Float] = {
    val n = x.length
    var mean = 0.0; var i = 0
    while (i < n) { mean += x(i); i += 1 }
    mean /= n
    var v = 0.0; i = 0
    while (i < n) { val d = x(i) - mean; v += d * d; i += 1 }
    val inv = 1.0 / math.sqrt(v / n + eps)
    val out = new Array[Float](n); i = 0
    while (i < n) { out(i) = ((x(i) - mean) * inv * g(i) + b(i)).toFloat; i += 1 }
    out
  }

  /** Abramowitz–Stegun 7.1.26 rational erf approximation, |err| < 1.5e-7. */
  private[graft] def erf(x: Double): Double = {
    val s = if (x < 0) -1.0 else 1.0
    val a = math.abs(x)
    val t = 1.0 / (1.0 + 0.3275911 * a)
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t -
      0.284496736) * t + 0.254829592) * t * math.exp(-a * a)
    s * y
  }

  /** BERT's exact-erf GELU: x/2 · (1 + erf(x/√2)). */
  private[graft] def gelu(x: Double): Double = 0.5 * x * (1.0 + erf(x / math.sqrt(2.0)))

  private[graft] def softmaxInPlace(x: Array[Double]): Unit = {
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < x.length) { if (x(i) > mx) mx = x(i); i += 1 }
    var sum = 0.0; i = 0
    while (i < x.length) { x(i) = math.exp(x(i) - mx); sum += x(i); i += 1 }
    i = 0
    while (i < x.length) { x(i) /= sum; i += 1 }
  }

  // ---- forward pass ------------------------------------------------------

  /** Encode one already-tokenized sequence: L token ids → unit-norm
    * H-vector. Sequences are processed unpadded (one at a time), so no
    * attention mask is needed — padding/masking is a batching artifact
    * this shape never creates, and mean pooling runs over exactly the
    * real tokens (the sentence-transformers mask-weighted mean). */
  def forward(w: MiniLmWeights, ids: Array[Int]): Array[Float] = {
    require(ids.nonEmpty, "cannot encode an empty token sequence")
    require(ids.length <= w.posEmb.length,
      s"sequence ${ids.length} exceeds position table ${w.posEmb.length}")
    val h = w.hidden
    val nh = w.heads
    val hd = h / nh
    // embeddings: word + position + type(0), then LN
    var x: Array[Array[Float]] = ids.zipWithIndex.map { case (id, pos) =>
      val e = new Array[Float](h)
      val we = w.wordEmb(id); val pe = w.posEmb(pos); val te = w.typeEmb(0)
      var j = 0
      while (j < h) { e(j) = we(j) + pe(j) + te(j); j += 1 }
      layerNorm(e, w.lnEmbG, w.lnEmbB)
    }
    val L = x.length
    w.layers.foreach { ly =>
      val q = x.map(linear(ly.wq, ly.bq, _))
      val k = x.map(linear(ly.wk, ly.bk, _))
      val v = x.map(linear(ly.wv, ly.bv, _))
      val scale = 1.0 / math.sqrt(hd.toDouble)
      val ctx = Array.fill(L)(new Array[Float](h))
      var head = 0
      while (head < nh) {
        val off = head * hd
        var i = 0
        while (i < L) {
          val scores = new Array[Double](L)
          var t = 0
          while (t < L) {
            var acc = 0.0; var j = 0
            while (j < hd) { acc += q(i)(off + j).toDouble * k(t)(off + j); j += 1 }
            scores(t) = acc * scale
            t += 1
          }
          softmaxInPlace(scores)
          var j = 0
          while (j < hd) {
            var acc = 0.0; t = 0
            while (t < L) { acc += scores(t) * v(t)(off + j); t += 1 }
            ctx(i)(off + j) = acc.toFloat
            j += 1
          }
          i += 1
        }
        head += 1
      }
      // attention output + residual + LN
      val attnOut = (0 until L).map { i =>
        val o = linear(ly.wo, ly.bo, ctx(i))
        var j = 0
        while (j < h) { o(j) += x(i)(j); j += 1 }
        layerNorm(o, ly.lnAttnG, ly.lnAttnB)
      }.toArray
      // FFN + residual + LN
      x = attnOut.map { xi =>
        val mid = linear(ly.w1, ly.b1, xi)
        var j = 0
        while (j < mid.length) { mid(j) = gelu(mid(j)).toFloat; j += 1 }
        val o = linear(ly.w2, ly.b2, mid)
        j = 0
        while (j < h) { o(j) += xi(j); j += 1 }
        layerNorm(o, ly.lnOutG, ly.lnOutB)
      }
    }
    // mean-pool + L2 normalize (sentence-transformers head)
    val pooled = new Array[Float](h)
    var j = 0
    while (j < h) {
      var acc = 0.0; var i = 0
      while (i < L) { acc += x(i)(j); i += 1 }
      pooled(j) = (acc / L).toFloat
      j += 1
    }
    var nrm = 0.0; j = 0
    while (j < h) { nrm += pooled(j).toDouble * pooled(j); j += 1 }
    val inv = if (nrm == 0.0) 0.0 else 1.0 / math.sqrt(nrm)
    j = 0
    while (j < h) { pooled(j) = (pooled(j) * inv).toFloat; j += 1 }
    pooled
  }

  // ---- weight I/O (HF state_dict names over NpyIO) -----------------------

  private def mat(dir: String, name: String): Array[Array[Float]] =
    NpyIO.readLocal(s"$dir/$name.npy")

  private def vec(dir: String, name: String): Array[Float] = {
    val m = mat(dir, name)
    if (m.length == 1) m(0) else m.map(_(0)) // 1-D saved as (n,) or (n,1)
  }

  /** Load weights from a directory of per-tensor .npy files named by their
    * HF state_dict keys (np.save(f"{key}.npy", t.numpy()) per entry),
    * plus vocab.txt; heads from config.json's num_attention_heads when
    * present (the real model's value is 12). */
  def load(dir: String, headsDefault: Int = 12): MiniLmWeights = {
    val heads = {
      val cfg = new java.io.File(s"$dir/config.json")
      if (cfg.exists()) {
        val txt = new String(java.nio.file.Files.readAllBytes(cfg.toPath))
        """"num_attention_heads"\s*:\s*(\d+)""".r.findFirstMatchIn(txt)
          .map(_.group(1).toInt).getOrElse(headsDefault)
      } else headsDefault
    }
    val nLayers = Iterator.from(0)
      .takeWhile(i => new java.io.File(
        s"$dir/encoder.layer.$i.attention.self.query.weight.npy").exists())
      .size
    require(nLayers > 0, s"no encoder.layer.*.npy tensors under $dir")
    val layers = (0 until nLayers).map { i =>
      val p = s"encoder.layer.$i"
      Layer(
        mat(dir, s"$p.attention.self.query.weight"), vec(dir, s"$p.attention.self.query.bias"),
        mat(dir, s"$p.attention.self.key.weight"), vec(dir, s"$p.attention.self.key.bias"),
        mat(dir, s"$p.attention.self.value.weight"), vec(dir, s"$p.attention.self.value.bias"),
        mat(dir, s"$p.attention.output.dense.weight"), vec(dir, s"$p.attention.output.dense.bias"),
        vec(dir, s"$p.attention.output.LayerNorm.weight"), vec(dir, s"$p.attention.output.LayerNorm.bias"),
        mat(dir, s"$p.intermediate.dense.weight"), vec(dir, s"$p.intermediate.dense.bias"),
        mat(dir, s"$p.output.dense.weight"), vec(dir, s"$p.output.dense.bias"),
        vec(dir, s"$p.output.LayerNorm.weight"), vec(dir, s"$p.output.LayerNorm.bias"))
    }
    MiniLmWeights(
      vocab = WordPiece.fromFile(s"$dir/vocab.txt").vocab,
      heads = heads,
      wordEmb = mat(dir, "embeddings.word_embeddings.weight"),
      posEmb = mat(dir, "embeddings.position_embeddings.weight"),
      typeEmb = mat(dir, "embeddings.token_type_embeddings.weight"),
      lnEmbG = vec(dir, "embeddings.LayerNorm.weight"),
      lnEmbB = vec(dir, "embeddings.LayerNorm.bias"),
      layers = layers)
  }

  /** Save weights as the same per-tensor .npy layout `load` reads (spec
    * round-trip + a template for the real-model export). */
  def save(w: MiniLmWeights, dir: String): Unit = {
    new java.io.File(dir).mkdirs()
    def wm(name: String, m: Array[Array[Float]]): Unit =
      NpyIO.write(s"$dir/$name.npy", m.iterator, m.length, m(0).length)
    def wv(name: String, v: Array[Float]): Unit =
      NpyIO.write(s"$dir/$name.npy", Iterator(v), 1, v.length)
    wm("embeddings.word_embeddings.weight", w.wordEmb)
    wm("embeddings.position_embeddings.weight", w.posEmb)
    wm("embeddings.token_type_embeddings.weight", w.typeEmb)
    wv("embeddings.LayerNorm.weight", w.lnEmbG); wv("embeddings.LayerNorm.bias", w.lnEmbB)
    w.layers.zipWithIndex.foreach { case (ly, i) =>
      val p = s"encoder.layer.$i"
      wm(s"$p.attention.self.query.weight", ly.wq); wv(s"$p.attention.self.query.bias", ly.bq)
      wm(s"$p.attention.self.key.weight", ly.wk); wv(s"$p.attention.self.key.bias", ly.bk)
      wm(s"$p.attention.self.value.weight", ly.wv); wv(s"$p.attention.self.value.bias", ly.bv)
      wm(s"$p.attention.output.dense.weight", ly.wo); wv(s"$p.attention.output.dense.bias", ly.bo)
      wv(s"$p.attention.output.LayerNorm.weight", ly.lnAttnG)
      wv(s"$p.attention.output.LayerNorm.bias", ly.lnAttnB)
      wm(s"$p.intermediate.dense.weight", ly.w1); wv(s"$p.intermediate.dense.bias", ly.b1)
      wm(s"$p.output.dense.weight", ly.w2); wv(s"$p.output.dense.bias", ly.b2)
      wv(s"$p.output.LayerNorm.weight", ly.lnOutG); wv(s"$p.output.LayerNorm.bias", ly.lnOutB)
    }
    val vocabLines = w.vocab.toSeq.sortBy(_._2).map(_._1)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/vocab.txt"),
      scala.jdk.CollectionConverters.SeqHasAsJava(vocabLines).asJava)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/config.json"),
      s"""{"num_attention_heads": ${w.heads}}""")
  }

  /** Deterministic seeded weights (N(0, 0.02), the BERT init scale) over
    * the char vocab — the pluggable-test model: real architecture, fake
    * parameters. Default hidden = 64 so its output dimension matches the
    * testdata embedding dim and encoded queries flow through the whole
    * search stack. */
  def seededTiny(hidden: Int = 64, layers: Int = 2, heads: Int = 4,
                 ffn: Int = 128, maxPos: Int = 128, seed: Long = 42L): MiniLmWeights = {
    val vocab = WordPiece.charVocab
    val rng = new scala.util.Random(seed)
    def m(rows: Int, cols: Int) = Array.fill(rows)(Array.fill(cols)((rng.nextGaussian() * 0.02).toFloat))
    def zeros(n: Int) = new Array[Float](n)
    def ones(n: Int) = Array.fill(n)(1.0f)
    val ls = (0 until layers).map { _ =>
      Layer(m(hidden, hidden), zeros(hidden), m(hidden, hidden), zeros(hidden),
        m(hidden, hidden), zeros(hidden), m(hidden, hidden), zeros(hidden),
        ones(hidden), zeros(hidden),
        m(ffn, hidden), zeros(ffn), m(hidden, ffn), zeros(hidden),
        ones(hidden), zeros(hidden))
    }
    MiniLmWeights(vocab, heads, m(vocab.size, hidden), m(maxPos, hidden),
      m(2, hidden), ones(hidden), zeros(hidden), ls)
  }

  // ---- the QueryEncoder seam + the distributed table path ----------------

  /** QueryEncoder over a weight set: the RunHarness/QuerySet encode seam
    * (explicit qvec wins; else non-empty qtext lands here). */
  final class Encoder(w: MiniLmWeights, maxLen: Int = 128) extends QueryEncoder {
    private val tok = new WordPiece(w.vocab)
    val dim: Int = w.hidden
    def encode(qtext: String): Array[Float] = {
      val ids = tok.encode(qtext, maxLen)
      forward(w, if (ids.isEmpty) tok.encode("[UNK]", maxLen) else ids)
    }
  }

  /** The tiny seeded encoder, matched to the testdata dim — what specs and
    * the registered encode query drive through the seam. */
  def tinyEncoder(seed: Long = 42L): Encoder = new Encoder(seededTiny(seed = seed))

  /** Distributed corpus embedding (the artifacts.py build_embeddings twin,
    * and the mm_features decoder-amortization shape): weights broadcast
    * ONCE, one encoder materialized per PARTITION, forward pass per row.
    * Output schema (idCol, embedding float32) — Ingest/Index-ready. */
  def embedTable(df: DataFrame, textCol: String, idCol: String,
                 w: MiniLmWeights, maxLen: Int = 128): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(w)
    val slim = df.select(org.apache.spark.sql.functions.col(idCol).cast(LongType),
        org.apache.spark.sql.functions.col(textCol))
    // the forward pass is COMPUTE-bound, so parallelism must track cores,
    // not input splits: a small corpus in one parquet file would otherwise
    // run every forward pass on a single thread (at warehouse scale the
    // input already has >= cores splits and this is a no-op)
    val want = spark.sparkContext.defaultParallelism
    val inRdd0 = slim.rdd.map(r => (r.getLong(0), if (r.isNullAt(1)) "" else r.getString(1)))
    val inRdd = if (inRdd0.getNumPartitions < want) inRdd0.repartition(want) else inRdd0
    val outRdd = inRdd.mapPartitions { it =>
      val enc = new Encoder(bc.value, maxLen) // once per partition
      it.map { case (id, text) => org.apache.spark.sql.Row(id, enc.encode(text)) }
    }
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
    spark.createDataFrame(outRdd, schema)
  }
}
