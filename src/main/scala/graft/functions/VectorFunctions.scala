package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.graft.{ArgMaxDotF32, DotProductF32, HyperplaneSignature, L2NormF32, SortedIntersectSize}

/** Public facade for graft's native Catalyst vector expressions (the case
  * classes live in `org.apache.spark.sql.graft` — see VectorExpressions.scala
  * for why). All stay inside whole-stage codegen.
  */
object VectorFunctions {

  /** Inner product of two float vectors, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProductF32(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Cosine similarity == dot product when inputs are L2-normalized (the
    * reference's contract); provided for un-normalized inputs. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{sqrt => fsqrt}
    dot(a, b) / (fsqrt(dot(a, a)) * fsqrt(dot(b, b)))
  }

  /** L2 norm of a float vector (reference validators.py:38 ensure_unit_l2). */
  def l2Norm(a: Column): Column =
    GraftBridge.column(L2NormF32(GraftBridge.expression(a)))

  /** Index of max-inner-product centroid (IVF assign/probe). */
  def argMaxDot(vec: Column, centroids: Column): Column =
    GraftBridge.column(ArgMaxDotF32(GraftBridge.expression(vec), GraftBridge.expression(centroids)))

  /** Random-hyperplane signature: bit j set iff vec·plane_j > 0.
    * The LSH primitive for cosine similarity (SimHash family). */
  def hyperplaneSignature(vec: Column, planes: Column): Column =
    GraftBridge.column(HyperplaneSignature(GraftBridge.expression(vec), GraftBridge.expression(planes)))

  /** |a ∩ b| of two sorted array<long> columns (two-pointer, codegen'd). */
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectSize(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Sorted distinct XXH64 token/shingle hashes of raw text (n-gram
    * shingles when n > 1) — single-pass JVM tokenization. */
  def tokenSetIds(text: Column, n: Int): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.TokenSetIds(GraftBridge.expression(text), n))

  /** Per-window n-gram fingerprints of the raw token sequence (codegen'd;
    * GramHashes doc — the dup-spans volume-pass keys). */
  def gramHashes(text: Column, n: Int): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.GramHashes(GraftBridge.expression(text), n))

  /** First-occurrence-distinct md5-prefix token ids (codegen'd; the
    * portable miners' engine-reproducible hash — TokenMd5Ids doc). */
  def tokenMd5Ids(text: Column, hexLen: Int): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.TokenMd5Ids(GraftBridge.expression(text), hexLen))

  /** All n-token shingle strings, duplicates included (codegen'd). */
  def tokenGrams(text: Column, n: Int, lower: Boolean): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.TokenGrams(GraftBridge.expression(text), n, lower))

  /** Rolling character fingerprint (codegen'd; RollingFingerprint doc). */
  def rollingFp(text: Column): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.RollingFingerprint(GraftBridge.expression(text)))

  /** Max multiplicity over the lowercased tokens (codegen'd). */
  def topTokenCount(text: Column): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.TopTokenCount(GraftBridge.expression(text)))

  /** Min-MD5 blocking key of the token/shingle set (oracle-compatible). */
  def tokenSetMinMd5(text: Column, n: Int): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.TokenSetMinMd5(GraftBridge.expression(text), n))

  /** Distinct token/shingle count (tokenize only). */
  def tokenSetSize(text: Column, n: Int): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.TokenSetSize(GraftBridge.expression(text), n))

  /** MinHash signature over an array<long> of element hashes: one codegen
    * pass for all permutations (aᵢ·h + bᵢ mod prime, minimised). */
  def minhashSignature(hashes: Column, a: Seq[Long], b: Seq[Long], prime: Long): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.MinHashSignature(GraftBridge.expression(hashes), a, b, prime))

  /** Row-local 64-bit SimHash over an array<long> of element hashes
    * (bit j set iff the ±1 majority vote on bit j is positive). */
  def simHash64(hashes: Column): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.SimHash64(GraftBridge.expression(hashes)))

  /** All m PQ codes of an array<float> vector in one codegen pass; the
    * codebook rides in the expression as primitive arrays. */
  def pqEncode(vec: Column, codebook: Array[Array[Array[Float]]]): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.PqEncode(GraftBridge.expression(vec), codebook))

  /** ADC score Σ_s lut[s][code_s] over an array<int> code column. */
  def pqAdcScore(codes: Column, lut: Array[Array[Double]]): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.PqAdcScore(GraftBridge.expression(codes), lut))

  /** 8-bit scalar-quantization encode: one byte per dimension (binary). */
  def sqEncode(vec: Column, vmin: Array[Float], delta: Array[Float]): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.SqEncode(GraftBridge.expression(vec), vmin, delta))

  /** Asymmetric SQ score bias + Σ code_i·w_i over a binary code column. */
  def sqAdcScore(codes: Column, w: Array[Double], bias: Double): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.SqAdcScore(GraftBridge.expression(codes), w, bias))

  /** Sign-bit binary-quantization encode: ceil(dim/8) bytes, bit i set iff
    * vec_i > 0 (training-free 32× compression). */
  def bqEncode(vec: Column): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.BqEncode(GraftBridge.expression(vec)))

  /** Hamming distance of a binary code column vs the query's code. */
  def bqHamming(codes: Column, qcode: Array[Byte]): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.BqHamming(GraftBridge.expression(codes), qcode))

  /** Bloom-sketch membership probe over a bigint id column (exact-false,
    * probabilistic-true): the pre-shuffle pruning primitive for
    * small-set ⋈ huge-stream joins. See BloomMightContainLong. */
  def bloomMightContainLong(id: Column, sketchBytes: Array[Byte]): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.BloomMightContainLong(
        GraftBridge.expression(id), sketchBytes))

  /** All m residual-PQ codes of (vec − centroids[listId]) in one pass. */
  def pqEncodeResidual(vec: Column, listId: Column,
                       centroids: Array[Array[Float]],
                       codebook: Array[Array[Array[Float]]]): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.PqEncodeResidual(
        GraftBridge.expression(vec), GraftBridge.expression(listId),
        centroids, codebook))

  /** y = basis·(x − mean): codegen'd affine projection (PCA/OPQ rotate). */
  def pcaProject(vec: Column, mean: Array[Float],
                 basis: Array[Array[Float]]): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.PcaProject(
        GraftBridge.expression(vec), mean, basis))
}
