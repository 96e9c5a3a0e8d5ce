package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over `array<float>` columns.
  *
  * They live in an `org.apache.spark.sql`-rooted package because
  * `AbstractDataType` is `private[sql]` in Spark 4 — the same pattern public
  * Spark extension libraries use. The `graft.functions.VectorFunctions`
  * facade is the public API.
  *
  * These stay inside whole-stage codegen (unlike Scala UDFs or higher-order
  * function composition), which is what makes brute-force scoring of large
  * embedding tables viable: the scan → score → top-K heap pipeline compiles
  * to one tight loop per partition.
  *
  * Accumulation is sequential in double precision — deterministic, and
  * matching the reference oracle's behaviour (reference: src/eval/oracle.py:36
  * `brute_force` upcasts to float64 before the dot product).
  */

/** score = Σ aᵢ·bᵢ over two array<float> columns, double accumulator. */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"dot_f32: dimension mismatch ($n vs ${y.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_f32: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double)$a.getFloat($i) * (double)$b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ‖a‖₂ over an array<float> column, double accumulator. */
case class L2NormF32(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm_f32"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double)$a.getFloat($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Index of the centroid with max inner product against `vec` —
  * the IVF assignment/probe primitive. `centroids` is an
  * array<array<float>> (broadcast literal or column).
  */
case class ArgMaxDotF32(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(ArrayType(FloatType)))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "argmax_dot_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val d = vec.numElements()
    var best = -1
    var bestScore = Double.NegativeInfinity
    var c = 0
    val k = cents.numElements()
    while (c < k) {
      val cent = cents.getArray(c)
      if (cent.numElements() != d)
        throw new IllegalArgumentException(
          s"argmax_dot_f32: centroid $c dimension ${cent.numElements()} != vector $d")
      var acc = 0.0
      var i = 0
      while (i < d) {
        acc += vec.getFloat(i).toDouble * cent.getFloat(i).toDouble
        i += 1
      }
      if (acc > bestScore) { bestScore = acc; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val cent = ctx.freshName("cent")
      s"""
         |int $best = -1;
         |double $bestScore = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $b.numElements(); $c++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cent = $b.getArray($c);
         |  int $n = $a.numElements();
         |  if ($cent.numElements() != $n) {
         |    throw new IllegalArgumentException("argmax_dot_f32: centroid " + $c
         |      + " dimension " + $cent.numElements() + " != vector " + $n);
         |  }
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double)$a.getFloat($i) * (double)$cent.getFloat($i);
         |  }
         |  if ($acc > $bestScore) { $bestScore = $acc; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** |a ∩ b| for two SORTED array<long> columns — two-pointer merge, O(n+m),
  * no per-element hashing/boxing. The Jaccard-verify hot path: with token
  * sets pre-hashed (xxhash64) and pre-sorted once per document, each
  * candidate pair costs one linear merge instead of `array_intersect`'s
  * hash-set build over strings.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Shared single-pass tokenization: lowercase whitespace tokens (n=1) or
  * n-token shingles (n>1), distinct. Plain JVM string work — replaces
  * chains of interpreted higher-order functions. */
object TokenSets {
  def items(input: Any, n: Int): Array[String] = {
    val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.toLowerCase
    val toks = text.split(" ", -1)
    if (n == 1) toks.distinct
    else if (toks.length < n) Array.empty
    else toks.sliding(n).map(_.mkString(" ")).toArray.distinct
  }

  def xxh64(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
  }

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5hex(s: String): String = {
    val d = md5.get()
    d.reset()
    d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }
}

/** Sorted distinct XXH64 token/shingle hashes of the text — the canonical
  * set representation every pairwise verify runs on. Single-purpose (no
  * struct output): projection pushdown/collapse can't silently multiply a
  * bundled computation per extracted field. */
case class TokenSetIds(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_set_ids"

  override protected def nullSafeEval(input: Any): Any = {
    val items = TokenSets.items(input, n)
    val hashes = new Array[Long](items.length)
    var i = 0
    while (i < items.length) { hashes(i) = TokenSets.xxh64(items(i)); i += 1 }
    java.util.Arrays.sort(hashes)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(hashes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Min MD5 hex of the token/shingle set — the 1-permutation-MinHash
  * blocking key; MD5 over UTF-8 bytes matches Spark's and DuckDB's md5()
  * exactly (oracle-visible). Null for empty texts. */
case class TokenSetMinMd5(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "token_set_min_md5"

  override protected def nullSafeEval(input: Any): Any = {
    val items = TokenSets.items(input, n)
    var minMd5: String = null
    var i = 0
    while (i < items.length) {
      val h = TokenSets.md5hex(items(i))
      if (minMd5 == null || h < minMd5) minMd5 = h
      i += 1
    }
    if (minMd5 == null) null
    else org.apache.spark.unsafe.types.UTF8String.fromString(minMd5)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct token/shingle count (tokenize only — no hashing). */
case class TokenSetSize(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_set_size"

  override protected def nullSafeEval(input: Any): Any =
    TokenSets.items(input, n).length

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature in one pass: out[j] = min_i (a(j)·h(i) + b(j)) mod p
  * over an array<long> of element hashes. Replaces per-permutation
  * `array_min(transform(...))` chains — those run interpreted with
  * per-element Catalyst overhead × perms; this is one tight codegen'd
  * nested loop. Constants stay below 2³¹ so the Long arithmetic cannot
  * overflow (a·h' < 2⁶² after h is reduced mod p).
  */
case class MinHashSignature(child: Expression, a: Seq[Long], b: Seq[Long], prime: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(a.length == b.length && a.nonEmpty, "coefficient arrays must match")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val k = a.length
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      var best = Long.MaxValue
      var i = 0
      while (i < n) {
        val h = ((hs.getLong(i) % prime) + prime) % prime
        val v = (a(j) * h + b(j)) % prime
        if (v < best) best = v
        i += 1
      }
      out(j) = if (n == 0) 0L else best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("aCoeffs", a.toArray, "long[]")
    val bRef = ctx.addReferenceObj("bCoeffs", b.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, in => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val best = ctx.freshName("best")
      val out = ctx.freshName("out")
      s"""
         |int $n = $in.numElements();
         |long[] $out = new long[${a.length}];
         |for (int $j = 0; $j < ${a.length}; $j++) {
         |  long $best = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = (($in.getLong($i) % ${prime}L) + ${prime}L) % ${prime}L;
         |    long $v = ($aRef[$j] * $h + $bRef[$j]) % ${prime}L;
         |    if ($v < $best) $best = $v;
         |  }
         |  $out[$j] = ($n == 0) ? 0L : $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Packs sign bits of vec·planeⱼ into a long — cosine-LSH bucket id.
  * `right` is array<array<float>> of ≤64 hyperplanes.
  */
case class HyperplaneSignature(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(ArrayType(FloatType)))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_signature"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val planes = b.asInstanceOf[ArrayData]
    var sig = 0L
    var j = 0
    val k = math.min(planes.numElements(), 64)
    val d = vec.numElements()
    while (j < k) {
      val p = planes.getArray(j)
      if (p.numElements() != d)
        throw new IllegalArgumentException(
          s"hyperplane_signature: plane $j dimension ${p.numElements()} != vector $d")
      var acc = 0.0
      var i = 0
      while (i < d) {
        acc += vec.getFloat(i).toDouble * p.getFloat(i).toDouble
        i += 1
      }
      if (acc > 0.0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      s"""
         |long $sig = 0L;
         |int $k = java.lang.Math.min($b.numElements(), 64);
         |for (int $j = 0; $j < $k; $j++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $p = $b.getArray($j);
         |  int $n = $a.numElements();
         |  if ($p.numElements() != $n) {
         |    throw new IllegalArgumentException("hyperplane_signature: plane " + $j
         |      + " dimension " + $p.numElements() + " != vector " + $n);
         |  }
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double)$a.getFloat($i) * (double)$p.getFloat($i);
         |  }
         |  if ($acc > 0.0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
