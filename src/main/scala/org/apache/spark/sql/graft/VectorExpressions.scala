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
  * n-token shingles (n>1). Plain JVM string work — replaces chains of
  * interpreted higher-order functions. The per-variant entry points below
  * (idsSorted / minMd5 / sizeOf) are single static calls so the generated
  * code of the TokenSet* expressions stays one whole-stage-codegen'd
  * invocation per row with no interpreted expression-tree walk.
  */
object TokenSets {
  private def tokens(input: org.apache.spark.unsafe.types.UTF8String): Array[String] =
    input.toString.toLowerCase.split(" ", -1)

  /** 64-bit fingerprint per n-token window over the RAW (case-preserved,
    * `split(text, " ")`-aligned) token sequence — the dup-spans volume
    * pass's gram keys (TextAnalysis.dupSpans). Per token one XXH64 over
    * its UTF-8 bytes, per window an XXH64-chained fold of the n token
    * hashes — equal token windows always fingerprint equal (the only
    * property the caller needs: collisions/false-positives die in its
    * exact string recount). Empty when the doc has < n tokens. */
  def gramHashes(input: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val toks = input.toString.split(" ", -1) // exactly split(text, " ")
    val m = toks.length - n + 1
    if (m <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { th(i) = xxh64(toks(i)); i += 1 }
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var acc = 42L
      var j = 0
      while (j < n) {
        acc = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(th(i + j), acc)
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** First-occurrence-distinct md5-prefix ids of the lowercased token set
    * — the portable miners' engine-reproducible token hash
    * (`conv(substring(md5(encode(t,'UTF-8')),1,hexLen),16,10)` rendered
    * natively; first hexLen hex chars parsed base-16). The transform
    * lambda this replaces was CodegenFallback (GramHashes doc). Order is
    * first-occurrence like array_distinct; every consumer (minhash
    * signature min-fold, simhash bit votes, set size) is order-free
    * anyway. */
  def md5Ids(input: org.apache.spark.unsafe.types.UTF8String, hexLen: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = tokens(input)
    val seen = new java.util.HashSet[String]()
    val buf = new Array[Long](toks.length)
    var m = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        buf(m) = java.lang.Long.parseLong(md5hex(t).substring(0, hexLen), 16)
        m += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (m == buf.length) buf else java.util.Arrays.copyOf(buf, m))
  }

  /** ALL n-token shingle strings (duplicates included, ' '-joined) of the
    * lowercase-or-raw token sequence — the gram-string projection the
    * novelty/collocation paths built with a CodegenFallback transform
    * lambda + per-window slice allocations. Empty when tokens < n. */
  def gramStrings(input: org.apache.spark.unsafe.types.UTF8String, n: Int,
                  lower: Boolean): org.apache.spark.sql.catalyst.util.ArrayData = {
    val raw = input.toString
    val toks = (if (lower) raw.toLowerCase else raw).split(" ", -1)
    val m = math.max(0, if (n == 1) toks.length else toks.length - n + 1)
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](m)
    var i = 0
    forEachItem(toks, n) { g =>
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(g); i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.asInstanceOf[Array[Any]])
  }

  /** Rabin–Karp rolling fingerprint h ← (h·31 + codepoint) mod 2³² over
    * the raw characters — text_fingerprint's hash, compiled (the
    * aggregate-lambda it replaces interpreted per character). Matches
    * `aggregate(split(text, ''), 0L, (h, c) -> pmod(h*31 + ascii(c),
    * 2^32))` exactly: split('') yields one string per code point and
    * ascii() returns its code point. */
  def rollingFp(input: org.apache.spark.unsafe.types.UTF8String): Long = {
    var h = 0L
    val it = input.toString.codePoints().iterator()
    while (it.hasNext) {
      h = (h * 31 + it.nextInt()) % 4294967296L
      if (h < 0) h += 4294967296L
    }
    h
  }

  /** Max multiplicity over the lowercased tokens — text_repetition's
    * top-token share numerator, O(tokens) instead of the O(distinct ·
    * tokens) filter-lambda scan. */
  def topTokenCount(input: org.apache.spark.unsafe.types.UTF8String): Int = {
    val toks = tokens(input)
    val counts = new java.util.HashMap[String, Int]()
    var best = 0
    var i = 0
    while (i < toks.length) {
      val c = counts.merge(toks(i), 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best
  }

  /** Visit every item (token or shingle), duplicates included. */
  private def forEachItem(toks: Array[String], n: Int)(f: String => Unit): Unit = {
    if (n == 1) {
      var i = 0
      while (i < toks.length) { f(toks(i)); i += 1 }
    } else if (toks.length >= n) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        f(sb.toString)
        i += 1
      }
    }
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

  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      out(i * 2) = HexDigits(b >>> 4)
      out(i * 2 + 1) = HexDigits(b & 0xF)
      i += 1
    }
    new String(out)
  }

  def md5hex(s: String): String = {
    val d = md5.get()
    d.reset()
    hex(d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** Sorted XXH64 hashes of the DISTINCT token/shingle set. */
  def idsSorted(input: org.apache.spark.unsafe.types.UTF8String, n: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = tokens(input)
    val seen = new java.util.HashSet[String]()
    val buf = new Array[Long](math.max(0, if (n == 1) toks.length else toks.length - n + 1))
    var m = 0
    forEachItem(toks, n) { item =>
      if (seen.add(item)) { buf(m) = xxh64(item); m += 1 }
    }
    val out = if (m == buf.length) buf else java.util.Arrays.copyOf(buf, m)
    java.util.Arrays.sort(out)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Min MD5 hex of the token/shingle set; null when there are no items.
    * The minimum is taken over raw digest bytes (unsigned lexicographic ==
    * hex-string order, both monotone per byte) so only the single winning
    * digest is hex-formatted. */
  def minMd5(input: org.apache.spark.unsafe.types.UTF8String, n: Int)
      : org.apache.spark.unsafe.types.UTF8String = {
    val toks = tokens(input)
    val d = md5.get()
    var best: Array[Byte] = null
    forEachItem(toks, n) { item =>
      d.reset()
      val dig = d.digest(item.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (best == null || java.util.Arrays.compareUnsigned(dig, best) < 0) best = dig
    }
    if (best == null) null
    else org.apache.spark.unsafe.types.UTF8String.fromString(hex(best))
  }

  /** Distinct token/shingle count (tokenize only — no hashing). */
  def sizeOf(input: org.apache.spark.unsafe.types.UTF8String, n: Int): Int = {
    val toks = tokens(input)
    val seen = new java.util.HashSet[String]()
    forEachItem(toks, n)(seen.add(_))
    seen.size
  }
}

/** Sorted distinct XXH64 token/shingle hashes of the text — the canonical
  * set representation every pairwise verify runs on. Single-purpose (no
  * struct output): projection pushdown/collapse can't silently multiply a
  * bundled computation per extracted field. */
case class TokenSetIds(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_set_ids"

  override protected def nullSafeEval(input: Any): Any =
    TokenSets.idsSorted(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenSets.idsSorted($in, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-window n-gram fingerprints of the raw token sequence
  * (TokenSets.gramHashes doc) — replaces the `transform(sequence(...),
  * i -> xxhash64(slice(t, i, n)))` formulation whose higher-order
  * function is CodegenFallback: the lambda broke whole-stage codegen for
  * the ENTIRE scan→explode→aggregate pipeline of the dup-spans volume
  * pass (measured 5× on the explode stage), and its per-window slice
  * allocated a fresh 13-element array per position. One compiled call,
  * O(tokens · n) long-mixing, zero per-window allocations. */
case class GramHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "gram width must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TokenSets.gramHashes(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenSets.gramHashes($in, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** First-occurrence-distinct md5-prefix ids of the lowercased token set
  * (TokenSets.md5Ids doc — the portable miners' token hash, compiled). */
case class TokenMd5Ids(child: Expression, hexLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(hexLen >= 1 && hexLen <= 15, "hex prefix must fit a signed long")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_md5_ids"

  override protected def nullSafeEval(input: Any): Any =
    TokenSets.md5Ids(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], hexLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenSets.md5Ids($in, $hexLen);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All n-token shingle strings, duplicates included (TokenSets.gramStrings
  * doc — the novelty/collocation gram projection, compiled). */
case class TokenGrams(child: Expression, n: Int, lower: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "gram width must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_grams"

  override protected def nullSafeEval(input: Any): Any =
    TokenSets.gramStrings(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, lower)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenSets.gramStrings($in, $n, $lower);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rolling character fingerprint (TokenSets.rollingFp doc). */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fp"

  override protected def nullSafeEval(input: Any): Any =
    TokenSets.rollingFp(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenSets.rollingFp($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Max multiplicity over the lowercased tokens (TokenSets.topTokenCount
  * doc — text_repetition's numerator, compiled). */
case class TopTokenCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "top_token_count"

  override protected def nullSafeEval(input: Any): Any =
    TokenSets.topTokenCount(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenSets.topTokenCount($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Min MD5 hex of the token/shingle set — the 1-permutation-MinHash
  * blocking key; MD5 over UTF-8 bytes matches Spark's and DuckDB's md5()
  * exactly (oracle-visible). Null for empty texts. */
case class TokenSetMinMd5(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "token_set_min_md5"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TokenSets.minMd5(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.TokenSets.minMd5($in, $n);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct token/shingle count (tokenize only — no hashing). */
case class TokenSetSize(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_set_size"

  override protected def nullSafeEval(input: Any): Any =
    TokenSets.sizeOf(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenSets.sizeOf($in, $n);")

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

/** 64-bit SimHash of an array<long> of element hashes, row-local: bit j of
  * the signature is set iff Σ over elements of (±1 by bit j of the hash) is
  * positive. One codegen'd pass per row — the zero-shuffle replacement for
  * the explode + 64-aggregate groupBy formulation, whose token-level
  * shuffle is corpus-sized at 100 TB while the signature itself only ever
  * needs the row's own tokens.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  // nullability is invisible to the type check (acceptsType ignores it),
  // but getLong on a null slot would silently hash garbage — reject
  // maybe-null element arrays at analysis instead of mis-signing at run
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else child.dataType match {
      case ArrayType(_, true) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> with non-null elements " +
            "(got a maybe-null element array; filter_nulls or array_compact first)")
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $in.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $in.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($counts[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

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

/** All m PQ codes of a vector in ONE pass: per subspace s, the id of the
  * L2-nearest codeword of slice s (argmin ‖x_s−c‖² = argmax x_s·c − ‖c‖²/2,
  * biases precomputed once per expression instance). The encode primitive
  * of the FAISS IndexPQ/IVFPQ family the reference's loader builds toward
  * (reference src/dataio/loaders.py:141-151 constructs the FAISS IVF
  * index family).
  *
  * The codebook rides IN the expression as primitive float arrays
  * (ctx.addReferenceObj in codegen) — NOT as a nested-array literal child:
  * a m=48 × k=256 codebook rendered as ArrayData literals pays a virtual
  * getFloat per multiply (measured: the literal formulation turned the
  * 150k×384 encode into a ~36-minute stage; primitive-array access runs
  * it in seconds). Build-time only — query scans read the code column.
  */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Float]]])
    extends UnaryExpression with ExpectsInputTypes {
  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "pq_encode: empty codebook")

  private val m = codebook.length
  private val dsub = codebook(0)(0).length

  @transient private lazy val biases: Array[Array[Double]] =
    codebook.map(_.map { c =>
      var n2 = 0.0; var i = 0
      while (i < c.length) { n2 += c(i).toDouble * c(i); i += 1 }
      -0.5 * n2
    })

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    if (vec.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: vector dimension ${vec.numElements()} != m*dsub (${m * dsub})")
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cents = codebook(s)
      val bias = biases(s)
      var best = -1
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var acc = bias(c)
        var i = 0
        while (i < dsub) { acc += vec.getFloat(s * dsub + i).toDouble * cent(i); i += 1 }
        if (acc > bestScore) { bestScore = acc; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[][][]")
      val bs = ctx.addReferenceObj("pqBiases", biases, "double[][]")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val cents = ctx.freshName("cents")
      val cent = ctx.freshName("cent")
      s"""
         |if ($a.numElements() != ${m * dsub}) {
         |  throw new IllegalArgumentException("pq_encode: vector dimension "
         |    + $a.numElements() + " != m*dsub (${m * dsub})");
         |}
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  float[][] $cents = $cb[$s];
         |  int $best = -1;
         |  double $bestScore = Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < $cents.length; $c++) {
         |    float[] $cent = $cents[$c];
         |    double $acc = $bs[$s][$c];
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      $acc += (double)$a.getFloat($s * $dsub + $i) * (double)$cent[$i];
         |    }
         |    if ($acc > $bestScore) { $bestScore = $acc; $best = $c; }
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 8-bit scalar quantization encode: per-dimension uniform code
  * c_i = clamp(round((x_i − vmin_i) / delta_i), 0, 255) packed into ONE
  * byte per dimension (BinaryType — 4× less scan I/O than f32). The
  * FAISS IndexScalarQuantizer QT_8bit primitive, the remaining member of
  * the compression family next to PQ (reference src/dataio/loaders.py
  * builds the FAISS index family this ladder re-expresses). Train params
  * (per-dim vmin, delta = (vmax−vmin)/255) are driver math over a bounded
  * sample and ride in the expression as primitive float arrays — encode
  * is row-local, shuffle-free, one codegen pass. delta_i == 0 (constant
  * dimension) encodes to 0 and decodes exactly to vmin_i. */
case class SqEncode(child: Expression, vmin: Array[Float], delta: Array[Float])
    extends UnaryExpression with ExpectsInputTypes {
  require(vmin.nonEmpty && vmin.length == delta.length,
    "sq_encode: vmin/delta must be non-empty and same length")

  private val dim = vmin.length

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    if (vec.numElements() != dim)
      throw new IllegalArgumentException(
        s"sq_encode: vector dimension ${vec.numElements()} != $dim")
    val out = new Array[Byte](dim)
    var i = 0
    while (i < dim) {
      val d = delta(i)
      if (d > 0f) {
        val c = Math.round((vec.getFloat(i) - vmin(i)) / d)
        out(i) = Math.max(0, Math.min(255, c)).toByte
      } // else constant dimension: code 0 (decode == vmin)
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val vm = ctx.addReferenceObj("sqVmin", vmin, "float[]")
      val dl = ctx.addReferenceObj("sqDelta", delta, "float[]")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException("sq_encode: vector dimension "
         |    + $a.numElements() + " != $dim");
         |}
         |byte[] $out = new byte[$dim];
         |for (int $i = 0; $i < $dim; $i++) {
         |  if ($dl[$i] > 0f) {
         |    int $c = java.lang.Math.round(($a.getFloat($i) - $vm[$i]) / $dl[$i]);
         |    $out[$i] = (byte) java.lang.Math.max(0, java.lang.Math.min(255, $c));
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric SQ score over the byte-code column: the exact identity
  * q · decode(code) = Σ q_i·(vmin_i + code_i·delta_i) = bias + Σ code_i·w_i
  * with bias = Σ q_i·vmin_i and w_i = q_i·delta_i folded driver-side
  * (SqModel.search), so the compressed scan is one unsigned-byte load and
  * one multiply-add per dimension, fully inside whole-stage codegen — the
  * vectors are never read. */
case class SqAdcScore(child: Expression, w: Array[Double], bias: Double)
    extends UnaryExpression with ExpectsInputTypes {
  require(w.nonEmpty, "sq_adc_score: empty weight vector")

  private val dim = w.length

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_adc_score"

  override protected def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[Array[Byte]]
    if (codes.length != dim)
      throw new IllegalArgumentException(
        s"sq_adc_score: code width ${codes.length} != $dim")
    var acc = bias
    var i = 0
    while (i < dim) { acc += (codes(i) & 0xFF) * w(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val wRef = ctx.addReferenceObj("sqW", w, "double[]")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |if ($a.length != $dim) {
         |  throw new IllegalArgumentException("sq_adc_score: code width "
         |    + $a.length + " != $dim");
         |}
         |double $acc = $bias;
         |for (int $i = 0; $i < $dim; $i++) {
         |  $acc += ($a[$i] & 0xFF) * $wRef[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score Σ_s lut[s][code_s] over an array<int> code column. The
  * per-query lookup table is driver math (PqModel.lut) and rides in the
  * expression as a primitive double[][] — the query-time scan over the
  * compressed code table is m plain array indexes per row, fully inside
  * whole-stage codegen (the element_at-over-literal formulation paid an
  * ArrayData dereference per subspace). */
case class PqAdcScore(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  require(lut.nonEmpty, "pq_adc_score: empty lookup table")

  private val m = lut.length

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override protected def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"pq_adc_score: code width ${codes.numElements()} != m ($m)")
    var acc = 0.0
    var s = 0
    while (s < m) { acc += lut(s)(codes.getInt(s)); s += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val lutRef = ctx.addReferenceObj("pqLut", lut, "double[][]")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $m) {
         |  throw new IllegalArgumentException("pq_adc_score: code width "
         |    + $a.numElements() + " != m ($m)");
         |}
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  $acc += $lutRef[$s][$a.getInt($s)];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sign-bit binary-quantization encode: bit i (of byte i/8, LSB-first) set
  * iff vec_i > 0 — ceil(dim/8) bytes, 32× less scan I/O than f32 at zero
  * training cost (FAISS IndexBinaryFlat's code layout; the training-free
  * member of the compression ladder next to SQ8's 4× and PQ's trained 32×).
  * Row-local, shuffle-free, one codegen pass; unused pad bits stay 0 so
  * Hamming distances are unaffected. */
case class BqEncode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      if (vec.getFloat(i) > 0f) out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[($n + 7) / 8];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getFloat($i) > 0f) {
         |    $out[$i >> 3] = (byte) ($out[$i >> 3] | (1 << ($i & 7)));
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hamming distance of a binary code column against the query's code
  * (driver-encoded, rides in the expression): one XOR + popcount per byte,
  * fully inside whole-stage codegen — the binary-tier scan primitive. */
case class BqHamming(child: Expression, qcode: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {
  require(qcode.nonEmpty, "bq_hamming: empty query code")

  private val width = qcode.length

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bq_hamming"

  override protected def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[Array[Byte]]
    if (codes.length != width)
      throw new IllegalArgumentException(
        s"bq_hamming: code width ${codes.length} != $width")
    var acc = 0
    var i = 0
    while (i < width) {
      acc += java.lang.Integer.bitCount((codes(i) ^ qcode(i)) & 0xFF)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val q = ctx.addReferenceObj("bqQcode", qcode, "byte[]")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |if ($a.length != $width) {
         |  throw new IllegalArgumentException("bq_hamming: code width "
         |    + $a.length + " != $width");
         |}
         |int $acc = 0;
         |for (int $i = 0; $i < $width; $i++) {
         |  $acc += java.lang.Integer.bitCount(($a[$i] ^ $q[$i]) & 0xFF);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Membership probe of a 64-bit id column against a driver-built Bloom
  * sketch of a SMALL id set — the 100 TB decontamination pre-filter
  * shape: the sketch ships to every task as one compact blob (~1.2 MB
  * per million ids at 1% fpp) and prunes the huge corpus-side stream
  * BEFORE any shuffle; the exact join downstream removes false
  * positives, so end results stay exact. Codegen keeps the probe inside
  * whole-stage codegen next to the shingle hash that feeds it. */
case class BloomMightContainLong(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {
  require(sketchBytes.nonEmpty, "bloom_might_contain_long: empty sketch")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  // Deserialized once per JVM; @transient so only the wire bytes ride
  // task serialization of the expression itself.
  @transient private lazy val filter: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // the deserialized filter rides ctx.references (BloomFilterImpl is
      // Serializable) — the same wiring Spark's runtime bloom filter uses
      val f = ctx.addReferenceObj("bloomFilter", filter,
        "org.apache.spark.util.sketch.BloomFilter")
      s"${ev.value} = $f.mightContainLong($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Affine projection y = B·(x − μ) of an array<float> vector, ONE codegen'd
  * pass with the basis as primitive float arrays (the PqEncode wiring —
  * an ArrayData-literal basis would pay a virtual getFloat per multiply,
  * d·r of them per row). `basis` rows are the projection directions
  * (eigenvectors for PCA), so the output has length basis.length ≤ d.
  * Accumulation is sequential double — deterministic across engines.
  * Build-time cost only: downstream scans read the projected column. */
case class PcaProject(child: Expression, mean: Array[Float],
                      basis: Array[Array[Float]])
    extends UnaryExpression with ExpectsInputTypes {
  require(basis.nonEmpty && basis.forall(_.length == mean.length),
    "pca_project: basis rows must match mean dimension")

  private val d = mean.length
  private val r = basis.length

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pca_project"

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    if (vec.numElements() != d)
      throw new IllegalArgumentException(
        s"pca_project: vector dimension ${vec.numElements()} != $d")
    val out = new Array[Float](r)
    var j = 0
    while (j < r) {
      val row = basis(j)
      var acc = 0.0
      var i = 0
      while (i < d) {
        acc += (vec.getFloat(i) - mean(i)).toDouble * row(i)
        i += 1
      }
      out(j) = acc.toFloat
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mu = ctx.addReferenceObj("pcaMean", mean, "float[]")
      val bs = ctx.addReferenceObj("pcaBasis", basis, "float[][]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      s"""
         |if ($a.numElements() != $d) {
         |  throw new IllegalArgumentException("pca_project: vector dimension "
         |    + $a.numElements() + " != $d");
         |}
         |float[] $out = new float[$r];
         |for (int $j = 0; $j < $r; $j++) {
         |  float[] $row = $bs[$j];
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    $acc += ((double)$a.getFloat($i) - (double)$mu[$i]) * (double)$row[$i];
         |  }
         |  $out[$j] = (float)$acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Residual PQ encode: all m codes of (x − c_listId) in ONE pass — the
  * true FAISS IndexIVFPQ fine quantizer (encode the residual against the
  * assigned coarse centroid, not the raw vector). Residuals concentrate
  * around the origin with far less variance than raw vectors, so the same
  * m×k code budget quantizes them much more finely — that is the recall
  * argument for composing the quantizers this way. Same argmax identity
  * and primitive-array wiring as PqEncode; the coarse centroid table rides
  * ctx.references alongside the codebook. */
case class PqEncodeResidual(left: Expression, right: Expression,
                            centroids: Array[Array[Float]],
                            codebook: Array[Array[Array[Float]]])
    extends BinaryExpression with ExpectsInputTypes {
  require(centroids.nonEmpty && codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "pq_encode_residual: empty centroids or codebook")

  private val m = codebook.length
  private val dsub = codebook(0)(0).length
  require(centroids(0).length == m * dsub,
    s"pq_encode_residual: centroid dim ${centroids(0).length} != m*dsub (${m * dsub})")

  @transient private lazy val biases: Array[Array[Double]] =
    codebook.map(_.map { c =>
      var n2 = 0.0; var i = 0
      while (i < c.length) { n2 += c(i).toDouble * c(i); i += 1 }
      -0.5 * n2
    })

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType), IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode_residual"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val list = b.asInstanceOf[Int]
    if (vec.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode_residual: vector dimension ${vec.numElements()} != m*dsub (${m * dsub})")
    if (list < 0 || list >= centroids.length)
      throw new IllegalArgumentException(
        s"pq_encode_residual: list_id $list outside [0,${centroids.length})")
    val cent = centroids(list)
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cw = codebook(s)
      val bias = biases(s)
      var best = -1
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < cw.length) {
        val w = cw(c)
        var acc = bias(c)
        var i = 0
        while (i < dsub) {
          val off = s * dsub + i
          acc += (vec.getFloat(off) - cent(off)).toDouble * w(i)
          i += 1
        }
        if (acc > bestScore) { bestScore = acc; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cents = ctx.addReferenceObj("ivfCentroids", centroids, "float[][]")
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[][][]")
      val bs = ctx.addReferenceObj("pqBiases", biases, "double[][]")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val cw = ctx.freshName("cw")
      val w = ctx.freshName("w")
      val cent = ctx.freshName("cent")
      s"""
         |if ($a.numElements() != ${m * dsub}) {
         |  throw new IllegalArgumentException("pq_encode_residual: vector dimension "
         |    + $a.numElements() + " != m*dsub (${m * dsub})");
         |}
         |if ($b < 0 || $b >= $cents.length) {
         |  throw new IllegalArgumentException("pq_encode_residual: list_id "
         |    + $b + " outside [0," + $cents.length + ")");
         |}
         |float[] $cent = $cents[$b];
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  float[][] $cw = $cb[$s];
         |  int $best = -1;
         |  double $bestScore = Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < $cw.length; $c++) {
         |    float[] $w = $cw[$c];
         |    double $acc = $bs[$s][$c];
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      int $off = $s * $dsub + $i;
         |      $acc += ((double)$a.getFloat($off) - (double)$cent[$off]) * (double)$w[$i];
         |    }
         |    if ($acc > $bestScore) { $bestScore = $acc; $best = $c; }
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
