package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Shannon entropy (nats) of a string's codepoint distribution — the
  * compression-ratio quality signal (gibberish and base64 blobs score near
  * ln|alphabet|, natural text sits lower, repeated-character padding near
  * 0) — as ONE row-local native pass. The explode-per-char + groupBy
  * formulation shuffles one row per character (a scale-killer: the shuffle
  * is the corpus size × bytes-per-row); this keeps the histogram in a
  * per-row hash map inside whole-stage codegen, zero shuffle.
  *
  * Terms are accumulated in ASCENDING CODEPOINT order so the double sum is
  * deterministic; the oracle's parallel GROUP BY sum differs only at ulp
  * scale, which the query-level round(·,6) absorbs (the text_logprob
  * discipline). */
case class CharEntropy(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.entropy(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val cls = CharEntropy.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.entropy($in.toString());"
    })
}

object CharEntropy {

  /** Compiled histogram + ordered sum (shared by eval and codegen). */
  def entropy(s: String): Double = {
    val cp = s.codePoints().toArray
    val n = cp.length
    if (n == 0) return 0.0
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    while (i < n) {
      counts.merge(cp(i), 1L, (a, b) => a + b)
      i += 1
    }
    var e = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      e -= p * math.log(p)
    }
    e
  }
}

/** Content-defined chunk boundaries (#215 text_cdc_chunks): every 1-based
  * position i in [16, len] whose TRAILING 16-char window's MD5 opens with
  * a byte < 0x04 (p = 4/256, mean chunk ~64 chars) — exactly the rule the
  * DuckDB twin replays with list_filter + md5 + substr. A native one-pass
  * expression because the HOF formulation (filter over sequence + md5 +
  * conv per element) runs interpreted per position and measured 10 s at
  * sf0.1 — the text_winnowing lesson again: per-position lambdas don't
  * codegen, a compiled loop with ONE reused MessageDigest does. */
case class CdcBoundaries(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    CdcBoundaries.boundaries(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val cls = CdcBoundaries.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.boundaries($in.toString());"
    })
}

object CdcBoundaries {
  private val Window = 16

  /** One pass, one reused digest. Positions are CODE POINTS, not UTF-16
    * units: the consumers (Spark SQL substring/length and DuckDB
    * substr/len) both index by code point, so a supplementary-plane char
    * (emoji) counted as 2 would shift every later cut and break the
    * tile-the-text invariant. Window bytes are the UTF-8 encoding of the
    * 16-code-point window — equal to md5(substr(text, i-15, 16)) in
    * both engines for ANY input. */
  def boundaries(s: String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val cp = s.codePoints().toArray
    val n = cp.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    if (n >= Window) {
      val md = java.security.MessageDigest.getInstance("MD5")
      var i = Window
      while (i <= n) {
        md.reset()
        md.update(new String(cp, i - Window, Window)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if ((md.digest()(0) & 0xFF) < 4) out += i.toLong
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }
}
