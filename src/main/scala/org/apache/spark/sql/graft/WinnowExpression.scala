package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
  * SIGMOD'03 — the MOSS algorithm) as ONE native codegen pass: hash every
  * k-gram of codepoints with the 31-polynomial mod 2^32 (text_fingerprint's
  * hash), slide a w-window over the hash sequence, keep each window's
  * RIGHTMOST minimum, dedup consecutive picks. Returns the selections
  * packed `(pos << 32) | hash` (hash < 2^32, so the pack is lossless and
  * unpacks with plain `div`/`mod` in any engine), ascending by position.
  *
  * Why native: the selection is a windowed argmin over a derived sequence —
  * as nested higher-order functions it is interpreted per element (measured
  * minutes on a corpus the compiled loop does in milliseconds), and as a
  * window function it would shuffle one row per character. Here the whole
  * thing is row-local inside whole-stage codegen, O(len·(k+w)) per row.
  *
  * Dedup correctness: the rightmost-argmin position of the sliding window
  * is non-decreasing (a strictly smaller later value would have won the
  * earlier window too), so comparing against the previous pick is exactly
  * global DISTINCT — the oracle's `SELECT DISTINCT` replay hash-matches.
  *
  * Codepoint semantics match `string_split(text,'')` + `ascii()` in the
  * oracle: one value per Unicode codepoint, not per UTF-16 unit. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1, s"winnow: k $k < 1")
  require(w >= 1, s"winnow: w $w < 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(WinnowFingerprints.select(
      input.asInstanceOf[UTF8String].toString, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val cls = WinnowFingerprints.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.select($in.toString(), $k, $w));
       """.stripMargin
    })
}

object WinnowFingerprints {

  /** The compiled selection loop (shared by eval and codegen). */
  def select(s: String, k: Int, w: Int): Array[Long] = {
    val cp = s.codePoints().toArray
    val n = cp.length
    val m = n - k + 1
    if (m < w) return Array.emptyLongArray
    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      var hh = 0L
      var j = 0
      while (j < k) { hh = (hh * 31L + cp(i + j)) % 4294967296L; j += 1 }
      h(i) = hh
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long](m / (w / 2 + 1) + 4)
    var prev = -1
    var jW = 0
    while (jW <= m - w) {
      var best = jW
      var o = jW + 1
      while (o <= jW + w - 1) { if (h(o) <= h(best)) best = o; o += 1 }
      if (best != prev) { out += (best.toLong << 32) | h(best); prev = best }
      jW += 1
    }
    out.toArray
  }
}
