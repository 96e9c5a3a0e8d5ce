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
