package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for data-layout keys (see
  * VectorExpressions.scala for why this package).
  *
  * The Hilbert d-index is inherently ITERATIVE — each of the `bits` levels
  * rotates/reflects the quadrant frame before descending, so unlike the
  * Morton interleave (graft.sources.ZOrder, a flat sum of masked shifts) it
  * cannot be unrolled into a Column expression without the tree doubling
  * per level (the x/y updates each reference both previous x and y). A
  * native expression keeps the loop inside whole-stage codegen: the scan →
  * quantize → hilbert → range-exchange pipeline stays one tight loop per
  * row, which is what a full-corpus layout rewrite at 100 TB needs.
  */

/** Hilbert curve index of a pre-quantized (qx, qy) cell on a 2^bits ×
  * 2^bits grid — the classic xy→d walk (one reflect/swap per level, high
  * bit first). Locality: consecutive d values are always adjacent cells
  * (Manhattan distance 1), which is why Hilbert layouts give tighter
  * file min/max envelopes than Morton's quadrant jumps. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(bits >= 1 && bits <= 31, s"hilbert_index: bits $bits outside [1,31]")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(qx: Any, qy: Any): Any = {
    var x = qx.asInstanceOf[Long]
    var y = qy.asInstanceOf[Long]
    var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += (s * s) * ((3L * rx) ^ ry)
      if (ry == 0L) {
        val t = if (rx == 1L) s - 1L - y else y
        y = if (rx == 1L) s - 1L - x else x
        x = t
      }
      i -= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (qx, qy) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $qx;
         |long $y = $qy;
         |long $d = 0L;
         |for (int $i = $bits - 1; $i >= 0; $i--) {
         |  long $s = 1L << $i;
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += ($s * $s) * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    long $t = ($rx == 1L) ? ($s - 1L - $y) : $y;
         |    $y = ($rx == 1L) ? ($s - 1L - $x) : $x;
         |    $x = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })
}
