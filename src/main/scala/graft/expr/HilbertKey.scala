package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Hilbert-curve key: the standard xy→d walk (one rotation per
  * bit, high bit first) as ONE codegen'd primitive loop.
  *
  * BIT-EXACT replacement for the unrolled Column form (per-round
  * `when` rotations): that form references BOTH prior coordinates in
  * each new coordinate, so the expression tree doubles per round —
  * 2^bits nodes through codegen (measured: 160 s for bits=8 over sf0.1
  * lineitem; this kernel: sub-second). Same walk, same full-width
  * n−1−v mirror, same d accumulation; `Wave92OpsSpec` asserts the
  * 4×4 bijection/adjacency and `HilbertKeySpec` the equivalence to a
  * reference implementation.
  *
  * Inputs are non-negative longs below 2^bits (the caller
  * bucket-normalizes — same contract as [[graft.io.Layout.zorderKey]]).
  * Null in either coordinate → null key (standard binary contract).
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits > 0 && bits <= 31, s"bits must be in [1,31]: $bits")
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertKey.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expr.HilbertKey$$.MODULE$$.compute($a, $b, $bits)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}

object HilbertKey {
  /** The classic xy2d loop (public-domain formulation): examine bit
    * level s from high to low; emit the quadrant digit; rotate the
    * frame (mirror with the FULL-width n−1−v when ry=0 ∧ rx=1 — the
    * already-consumed high bits flip harmlessly — then swap).
    */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = x0
    var y = y0
    var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      i -= 1
    }
    d
  }
}
