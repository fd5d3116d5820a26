package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Native one-pass int8-quantization summary: struct(scale, q_checksum,
  * max_err) for a double vector — the three q72 outputs whose composed
  * forms (Quantize.int8Scale/Checksum/MaxError) each re-derive the
  * scale and codes through interpreted lambdas, with every `round()`
  * going through a Double.toString-based BigDecimal. The kernel derives
  * them once per row.
  *
  * BIT-EXACT twin of the composed forms (equivalence property-asserted
  * in Int8StatsSpec):
  *   - scale = max(|v_i|) / 127.0 over non-null elements (array_max
  *     skips nulls), 0.0 for empty/all-null;
  *   - codes: round(v/scale) via the same BigDecimal(HALF_UP) path
  *     Spark's Round takes (incl. the NaN/Inf passthrough and the
  *     non-ANSI double→long cast), zeros when scale = 0;
  *   - q_checksum = Σ code_i · (i+1), 0 when any element is null
  *     (a null code nulls the fold; the composed form coalesces to 0);
  *   - max_err = max |v_i − code_i·scale| over non-null slots, 0.0
  *     when empty.
  */
case class Int8Stats(child: Expression) extends UnaryExpression {
  // input contract (enforced by Quantize.int8Stats, the construction
  // site): child is array<double>
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q_checksum", LongType, nullable = false),
    StructField("max_err", DoubleType, nullable = false)))
  override def prettyName: String = "int8_stats"

  override def nullSafeEval(input: Any): Any =
    Int8Stats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.Int8Stats$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Int8Stats =
    copy(child = newChild)
}

object Int8Stats {
  /** Spark Round(HALF_UP, scale 0) on a double, exactly: NaN/Inf pass
    * through, everything else goes through the canonical-string
    * BigDecimal — the same arithmetic `functions.round` performs.
    */
  private def roundHalfUp(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var maxAbs = 0.0
    var sawValue = false
    var anyNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) anyNull = true
      else {
        val a = math.abs(arr.getDouble(i))
        // Double.compare mirrors array_max's ordering (NaN greatest)
        if (!sawValue || java.lang.Double.compare(a, maxAbs) > 0) maxAbs = a
        sawValue = true
      }
      i += 1
    }
    val scale = (if (sawValue) maxAbs else 0.0) / 127.0
    var checksum = 0L
    var maxErr = 0.0
    var sawErr = false
    i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getDouble(i)
        val code = if (scale == 0.0) 0L else roundHalfUp(v / scale).toLong
        checksum += code * (i + 1L)
        val err = math.abs(v - code.toDouble * scale)
        if (!sawErr || java.lang.Double.compare(err, maxErr) > 0) maxErr = err
        sawErr = true
      }
      i += 1
    }
    // composed checksum folds through null products -> coalesce(0);
    // empty vectors zip against [1] -> null -> 0
    if (anyNull || n == 0) checksum = 0L
    new GenericInternalRow(Array[Any](scale, checksum,
      if (sawErr) maxErr else 0.0))
  }
}
