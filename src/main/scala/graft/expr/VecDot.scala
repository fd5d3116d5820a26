package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector-math hot path: dot product
  * of two double arrays in one codegen'd primitive loop.
  *
  * The composed form (`aggregate(zip_with(a, b, (x,y) => x*y),
  * lit(0.0), (acc,v) => acc+v)`) materializes a products array and
  * interprets two lambda closures per element — per-row allocation and
  * megamorphic dispatch in the middle of every ANN / semantic-dedup
  * scan. This expression is the same left-to-right fold as a primitive
  * while-loop: BIT-IDENTICAL results (same multiply/add order, so the
  * DuckDB oracles keep matching — asserted by VecDotSpec's
  * equivalence property), no allocation, whole-stage codegen.
  *
  * Null semantics mirror the composed form exactly: null array → null,
  * null element → null, length mismatch → null (zip_with pads with
  * null), empty arrays → 0.0.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  // AbstractDataType (what ImplicitCastInputTypes wants) is private[sql]
  // in Spark 4, so input typing is a plain check; construction sites
  // (Similarity.dot, the vec_dot SQL builder) insert the array<double>
  // cast themselves.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.expr.VecDot.compute($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Fold kernel, shared by interpreted eval and codegen. Boxed return
    * carries the three null cases; escape analysis elides the box on
    * the hot (non-null) path.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}
