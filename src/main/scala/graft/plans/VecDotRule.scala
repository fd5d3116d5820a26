package graft.plans

import graft.expr.VecDot
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Rewrites the composed dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * (and its self-product spelling over `transform(a, x -> x * x)`, when
  * `a` is a plain column) to the native [[graft.expr.VecDot]] kernel —
  * so SQL users writing the textbook higher-order-function form get the
  * codegen'd primitive loop without knowing `vec_dot` exists.
  *
  * The rewrite is BIT-EXACT, not just algebraic: VecDot is the same
  * left-to-right fold, IEEE multiply/add are commutative bitwise (so
  * both lambda argument orders match), and the zero literal must be
  * +0.0 exactly — a -0.0 seed can surface (-0.0 + -0.0 = -0.0 while
  * +0.0 + -0.0 = +0.0), so it is deliberately NOT matched.
  */
object GraftVecDotRule extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedExpression): Boolean = (e, v) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) => a.exprId == b.exprId
    case _ => false
  }

  /** (x, y) -> x * y, either argument order. */
  private def isPairProduct(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(Multiply(l, r, _), Seq(x, y), _) =>
      (sameVar(l, x) && sameVar(r, y)) || (sameVar(l, y) && sameVar(r, x))
    case _ => false
  }

  /** x -> x * x. */
  private def isSelfProduct(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(Multiply(l, r, _), Seq(x), _) =>
      sameVar(l, x) && sameVar(r, x)
    case _ => false
  }

  /** (acc, v) -> acc + v, either argument order. */
  private def isSum(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(Add(l, r, _), Seq(acc, v), _) =>
      (sameVar(l, acc) && sameVar(r, v)) || (sameVar(l, v) && sameVar(r, acc))
    case _ => false
  }

  private def isIdentity(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(body, Seq(arg), _) => sameVar(body, arg)
    case _ => false
  }

  private def isPlusZero(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToLongBits(v) == 0L
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b, product: LambdaFunction), zero,
          merge: LambdaFunction, finish: LambdaFunction)
          if isDoubleArray(a) && isDoubleArray(b) && isPairProduct(product) &&
            isPlusZero(zero) && isSum(merge) && isIdentity(finish) =>
        VecDot(a, b)
      // the self-product form duplicates its child; whole-stage
      // codegen's subexpression elimination evaluates the duplicate
      // once, so any deterministic child qualifies
      case ArrayAggregate(
          ArrayTransform(a, square: LambdaFunction), zero,
          merge: LambdaFunction, finish: LambdaFunction)
          if a.deterministic && isDoubleArray(a) && isSelfProduct(square) &&
            isPlusZero(zero) && isSum(merge) && isIdentity(finish) =>
        VecDot(a, a)
    }
}
