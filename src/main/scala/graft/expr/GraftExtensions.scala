package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Engine extension point: registers graft's native Catalyst
  * expressions with the session's function registry, so SQL users (and
  * `expr()` strings in manifests) can call them directly — e.g.
  * `SELECT shingle_hashes(tokens, 3) FROM docs`.
  *
  * Wire-up is the standard Spark mechanism, either of:
  *   - `SparkSession.builder.withExtensions(new GraftExtensions)`
  *     (what this repo's Verify/Bench/CLI/test builders do), or
  *   - `--conf spark.sql.extensions=graft.expr.GraftExtensions` on an
  *     unmodified spark-submit/cluster deployment.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.shingleHashes)
    // plan-level: top-k-per-group operator + the window-idiom rewrite
    ext.injectPlannerStrategy(_ => graft.plans.GraftTopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.GraftTopKRule)
  }
}

object GraftExtensions {
  /** shingle_hashes(tokens array<string>, n int-literal) -> array<long>.
    * The shingle size must be a literal: it shapes the generated code
    * (see ShingleHashes), exactly like the built-in `sequence` step.
    */
  val shingleHashes: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_hashes"),
    new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
    (args: Seq[Expression]) => args match {
      case Seq(child, Literal(n: Int, IntegerType)) => ShingleHashes(child, n)
      case Seq(child) => ShingleHashes(child, 3)
      case _ => throw new IllegalArgumentException(
        "shingle_hashes(tokens array<string>, n int literal = 3)")
    })
}
