package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sign-LSH bucket key: bits [fromPlane, toPlane) of the
  * hyperplane-sign signature of a double vector, in one codegen'd
  * primitive loop.
  *
  * BIT-EXACT replacement for the composed form
  * (`(from until to).map(p => when(aggregate(zip_with(vec, sequence,
  * (x,i) => x * planeComponent(p,i)), 0.0, +) >= 0, 1L << (p-from))
  * .otherwise(0L)).reduce(_|_)`): the hyperplane components are the
  * same `xxhash64("plane<p>#<i>", seed 42) / Long.MaxValue` doubles,
  * the projection is the same left-to-right fold, and the sign test is
  * the same `>= 0` — so bucket keys (and therefore LSH candidate sets
  * and every downstream result) are unchanged; SignLshSpec asserts the
  * equivalence property. What changes is the cost: the composed form
  * re-hashes (planes × dims) strings per ROW and interprets two
  * lambdas per element; the kernel computes the component matrix once
  * per (fromPlane, toPlane, dims) and folds primitive doubles.
  *
  * Null semantics of the composed form are preserved for null
  * ELEMENTS (a null component nulls every projection, so every bit
  * takes the `otherwise(0)` branch → bucket 0). A null ARRAY returns
  * null (the standard unary contract) where the composed form returned
  * 0 — no construction site (Similarity.lshBucketRange over cast
  * non-null vectors) can observe the difference.
  */
case class SignLsh(child: Expression, fromPlane: Int, toPlane: Int)
    extends UnaryExpression {
  require(0 <= fromPlane && fromPlane < toPlane && toPlane - fromPlane <= 64,
    s"plane range must fit a long: [$fromPlane, $toPlane)")
  // input contract (enforced by Similarity.lshBucketRange, the only
  // construction site): child is array<double>
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh"

  override def nullSafeEval(input: Any): Any =
    SignLsh.compute(input.asInstanceOf[ArrayData], fromPlane, toPlane)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.SignLsh$$.MODULE$$.compute($c, $fromPlane, $toPlane)")

  override protected def withNewChildInternal(newChild: Expression): SignLsh =
    copy(child = newChild)
}

object SignLsh {
  private final val Seed = 42L // Spark's xxhash64 default seed
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]

  /** Hyperplane component matrix for (fromPlane until toPlane) × dims,
    * row-major by plane — computed once per shape, shared by all rows.
    */
  def components(from: Int, to: Int, dims: Int): Array[Double] =
    cache.computeIfAbsent((from, to, dims), _ => {
      val arr = new Array[Double]((to - from) * dims)
      var p = from
      while (p < to) {
        var i = 0
        while (i < dims) {
          arr((p - from) * dims + i) = XXH64.hashUTF8String(
            UTF8String.fromString(s"plane$p#$i"), Seed).toDouble /
            Long.MaxValue.toDouble
          i += 1
        }
        p += 1
      }
      arr
    })

  def compute(arr: ArrayData, from: Int, to: Int): Long = {
    val n = arr.numElements()
    var i = 0
    while (i < n) { // null element -> every projection nulls -> bucket 0
      if (arr.isNullAt(i)) return 0L
      i += 1
    }
    val comp = components(from, to, n)
    val planes = to - from
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      val off = p * n
      var j = 0
      while (j < n) { s += arr.getDouble(j) * comp(off + j); j += 1 }
      if (s >= 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }
}
