package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression for the shingling hot path: token array →
  * array of distinct sliding-window hashes, in one codegen'd call.
  *
  * The composed-expression form (`transform(sequence(...), i →
  * xxhash64(concat_ws(" ", slice(toks, i+1, n))))` + `array_distinct`)
  * allocates, per window, a slice array, a concatenated UTF8String and
  * a boxed hash, then re-scans the result for distinctness — measured
  * 3.7 s of the near-dup queries' time at sf0.1 (7.5M windows). This
  * expression hashes each token ONCE (XXH64 over its bytes), combines
  * per-window by chaining `XXH64.hashLong`, and dedups via
  * sort-and-compact on a primitive long array: zero per-window
  * allocations, one pass, ~n long-mix ops per window.
  *
  * The hash VALUE differs from the composed form — by design, shingle
  * hashes never surface in results (only set cardinalities: jaccard,
  * overlap counts), so any deterministic injective-w.h.p. window hash
  * is equivalent. Output order is ascending (sort-based dedup); all
  * consumers are order-insensitive (min-aggregations and set
  * intersections).
  *
  * Codegen note: `doGenCode` emits a direct static-style call into
  * [[ShingleHashes.compute]] — the expression participates in
  * whole-stage codegen (no CodegenFallback row boxing); the kernel
  * itself is a single JIT-friendly method on primitive arrays.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, s"shingle size must be positive: $n")
  // input contract (enforced by the Dedup.shingles builder, the only
  // construction site): child is array<string>
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.ShingleHashes$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private final val Seed = 42L

  /** Window-hash kernel. Shared by interpreted eval and codegen.
    * Zero-length tokens are skipped HERE (not by a preceding
    * higher-order `filter`): `ArrayFilter` is CodegenFallback in Spark,
    * so keeping it in the tree would push the whole enclosing Project
    * out of whole-stage codegen — and the kernel skip is free.
    */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val raw = arr.numElements()
    val tokenHash = new Array[Long](raw)
    var t = 0
    var i = 0
    while (i < raw) {
      val tok = arr.getUTF8String(i)
      if (tok.numBytes() > 0) {
        tokenHash(t) = XXH64.hashUTF8String(tok, Seed)
        t += 1
      }
      i += 1
    }
    val w = math.max(t - n + 1, 1)
    val windowHash = new Array[Long](w)
    i = 0
    while (i < w) {
      var h = Seed
      var j = i
      val end = math.min(i + n, t)
      while (j < end) { h = XXH64.hashLong(tokenHash(j), h); j += 1 }
      windowHash(i) = h
      i += 1
    }
    java.util.Arrays.sort(windowHash)
    var unique = 0
    i = 0
    while (i < w) {
      if (i == 0 || windowHash(i) != windowHash(i - 1)) {
        windowHash(unique) = windowHash(i)
        unique += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOfRange(windowHash, 0, unique))
  }
}
