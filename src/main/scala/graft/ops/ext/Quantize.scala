package graft.ops.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding quantization (SURVEY §2.12 adjunct: an int8 vector is 4x
  * smaller than float32 — at 100 TB of embeddings the index either
  * quantizes or doesn't fit; symmetric max-abs scaling is what FAISS/
  * vector stores ship as "SQ8").
  *
  * Per-vector symmetric int8: scale = max|v_i| / 127, q_i =
  * round(v_i / scale) in [-127, 127], dequantized error |v_i - q_i *
  * scale| <= scale/2 by construction of round. Everything is a narrow
  * per-row expression pipeline over the vector column — no shuffle, no
  * UDF; float->double widening is exact and / is IEEE-deterministic,
  * so the quantized codes are engine-portable integers.
  */
object Quantize {

  private def asDouble(vec: Column): Column =
    transform(vec, _.cast("double"))

  /** All three quantization outputs in ONE native pass:
    * struct(scale, q_checksum, max_err) via [[graft.expr.Int8Stats]] —
    * bit-exact twin of the three composed functions below (asserted in
    * Int8StatsSpec), without re-deriving scale and codes per output
    * column through interpreted lambdas. The composed forms remain the
    * readable reference (and the shape the q72 oracle reproduces).
    */
  def int8Stats(vec: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge
    // array-level cast, NOT the per-element transform the composed
    // forms use: ArrayTransform is CodegenFallback and would push the
    // enclosing Project out of whole-stage codegen (same values —
    // both widen each element float -> double)
    GraftExpressionBridge.column(graft.expr.Int8Stats(
      GraftExpressionBridge.expression(vec.cast("array<double>"))))
  }

  /** max|v_i| / 127 (0.0 for an all-zero or empty vector). */
  def int8Scale(vec: Column): Column =
    coalesce(array_max(transform(asDouble(vec), abs(_))), lit(0.0)) / 127.0

  /** The int8 codes: round(v_i / scale), all-zero vectors pass through
    * as zeros (scale 0 would otherwise divide by zero -> NULLs).
    */
  def int8Codes(vec: Column): Column = {
    val s = int8Scale(vec)
    transform(asDouble(vec), v =>
      when(s === 0.0, lit(0L)).otherwise(round(v / s).cast("long")))
  }

  /** Max absolute dequantization error over the vector: the invariant
    * max_err <= scale/2 (+ half an ulp) is the correctness certificate
    * for any symmetric quantizer.
    */
  def int8MaxError(vec: Column): Column = {
    val s = int8Scale(vec)
    coalesce(
      array_max(zip_with(asDouble(vec), int8Codes(vec),
        (v, q) => abs(v - q.cast("double") * s))),
      lit(0.0))
  }

  /** Order-free integer digest of the codes: sum of q_i * (i+1) —
    * position-weighted so permutations don't collide; exact long
    * arithmetic, portable to any engine.
    */
  def int8Checksum(vec: Column): Column =
    coalesce(
      aggregate(
        zip_with(int8Codes(vec), sequence(lit(1L), greatest(size(vec), lit(1)).cast("long")),
          (q, i) => q * i),
        lit(0L), (acc, x) => acc + x),
      lit(0L))
}
