package graft.ops.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One-Permutation Hashing MinHash (Li, Owen & Zhang, NIPS 2012): the
  * k-hash MinHash signature from ONE hash evaluation per shingle —
  * each shingle hashes once, the hash space is split into k bins by
  * `hash mod k`, and the signature is the per-bin minimum. Classic
  * MinHash evaluates k independent hashes per shingle; OPH is k×
  * cheaper on the scan side, which is the difference that matters when
  * the corpus is 100 TB and the signature pass is a full-data scan.
  *
  * Empty bins (short documents) are left NULL and similarity is
  * estimated over the bins BOTH signatures define — the "no
  * densification" estimator, unbiased for the matched-bin count and
  * honest about its reduced precision on short docs (callers gate on
  * token count; [[Dedup.minhashNearDups]] remains the
  * high-precision path where exact verification follows anyway).
  *
  * The underlying hash is Spark's xxhash64 — engine-native and not
  * SQL-portable, so query-level checks use the INVARIANT-oracle
  * pattern (the q14 SimHash precedent): assert what makes the sketch
  * useful (mutated near-copies estimate high similarity) rather than
  * replaying bits in the oracle engine.
  */
object Oph {

  /** k-bin OPH signature of `textCol`'s `shingleSize`-gram set:
    * `array<bigint>` of length k, NULL where a bin saw no shingle.
    * Pure expression tree (codegen'd) — no shuffle, no UDF.
    */
  def signature(text: Column, shingleSize: Int, k: Int): Column = {
    require(k >= 2)
    val hashes = transform(Dedup.shingles(text, shingleSize),
      s => xxhash64(s))
    transform(sequence(lit(0), lit(k - 1)),
      b => array_min(filter(hashes, h => pmod(h, lit(k)) === b)))
  }

  /** Estimated jaccard from two OPH signatures: matched bins over
    * mutually-defined bins; NULL when no bin is defined on both sides.
    */
  def simEstimate(a: Column, b: Column): Column = {
    val both = zip_with(a, b, (x, y) => x.isNotNull && y.isNotNull)
    val eq = zip_with(a, b,
      (x, y) => x.isNotNull && y.isNotNull && x === y)
    val defined = size(filter(both, v => v))
    when(defined > 0,
      size(filter(eq, v => v)).cast("double") / defined.cast("double"))
  }
}
