package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level (span) exact dedup — the "exact substring
  * deduplication" stage of training-data pipelines (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better"): a span
  * of `w` consecutive tokens that occurs in more than one document is a
  * duplicated substring, and a document's duplicated-span fraction is
  * the removal/masking signal. The published recipe builds a suffix
  * array; the distributed re-expression is sliding w-token windows
  * hashed to 64-bit keys — same signal, shuffle-friendly.
  *
  * Scale shape: spans are DISTINCT per document before the shuffle (a
  * doc-internal repeat is q48's repetition signal, not cross-doc
  * duplication), and only `(id, xxhash64(span))` — 16 bytes/row — ever
  * shuffles; the span text is dropped before the exchange. One shuffle
  * on the span hash (window count), one on the doc id (final rollup).
  * Cross-doc span counts need no join-back: a window count over the
  * hash partition annotates in place.
  *
  * The 64-bit hash keys collide with probability ~n²/2⁶⁴ (~1e-9 at a
  * billion distinct spans) — the standard trade; the DuckDB oracle
  * groups by the span text itself, so a collision would surface as a
  * correctness diff rather than hide.
  */
object SpanDedup {

  /** Distinct w-token sliding spans of `text` (stride 1), as STRINGS —
    * the readable reference construction (and the shape the DuckDB
    * oracle reproduces); spanStats uses the hash-native twin. A
    * document shorter than `w` tokens contributes its whole token
    * string as its single span.
    */
  def spans(text: Column, w: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - (w - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(w)))))
  }

  /** Per-document span-duplication stats: total distinct spans, spans
    * shared with at least one other document, and the duplicated
    * fraction (rounded to 6 dp, the repo-wide float-compare contract).
    *
    * Span hashing rides the native [[graft.expr.ShingleHashes]]
    * expression (via Dedup.shingles): window hashes combine straight
    * from per-token hashes — no 150-byte span string is ever
    * materialized (the composed spans→xxhash64 form measured 4.0 s at
    * sf0.1; this path halves it). Identical span ⇔ identical hash
    * either way, so the per-doc distinct/dup counts — all that ever
    * surfaces — match the string construction the oracle uses.
    */
  def spanStats(df: DataFrame, textCol: String, idCol: String,
      w: Int = 20): DataFrame = {
    val exploded = df
      .select(col(idCol), explode(Dedup.shingles(col(textCol), w)).as("h"))
    val docsPerSpan = count(lit(1)).over(Window.partitionBy("h"))
    exploded
      .withColumn("docs", docsPerSpan)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"),
        count(when(col("docs") > 1, lit(1))).as("n_dup_spans"))
      .withColumn("dup_frac",
        round(col("n_dup_spans") / col("n_spans"), 6))
  }

  /** The removal gate: documents whose duplicated-span fraction is at
    * most `maxDupFrac` (pass `0.0` for "no duplicated substring at
    * all").
    */
  def dropDuplicatedSpans(df: DataFrame, textCol: String, idCol: String,
      w: Int = 20, maxDupFrac: Double = 0.0): DataFrame = {
    val stats = spanStats(df, textCol, idCol, w)
      .filter(col("dup_frac") <= maxDupFrac)
      .select(col(idCol))
    df.join(stats, Seq(idCol), "left_semi")
  }
}
