package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram collocation mining (SURVEY §2.12 adjunct: phrase discovery
  * for tokenizer/vocabulary construction — "new york" should be one
  * unit; PMI is the standard association score).
  *
  * PMI(a,b) = log( P(a,b) / (P(a) P(b)) ) is monotone in the integer
  * ratio c_ab * N / (c_a * c_b), so the ranking never needs the log:
  * the score is kept in EXACT integer arithmetic (scaled by 1e6 and
  * floor-divided) — engine-portable and immune to libm differences.
  * Overflow bound under ANSI: c_ab <= N and c_a*c_b <= N^2, so the
  * numerator c_ab * N * 1e6 needs N <= ~3e6 within a signed 64-bit
  * long; beyond that scale the same expression runs in DECIMAL(38,0).
  *
  * Spark shape: one explode over consecutive token pairs (zip of the
  * array with its own tail — a narrow expression, no self-join), one
  * groupBy for bigram counts, one for unigram counts; the unigram side
  * is vocabulary-sized and broadcast back onto the bigrams for both
  * endpoints. Top-k is TakeOrderedAndProject (per-partition heaps +
  * one k-row merge on the driver), never a global sort.
  */
object Collocations {

  /** Consecutive token pairs of `text` as an array of (a, b) structs:
    * zip(tokens, tokens drop 1). Both slices have length size-1, so no
    * padding nulls appear.
    */
  def bigrams(text: Column): Column = {
    val t = TextAnalysis.tokens(text)
    val n = greatest(size(t) - 1, lit(0))
    arrays_zip(slice(t, lit(1), n).as("a"), slice(t, lit(2), n).as("b"))
  }

  /** Top-k bigrams by PMI among those with count >= minCount.
    * `pmi_scaled` = floor(c_ab * N * 1e6 / (c_a * c_b)) — the exact
    * integer ranking key (ties broken by the words).
    */
  def pmiTopK(df: DataFrame, textCol: String, minCount: Long, k: Int)
      : DataFrame = {
    val pairs = df.select(explode(bigrams(col(textCol))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val bi = pairs.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    // marginals of the bigram table: c_a = #(a, *), c_b = #(*, b)
    val left = pairs.groupBy("a").agg(count(lit(1)).as("c_a"))
    val right = pairs.groupBy("b").agg(count(lit(1)).as("c_b"))
    val n = pairs.count() // one count job; a literal, not a crossJoin
    bi.join(broadcast(left), "a")
      .join(broadcast(right), "b")
      .withColumn("pmi_scaled",
        expr(s"c_ab * ${n}L * 1000000L div (c_a * c_b)"))
      .select("a", "b", "c_ab", "c_a", "c_b", "pmi_scaled")
      .orderBy(col("pmi_scaled").desc, col("a"), col("b"))
      .limit(k)
  }
}
