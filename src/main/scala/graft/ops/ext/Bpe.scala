package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge induction — the tokenizer-training
  * primitive of an LLM data pipeline (Sennrich et al. 2016), shaped
  * the way real BPE trainers run: ONE corpus-scale pass builds the
  * distinct-word frequency table, and every merge round after that
  * operates on the VOCABULARY (each word's current symbol
  * segmentation, weighted by frequency) — at 100 TB the corpus is
  * touched once and the iterative state is vocab-sized, exactly like
  * [[KMeans]]' centroids.
  *
  * Each round: count adjacent symbol pairs (weighted by word
  * frequency, one hash aggregation over the exploded pair stream),
  * pick the argmax pair with a deterministic (count desc, lhs, rhs)
  * tie-break — a 1-row collect, the merge table IS driver state by
  * design — and rewrite every segmentation with a leftmost
  * non-overlapping merge expressed as a sequential `aggregate` fold
  * (engine-portable: DuckDB's `list_reduce` has identical
  * semantics; verified for chained runs like "aaaa" + (a,a) →
  * [aa, aa]).
  */
object Bpe {

  /** Distinct-word frequency table from a text column — the single
    * corpus-scale job (one explode + one hash aggregation).
    */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Leftmost non-overlapping merge of (a, b) → a+b over a symbol
    * array, as a sequential fold: append each symbol unless the
    * accumulator ends in `a` and the symbol is `b`, in which case
    * replace the tail with the merged symbol. `get` (0-based,
    * null-safe on the empty accumulator) keeps the expression
    * ANSI-proof.
    */
  private def mergeFold(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(get(acc, size(acc) - 1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Run `rounds` merge inductions over a `(word, freq)` table.
    * Returns the merge table `(round, lhs, rhs, merged, pair_count)`
    * — the artifact a tokenizer ships. Segmentations persist across
    * rounds (each round's fold feeds the next); stops early if no
    * pair remains.
    */
  def train(words: DataFrame, rounds: Int): DataFrame = {
    val spark = words.sparkSession
    require(rounds > 0)
    var seg = words.select(col("word"), col("freq"),
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        .as("syms")).persist()
    val merges = scala.collection.mutable.ListBuffer[(Int, String, String,
      String, Long)]()
    var r = 1
    var go = true
    while (r <= rounds && go) {
      val top = seg.select(col("freq"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .select(col("p").getField("0").as("lhs"),
          col("p").getField("1").as("rhs"), col("freq"))
        .groupBy(col("lhs"), col("rhs")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) go = false
      else {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, a, b, a + b, cnt))
        val next = seg.withColumn("syms", mergeFold(col("syms"), a, b))
          .persist()
        next.count()
        seg.unpersist()
        seg = next
        r += 1
      }
    }
    seg.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("round", "lhs", "rhs", "merged", "pair_count")
  }

  /** ENCODE with a trained merge table — the other half of the
    * tokenizer: apply the merges, in training order, to a distinct-word
    * frame and return each word's subword count. The per-word fold is
    * the same leftmost-non-overlapping [[mergeFold]] the trainer used,
    * so encode(train(...)) round-trips exactly. Scale shape: the fold
    * runs once per DISTINCT word (vocabulary-sized, like the training
    * rounds); callers join the result back onto the corpus word stream
    * — the corpus itself is never re-folded.
    */
  def encode(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val chars = words.select(col("word"),
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        .as("syms"))
    val folded = merges.foldLeft(chars) { case (df, (a, b)) =>
      df.withColumn("syms", mergeFold(col("syms"), a, b))
    }
    folded.select(col("word"), size(col("syms")).as("n_subwords"))
  }
}
