package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Unigram language-model scoring — the corpus-level perplexity filter
  * of training-data pipelines (the CCNet/Wikipedia-LM quality gate,
  * reduced to its order-0 form so the model is the corpus itself, not
  * an external artifact): fit add-one-smoothed unigram probabilities
  * over the corpus, then score every document by its mean token
  * negative log-likelihood. High-NLL documents are the
  * rare-token/garbled tail; low-NLL documents are stopword soup — both
  * ends are the standard trim targets.
  *
  * Scale shape: one shuffle to build the frequency table (map-side
  * partial counts on the token), one shuffle to join tokens back to
  * their frequencies (AQE turns it into a broadcast join when the
  * vocabulary is small; at web-corpus vocabulary sizes the shuffle join
  * on the token is the right plan and Catalyst keeps it), one shuffle
  * for the per-document rollup.
  *
  * Determinism: ln() terms are summed through DECIMAL(38,18) —
  * order-independent, exact — and only divided/rounded at the very end,
  * per the repo-wide cross-engine float contract. The smoothed
  * probability is factored as ln(c+1) − ln(N+V) so every ln() input is
  * an integer — both engines take ln of bit-identical doubles.
  */
object LmScore {

  /** Corpus unigram frequency table: (token, c). */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").count().withColumnRenamed("count", "c")

  /** Per-document mean negative log-likelihood under the corpus's own
    * add-one-smoothed unigram model:
    *   nll(d) = −(1/|d|) Σ_t ln((c_t+1)/(N+V))
    *          = ln(N+V) − (1/|d|) Σ_t ln(c_t+1)
    * Output: (id, n_tokens, nll) with nll rounded to 6 dp. Documents
    * with no tokens are dropped (no likelihood to speak of).
    */
  def unigramNll(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val freqs = unigramCounts(df, textCol)
    val totals = freqs.agg(sum("c").as("n"), count(lit(1)).as("v"))
    val perDoc = toks
      .join(freqs, Seq("token"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(log(col("c") + 1).cast(DecimalType(38, 18))).as("s"))
    perDoc.crossJoin(broadcast(totals))
      .select(col(idCol), col("n_tokens"),
        round(log(col("n") + col("v")) - col("s").cast("double") / col("n_tokens"), 6)
          .as("nll"))
  }

  /** Per-document out-of-vocabulary rate against the corpus's own
    * frequency-floored vocabulary (tokens with count >= minCount — the
    * tokenizer-coverage signal: a doc whose tokens the vocabulary
    * doesn't cover will fragment badly at tokenization time).
    *
    * Scale shape: one shuffle for the vocabulary counts, one join of
    * the token stream against the (small, often broadcast) vocabulary,
    * one per-doc rollup. Token-less docs drop out (no coverage to
    * speak of), as in the NLL scorers.
    */
  def oovRate(df: DataFrame, textCol: String, idCol: String,
      minCount: Long): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val vocab = unigramCounts(df, textCol)
      .filter(col("c") >= minCount).select("token")
      .withColumn("__in_vocab", lit(1))
    toks.join(vocab, Seq("token"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__in_vocab").isNull, lit(1))).as("n_oov"))
      .withColumn("oov_rate", round(col("n_oov") / col("n_tokens"), 6))
  }

  /** Per-document mean NLL under the corpus's add-one-smoothed BIGRAM
    * model: nll(d) = −(1/#pairs) Σ ln((c₁₂+1)/(c₁+V)), with c₁ the
    * bigram-prefix count (Σ_w c₁w — self-consistent with the pair
    * stream) and V the unigram vocabulary. Documents with fewer than 2
    * tokens have no bigrams and drop out.
    *
    * Scale shape: the pair stream shuffles twice (bigram counts join,
    * prefix counts join) plus the per-doc rollup — all keyed joins
    * Catalyst can broadcast when the count tables allow. Both ln()
    * terms are cast to DECIMAL(38,18) BEFORE the sum, so the rollup is
    * order-independent and cross-engine exact; ln() inputs are
    * integers, as in [[unigramNll]].
    */
  def bigramNll(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val pairs = df
      .select(col(idCol),
        explode(arrays_zip(
          slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))))).as("p"))
      .select(col(idCol), col("p").getField("0").as("w1"),
        col("p").getField("1").as("w2"))
      // persisted: the count tables AND the per-doc join all read this
      // frame — without it the tokenize+zip+explode runs three times
      .persist()
    val big = pairs.groupBy("w1", "w2").count().withColumnRenamed("count", "c12")
    val pre = pairs.groupBy(col("w1")).count().withColumnRenamed("count", "c1")
    val vocab = df.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .agg(count_distinct(col("token")).as("v"))
    val perDoc = pairs
      .join(big, Seq("w1", "w2")).join(pre, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(log(col("c12") + 1).cast(DecimalType(38, 18))
          - log(col("c1") + col("v")).cast(DecimalType(38, 18))).as("s"))
    perDoc.select(col(idCol), col("n_bigrams"),
      round(-col("s").cast("double") / col("n_bigrams"), 6).as("nll"))
  }
}
