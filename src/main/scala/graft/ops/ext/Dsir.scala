package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (hashed n-gram variant —
  * the DSIR recipe of Xie et al., NeurIPS 2023): score every raw-corpus
  * document by how much more likely its token stream is under the
  * TARGET distribution than under the RAW distribution, both estimated
  * as hashed-bucket unigram models. The standard pre-training move for
  * "give me more data that looks like this high-quality set" without
  * training a classifier.
  *
  * Determinism (cross-engine oracle contract):
  *  - the feature hash is md5's first two hex chars → bucket 0..255
  *    (md5 is bit-identical everywhere; no engine-specific xxhash);
  *  - bucket log-ratios are quantized to integer MICROS once
  *    (`round(ln(ct/cs), 6) * 1e6`) and every per-doc score is an
  *    exact integer SUM of those micros — float addition order never
  *    matters;
  *  - ranking tie-breaks by doc id.
  *
  * Scale shape: two token-bucket aggregations (256-row results), one
  * broadcast of the 256-row weight table into the exploded corpus
  * tokens (map-side), one per-doc sum — no shuffle ever carries more
  * than (doc, bucket-count) rows; the top-N is a bounded
  * TakeOrdered. At 100 TB the corpus-side aggregation is the only
  * full-data pass, and it is a map-side-combined hash agg on a
  * 256-value key.
  */
object Dsir {

  private val Buckets = 256

  /** md5-derived feature bucket of the `__tok` column — first two hex
    * chars as an integer 0..255. `instr` over the hex alphabet keeps
    * the decode in the SQL subset both engines share (no hex-cast
    * dialect differences); DuckDB twin:
    * `(instr('0123456789abcdef', substr(md5(t),1,1))-1)*16 +
    *  instr('0123456789abcdef', substr(md5(t),2,1))-1`.
    */
  private val bucketOfTok: org.apache.spark.sql.Column =
    expr("(instr('0123456789abcdef', substring(md5(__tok), 1, 1)) - 1) " +
      "* 16 + instr('0123456789abcdef', substring(md5(__tok), 2, 1)) - 1")
      .cast("int")

  /** Bucket (0..255) token counts of a corpus — the sufficient
    * statistic importance weights derive from. Exposed separately so a
    * table-log consumer can maintain it O(delta): fold the bucket
    * counts of `readChanges` batches into a 256-row running table
    * instead of re-scanning the corpus (q443 proves the fold equals
    * the full recompute).
    */
  def bucketCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
      .withColumn("__b", bucketOfTok)
      .groupBy("__b").agg(count(lit(1)).as("cnt"))

  /** Per-document importance scores of `corpus` against `target` —
    * (idCol, n_tokens, score_micro), all rows, no ranking.
    * `score_micro` is the exact integer sum of quantized per-token
    * bucket log-ratios; divide by 1e6 for nats. Add-one smoothing on
    * both bucket tables keeps every ratio finite regardless of
    * coverage.
    */
  def importanceScores(corpus: DataFrame, target: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    val spark = corpus.sparkSession
    def toks(df: DataFrame, withId: Boolean): DataFrame = {
      val base = if (withId)
        df.select(col(idCol).as("__id"),
          explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
      else
        df.select(explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
      base.withColumn("__b", bucketOfTok)
    }
    val corpusToks = toks(corpus, withId = true)
    val cs = corpusToks.groupBy("__b").agg(count(lit(1)).as("__cs"))
    val ct = toks(target, withId = false)
      .groupBy("__b").agg(count(lit(1)).as("__ct"))
    // full 0..255 domain with add-one smoothing; weight in exact micros
    val domain = spark.range(0, Buckets).select(col("id").cast("int").as("__b"))
    val weights = domain
      .join(cs, Seq("__b"), "left").join(ct, Seq("__b"), "left")
      .select(col("__b"),
        floor(round(log(
          (coalesce(col("__ct"), lit(0L)) + lit(1L)).cast("double") /
            (coalesce(col("__cs"), lit(0L)) + lit(1L)).cast("double")), 6)
          * lit(1e6) + lit(0.5)).cast("long").as("__w"))
    corpusToks
      .join(broadcast(weights), Seq("__b"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"), sum("__w").as("score_micro"))
      .withColumnRenamed("__id", idCol)
  }

  /** The `topN` docs of [[importanceScores]] by score descending (ties
    * by id ascending), with a 1-based rank.
    */
  def importanceTopN(corpus: DataFrame, target: DataFrame,
      textCol: String, idCol: String, topN: Int): DataFrame =
    importanceScores(corpus, target, textCol, idCol)
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(topN)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score_micro").desc, col(idCol))).cast("long"))
}
