package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size token-window chunking with stride — the standard
  * long-document → training-sequence split (stride < chunkSize gives
  * overlapping windows; stride == chunkSize gives a disjoint tiling).
  *
  * Scale shape: tokens → per-row `sequence` + `explode` + `slice`, all
  * narrow codegen'd expressions — no shuffle, no UDF, fan-out bounded
  * by ceil(n_tokens / stride) per document. A 100 TB corpus chunks at
  * full scan parallelism; the output is written partition-local.
  *
  * Chunk count: 1 + ceil(max(n - chunkSize, 0) / stride) — every token
  * is covered, the last window may be short, and an empty/short doc
  * still yields exactly one chunk (its whole text), which keeps the
  * operator total (no dropped docs) and the count closed-form enough
  * to reproduce in the SQL oracle.
  */
object Chunking {

  /** Split `textCol` of each row into token windows. Output: all input
    * columns except the text, plus `chunk_id` (0-based), `chunk_text`,
    * `n_chunk_tokens`.
    */
  def fixedTokenChunks(df: DataFrame, textCol: String,
                       chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0,
      s"chunkSize/stride must be positive: $chunkSize/$stride")
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(toks)
    val nChunks = lit(1) +
      ceil(greatest(n - chunkSize, lit(0)).cast("double") / stride)
        .cast("int")
    val keep = df.columns.filter(_ != textCol).map(col)
    df.select(keep :+ toks.as("__toks") :+
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"): _*)
      .select(keep :+ col("chunk_id") :+
        slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkSize))
          .as("__chunk"): _*)
      .select(keep :+ col("chunk_id") :+
        concat_ws(" ", col("__chunk")).as("chunk_text") :+
        size(col("__chunk")).as("n_chunk_tokens"): _*)
  }
}
