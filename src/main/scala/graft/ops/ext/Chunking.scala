package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  /** GPT-style sequence packing: chunks are concatenated in a
    * deterministic order and cut every `budget` tokens; a chunk
    * straddling a cut contributes to both sequences. Assignment is by
    * token offset — a window cumsum turns each chunk into a span
    * [cum - n, cum), and the spans are binned exactly like the range
    * join (explode to overlapped budget-multiples).
    *
    * The cumsum window partitions by `shardCol`, NOT globally: a global
    * ordering is the classic single-partition window anti-pattern at
    * 100 TB. Production packing is shard-local anyway (sequence ids are
    * (shard, local_seq)); shards pack in parallel, one window shuffle.
    * Output: one row per (chunk x sequence it feeds) with `seq_id` and
    * `tok_in_seq` (tokens this chunk contributes to that sequence).
    */
  def packSequences(chunks: DataFrame, shardCol: String,
                    orderCols: Seq[String], tokenCol: String,
                    budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(orderCols.map(col): _*)
    val cum = sum(col(tokenCol)).over(w)
    chunks
      .filter(col(tokenCol) > 0)
      .withColumn("__end", cum)
      .withColumn("__start", cum - col(tokenCol))
      .withColumn("seq_id", explode(sequence(
        floor(col("__start") / budget),
        floor((col("__end") - 1) / budget))))
      .withColumn("tok_in_seq",
        least(col("__end"), (col("seq_id") + 1) * budget) -
          greatest(col("__start"), col("seq_id") * budget))
      .drop("__start", "__end")
  }

  def fixedTokenChunks(df: DataFrame, textCol: String,
                       chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0,
      s"chunkSize/stride must be positive: $chunkSize/$stride")
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(toks)
    val nChunks = lit(1) +
      ceil(greatest(n - chunkSize, lit(0)).cast("double") / stride)
        .cast("int")
    val keep = df.columns.toIndexedSeq.filter(_ != textCol).map(col)
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
