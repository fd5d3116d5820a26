package graft.ops.ext

import org.apache.spark.sql.{DataFrame, GraftExpressionBridge}
import org.apache.spark.sql.functions._

/** Corpus chunk-level dedup over content-defined chunk boundaries
  * ([[graft.expr.CdcChunks]]): prepended banners / injected headers
  * shift content bytes, so fixed-size chunking never re-aligns — CDC
  * boundaries depend only on the local character window and re-align
  * one boundary after any edit. Chunk-granular dedup is the
  * between-exact-and-near-dup tool: it finds the shared boilerplate
  * SPANS themselves, not just that two docs are similar.
  *
  * Scale shape: one narrow map per document (the chunker is a codegen'd
  * expression), then a digest-only groupBy — the shuffle carries
  * (digest, len), never chunk text. Duplicate-digest collisions are
  * md5-improbable; the digest group count IS the occurrence count.
  */
object CdcDedup {

  /** (id, digest, chunk_len) per chunk, in document order. */
  def chunks(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val chunksCol = GraftExpressionBridge.column(
      graft.expr.CdcChunks(GraftExpressionBridge.expression(col(textCol))))
    df.select(col(idCol), explode(chunksCol).as("chunk"))
      .select(col(idCol), md5(col("chunk")).as("digest"),
        length(col("chunk")).as("chunk_len"))
  }

  /** Top duplicated chunks: digest, occurrence count, distinct-doc
    * count, chunk length — deterministic order, capped output.
    */
  def duplicatedChunks(df: DataFrame, textCol: String, idCol: String,
      limit: Int = 50): DataFrame =
    chunks(df, textCol, idCol)
      .groupBy("digest")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs"),
        min(col("chunk_len")).cast("long").as("chunk_len"))
      .filter(col("n_occurrences") > 1)
      .orderBy(col("n_occurrences").desc, col("digest"))
      .limit(limit)
}
