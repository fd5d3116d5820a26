package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level structural cleaning (the CCNet/RefinedWeb paragraph
  * stages): exact paragraph dedup (first occurrence wins, every later
  * copy removed) and boilerplate-line removal (a line appearing in
  * ≥ minDocs documents is template chrome — removed everywhere).
  *
  * Scale shape (both operators): documents explode to
  * (doc, pos, paragraph) rows; the only shuffle keys on the paragraph
  * text (its hash) — the natural partitioning for a global
  * first-occurrence / frequency decision and exactly one exchange.
  * Reconstruction groups back by doc id (second exchange) with a
  * sort_array on the kept positions, so the rebuilt text is
  * order-exact without any global sort. State never lives on the
  * driver; both frequency tables are themselves distributed.
  *
  * Determinism: "first occurrence" is the global (doc_id, pos) minimum
  * — a total order, so results are stable at any parallelism and
  * reproducible in the SQL oracle.
  */
object CorpusClean {

  private def exploded(docs: DataFrame, textCol: String, idCol: String,
                       sep: String) =
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), sep)).as(Seq("pos", "para")))
      .filter(length(trim(col("para"))) > 0)

  /** Remove every non-first occurrence of each duplicated paragraph.
    * Output: doc_id, text_clean, n_kept, n_removed (docs whose every
    * paragraph was removed keep an empty text_clean).
    */
  def paragraphDedup(docs: DataFrame, textCol: String, idCol: String,
                     sep: String = "\n"): DataFrame = {
    val paras = exploded(docs, textCol, idCol, sep)
    val first = Window.partitionBy(col("para"))
      .orderBy(col("doc_id"), col("pos"))
    val kept = paras
      .withColumn("rn", row_number().over(first))
      .withColumn("keep", col("rn") === 1)
    rebuild(docs, idCol, kept)
  }

  /** Remove every line that occurs in ≥ minDocs distinct documents.
    * Output: doc_id, text_clean, n_kept, n_removed.
    */
  def boilerplateStrip(docs: DataFrame, textCol: String, idCol: String,
                       minDocs: Int, sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2 (got $minDocs) - " +
      "1 would strip every line")
    // persisted: the frequency aggregate AND the keep-join both read
    // the exploded frame — without it the split+explode runs twice
    val paras = exploded(docs, textCol, idCol, sep).persist()
    // line -> distinct-doc frequency: far smaller than the corpus, and
    // AQE broadcasts it back when it fits
    val freq = paras.groupBy("para")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    val kept = paras.join(freq, Seq("para"))
      .withColumn("keep", col("n_docs") < minDocs)
    rebuild(docs, idCol, kept)
  }

  /** Group kept paragraphs back into documents, order-exact via
    * sort_array on (pos, para) structs; left join preserves docs that
    * lost everything.
    */
  private def rebuild(docs: DataFrame, idCol: String,
                      kept: DataFrame): DataFrame = {
    val agg = kept.groupBy("doc_id").agg(
      array_join(transform(
        sort_array(collect_list(when(col("keep"),
          struct(col("pos"), col("para"))))),
        s => s.getField("para")), "\n").as("text_clean"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
      sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"))
    docs.select(col(idCol).as("doc_id")).distinct()
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }
}
