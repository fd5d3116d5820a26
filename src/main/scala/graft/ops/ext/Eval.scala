package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Classifier evaluation — the quality-gate companion to
  * [[Retrieval.rankingMetrics]]: once a pipeline scores documents
  * (fastText-style keep/drop, nearest-centroid, a distilled reward
  * model), the curation decision needs an exact AUC against a labeled
  * eval set before the threshold ships.
  *
  * Exactness/portability construction (the repo's determinism rules):
  * AUC is the Mann–Whitney U statistic with mid-rank tie handling.
  * Ranks come from `row_number` over (score, id) — deterministic under
  * ties — and the mid-rank is carried as `min(rn)+max(rn)` per score
  * group (twice the mid-rank, an exact BIGINT), so the positive-class
  * rank sum is pure integer arithmetic until one final division.
  *
  * Scale shape: eval sets are labeled and therefore small (thousands
  * to low millions of rows — labels are the expensive resource, not
  * compute), so the global rank window is an intentional single-sort
  * design: one sort of the EVAL SET, never of the corpus. The scoring
  * side (centroid build + broadcast dot) is one corpus-scan shaped
  * pass and would scale to any corpus size; only the labeled rows
  * enter the window.
  */
object Eval {

  /** Per-dimension mean of `vecCol` over rows where `pred` holds —
    * DECIMAL(38,18) component sums (order-independent, exact), one
    * IEEE division back to double per dimension. Returns a 1-row
    * frame with the mean vector as `centv`.
    */
  def classCentroid(df: DataFrame, vecCol: String, pred: Column)
      : DataFrame =
    df.filter(pred)
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(sum(col("x").cast(DecimalType(38, 18))).as("s"),
        count(lit(1)).as("n"))
      .agg(transform(
        sort_array(collect_list(struct(col("dim"),
          (col("s").cast("double") / col("n")).as("m")))),
        e => e.getField("m")).as("centv"))

  /** Exact ROC AUC of the nearest-centroid score `dot(vec, centroid
    * of the positive class)` against `labelCol === posLabel`.
    * Output: one row (n_pos, n_neg, auc).
    */
  def centroidAuc(df: DataFrame, vecCol: String, idCol: String,
      labelCol: String, posLabel: Int): DataFrame = {
    val vecs = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"),
      (col(labelCol) === posLabel).as("pos"))
    val cent = classCentroid(vecs, "vec", col("pos"))
    val scored = vecs.crossJoin(broadcast(cent))
      .select(col("id"), col("pos"),
        Similarity.dot(col("vec"), col("centv")).as("score"))
    rocAuc(scored, "score", "pos")
  }

  /** Mann–Whitney AUC of `scoreCol` against boolean `posCol`:
    * AUC = (Σ_pos midrank − n_pos(n_pos+1)/2) / (n_pos·n_neg), ties
    * at mid-rank. Integer-exact until the final division; ranks the
    * (small, labeled) eval frame in one global sort. `scored` must
    * carry an `id` column — the deterministic tie-break for the rank
    * ordering (the mid-rank construction makes the STATISTIC
    * tie-order-independent; the id only pins row numbering).
    */
  def rocAuc(scored: DataFrame, scoreCol: String, posCol: String)
      : DataFrame = {
    val rn = scored.withColumn("rn",
      row_number().over(Window.orderBy(col(scoreCol), col("id"))))
    val ws = Window.partitionBy(col(scoreCol))
    // min+max of rn per score group = 2×midrank, exact in BIGINT
    val mr = rn.withColumn("mr2",
      (min(col("rn")).over(ws) + max(col("rn")).over(ws)).cast("long"))
    mr.agg(
      sum(when(col(posCol), 1L)).as("n_pos"),
      sum(when(!col(posCol), 1L)).as("n_neg"),
      sum(when(col(posCol), col("mr2"))).as("sum2"))
      .select(col("n_pos"), col("n_neg"),
        round((col("sum2").cast("double") / 2.0
          - col("n_pos").cast("double") * (col("n_pos") + 1) / 2.0)
          / (col("n_pos") * col("n_neg")), 6).as("auc"))
  }
}
