package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-1 alternating least squares over an implicit (user, item,
  * rating) matrix — the embedding-initialization / popularity-factor
  * decomposition step of a recommender or data-mixture pipeline,
  * kept bit-reproducible across engines.
  *
  * Rank 1 makes each half-step closed-form (no linear solve):
  * `u_c = Σ_p r·v_p / Σ_p v_p²` over the customer's observed items,
  * and symmetrically for items. Every latent factor is re-quantized
  * to 1e-6 fixed point BEFORE it feeds the next half-step, so each
  * per-group numerator/denominator is an exact integer sum — order
  * free under Spark's arbitrary aggregation order and identical to a
  * sequential replay (the DuckDB oracle). The only float ops are the
  * per-group divisions, written in one fixed shape
  * (`CAST(n)/CAST(d)·1e6`) on both engines.
  *
  * Scale shape: each half-step is one hash aggregation on the side
  * being solved (map-side partials, no window, no sort) plus a join
  * of the opposite factor back onto the ratings. The factor frames
  * are one row per user/item — they GROW with the corpus, so they are
  * deliberately NOT broadcast-hinted: the shuffle hash join on the
  * rating key is the at-scale plan, and AQE still broadcasts a factor
  * frame at runtime whenever it is genuinely small. Nothing iterates
  * on the driver; the fixed alternation count keeps the lineage
  * bounded.
  */
object Factorize {

  private val S = 1000000.0 // 1e6 fixed-point scale for latent factors

  /** One closed-form half-step: solve `outCol` factors given the
    * opposite side's quantized factors (`fq`, joined by `byCol`).
    * Ratings must carry an exact integer `r`.
    */
  private def halfStep(ratings: DataFrame, opposite: DataFrame,
      byCol: String, outCol: String): DataFrame =
    ratings.join(opposite, byCol)
      .groupBy(col(outCol))
      .agg(sum(col("r") * col("fq")).as("num"),
        sum(col("fq") * col("fq")).as("den"))
      .select(col(outCol),
        floor(col("num").cast("double") / col("den").cast("double") * S * S
          + 0.5).cast("long").as("fq"))

  /** Rank-1 ALS with `rounds` full alternations starting from all-ones
    * item factors; returns ratings joined with both final factors and
    * the fixed-point prediction `predq` (= user·item, 1e-12 scale).
    *
    * `ratings`: (userCol, itemCol, r: Long) with exact integer r.
    */
  def rank1Als(ratings: DataFrame, userCol: String, itemCol: String,
      rounds: Int = 2): DataFrame = {
    require(rounds >= 1, "at least one alternation")
    val r = ratings.select(col(userCol), col(itemCol), col("r"))
    var item = r.select(col(itemCol)).distinct()
      .withColumn("fq", lit((S * 1.0).toLong))
    var user: DataFrame = null
    for (_ <- 1 to rounds) {
      user = halfStep(r, item.select(col(itemCol), col("fq")),
        itemCol, userCol)
      item = halfStep(r, user.select(col(userCol), col("fq")),
        userCol, itemCol)
    }
    // final user refresh against the last item factors (u, v, u shape)
    user = halfStep(r, item.select(col(itemCol), col("fq")),
      itemCol, userCol)
    r.join(user.withColumnRenamed("fq", "uq"), userCol)
      .join(item.withColumnRenamed("fq", "vq"), itemCol)
      .withColumn("predq", col("uq") * col("vq"))
  }
}
