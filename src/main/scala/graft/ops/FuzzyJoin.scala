package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked edit-distance join (record linkage): match dirty strings to
  * a reference list within a Levenshtein budget — the entity-resolution
  * primitive behind "same product/author/address, typo'd".
  *
  * Scale shape: candidates form ONLY inside a block (shared prefix) and
  * within a length tolerance — the classic blocking strategy that turns
  * the quadratic all-pairs distance matrix into Σ_block |L_b|×|R_b|.
  * The expensive levenshtein runs on candidates alone, via Spark's
  * thresholded variant (early-exits the DP once the budget is blown, so
  * the common non-match costs O(len·maxDist), not O(len²)). Skewed
  * blocks (one hot prefix) are the operator's known hazard — pick
  * blockPrefix so blocks stay bounded, or salt the hot block (see
  * ops/Skew).
  *
  * Determinism: unit-cost Levenshtein is engine-universal; every output
  * carries (query_id, match_id, dist) — exact, no floats.
  */
object FuzzyJoin {

  def join(left: DataFrame, right: DataFrame,
           leftId: String, leftCol: String,
           rightId: String, rightCol: String,
           maxDist: Int = 1, blockPrefix: Int = 4): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0 (got $maxDist)")
    require(blockPrefix >= 1, s"blockPrefix must be >= 1 (got $blockPrefix)")
    val l = left.select(col(leftId).as("query_id"),
      col(leftCol).as("q_name"),
      substring(col(leftCol), 1, blockPrefix).as("blk"),
      length(col(leftCol)).as("q_len"))
    val r = right.select(col(rightId).as("match_id"),
      col(rightCol).as("m_name"),
      substring(col(rightCol), 1, blockPrefix).as("blk"),
      length(col(rightCol)).as("m_len"))
    l.join(r, Seq("blk"))
      .filter(abs(col("q_len") - col("m_len")) <= maxDist)
      .withColumn("dist",
        levenshtein(col("q_name"), col("m_name"), maxDist).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select("query_id", "match_id", "q_name", "m_name", "dist")
  }

  /** Jaro-Winkler similarity Column over the native codegen'd kernel
    * ([[graft.expr.JaroWinkler]]) — prefix weight 0.1, boost threshold
    * 0.7, the de-facto standard variant (matches DuckDB's
    * `jaro_winkler_similarity`). Pair with a blocking join: score only
    * candidates sharing a cheap deterministic block key (prefix,
    * length band) — never all-pairs.
    */
  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge
    GraftExpressionBridge.column(graft.expr.JaroWinkler(
      GraftExpressionBridge.expression(a.cast("string")),
      GraftExpressionBridge.expression(b.cast("string"))))
  }
}
