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

  /** All within-frame id pairs at Levenshtein distance ≤ 1, via the
    * deletion-neighborhood candidate join (FastSS, Bocek et al. 2007 /
    * SymSpell): each record emits its name plus every single-character
    * deletion as join keys; any two strings within edit distance 1
    * share at least one such key (equal → the identity key;
    * substitution → both delete the differing position;
    * insert/delete → the shorter string IS a deletion of the longer).
    * Candidates then verify with the thresholded `levenshtein`.
    *
    * Scale shape: fan-out is len(name)+1 keys per record — LINEAR in
    * the corpus, independent of any blocking key's cardinality. This
    * replaces block-quadratic candidate generation (Σ_block |b|²),
    * which the sf1 bench showed growing ~100× on a 10× corpus when
    * records concentrate in few blocks (q226: blocking on `source`).
    * Deletion keys are near-unique for hash-bearing names; the
    * operator's residual hazard is a single name shared by many
    * records (its identity key goes quadratic) — same class as a hot
    * block, and visible to the key-skew audit (q280).
    *
    * Output: (id_a, name_a, id_b, name_b), id_a < id_b, distinct,
    * lev(name_a, name_b) ≤ 1 exactly.
    */
  def lev1SelfPairs(df: DataFrame, idCol: String, nameCol: String)
      : DataFrame = {
    val keys = df.select(col(idCol).as("id"), col(nameCol).as("name"))
      .withColumn("delkey", explode(expr(
        "transform(sequence(0, length(name)), i -> " +
        "if(i = 0, name, concat(substr(name, 1, i-1), substr(name, i+1))))")))
      .distinct() // deleting either of two equal adjacent chars repeats
    keys.as("a").join(keys.as("b"),
        col("a.delkey") === col("b.delkey") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.name").as("name_a"),
        col("b.id").as("id_b"), col("b.name").as("name_b"))
      .distinct()
      .filter(levenshtein(col("name_a"), col("name_b"), 1) >= 0)
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
