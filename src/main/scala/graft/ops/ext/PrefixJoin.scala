package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity join by prefix filtering (Chaudhuri et al.
  * 2006 / PPJoin): two token sets with jaccard ≥ t MUST share a token
  * inside each other's (|x| − ⌈t·|x|⌉ + 1)-element prefix when both
  * sets are ordered by ascending global token frequency — so
  * candidates come from an equi-join on PREFIX tokens only (the
  * rarest tokens, tiny posting lists), never an all-pairs scan, and
  * the exact jaccard then verifies each candidate once.
  *
  * This is the EXACT counterpart to the MinHash/SimHash APPROXIMATE
  * near-dup family (q13/q14): no false negatives at the threshold, at
  * the cost of the verify join. Scale shape: the frequency ordering
  * is one hash aggregation + a domain-sized rank; prefix posting
  * lists are bounded by the rare-token df; verification joins the
  * candidate pairs back to the full token frame. Shuffles carry
  * (id, token) rows — at warehouse scale, dictionary-encode the
  * token column first so the joins move codes, not strings.
  *
  * Determinism: the frequency order tie-breaks by token; the
  * threshold predicate is exact integer cross-multiplication
  * (den·inter ≥ num·(|a|+|b|−inter)); jaccard is one division,
  * reported at 6 dp.
  */
object PrefixJoin {

  /** Pairs (a < b by id) with jaccard(tokens) ≥ num/den. `df` columns:
    * idCol, plus `tokCol` = array of tokens. Output: (a, b, inter,
    * na, nb, jaccard). */
  def jaccardJoin(df: DataFrame, idCol: String, tokCol: String,
      num: Int, den: Int): DataFrame = {
    require(num > 0 && den >= num)
    val toks = df.select(col(idCol).as("id"),
        explode(array_distinct(col(tokCol))).as("w"))
      .persist()
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("n")).persist()
    // ascending-df order (rarest first), tie-break by token — applied
    // directly inside the per-doc window, so no global vocabulary rank
    // (a needless single-partition sort) ever materializes
    val freq = toks.groupBy("w").agg(count(lit(1)).as("df"))
    // per-doc ordered position; prefix size = n - ceil(t*n) + 1
    val pos = toks.join(freq, "w")
      .withColumn("p",
        row_number().over(
          Window.partitionBy("id").orderBy(col("df"), col("w"))))
      .join(sizes, "id")
      .withColumn("plen",
        col("n") - expr(s"($num * n + $den - 1) div $den") + lit(1L))
    val prefix = pos.filter(col("p") <= col("plen"))
      .select(col("id"), col("w"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.w") === col("b.w") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"))
      .distinct()
    val inter = cand
      .join(toks.select(col("id").as("ida"), col("w")), "ida")
      .join(toks.select(col("id").as("idb"), col("w")), Seq("idb", "w"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("ida"), col("n").as("na")), "ida")
      .join(sizes.select(col("id").as("idb"), col("n").as("nb")), "idb")
      .filter(lit(den) * col("inter")
        >= lit(num) * (col("na") + col("nb") - col("inter")))
      .select(col("ida").as("a"), col("idb").as("b"), col("inter"),
        col("na"), col("nb"),
        round(col("inter").cast("double")
          / (col("na") + col("nb") - col("inter")).cast("double"), 6)
          .as("jaccard"))
  }
}
