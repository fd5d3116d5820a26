package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semi-supervised label propagation over a cosine kNN graph — the
  * "label the unlabeled 99% of the corpus from a small seed set"
  * step of weak supervision pipelines. A fixed number of majority-
  * vote rounds; each round labels exactly the still-unlabeled nodes
  * that have ≥1 labeled kNN neighbor (majority by count, ties to the
  * smallest label — fully deterministic).
  *
  * Determinism: cosine ranking tie-breaks by neighbor id; sqrt and
  * division are correctly-rounded IEEE ops, identical on any engine.
  * Votes are integer counts; no float accumulations anywhere.
  *
  * Scale shape: the kNN build here is the brute-force baseline (one
  * self-join, top-k window per node — same envelope as the q16
  * brute-force cosine); at corpus scale swap in the LSH/IVF candidate
  * generation from [[Similarity]] — the propagation rounds downstream
  * are bounded joins on the (node, neighbor) edge frame, which is
  * k·n rows regardless of how it was built.
  */
object LabelSpread {

  /** kNN edge frame: (id, nb, rank) — top `k` neighbors by cosine
    * (desc), neighbor-id tie-break. `df`: (idCol, vecCol).
    */
  def knnEdges(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
    val right = base.select(col("id").as("nb"), col("v").as("w"),
      col("nrm").as("wnrm"))
    val w = Window.partitionBy("id")
      .orderBy(col("cos").desc, col("nb"))
    base.crossJoin(right).filter(col("id") =!= col("nb"))
      .select(col("id"), col("nb"),
        (Similarity.dot(col("v"), col("w"))
          / (col("nrm") * col("wnrm"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id", "nb", "rank")
  }

  /** One majority-vote round: label every unlabeled node with ≥1
    * labeled neighbor. `labels`: (id, lab); returns the NEW
    * assignments only.
    */
  private def voteRound(edges: DataFrame, labels: DataFrame): DataFrame = {
    val w = Window.partitionBy("id")
      .orderBy(col("cnt").desc, col("lab"))
    edges.join(labels.select(col("id").as("u")), col("id") === col("u"),
        "left_anti")
      .join(labels.select(col("id").as("nb"), col("lab")), "nb")
      .groupBy("id", "lab").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("lab"))
  }

  /** Propagate `seeds` (id, lab) over `edges` for `rounds` rounds;
    * output (id, lab, round) where round 0 = seed, r ≥ 1 = the round
    * the node was labeled in.
    */
  def propagate(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    var all = seeds.select(col("id"), col("lab"), lit(0).as("round"))
    for (r <- 1 to rounds) {
      val fresh = voteRound(edges, all.select("id", "lab"))
        .withColumn("round", lit(r))
      all = all.unionByName(fresh)
    }
    all
  }
}
