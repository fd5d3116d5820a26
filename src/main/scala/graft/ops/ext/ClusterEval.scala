package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering-quality diagnostics over an embedding corpus: silhouette
  * scores on squared-Euclidean distance — the standard "is this
  * cluster assignment tight and separated" readout for k-means /
  * label partitions, evaluated on a deterministic hash sample of
  * anchor points (exact silhouette is O(n²); the sample makes the
  * corpus side linear while anchors stay a broadcast).
  *
  * d²(x, y) expands to |x|² + |y|² − 2·x·y, so the only per-pair work
  * is one codegen'd [[graft.expr.VecDot]] against precomputed norms —
  * no sqrt anywhere (squared distances preserve the silhouette
  * ordering and keep both engines on identical arithmetic). Per-pair
  * d² quantizes to 1e-6 before the per-(anchor, cluster) sum;
  * per-anchor s = (b−a)/max(a,b) quantizes to 1e-9 before the
  * per-cluster mean — every aggregation an exact integer sum.
  *
  * Scale shape: anchors broadcast onto ONE corpus scan (no shuffle of
  * the corpus), then two tiny hash aggregations. At 100 TB the
  * anchor count is the knob; the corpus is never self-joined.
  */
object ClusterEval {

  /** Mean silhouette per cluster over anchor rows selected by
    * `anchorPred`. `df`: (idCol, clusterCol, vecCol: array).
    * Output: (cluster, n_anchors, mean_silhouette).
    */
  def silhouette(df: DataFrame, idCol: String, clusterCol: String,
      vecCol: String, anchorPred: org.apache.spark.sql.Column): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(clusterCol).as("cl"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", Similarity.dot(col("v"), col("v")))
    val anchors = base.filter(anchorPred)
      .select(col("id").as("aid"), col("cl").as("acl"),
        col("v").as("av"), col("nrm").as("anrm"))
    val pairs = base.crossJoin(broadcast(anchors))
      .filter(col("id") =!= col("aid"))
      .select(col("aid"), col("acl"), col("cl"),
        floor((col("anrm") + col("nrm")
          - lit(2.0) * Similarity.dot(col("av"), col("v")))
          * 1000000.0 + 0.5).cast("long").as("d2q"))
    val perCluster = pairs.groupBy("aid", "acl", "cl")
      .agg(sum("d2q").as("sq"), count(lit(1)).as("cnt"))
      .withColumn("mean_d2",
        col("sq").cast("double") / 1000000.0 / col("cnt").cast("double"))
    val a = perCluster.filter(col("cl") === col("acl"))
      .select(col("aid"), col("acl"), col("mean_d2").as("a"))
    val b = perCluster.filter(col("cl") =!= col("acl"))
      .groupBy("aid").agg(min("mean_d2").as("b"))
    a.join(b, "aid")
      .select(col("acl"),
        floor(when(greatest(col("a"), col("b")) > 0.0,
            (col("b") - col("a")) / greatest(col("a"), col("b")))
          .otherwise(0.0) * 1000000000.0 + 0.5).cast("long").as("sq"))
      .groupBy(col("acl").as("cluster"))
      .agg(count(lit(1)).as("n_anchors"), sum("sq").as("ssq"))
      .select(col("cluster"), col("n_anchors"),
        round(col("ssq").cast("double") / 1000000000.0
          / col("n_anchors").cast("double"), 6).as("mean_silhouette"))
  }

  /** Pairwise energy distance between every pair of clusters on the
    * squared-Euclidean metric, WITHOUT any pairwise scan: for squared
    * distances the mean inter/intra-pair distance decomposes into
    * per-cluster moments — Σ|x|² and the per-dimension coordinate
    * sums — so the whole matrix comes from ONE pass over the corpus
    * plus a clusters²·dims-sized join. `E(i,j) = 2·B_ij − W_i − W_j`
    * where B is the mean cross-pair d² and W the mean within-pair d²;
    * E ≈ 0 means the clusters overlap, large E means separation.
    *
    * Determinism: coordinates quantize to 1e-6 before the per-dim
    * sums, row norms to 1e-6 before the per-cluster sum, and each
    * per-dim product of coordinate sums re-quantizes to 1e-6 before
    * the cross-dimension sum — every aggregation an exact integer.
    *
    * Scale shape: one hash aggregation over (cluster, dim) — dims·
    * clusters rows of state — and one over cluster; the pair matrix
    * is clusters², never corpus². This is the 100 TB path the
    * sampled [[silhouette]] trades away.
    */
  def energyDistanceMatrix(df: DataFrame, clusterCol: String,
      vecCol: String): DataFrame = {
    val base = df.select(col(clusterCol).as("cl"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("nq",
        floor(Similarity.dot(col("v"), col("v")) * 1000000.0 + 0.5)
          .cast("long"))
    val stats = base.groupBy("cl")
      .agg(count(lit(1)).as("n"), sum("nq").as("s2q"))
    val dims = base.select(col("cl"), posexplode(col("v")))
      .select(col("cl"), col("pos").as("d"),
        floor(col("col") * 1000000.0 + 0.5).cast("long").as("eq"))
      .groupBy("cl", "d").agg(sum("eq").as("svq"))
    val cross = dims.select(col("cl").as("ci"), col("d"),
        col("svq").as("si"))
      .join(dims.select(col("cl").as("cj"), col("d"),
        col("svq").as("sj")), "d")
      .filter(col("ci") <= col("cj"))
      .select(col("ci"), col("cj"),
        floor(col("si").cast("double") * col("sj").cast("double")
          / 1000000000000.0 * 1000000.0 + 0.5).cast("long").as("pq"))
      .groupBy("ci", "cj").agg(sum("pq").as("cq"))
    val si = stats.select(col("cl").as("ci"), col("n").as("ni"),
      col("s2q").as("s2i"))
    val sj = stats.select(col("cl").as("cj"), col("n").as("nj"),
      col("s2q").as("s2j"))
    val cii = cross.filter(col("ci") === col("cj"))
      .select(col("ci").as("wc"), col("cq").as("cw"))
    // V-statistic within-mean (over ALL n² ordered pairs, self-pairs
    // contributing 0): the standard energy-distance estimator — makes
    // E(i,i) ≡ 0 exactly, unlike the a≠b U-mean which biases E by
    // −4·var/(n−1) even for identical clusters
    def within(n: org.apache.spark.sql.Column,
        s2: org.apache.spark.sql.Column,
        cw: org.apache.spark.sql.Column) =
      (lit(2.0) * n.cast("double") * s2.cast("double") / 1000000.0
        - lit(2.0) * cw.cast("double") / 1000000.0) /
      (n.cast("double") * n.cast("double"))
    cross.filter(col("ci") < col("cj"))
      .join(si, "ci").join(sj, "cj")
      .join(cii.select(col("wc").as("ci"), col("cw").as("cwi")), "ci")
      .join(cii.select(col("wc").as("cj"), col("cw").as("cwj")), "cj")
      .select(col("ci"), col("cj"), col("ni"), col("nj"),
        round(lit(2.0) * (col("s2i").cast("double") / 1000000.0
            / col("ni").cast("double")
          + col("s2j").cast("double") / 1000000.0
            / col("nj").cast("double")
          - lit(2.0) * col("cq").cast("double") / 1000000.0
            / (col("ni") * col("nj")).cast("double"))
          - within(col("ni"), col("s2i"), col("cwi"))
          - within(col("nj"), col("s2j"), col("cwj")), 6)
          .as("energy"))
  }

  /** B-cubed clustering evaluation (Bagga & Baldwin 1998) against a
    * gold labeling: per item, precision = the fraction of its
    * cluster-mates sharing its gold class, recall = the fraction of
    * its class-mates sharing its cluster; B³ P/R are the item means
    * and decompose EXACTLY over the (cluster, gold) contingency cells
    * — Σ_cells n_cg²/n_c / N and Σ_cells n_cg²/n_g / N — so the whole
    * evaluation is three hash aggregations on exact integers, with
    * the per-cell ratio terms quantized to 1e-9 before the sums.
    * The metric pairwise-F (q208) can't see per-item imbalance; B³
    * weights every item equally. Output one row: n_items, n_clusters,
    * n_classes, b3_precision, b3_recall, b3_f1 (6 dp).
    */
  def bCubed(assign: DataFrame, truth: DataFrame): DataFrame = {
    val j = assign.select(col("item"), col("cluster"))
      .join(truth.select(col("item"), col("gold")), "item")
      .persist()
    val cells = j.groupBy("cluster", "gold").agg(count(lit(1)).as("ncg"))
    val nc = j.groupBy("cluster").agg(count(lit(1)).as("nc"))
    val ng = j.groupBy("gold").agg(count(lit(1)).as("ng"))
    val terms = cells.join(broadcast(nc), "cluster")
      .join(broadcast(ng), "gold")
    val agg = terms.agg(
      sum(col("ncg")).as("n"),
      countDistinct(col("cluster")).as("n_clusters"),
      countDistinct(col("gold")).as("n_classes"),
      sum(floor((col("ncg") * col("ncg")).cast("double")
        / col("nc").cast("double") * lit(1e9) + lit(0.5)).cast("long"))
        .as("pq"),
      sum(floor((col("ncg") * col("ncg")).cast("double")
        / col("ng").cast("double") * lit(1e9) + lit(0.5)).cast("long"))
        .as("rq"))
    agg.select(col("n").as("n_items"), col("n_clusters"), col("n_classes"),
        (col("pq").cast("double") / lit(1e9) / col("n").cast("double"))
          .as("p"),
        (col("rq").cast("double") / lit(1e9) / col("n").cast("double"))
          .as("r"))
      .select(col("n_items"), col("n_clusters"), col("n_classes"),
        round(col("p"), 6).as("b3_precision"),
        round(col("r"), 6).as("b3_recall"),
        round(lit(2.0) * col("p") * col("r") / (col("p") + col("r")), 6)
          .as("b3_f1"))
  }
}
