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
}
