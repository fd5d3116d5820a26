package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global training order: every epoch of LLM training
  * wants the corpus in a pseudo-random but REPRODUCIBLE order, sharded
  * so each data-loader rank streams its own files. A seeded sort key
  * from a mixed-congruential step gives exactly that without any
  * engine-specific RNG — the permutation is pure integer arithmetic,
  * so any engine (and the SQL oracle) derives the identical order.
  *
  * Scale shape: ord is a narrow per-row expression; shard assignment
  * is `ord % nShards`; the within-shard position is a window per shard
  * — the single shuffle keys on the shard id, and each shard sorts
  * independently (no global sort, no driver state). With nShards ≥
  * executor count the sort parallelism matches the cluster. Writing
  * `partitionBy(shard)` after this gives one ordered file set per
  * data-loader rank.
  */
object TrainOrder {

  /** glibc-constants LCG step — collision-free enough for ordering;
    * ties (possible since the step is mod 2^31) break by id.
    */
  def shuffled(df: DataFrame, idCol: String, seed: Long = 12345L,
               nShards: Int = 8): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1 (got $nShards)")
    val ord = pmod(col(idCol).cast("long") * lit(1103515245L) + lit(seed),
      lit(2147483648L))
    val w = Window.partitionBy(col("shard")).orderBy(col("ord"), col(idCol))
    df.withColumn("ord", ord)
      .withColumn("shard", col("ord") % nShards)
      .withColumn("position", row_number().over(w).cast("long"))
  }
}
