package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sharding — the "write the corpus as N-token shards"
  * step before tokenizer/trainer handoff: place documents in a
  * deterministic pseudo-random global order (md5 of the id — the repo's
  * engine-portable uniform order) and cut a new shard every `budget`
  * tokens of running total.
  *
  * Scale shape: a single global window would serialize on one
  * partition, so the running sum is two-level — the hash order is split
  * into 16 lexicographic buckets by the first hex digit, each bucket
  * computes its own prefix sums in parallel (shuffle on the bucket),
  * and the 16 bucket totals (a broadcast-size aggregate) turn local
  * prefixes into global ones. Everything is integer arithmetic —
  * bit-portable to the SQL oracle.
  */
object Sharding {

  /** Per-document shard assignment: (id…, shard) where shard =
    * floor(tokens-before-this-doc / budget) in the md5(id) global
    * order.
    */
  def assignShards(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val keyed = df
      .withColumn("__key", Sampling.hashBucket(col(idCol)))
      .withColumn("__bucket", ascii(substring(col("__key"), 1, 1)))
    // local prefix sum inside each of the 16 hash buckets (parallel)
    val local = Window.partitionBy("__bucket")
      .orderBy(col("__key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = keyed.withColumn("__cum", sum(col(tokensCol)).over(local))
    // bucket totals -> exclusive global offset per bucket (16 rows)
    val offsets = withLocal.groupBy("__bucket")
      .agg(sum(col(tokensCol)).as("__btot"))
      .withColumn("__offset",
        coalesce(sum(col("__btot")).over(
          Window.orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__bucket", "__offset")
    withLocal.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("__before",
        col("__offset") + col("__cum") - col(tokensCol))
      .withColumn("shard", expr(s"__before div ${budget}L")) // exact integer div
      .drop("__key", "__bucket", "__cum", "__offset", "__before")
  }

  /** Shard manifest: docs and token totals per shard. */
  def shardManifest(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long): DataFrame =
    assignShards(df, idCol, tokensCol, budget)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("n_tokens"))
}
