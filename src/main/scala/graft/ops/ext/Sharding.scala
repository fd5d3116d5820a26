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

  /** Next-fit whole-document bin packing audit, shard-local: docs
    * hash into `shards` md5 buckets (engine-portable), each bucket
    * folds its ordered doc list through the next-fit state
    * (bins, fill): fill + len ≤ C keeps filling, else a new bin
    * opens — the packing policy a context-window builder runs
    * per-partition at scale (bins never cross shards, so the fold is
    * embarrassingly parallel). `byLengthDesc` orders each shard
    * longest-first (next-fit-decreasing — tighter) instead of id
    * order. Docs longer than the capacity are EXCLUDED and counted.
    * The fold carries a 2-long ARRAY accumulator (the q336
    * discipline); everything is exact integers. Output one row:
    * (strategy, n_docs, n_oversize, n_bins, used_tokens,
    * waste_tokens, waste_share).
    */
  def nextFitAudit(df: DataFrame, idCol: String, lenCol: String,
      capacity: Long, byLengthDesc: Boolean, shards: Int,
      strategy: String): DataFrame = {
    require(capacity >= 1 && shards >= 1)
    val base = df.select(col(idCol).cast("long").as("id"),
        col(lenCol).cast("long").as("len"))
      .withColumn("shard",
        expr(s"CAST(conv(substring(md5(CAST(id AS STRING)), 1, 4), 16, 10) AS BIGINT) % $shards"))
    val fit = base.filter(col("len") <= capacity)
    val over = base.filter(col("len") > capacity)
      .agg(count(lit(1)).as("n_oversize"))
    val ordKey =
      if (byLengthDesc) array((lit(100000000L) - col("len")), col("id"))
      else array(col("id"), col("len"))
    val packed = fit
      .select(col("shard"), col("len"), ordKey.as("k"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("len").as("used"),
        sort_array(collect_list(struct(col("k"), col("len")))).as("s"))
      .select(col("shard"), col("n_docs"), col("used"),
        transform(col("s"), e => e.getField("len")).as("lens"))
    val st = aggregate(col("lens"),
      array(lit(0L), lit(capacity)), // (bins so far, current fill)
      (acc, x) => when(element_at(acc, 2) + x <= capacity,
        array(element_at(acc, 1), element_at(acc, 2) + x))
        .otherwise(array(element_at(acc, 1) + 1L, x)))
    val perShard = packed.select(col("shard"), col("n_docs"), col("used"),
      element_at(st, 1).as("bins"))
    perShard.agg(sum("n_docs").as("n_docs"), sum("used").as("used_tokens"),
        sum("bins").as("n_bins"))
      .crossJoin(over)
      .select(lit(strategy).as("strategy"), col("n_docs"),
        coalesce(col("n_oversize"), lit(0L)).as("n_oversize"),
        col("n_bins"), col("used_tokens"),
        (col("n_bins") * capacity - col("used_tokens")).as("waste_tokens"),
        round((col("n_bins") * capacity - col("used_tokens")).cast("double")
          / (col("n_bins") * capacity).cast("double"), 6).as("waste_share"))
  }
}
