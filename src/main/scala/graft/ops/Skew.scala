package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers (SURVEY scale notes; the builder's "salting
  * for skew" requirement).
  *
  * AQE's skew-join handling (enabled in every session this engine
  * creates) covers sort-merge joins at runtime. These helpers cover the
  * aggregation case AQE does not rewrite: a groupBy whose key
  * distribution has heavy hitters melts one reducer while the rest
  * idle. Two-phase salted aggregation splits each key into `salts`
  * sub-keys (phase 1, spreads the hot key over `salts` reducers), then
  * combines the partials (phase 2, tiny — one row per (key, salt)).
  *
  * The salt is DETERMINISTIC — a hash of the full row, not rand() — so
  * results are reproducible and retried tasks don't double-count.
  */
object Skew {

  /** Deterministic per-row salt in [0, salts). */
  def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts.toLong))

  /** Salted count + sum aggregation: semantically identical to
    * `df.groupBy(keys).agg(count(*), sum(valueCol))` but resilient to
    * heavy-hitter keys. Two exchanges, both balanced.
    */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    val partial = df
      .withColumn("__salt", rowSalt(df, salts))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    partial
      .groupBy(keyCols: _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as(s"sum_$valueCol"))
  }

  /** Salted equi-join: semantically identical to
    * `big.join(small, keys, joinType)` but resilient to heavy-hitter
    * join keys on the big side. The big side gets a deterministic
    * per-row salt in [0, salts); the small side is replicated once per
    * salt value (an `explode` over a literal array — `salts`x blowup of
    * the SMALL side only); the join runs on (keys :+ salt), so a hot
    * key's probe rows spread over `salts` reducers instead of melting
    * one.
    *
    * When to use: the small side is too big to broadcast (else
    * broadcast and there is no skew problem) and the big side's key
    * histogram has heavy hitters. AQE's skew-join split covers
    * sort-merge joins after the fact; explicit salting is the planned
    * form that also composes with bucketing. Only inner/left joins are
    * exposed: a right/full join would see the small side's unmatched
    * rows once per salt.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int = 16, joinType: String = "inner",
                 keepSalt: Boolean = false): DataFrame = {
    require(Seq("inner", "left", "left_outer", "leftouter").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    val saltedBig = big.withColumn("__salt", rowSalt(big, salts))
    // Shuffled-hash over sort-merge: the salt spreads every key over
    // `salts` partitions by construction, so the replicated side's
    // per-partition build set is balanced and bounded — the very
    // property salting buys — and SMJ's two full sorts are pure waste.
    val replSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
      .hint("shuffle_hash")
    val joined = saltedBig.join(replSmall, keys :+ "__salt", joinType)
    // keepSalt: a downstream groupBy(keys :+ "__salt") clusters on
    // exactly the join keys, so Catalyst reuses the join's exchange —
    // the two-phase salted-join-then-aggregate composition costs no
    // third shuffle (the phase-2 combine moves one row per key+salt).
    if (keepSalt) joined else joined.drop("__salt")
  }

  /** Salted distinct count: exact, two balanced phases (dedup on
    * (key, salt, value) partitions first, then count per key).
    */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String],
                          valueCol: String, salts: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.select(keyCols :+ col(valueCol): _*)
      .distinct() // shuffles on (keys, value) — no hot single key
      .groupBy(keyCols: _*)
      .agg(count(col(valueCol)).as(s"n_distinct_$valueCol"))
  }

  /** Join/shuffle-key skew audit: the diagnostic that decides whether a
    * key needs salting BEFORE the job melts an executor. Buckets rows
    * by `key mod nBuckets` (a deterministic stand-in for the hash
    * partitioner — engine-portable, unlike Murmur3), reports the
    * bucket-size distribution (max/mean ratio, Gini over the sorted
    * bucket sizes) and the top-`topK` hottest keys' row share. One
    * hash aggregation per statistic; the Gini walks `nBuckets` rows.
    * All counts exact; ratios are the only floats. Output one row:
    * n_rows, n_keys, max_bucket, mean_bucket, skew_ratio, gini,
    * topk_share (6 dp).
    */
  def keySkewAudit(df: DataFrame, keyCol: String, nBuckets: Int,
      topK: Int): DataFrame = {
    require(nBuckets >= 2 && topK >= 1)
    import org.apache.spark.sql.expressions.Window
    val keyed = df.select(pmod(col(keyCol).cast("long"), lit(nBuckets.toLong))
      .as("b"), col(keyCol).cast("long").as("k"))
    val buckets = keyed.groupBy("b").agg(count(lit(1)).as("s"))
    val ranked = buckets.withColumn("i",
      row_number().over(Window.orderBy(col("s"), col("b"))).cast("long"))
    val gini = ranked.agg(count(lit(1)).as("nb"), sum(col("s")).as("n"),
        max(col("s")).as("mx"), sum(col("i") * col("s")).as("wsum"))
      .select(col("nb"), col("n"), col("mx"),
        (lit(2.0) * col("wsum").cast("double")
          / (col("nb").cast("double") * col("n").cast("double"))
          - (col("nb") + 1).cast("double") / col("nb").cast("double"))
          .as("gini"))
    val keys = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
    val topShare = keys
      .withColumn("r", row_number().over(
        Window.orderBy(col("c").desc, col("k"))).cast("long"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("r") <= topK, col("c")).otherwise(0L)).as("topc"))
    gini.crossJoin(broadcast(topShare))
      .select(col("n").as("n_rows"), col("n_keys"),
        col("mx").as("max_bucket"),
        round(col("n").cast("double") / col("nb").cast("double"), 6)
          .as("mean_bucket"),
        round(col("mx").cast("double")
          / (col("n").cast("double") / col("nb").cast("double")), 6)
          .as("skew_ratio"),
        round(col("gini"), 6).as("gini"),
        round(col("topc").cast("double") / col("n").cast("double"), 6)
          .as("topk_share"))
  }
}
