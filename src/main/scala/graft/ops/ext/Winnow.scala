package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing (minimizer) document fingerprints — the MOSS/minimizer
  * scheme: hash every k-token shingle, keep only the shingles whose
  * hash is a LOCAL MINIMUM within a fixed position radius, and compare
  * documents by their (tiny) fingerprint sets. Selection density is
  * ~2/(w+1), so the cross-doc join touches a constant fraction of the
  * shingle volume — the property that makes this the scale path when
  * even MinHash signatures are too wide (fingerprints are also
  * POSITIONAL, so unlike MinHash they localize the shared span).
  *
  * Scheme: the "local scheme" variant (position p is selected iff its
  * key is the minimum over positions [p-(w-1), p+(w-1)]), expressible
  * as ONE window-min pass in both Spark and the DuckDB oracle. Keys
  * are md5(gram) — engine-portable, uniformly distributed. Expected
  * selection density is 2/(w+1) for random keys, and each document's
  * global-min gram is always selected; unlike original per-window
  * winnowing there is no HARD every-w-window guarantee (a monotone
  * key run selects only its end), which random md5 keys make
  * exponentially unlikely to matter.
  *
  * Scale shape: tokenize → per-doc window (no shuffle beyond the
  * doc-id repartition) → distinct fingerprint keys → df-capped
  * equi-join on key. The df cap (drop fingerprints shared by more
  * than `maxDf` docs) is the boilerplate guard every fingerprint
  * join needs: without it one templated banner creates an O(n²)
  * bucket.
  */
object Winnow {

  /** Distinct (id, fp) winnowing fingerprints; fp = md5 of the selected
    * gram. Docs with fewer than `gramSize` tokens produce no rows.
    */
  def fingerprints(df: DataFrame, textCol: String, idCol: String,
      gramSize: Int = 3, window: Int = 4): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val grams: Column = transform(
      sequence(lit(1), size(col("toks")) - (gramSize - 1)),
      i => concat_ws(" ", slice(col("toks"), i, lit(gramSize))))
    val w = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(-(window - 1), window - 1)
    df.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= gramSize)
      .select(col(idCol), posexplode(grams).as(Seq("pos", "gram")))
      .select(col(idCol), col("pos"), md5(col("gram")).as("k"))
      .withColumn("kmin", min("k").over(w))
      .filter(col("k") === col("kmin"))
      .select(col(idCol), col("k").as("fp"))
      .distinct()
  }

  /** Doc pairs sharing >= `minShared` fingerprints, hub-capped at
    * `maxDf` docs per fingerprint. Deterministic order + limit.
    */
  def overlapPairs(df: DataFrame, textCol: String, idCol: String,
      gramSize: Int = 3, window: Int = 4, maxDf: Int = 50,
      minShared: Int = 2, limit: Int = 200): DataFrame = {
    val fp = fingerprints(df, textCol, idCol, gramSize, window)
    // anti-join against the HUB set (df > maxDf) — hubs are few by
    // construction, so they broadcast; the keep-side complement would not.
    val hubs = fp.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("fp")
    val capped = fp.join(broadcast(hubs), Seq("fp"), "left_anti")
    capped.as("a")
      .join(capped.as("b"), col("a.fp") === col("b.fp") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("n_shared").desc, col("id_a"), col("id_b"))
      .limit(limit)
  }

  /** SOFT deduplication weights — down-weight common content instead
    * of dropping documents (the SoftDeDup idea re-expressed on
    * winnowing fingerprints): a document's duplication mass is the
    * fraction of its fingerprints that occur in ≥ `commonDf` documents
    * corpus-wide; its sampling weight is 1 − that fraction. A unique
    * document keeps weight 1, a fully-boilerplate one approaches 0,
    * and — unlike hard near-dup removal — partial overlaps lose only
    * their overlapping mass.
    *
    * Scale shape: fingerprint extraction is the [[fingerprints]]
    * linear pass; document frequency is one count shuffle keyed by
    * fingerprint; the weight is a per-doc ratio of two exact counts.
    * Nothing pairs up — cost is linear where pairwise near-dup is
    * candidate-bounded. Output per doc: n_fp, n_common, weight (6 dp).
    */
  def commonalityWeights(df: DataFrame, textCol: String, idCol: String,
      gramSize: Int = 3, window: Int = 4, commonDf: Int = 2)
      : DataFrame = {
    val fp = fingerprints(df, textCol, idCol, gramSize, window)
    val freq = fp.groupBy("fp").agg(count(lit(1)).as("df"))
    fp.join(freq, Seq("fp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_fp"),
        sum(when(col("df") >= commonDf, 1L).otherwise(0L)).as("n_common"))
      .select(col(idCol), col("n_fp"), col("n_common"),
        round(lit(1.0) - col("n_common").cast("double")
          / col("n_fp").cast("double"), 6).as("weight"))
  }
}
