package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only A/B: old (long-form join + pair-row aggregation) vs new
  * (wide codes + per-subspace broadcast LUT joins) PQ-ADC scoring,
  * interleaved in one session so box drift cancels. QS_DIR selects the
  * scale (default sf0.1; benchdata/sf1 is synthesized when absent).
  */
object DevPqAb {
  import graft.ops.ext.{KMeans, PqSearch, Similarity}

  private def adcTopKOld(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, subspaces: Int, subDim: Int,
      centroidEvery: Int, iters: Int, k: Int): DataFrame = {
    val cb = KMeans.pqTrain(corpus, vecCol, idCol, subspaces, subDim,
      centroidEvery, iters)
    val cents = PqSearch.codebookArrays(cb)
    val codes = PqSearch.encode(corpus, vecCol, idCol, cents, subDim,
      subspaces)
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qvec"))
    val lut = q.crossJoin(broadcast(cents))
      .withColumn("subq", slice(col("qvec"),
        (col("subspace") * subDim + 1).cast("int"), lit(subDim)))
      .withColumn("pq",
        floor(Similarity.dot(col("subq"), col("centv")) * 1e6 + 0.5)
          .cast("long"))
      .select(col("query_id"), col("subspace"), col("cid"), col("pq"))
    val scored = codes
      .join(broadcast(lut),
        codes("subspace") === lut("subspace") && codes("code") === lut("cid"))
      .groupBy(col("query_id"), col("corpus_id"))
      .agg(sum(col("pq")).as("adot_micro"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adot_micro").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"),
        col("adot_micro"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("QS_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sfDir.endsWith("benchdata/sf1"))
      BenchData.ensureScaled(spark, "/root/testdata/sf0.1", sfDir, factor = 10)
    val reps = sys.env.getOrElse("REPS", "3").toInt
    def run(tag: String, fn: () => DataFrame): Unit = {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[pqab] $tag time=$dt%.2f s")
    }
    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    for (_ <- 1 to reps) {
      run("old", () => adcTopKOld(emb, emb.filter(col("vec_id") % 50 === 0),
        "embedding", "vec_id", 4, 16, 25, 2, 5).orderBy("query_id", "rank"))
      run("new", () => PqSearch.adcTopK(emb, emb.filter(col("vec_id") % 50 === 0),
        "embedding", "vec_id", 4, 16, 25, 2, 5).orderBy("query_id", "rank"))
    }
    spark.stop()
  }
}
