package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only q109 stage profiler. */
object DevProf109 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.expr.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.ext.TextAnalysis
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = ExtQueries.nearDupCorpus(spark, sfDir)
    t("corpus count")(docs.count())
    val withToks = docs.select(col("doc_id").as("id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    val toks = col("toks")
    val ngram = 3
    val terms = when(size(toks) >= ngram,
      transform(sequence(lit(1), size(toks) - (ngram - 1)),
        i => xxhash64((0 until ngram).map(o => element_at(toks, i + o)): _*)))
      .otherwise(array().cast("array<long>"))
    val tf = withToks.select(col("id"), explode(terms).as("th"))
      .groupBy("id", "th").agg(count(lit(1)).as("tf"))
    t("tf count")(println(tf.count()))
    val dfreq = tf.groupBy("th").agg(count(lit(1)).as("dfreq"))
      .filter(col("dfreq") <= 500L)
    val weights = tf.join(dfreq, "th")
      .withColumn("w", round(col("tf").cast("double") *
        log(lit(60001.0) / (col("dfreq") + lit(1.0))), 6))
      .persist()
    t("weights count")(println(weights.count()))
    val a = weights.select(col("th"), col("id").as("id_a"), col("w").as("wa"))
    val b = weights.select(col("th"), col("id").as("id_b"), col("w").as("wb"))
    val pairDot = a.join(b, Seq("th"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum((round(col("wa") * col("wb"), 6))
        .cast(org.apache.spark.sql.types.DecimalType(28, 6))).cast("double").as("dot"))
    t("pairDot count")(println(pairDot.count()))
    t("full q109")(graft.SparkEntry.queries("q109_sparse_cosine")(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
