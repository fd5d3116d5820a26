package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev-only: stage-by-stage profile of the q109 sparse cosine join. */
object DevSparseProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.expr.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = ExtQueries.nearDupCorpus(spark, sfDir)
    t("corpus count")(docs.count())
    val toks = graft.ops.ext.TextAnalysis.tokens(col("text"))
    val terms = when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => array_join(slice(toks, i, lit(3)), " ")))
      .otherwise(array().cast("array<string>"))
    val tf = docs.select(col("doc_id").as("id"), explode(terms).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    t("tf count")(println(tf.count()))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
      .filter(col("dfreq") <= 100000L)
    val weights = tf.join(dfreq, "term")
      .withColumn("w", round(col("tf").cast("double") *
        log(lit(5500 + 1.0) / (col("dfreq") + lit(1.0))), 6)).persist()
    t("weights count")(println(weights.count()))
    val hashed = weights.select(xxhash64(col("term")).as("th"),
      col("id"), col("w"))
    val a = hashed.select(col("th"), col("id").as("id_a"), col("w").as("wa"))
    val b = hashed.select(col("th"), col("id").as("id_b"), col("w").as("wb"))
    val pairDot = a.join(b, Seq("th"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum((round(col("wa") * col("wb"), 6))
        .cast(DecimalType(28, 6))).cast("double").as("dot"))
    t("pairDot count")(println(pairDot.count()))
    t("full q109")(println(
      graft.SparkEntry.queries("q109_sparse_cosine")(spark, sfDir).count()))
    spark.stop()
  }
}
