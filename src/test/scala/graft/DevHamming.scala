package graft

import graft.ops.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only diagnostic: distribution of simhash hamming distances among
  * TRUE near-dup pairs (exact jaccard >= 0.8) of the q13/q38 corpus —
  * the empirical basis for the q38 maxHamming recall knob.
  */
object DevHamming {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val toks = filter(split(lower(col("text")), "[^a-z0-9]+"),
      t => length(t) > 0)
    val mutated = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 2, lit(1))))
          .as("text"))
    val corpus = docs.unionByName(mutated)
    // true pairs: min-jaccard verified via minhash with exact dup classes
    val truePairs = Dedup.minhashNearDups(corpus, "text", "doc_id",
      threshold = 0.8, includeExactDuplicates = true)
      .select("id_a", "id_b")
    val fp = Dedup.simhash(corpus, "text", "doc_id")
    val nt = corpus.select(col("doc_id").as("id"),
      size(filter(split(lower(col("text")), "[^a-z0-9]+"),
        t => length(t) > 0)).as("n_toks"))
    val withH = truePairs
      .join(fp.select(col("id").as("id_a"), col("simhash").as("fa")), Seq("id_a"))
      .join(fp.select(col("id").as("id_b"), col("simhash").as("fb")), Seq("id_b"))
      .join(nt.select(col("id").as("id_a"), col("n_toks").as("na")), Seq("id_a"))
      .select(Dedup.hamming(col("fa"), col("fb")).as("h"),
        (floor(col("na") / 25) * 25).as("tok_bucket"))
    withH.groupBy("tok_bucket")
      .agg(count(lit(1)).as("n"), max(col("h")).as("max_h"),
        expr("percentile(h, 0.99)").as("p99_h"))
      .orderBy("tok_bucket").show(40)
    spark.stop()
  }
}
