package graft

import graft.ops.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: q38 stage timing — corpus+fingerprint vs candidates vs full. */
object DevSimhashProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
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
      .filter(size(filter(split(lower(col("text")), "[^a-z0-9]+"),
        t => length(t) > 0)) >= 50)
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (_ <- 1 to 2) {
      time("fingerprint-only")(
        Dedup.simhash(corpus, "text", "doc_id")
          .write.format("noop").mode("overwrite").save())
      time("candidates")(
        Dedup.simhashNearDups(corpus, "text", "doc_id", 7, 8)
          .write.format("noop").mode("overwrite").save())
      val sh = corpus.select(col("doc_id").as("id"),
        Dedup.shingles(col("text"), 3).as("sh")).persist()
      time("shingle-materialize")(sh.write.format("noop").mode("overwrite").save())
      sh.unpersist(true)
      time("full-verified")(
        Dedup.simhashNearDupsVerified(corpus, "text", "doc_id")
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
