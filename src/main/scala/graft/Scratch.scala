package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.ext.{Dedup, TextAnalysis}

/** Dev scratch main for stage-level profiling (not part of the driver
  * contract; kept out of SparkEntry).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val toks = TextAnalysis.tokens(col("text"))
    val mutated = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 2, lit(1))))
          .as("text"))
    val corpus = docs.unionByName(mutated)

    val sh = corpus.select(col("doc_id").as("id"),
      Dedup.shingles(col("text"), 3).as("sh"))
    time("shingles count")(sh.count())
    val hashed = sh.select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), xxhash64(col("s")).as("h"))
    time("exploded count")(hashed.count())
    val aggs = (0 until 64).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    val sigs = hashed.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    time("sigs")(sigs.write.format("noop").mode("overwrite").save())
    val full = Dedup.minhashNearDups(corpus, "text", "doc_id")
    time("full pipeline")(full.write.format("noop").mode("overwrite").save())
    time("full again")(full.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
