package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfQ349 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.expr.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    for (rep <- 1 to 2) {
      val li = graft.queries.CoreQueries.T(spark, dir, "lineitem")
        .select("l_orderkey", "l_partkey")
      val pc = graft.ops.Graph.coOccurrencePairCounts(li, "l_orderkey", "l_partkey").persist()
      t("paircounts")(pc.count())
      val e3 = pc.filter(col("shared") >= 3L).select("src", "dst")
      t("e3 count")(e3.count())
      val comp = t("cc")(graft.ops.ext.Dedup.connectedComponentsStar(
        e3.select(col("src").as("id_a"), col("dst").as("id_b"))))
      t("cc count")(comp.count())
      val e2 = pc.filter(col("shared") >= 2L).select("src", "dst")
      val nodes = e2.select(col("src").as("node"))
        .unionByName(e2.select(col("dst").as("node"))).distinct()
      val communities = nodes
        .join(comp.withColumnRenamed("id", "node"), Seq("node"), "left")
        .select(col("node"), coalesce(col("component"), col("node")).as("community"))
      t("modularity")(graft.ops.Graph.modularity(e2, communities).count())
      pc.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
