package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness for q243 (not part of the driver contract):
  * times each stage of RecMetrics.listMetrics in isolation at the
  * QS_DIR scale to find the stage that grows superlinearly.
  */
object DevQ243 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("QS_DIR", "/root/repo/benchdata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.expr.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.CoreQueries.T
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s n=$n%10d  ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.catalog.clearCache()
    }
    val inter = T(spark, sfDir, "lineitem")
      .join(T(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(T(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("o_custkey").as("user"), col("l_partkey").as("item"),
        col("p_brand").as("attr"))
    val segments = T(spark, sfDir, "customer")
      .select(col("c_custkey").as("user"), col("c_mktsegment").as("seg"))
    val counts = inter.groupBy("user", "item")
      .agg(count(lit(1)).as("cnt"), min("attr").as("attr"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user")
      .orderBy(col("cnt").desc, col("item"))
    val recs = counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
    t("inter")(inter.count())
    t("counts")(counts.count())
    t("recs(topk)")(recs.count())
    t("perUser(countDistinct)")(
      recs.groupBy("user").agg(countDistinct("attr").as("na")).count())
    t("segItems(countDistinct)")(
      recs.join(segments, "user").groupBy("seg")
        .agg(countDistinct("item")).count())
    t("full q243")(
      SparkEntry.queries("q243_rec_coverage")(spark, sfDir).count())
    // variant: one user-hash shuffle serves both the pair-count agg and
    // the per-user top-k (partitioning on user satisfies (user,item)
    // clustering); brand joins AFTER the k-bounded lists
    val interSlim = T(spark, sfDir, "lineitem")
      .join(T(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("user"), col("l_partkey").as("item"))
    val counts2 = interSlim.repartition(col("user"))
      .groupBy("user", "item").agg(count(lit(1)).as("cnt"))
    val recs2 = counts2.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .join(broadcast(T(spark, sfDir, "part")
        .select(col("p_partkey").as("item"), col("p_brand").as("attr"))),
        "item")
    t("recs2(1-shuffle topk)")(recs2.count())
    t("perUser2")(
      recs2.groupBy("user").agg(countDistinct("attr").as("na")).count())
    spark.stop()
  }
}
