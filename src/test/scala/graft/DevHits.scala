package graft

import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the q249 HITS rounds at sf0.1. */
object DevHits {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .withExtensions(new graft.expr.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](lbl: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$lbl: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val edges = li.select(col("l_suppkey").as("src"),
      (col("l_partkey") + 1000000L).as("dst"))
    val e = edges.distinct().persist()
    t("edges distinct")(e.count())
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    t("nodes")(nodes.count())
    var hub = nodes.withColumn("hub", lit(1000000000000L))
    for (r <- 1 to 2) {
      val rawA = t(s"round $r auth gather")(
        e.join(broadcast(hub.withColumnRenamed("node", "src")), "src")
          .groupBy(col("dst").as("node")).agg(sum("hub").as("auth"))
          .localCheckpoint())
      val mxA = rawA.agg(max(col("auth")).as("mx"))
      val auth = t(s"round $r auth norm")(
        rawA.crossJoin(broadcast(mxA))
          .select(col("node"),
            expr("CAST(auth AS DECIMAL(38,0)) * 1000000000000 div mx")
              .cast("long").as("auth")).localCheckpoint())
      val rawH = t(s"round $r hub gather")(
        e.join(broadcast(auth.withColumnRenamed("node", "dst")), "dst")
          .groupBy(col("src").as("node")).agg(sum("auth").as("hub"))
          .localCheckpoint())
      val mxH = rawH.agg(max(col("hub")).as("mx"))
      hub = t(s"round $r hub norm")(
        rawH.crossJoin(broadcast(mxH))
          .select(col("node"),
            expr("CAST(hub AS DECIMAL(38,0)) * 1000000000000 div mx")
              .cast("long").as("hub")).localCheckpoint())
    }
    val t0 = System.nanoTime()
    val out = graft.ops.Graph.hits(edges, rounds = 2).orderBy("node")
    println("full hits() build: " + ((System.nanoTime()-t0)/1e9) + " s")
    val t1 = System.nanoTime()
    println("n=" + out.count())
    println("full hits() action: " + ((System.nanoTime()-t1)/1e9) + " s")
    spark.stop()
  }
}
