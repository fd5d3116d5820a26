package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage-by-stage timing of q255's ItemCf pipeline at sf1. */
object DevItemCf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("QS_DIR", "/root/repo/benchdata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.expr.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("bk"), col("l_partkey").as("item"))
    val baskets = li.filter(col("bk").isNotNull)
      .groupBy("bk").agg(sort_array(collect_set(col("item"))).as("it"))
      .persist()
    t("baskets")(baskets.count())
    val itemCnt = baskets.select(explode(col("it")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("ci")).persist()
    t("itemCnt")(itemCnt.count())
    val co = baskets
      .select(explode(flatten(transform(col("it"), (x, idx) =>
        transform(slice(col("it"), idx + lit(2), size(col("it"))),
          y => struct(x.as("i"), y.as("j")))))).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("co"))
      .filter(col("co") >= 1L).persist()
    t("co-pairs")(co.count())
    val dim = broadcast(itemCnt)
    val scoredHalf = co
      .join(dim.select(col("item").as("i"), col("ci")), "i")
      .join(dim.select(col("item").as("j"), col("ci").as("cj")), "j")
      .withColumn("sim", round(col("co").cast("double") /
        sqrt((col("ci") * col("cj")).cast("double")), 6))
    val scored = scoredHalf
      .select(col("i").as("item"), col("j").as("neighbor"), col("co"),
        col("sim"))
      .unionByName(scoredHalf.select(col("j").as("item"),
        col("i").as("neighbor"), col("co"), col("sim"))).persist()
    t("scored")(scored.count())
    val ranked = graft.ops.TopK.perGroup(scored, Seq(col("item")),
      Seq(col("sim").desc, col("neighbor")), 5)
    t("topk")(ranked.count())
    val w = org.apache.spark.sql.expressions.Window.partitionBy("item")
      .orderBy(col("sim").desc, col("neighbor"))
    t("window-rank")(scored.withColumn("rank",
      row_number().over(w).cast("long")).filter(col("rank") <= 5).count())

    // alternative: distinct + self-join (no object agg, all codegen)
    val b = li.filter(col("bk").isNotNull).distinct().persist()
    t("alt-distinct")(b.count())
    val co2 = b.as("a").join(b.as("b2"), col("a.bk") === col("b2.bk") &&
        col("a.item") < col("b2.item"))
      .select(col("a.item").as("i"), col("b2.item").as("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("co")).persist()
    t("alt-co-pairs")(co2.count())
    val ic2 = b.groupBy("item").agg(count(lit(1)).as("ci")).persist()
    t("alt-itemCnt")(ic2.count())
    spark.stop()
  }
}
