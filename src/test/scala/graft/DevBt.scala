package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the q232 Bradley–Terry pipeline. */
object DevBt {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.expr.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val m = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_partkey").as("part"), col("l_suppkey").as("supp"),
        floor(col("l_extendedprice") / col("l_quantity") * 100.0 + 0.5)
          .cast("long").as("upq"))
      .groupBy("part", "supp").agg(min("upq").as("m")).persist()
    time("m")(m.count())
    val b = m.select(col("part"), col("supp").as("j"), col("m").as("mj"))
    val up = m.join(b, Seq("part")).filter(col("supp") < col("j"))
      .groupBy(col("supp").as("i"), col("j"))
      .agg(sum(when(col("m") < col("mj"), 1L).otherwise(0L)).as("wij"),
        sum(when(col("mj") < col("m"), 1L).otherwise(0L)).as("wji"))
      .persist()
    time("up")(up.count())
    val duels = up.filter(col("wij") > 0)
        .select(col("i"), col("j"), col("wij").as("wins"))
      .unionAll(up.filter(col("wji") > 0)
        .select(col("j").as("i"), col("i").as("j"),
          col("wji").as("wins")))
    time("duels")(duels.count())
    val pairs = duels
      .select(col("i"), col("j"), col("wins").as("w"), col("wins").as("g"))
      .unionAll(duels.select(col("j").as("i"), col("i").as("j"),
        lit(0L).as("w"), col("wins").as("g")))
      .groupBy("i", "j").agg(sum("w").as("w"), sum("g").as("g"))
      .persist()
    time("pairs")(pairs.count())
    val totals = pairs.groupBy("i")
      .agg(sum("w").as("wins"), sum("g").as("games")).persist()
    time("totals")(totals.count())
    var piq = totals.select(col("i"), lit(1000000L).as("piq"))
    val S = 1000000.0
    for (r <- 1 to 3) {
      val opp = piq.select(col("i").as("j"), col("piq").as("pjq"))
      val next = pairs.join(broadcast(piq), "i").join(broadcast(opp), "j")
        .select(col("i"),
          floor(col("g").cast("double") /
            ((col("piq") + col("pjq")).cast("double") / S) * S + 0.5)
            .cast("long").as("tq"))
        .groupBy("i").agg(sum("tq").as("den"))
        .join(broadcast(totals.select(col("i"), col("wins"))), "i")
        .select(col("i"),
          floor(col("wins").cast("double") /
            (col("den").cast("double") / S) * S + 0.5)
            .cast("long").as("piq"))
        .localCheckpoint(true)
      time(s"round$r")(next.count())
      piq = next
    }
    spark.stop()
  }
}
