package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: sf0.1 timings for the round-4 queries. */
object DevWave4Time {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.expr.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.queries.Wave4Queries.queries.keys.toSeq.sorted
    for (name <- qs) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name n=$n time=$dt%.2f s")
    }
    spark.stop()
  }
}
