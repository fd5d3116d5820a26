package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time the streaming queries after the state-partition knob
  * (state store instances = shuffle partitions at stream start).
  */
object DevStreamTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.expr.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq("q23_stream_hourly", "q33_stateful_stream",
      "q41_stream_dedup", "q49_stream_enrich", "q51_tws_stateful",
      "q60_stream_join", "q75_chained_stateful", "q98_stream_sample")
    for (name <- qs; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name rep=$rep n=$n time=$dt%.2f s")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "32",
        "state-partition knob must restore the session setting")
    }
    spark.stop()
  }
}
