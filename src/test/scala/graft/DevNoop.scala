package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: run the QS queries through the Bench-style noop write. */
object DevNoop {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.expr.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- sys.env.getOrElse("QS", "q290_haar_energy").split(",")) {
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(s"$name OK")
      } catch {
        case e: Throwable =>
          println(s"$name FAILED: ${e.getMessage}")
          e.printStackTrace()
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
