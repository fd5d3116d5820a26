package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parquet file sink with checkpoint matches the batch result") {
    val src = Files.createTempDirectory("sink_src").toString
    val out = Files.createTempDirectory("sink_out").toString + "/t"
    val ckpt = Files.createTempDirectory("sink_ckpt").toString
    (1L to 1000L).map(i => (i, i % 7)).toDF("id", "k")
      .write.mode("overwrite").parquet(src)
    StreamOps.streamToParquet(spark, src, out, ckpt,
      transform = _.filter(col("k") =!= 0).withColumn("dbl", col("id") * 2))
    val got = spark.read.parquet(out)
      .select("id", "k", "dbl").as[(Long, Long, Long)].collect().toSet
    val want = (1L to 1000L).filter(_ % 7 != 0).map(i => (i, i % 7, i * 2)).toSet
    assert(got == want)
    // restart with the same checkpoint: no new data -> no duplicates
    StreamOps.streamToParquet(spark, src, out, ckpt,
      transform = _.filter(col("k") =!= 0).withColumn("dbl", col("id") * 2))
    assert(spark.read.parquet(out).count() == want.size)
  }

  test("streamDistinct over derived keys matches the batch distinct") {
    val src = Files.createTempDirectory("sd_src").toString
    (1L to 300L).map(i => (i, s"k${i % 40}")).toDF("id", "raw")
      .write.mode("overwrite").parquet(src)
    val got = StreamOps.streamDistinct(spark, src,
      df => df.select(upper(col("raw")).as("key")), "sd_test")
      .as[String].collect().toSet
    assert(got == (0 until 40).map(i => s"K$i").toSet)
    // session shuffle partitions restored after the bounded run
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
  }

  test("runningEwma single-batch stream equals the batch array fold") {
    val src = Files.createTempDirectory("ewma_src").toString
    // 3 users x 40 events, ts deliberately written out of order
    val rows = for (u <- 1L to 3L; i <- 0L until 40L)
      yield (u, (40 - i) * 1000L, u * 100 + i, (i % 7).toDouble + u)
    rows.toDF("user_id", "ts", "event_id", "value")
      .write.mode("overwrite").parquet(src)
    val streamed = StreamOps.withStatePartitions(spark, 4) {
      val ds = spark.readStream
        .schema(spark.read.parquet(src).schema).parquet(src)
        .as[Stateful.TimedEvent]
      val q = Stateful.runningEwma(spark, ds, alpha = 0.25)
        .writeStream.outputMode("update")
        .format("memory").queryName("ewma_spec").start()
      try q.processAllAvailable() finally q.stop()
      spark.table("ewma_spec")
        .select("user_id", "n_events", "ewma")
        .as[(Long, Long, Double)].collect().toSet
    }
    val batch = graft.ops.Rolling.ewma(
      spark.read.parquet(src), Seq("user_id"),
      Seq(col("ts"), col("event_id")), "value", alpha = 0.25)
      .select(col("user_id"), col("n_events"), col("ewma"))
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2, t._3)).toSet
    // batch op rounds to 6 dp; round the streamed side identically
    val streamedR = streamed.map(t => (t._1, t._2,
      BigDecimal(t._3).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble))
    assert(streamedR == batch)
  }

  test("compact resizes a many-file table without changing its rows") {
    val in = Files.createTempDirectory("compact_in").toString + "/t"
    val out = Files.createTempDirectory("compact_out").toString + "/t"
    (1L to 5000L).toDF("id").repartition(64)
      .write.mode("overwrite").parquet(in)
    val before = new java.io.File(in).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before == 64)
    graft.io.Layout.compact(spark, in, out, targetBytes = 64L << 10)
    val after = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after < before, s"expected fewer files, got $after")
    assert(spark.read.parquet(out).as[Long].collect().toSet ==
      (1L to 5000L).toSet)
  }

  test("chained dedup -> window agg emits every real window exactly once") {
    val src = Files.createTempDirectory("chain_src").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000)
    // two users, three hours of events, EVERY row duplicated; sentinel
    // at +5h releases the last real window under a 1h watermark
    val rows = for {
      u <- Seq(1L, 2L); m <- Seq(10L, 70L, 130L, 150L); _ <- 1 to 2
    } yield (u, ts(m), 1.0)
    val all = rows :+ ((-1L, ts(300L), 0.0))
    all.toDF("user_id", "ts", "value")
      .write.mode("overwrite").parquet(src)
    val got = StreamOps.streamDedupThenWindow(spark, src, "ts", "user_id",
        dedupCols = Seq("user_id", "ts", "value"), sentinelKey = -1L,
        queryName = "chain_test")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
      .toSet
    // dedup collapses the doubles; hour 2 holds minutes 130 and 150
    val want = Seq(1L, 2L).flatMap(u => Seq(
      (ts(0), u, 1L), (ts(60), u, 1L), (ts(120), u, 2L))).toSet
    assert(got == want)
  }
}
