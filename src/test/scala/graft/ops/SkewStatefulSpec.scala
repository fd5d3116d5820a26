package graft.ops

import graft.TestSpark
import graft.streaming.Stateful
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // heavy-hitter distribution: key "hot" owns 90% of rows
  val skewed = ((1 to 900).map(i => ("hot", i.toDouble)) ++
    (1 to 100).map(i => (s"k${i % 10}", i.toDouble)))
    .toDF("k", "v")

  test("saltedCountSum equals plain groupBy aggregation") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val salted = Skew.saltedCountSum(skewed, Seq("k"), "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(salted == plain)
  }

  test("salt is deterministic across evaluations") {
    val s1 = skewed.select(Skew.rowSalt(skewed, 16)).collect().map(_.getLong(0))
    val s2 = skewed.select(Skew.rowSalt(skewed, 16)).collect().map(_.getLong(0))
    assert(s1.toSeq == s2.toSeq)
    assert(s1.forall(s => s >= 0 && s < 16))
  }

  test("saltedCountDistinct is exact") {
    val got = Skew.saltedCountDistinct(skewed, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("hot") == 900)
  }
}

class StatefulSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("batch twin computes running per-user stats") {
    val events = Seq(
      Stateful.Event(1L, 2.0), Stateful.Event(1L, 5.0),
      Stateful.Event(2L, 1.0)).toDS()
    val stats = Stateful.runningUserStatsBatch(spark, events)
      .collect().map(s => s.user_id -> s).toMap
    assert(stats(1L).n_events == 2 && stats(1L).total == 7.0
      && stats(1L).max_value == 5.0)
    assert(stats(2L).n_events == 1)
  }

  test("flatMapGroupsWithState accumulates across micro-batches") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-state").toString
    Seq(Stateful.Event(1L, 2.0), Stateful.Event(1L, 3.0),
      Stateful.Event(2L, 10.0)).toDS()
      .write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .parquet(dir).as[Stateful.Event]
    val q = Stateful.runningUserStats(spark, src)
      .writeStream.outputMode("update")
      .format("memory").queryName("stateful_test").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("stateful_test").as[Stateful.Stat]
      .collect().map(s => s.user_id -> s).toMap
    assert(out(1L).n_events == 2 && out(1L).total == 5.0)
    assert(out(2L).max_value == 10.0)
  }
}
