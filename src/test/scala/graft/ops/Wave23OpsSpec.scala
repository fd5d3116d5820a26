package graft.ops

import graft.TestSpark
import graft.ops.ext.FeatureSelect
import graft.streaming.Stateful
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the wave-23 operators: stratified ATE, mRMR, and
  * the leaderboard state fold.
  */
class Wave23OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stratifiedAte: constant within-stratum effect is recovered exactly") {
    // matched pairs: each x value has one treated and one control
    // unit; strata of 20 rows hold 10 whole pairs, so arms are
    // x-balanced within every stratum and the effect recovers exactly
    val units = (1L to 100L).map { u =>
      val x = (u - 1) / 2
      val treated = u % 2 == 1
      (u, treated, x, if (treated) x + 10 else x)
    }
    val out = Experiment.stratifiedAte(
      units.toDF("unit", "treated", "x", "y"), nStrata = 5, scale = 1.0)
      .collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("diff") - 10.0) < 1e-9)
      assert(math.abs(r.getAs[Double]("ate") - 10.0) < 1e-6)
    }
    // ate identical on every row
    assert(out.map(_.getAs[Double]("ate")).toSet.size == 1)
  }

  test("mrmr: a duplicated feature is penalized out of the top picks") {
    // f1 == target (max relevance), f2 == f1 (pure redundancy),
    // f3 independent coin
    val rows = (1L to 200L).map { i =>
      val t = (i % 2).toString
      val f3 = ((i / 2) % 2).toString
      Seq((i, "_target", t), (i, "af1", t), (i, "bf2", t), (i, "cf3", f3))
    }.flatten
    val out = FeatureSelect.mrmr(rows.toDF("row_id", "feature", "value"),
      "_target", k = 3).orderBy("rank").collect()
    assert(out(0).getAs[String]("feature") == "af1") // top relevance, tie→name
    // the duplicate bf2 scores rel − red = 0; the independent cf3
    // scores 0 − 0 = 0 too, ties break by name: bf2 before cf3
    assert(out(0).getAs[Double]("red") == 0.0)
    assert(out(1).getAs[Double]("score") <= out(0).getAs[Double]("score"))
    // redundancy of bf2 vs selected af1 equals its relevance (same col)
    val bf2 = out.find(_.getAs[String]("feature") == "bf2").get
    assert(math.abs(bf2.getAs[Double]("red") - bf2.getAs[Double]("rel"))
      < 1e-6)
  }

  test("updateLeaderboard: totals accumulate across batches, top-k sorted") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    // fold two batches by hand through the pure update function
    val s1 = new TestGroupState[Stateful.LbState]
    val b1 = Iterator(Stateful.ValueEvent("k", 1L, 10L),
      Stateful.ValueEvent("k", 2L, 5L))
    val r1 = Stateful.updateLeaderboard(2)("k", b1, s1).toSeq
    assert(r1.map(r => (r.rank, r.user_id, r.total)) ==
      Seq((1L, 1L, 10L), (2L, 2L, 5L)))
    val b2 = Iterator(Stateful.ValueEvent("k", 2L, 20L),
      Stateful.ValueEvent("k", 3L, 7L))
    val r2 = Stateful.updateLeaderboard(2)("k", b2, s1).toSeq
    assert(r2.map(r => (r.rank, r.user_id, r.total)) ==
      Seq((1L, 2L, 25L), (2L, 1L, 10L)))
    assert(r2.head.version == 4L)
  }
}

/** Minimal in-memory GroupState for exercising update functions. */
class TestGroupState[T] extends org.apache.spark.sql.streaming.GroupState[T] {
  private var v: Option[T] = None
  override def exists: Boolean = v.isDefined
  override def get: T = v.get
  override def getOption: Option[T] = v
  override def update(s: T): Unit = v = Some(s)
  override def remove(): Unit = v = None
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(d: Long): Unit = ()
  override def setTimeoutDuration(d: String): Unit = ()
  override def setTimeoutTimestamp(t: Long): Unit = ()
  override def setTimeoutTimestamp(t: Long, a: String): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date, a: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
