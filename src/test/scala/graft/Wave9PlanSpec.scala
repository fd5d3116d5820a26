package graft

import graft.streaming.Stateful
import org.apache.spark.sql.streaming.TestGroupState
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape and state-semantics assertions for the round-4 late-wave
  * operators: the CdcChunks expression must stay inside whole-stage
  * codegen with a digest-only shuffle, and the order-free stateful
  * accumulators (moments, latest-wins) must produce IDENTICAL final
  * state under any batch slicing — the property their q193/q213
  * oracles rely on.
  */
class Wave9PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("CdcChunks runs inside whole-stage codegen; shuffle carries digests") {
    val df = SparkEntry.queries("q192_cdc_chunks")(spark, dir)
    df.collect() // finalize the adaptive plan so codegen stages are real
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cdc_chunks"), s"expected cdc_chunks in plan:\n$plan")
    val starredGenerate = """\*\(\d+\) Generate explode\(cdc_chunks""".r
    assert(starredGenerate.findFirstIn(plan).isDefined,
      s"cdc_chunks Generate not codegen'd:\n$plan")
    // every exchange must partition on the digest, never ship chunk text
    assert("Exchange hashpartitioning\\(chunk".r.findFirstIn(plan).isEmpty,
      s"shuffle must not carry chunk text:\n$plan")
  }

  test("frameSample: binary slicing plans with no RDD hop, codegen project") {
    val df = SparkEntry.queries("q205_frame_sample")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("binaryFile") || plan.contains("FileScan"),
      s"expected a binaryFile scan:\n$plan")
    assert(!plan.contains("ExistingRDD"),
      s"frameSample must stay in the DataFrame plan (no RDD hop):\n$plan")
  }

  private def ev(u: Long, t: Long, id: Long, v: Double) =
    Stateful.TimedEvent(u, t, id, v)

  private def runMoments(slices: Seq[Seq[Stateful.TimedEvent]])
      : Stateful.MomentsState = {
    var st: Option[Stateful.MomentsState] = None
    slices.foreach { batch =>
      val gs = TestGroupState.create[Stateful.MomentsState](
        org.apache.spark.api.java.Optional.fromNullable(st.orNull),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
        0L, org.apache.spark.api.java.Optional.empty[Long](),
        hasTimedOut = false)
      Stateful.updateMoments(1L, batch.iterator, gs).toList
      st = Some(gs.get)
    }
    st.get
  }

  test("moments state is identical under any batch slicing and order") {
    val events = (1 to 40).map(i => ev(1L, 100L + i, i.toLong, i * 1.37))
    val whole = runMoments(Seq(events))
    val sliced = runMoments(events.grouped(7).toSeq)
    val shuffled = runMoments(Seq(events.reverse.take(13),
      events.reverse.drop(13)))
    assert(whole == sliced && whole == shuffled)
    assert(whole.n == 40)
  }

  private def runLatest(slices: Seq[Seq[Stateful.TimedEvent]])
      : Stateful.LatestState = {
    var st: Option[Stateful.LatestState] = None
    slices.foreach { batch =>
      val gs = TestGroupState.create[Stateful.LatestState](
        org.apache.spark.api.java.Optional.fromNullable(st.orNull),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
        0L, org.apache.spark.api.java.Optional.empty[Long](),
        hasTimedOut = false)
      Stateful.updateLatest(1L, batch.iterator, gs).toList
      st = Some(gs.get)
    }
    st.get
  }

  test("latest-wins state is identical under any batch slicing and order") {
    val events = (1 to 25).map(i => ev(1L, (i % 7).toLong, i.toLong, i * 0.5))
    val whole = runLatest(Seq(events))
    val sliced = runLatest(events.grouped(4).toSeq)
    val reversed = runLatest(Seq(events.reverse))
    assert(whole == sliced && whole == reversed)
    // max (ts, event_id): ts peaks at 6 (i=6,13,20), max id among those = 20
    assert(whole.ts == 6L && whole.event_id == 20L)
  }

  test("Misra-Gries guarantees hold on a skewed stream") {
    val m = 5
    // 100 of item 1, 50 of item 2, singletons 100..199: N = 250
    val items = Seq.fill(100)(1L) ++ Seq.fill(50)(2L) ++ (100L until 200L)
    val events = items.zipWithIndex.map { case (it, i) =>
      Stateful.KeyedItem("k", it, i.toLong, i.toLong)
    }
    val gs = TestGroupState.create[Stateful.MgState](
      org.apache.spark.api.java.Optional.empty[Stateful.MgState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      0L, org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val out = Stateful.updateMisraGries(m)("k", events.iterator, gs).toList
    val counters = out.map(c => c.item -> c.est).toMap
    val n = items.size
    // retention: any item with true count > N/(m+1) must be present
    assert(counters.contains(1L) && counters.contains(2L))
    // undercount bound: true - est <= N/(m+1); never overcount
    assert(counters(1L) <= 100 && 100 - counters(1L) <= n / (m + 1))
    assert(counters(2L) <= 50 && 50 - counters(2L) <= n / (m + 1))
    assert(counters.size <= m)
  }
}
