package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checkable fixtures for the wave 45 operators. */
class Wave45OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kleinbergBurst: a clear burst episode is counted") {
    // 20 quiet days at 10, 10 burst days at 40, 10 quiet again
    val rows = (1 to 40).map(t => ("k", t.toLong,
      if (t > 20 && t <= 30) 40L else 10L))
    val r = Trend.kleinbergBurst(rows.toDF("g", "t", "c"), "g", "t", "c")
      .head()
    val bd = r.getAs[Long]("n_burst_days")
    assert(bd >= 9 && bd <= 11, s"expected ~10 burst days, got $bd")
  }

  test("kleinbergBurst: a flat series never bursts") {
    val rows = (1 to 30).map(t => ("k", t.toLong, 10L))
    val r = Trend.kleinbergBurst(rows.toDF("g", "t", "c"), "g", "t", "c")
      .head()
    assert(r.getAs[Long]("n_burst_days") == 0L)
  }

  test("dupRateCurve: rates fall as n grows; all-unique gives 0") {
    val docs = Seq("a b c d", "a b x y", "p q r s").toDF("text")
    val out = graft.ops.ext.TextAnalysis.dupRateCurve(docs, "text", 3)
      .collect().map(r => r.getAs[Long]("n") ->
        r.getAs[Double]("dup_rate")).toMap
    assert(out(1L) > 0.0)      // 'a','b' repeat
    assert(out(3L) == 0.0)     // no 3-gram repeats
    assert(out(1L) >= out(2L) && out(2L) >= out(3L))
  }

  test("sourceCrossEntropy: the corpus-typical source has lowest KL") {
    // source "big" IS most of the corpus; "odd" uses different words
    val docs = (1 to 9).map(i => ("big", "alpha beta gamma delta")) ++
      Seq(("odd", "zeta zeta zeta zeta"))
    val out = graft.ops.ext.TextAnalysis.sourceCrossEntropy(
        docs.toDF("source", "text"), "source", "text")
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Double]("kl")).toMap
    assert(out("odd") > out("big"))
    assert(out("big") < 0.2)
  }

  test("streaming conversion update fn: first view, first later purchase") {
    import graft.streaming.Stateful.{TypedEvent, updateConversion, ConvState}
    // no GroupState harness needed for the pure part: simulate via the
    // sorted-fold contract using a stub state
    val events = Seq(
      TypedEvent(1L, 100L, 1L, "view"),
      TypedEvent(1L, 90L, 2L, "click"),
      TypedEvent(1L, 150L, 3L, "purchase"),
      TypedEvent(1L, 200L, 4L, "purchase"))
    var stored: Option[ConvState] = None
    val state = new org.apache.spark.sql.streaming.GroupState[ConvState] {
      def exists = stored.isDefined
      def get = stored.get
      def getOption = stored
      def update(s: ConvState): Unit = stored = Some(s)
      def remove(): Unit = stored = None
      def hasTimedOut = false
      def setTimeoutDuration(d: Long): Unit = ()
      def setTimeoutDuration(d: String): Unit = ()
      def setTimeoutTimestamp(t: Long): Unit = ()
      def setTimeoutTimestamp(t: Long, additionalDuration: String): Unit = ()
      def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
      def setTimeoutTimestamp(t: java.sql.Date,
        additionalDuration: String): Unit = ()
      def getCurrentWatermarkMs(): Long = 0L
      def getCurrentProcessingTimeMs(): Long = 0L
    }
    val out = updateConversion(1L, events.iterator, state).toSeq
    assert(out.size == 1)
    assert(out.head.purchase_id == 3L && out.head.latency_us == 50L)
    assert(stored.exists(_.converted))
    // a second batch after conversion emits nothing
    val out2 = updateConversion(1L,
      Iterator(TypedEvent(1L, 300L, 5L, "purchase")), state).toSeq
    assert(out2.isEmpty)
  }
}
