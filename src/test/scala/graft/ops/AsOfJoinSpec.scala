package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val trades = Seq(
    (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 3L, "t0"), (2L, 10L, "t3"))
    .toDF("k", "ts", "trade")
  val quotes = Seq(
    (1L, 5L, 1.0), (1L, 15L, 2.0), (1L, 20L, 3.0), (2L, 50L, 9.0))
    .toDF("k", "ts", "px")

  test("backward as-of picks the latest right row at or before left ts") {
    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "ts",
      Seq("px", "ts"))
      .collect().map(r => r.getString(2) ->
        (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(out("t1") == (Some(1.0), Some(5L)))  // 5 <= 10 < 15
    assert(out("t2") == (Some(3.0), Some(20L))) // equal ts matches
    assert(out("t0") == (None, None))           // nothing at/before 3
    assert(out("t3") == (None, None))           // right all later
  }

  test("left row count is preserved (no fan-out)") {
    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "ts", Seq("px"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == Seq("k", "ts", "trade", "px_right"))
  }
}
