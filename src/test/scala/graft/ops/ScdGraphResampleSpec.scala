package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("type2 chains intervals per key, latest row open") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val log = Seq((1L, ts(1), 10L, "a"), (1L, ts(3), 11L, "b"),
      (1L, ts(3), 12L, "c"), (2L, ts(2), 20L, "x"))
      .toDF("k", "ts", "id", "v")
    val got = Scd.type2(log, "k", "ts", "id", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), Option(r.getTimestamp(4)), r.getBoolean(5))).toSet
    assert(got == Set(
      (1L, ts(1), 10L, "a", Some(ts(3)), false),
      // simultaneous changes: tie-broken by id, earlier gets the
      // zero-length interval, later carries on
      (1L, ts(3), 11L, "b", Some(ts(3)), false),
      (1L, ts(3), 12L, "c", None, true),
      (2L, ts(2), 20L, "x", None, true)))
  }
}

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageRank: hand-computed integer ranks on a 3-node star") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    val got = Graph.pageRank(edges, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // scale 1e12, n=3, damping 85/100 — every step exact integer math,
    // so these are THE values, not approximations (derivation: r0 =
    // 333333333333 each; three rounds of base 5e10 + 85*contrib div 100)
    assert(got == Map(1L -> 580541666666L, 2L -> 209729166666L,
      3L -> 209729166666L))
  }

  test("pageRank mass stays below scale and symmetric pairs tie") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L) && got(1L) == 500000000000L)
  }
}

class ResampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hourly grid covers min..max and forward-fills gaps") {
    def ts(h: Int, m: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val ev = Seq(
      (1L, ts(0, 5), 1L, Some(1.0)), (1L, ts(0, 50), 2L, Some(2.0)),
      (1L, ts(1, 10), 3L, None), // null observation: bucket stays empty
      (1L, ts(3, 0), 4L, Some(4.0)),
      (2L, ts(2, 0), 5L, None))  // key with NO non-null values at all
      .toDF("k", "ts", "id", "v")
    val got = Resample.hourlyFfill(ev, "k", "ts", "v", "id")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(got == Set(
      (1L, ts(0), Some(2.0)), // max_by id in bucket, not first/avg
      (1L, ts(1), Some(2.0)), // gap forward-filled
      (1L, ts(2), Some(2.0)), // empty hour forward-filled
      (1L, ts(3), Some(4.0)),
      (2L, ts(2), None)))     // nothing to fill from: stays null
  }
}
