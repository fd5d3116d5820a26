package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for seasonal decomposition, LOO target encoding and PSI
  * drift.
  */
class SeasonalEncodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def u(i: Long): Double =
    ((i * 2654435761L) % 1000003L).toDouble / 1000003.0

  test("seasonalDecompose: additive identity holds and a spike is flagged") {
    // noisy weekly pattern with one large spike at idx 17
    val rows = (1L to 28L).map { i =>
      val base = 100.0 + 5.0 * (i % 7) + u(i)
      ("k", i, if (i == 17) base + 500.0 else base)
    }
    val r = Trend.seasonalDecompose(rows.toDF("k", "idx", "v"),
      "k", "idx", "v", period = 7, halfWindow = 3, zThreshold = 2.0)
      .orderBy("idx").collect()
    // v = trend + seasonal + resid up to the 6-dp quantization
    r.foreach { row =>
      val recon = row.getDouble(3) + row.getDouble(4) + row.getDouble(5)
      assert(math.abs(row.getDouble(2) - recon) < 2e-6)
    }
    val flagged = r.filter(_.getBoolean(7)).map(_.getLong(1)).toSet
    assert(flagged.contains(17L))
    assert(flagged.size <= 4) // spike dominates; neighbors may co-flag
  }

  test("looTargetEncode: two-member category swaps values; singleton is null") {
    val df = Seq((1L, "a", 2.0), (2L, "a", 4.0), (3L, "b", 9.0))
      .toDF("id", "cat", "v")
    val r = graft.ops.ext.FeatureEncode.looTargetEncode(df, "cat", "v", "id")
      .collect().map(row => row.getLong(0) ->
        (if (row.isNullAt(2)) None else Some(row.getDouble(2)))).toMap
    assert(r(1L).contains(4.0) && r(2L).contains(2.0) && r(3L).isEmpty)
  }

  test("looTargetEncode satisfies the (c*mean - v)/(c-1) identity") {
    val df = (1L to 50L).map(i => (i, s"c${i % 5}", u(i) * 10))
      .toDF("id", "cat", "v")
    val got = graft.ops.ext.FeatureEncode
      .looTargetEncode(df, "cat", "v", "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byCat = rows.groupBy(_._2)
    for ((id, cat, v) <- rows) {
      val peers = byCat(cat).filter(_._1 != id).map(_._3)
      val want = peers.sum / peers.size
      assert(math.abs(got(id) - want) < 1e-5)
    }
  }

  test("psiDrift: identical left/right distributions give PSI 0") {
    val df = (1L to 200L).map(i => (u(i) * 100, i % 2 == 0))
      .toDF("x", "is_left")
    val r = Profile.psiDrift(df, col("is_left"), "x", buckets = 10)
      .collect()
    assert(r.length == 10)
    // same draws land in both halves? not exactly — build truly equal sides
    val vals = (1L to 100L).map(i => u(i) * 100)
    val eq = (vals.map((_, true)) ++ vals.map((_, false)))
      .toDF("x", "is_left")
    val r2 = Profile.psiDrift(eq, col("is_left"), "x", buckets = 10)
      .collect()
    r2.foreach { row =>
      assert(row.getDouble(7) == 0.0 && row.getDouble(8) == 0.0)
    }
  }
}
