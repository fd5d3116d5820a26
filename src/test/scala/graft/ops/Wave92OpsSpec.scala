package graft.ops

import graft.TestSpark
import graft.io.Layout
import graft.ops.ext.{Linkage, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-92 operator semantics: Hilbert key, Fellegi–Sunter, coreset. */
class Wave92OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------ hilbertKey

  test("hilbertKey is a bijection on the 4x4 grid with unit steps") {
    val cells = (for (x <- 0 to 3; y <- 0 to 3) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val d = cells.select(col("x"), col("y"),
        Layout.hilbertKey(col("x"), col("y"), bits = 2).as("d"))
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
      .toMap
    // every key 0..15 hit exactly once
    assert(d.keySet == (0L to 15L).toSet)
    // the defining Hilbert property: consecutive keys are grid-adjacent
    for (i <- 0L to 14L) {
      val (x1, y1) = d(i); val (x2, y2) = d(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between d=$i ($x1,$y1) and d=${i + 1} ($x2,$y2)")
    }
    // the canonical first quadrant walk starts at the origin
    assert(d(0L) == (0L, 0L))
  }

  test("HilbertKey kernel: full 8-bit bijection with unit steps") {
    val n = 256
    val pos = new Array[(Int, Int)](n * n)
    for (x <- 0 until n; y <- 0 until n) {
      val d = graft.expr.HilbertKey.compute(x.toLong, y.toLong, 8).toInt
      assert(pos(d) == null, s"key $d hit twice")
      pos(d) = (x, y)
    }
    for (i <- 0 until n * n - 1) {
      val (x1, y1) = pos(i); val (x2, y2) = pos(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between d=$i and d=${i + 1}")
    }
  }

  // --------------------------------------------------------- fellegiSunter

  test("fellegiSunter weights separate strong and weak evidence") {
    // 2 matches (both agree on a; one disagrees on b) + 6 non-matches
    // (none agree on a; half agree on b): a is a strong identifier,
    // b is weak noise
    val pairs = Seq(
      (true, true, true), (true, false, true),
      (false, true, false), (false, false, false),
      (false, true, false), (false, false, false),
      (false, true, false), (false, false, false)
    ).toDF("agree_a", "agree_b", "is_match")
    val out = Linkage.fellegiSunter(pairs, "is_match",
      Seq("agree_a", "agree_b"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(5))).toMap
    // pattern counts
    assert(out((true, true))._1 == 1 && out((true, true))._2 == 1)
    assert(out((false, true))._1 == 3 && out((false, true))._2 == 0)
    // m_a = 3/4, u_a = 1/8; m_b = 2/4, u_b = 4/8 (Laplace-smoothed)
    // agreeing on the strong field must outweigh anything b says
    assert(out((true, true))._3 > 0 && out((true, false))._3 > 0)
    assert(out((false, true))._3 < 0 && out((false, false))._3 < 0)
    // b carries zero evidence after smoothing (m_b == u_b): flipping b
    // with a fixed must not change the score
    assert(math.abs(out((true, true))._3 - out((true, false))._3) < 1e-9)
  }

  // ---------------------------------------------------- sensitivityCoreset

  test("sensitivityCoreset draws exactly nDraws copies, outliers in") {
    // ids 0/50 are prototypes; 1..4 sit on top of proto 0 (near-zero
    // sensitivity), id 99 is a far outlier (max sensitivity)
    def v(x: Double, y: Double) = Seq(x, y)
    val emb = Seq(
      0L -> v(1, 0), 1L -> v(1, 0.001), 2L -> v(1, -0.001),
      3L -> v(1, 0.002), 4L -> v(1, -0.002),
      50L -> v(0, 1), 51L -> v(0.001, 1),
      99L -> v(-1, -1)
    ).toDF("vec_id", "embedding")
    val out = Sampling.sensitivityCoreset(emb, "embedding", "vec_id",
      centroidEvery = 50, nDraws = 16).collect()
    assert(out.map(_.getLong(3)).sum == 16L)
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // the far outlier dominates the mass — it must be drawn, repeatedly
    assert(byId.contains(99L) && byId(99L)._3 > 1)
    assert(byId(99L)._1 == 50L || byId(99L)._1 == 0L)
    // weights are inverse-probability: heavier sensitivity -> smaller
    val w99 = byId(99L)._4
    byId.filterNot(_._1 == 99L).values.foreach { case (_, _, _, w) =>
      assert(w >= w99)
    }
  }
}
