package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style invariants for the evaluation/statistics wave —
  * mathematical identities that must hold on ANY input, checked on
  * deterministic pseudo-random frames (LCG-derived, no RNG seeds to
  * drift).
  */
class Wave5PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-random doubles in [0, 1)
  private def u(i: Long): Double =
    ((i * 2654435761L) % 1000003L).toDouble / 1000003.0

  test("rocAuc is invariant under monotone score transforms") {
    import graft.ops.ext.Eval
    val scored = (1L to 200L)
      .map(i => (i, u(i), u(i * 7 + 3) > 0.5)).toDF("id", "score", "pos")
    val a1 = Eval.rocAuc(scored, "score", "pos").collect().head.getDouble(2)
    val mono = scored.withColumn("score", col("score") * 3.0 + 10.0)
    val a2 = Eval.rocAuc(mono, "score", "pos").collect().head.getDouble(2)
    assert(a1 == a2)
    // label flip mirrors AUC around 0.5 (same mid-rank tie structure)
    val flip = scored.withColumn("pos", !col("pos"))
    val a3 = Eval.rocAuc(flip, "score", "pos").collect().head.getDouble(2)
    assert(math.abs(a1 + a3 - 1.0) < 1e-9)
  }

  test("frontier2d output is an antichain that dominates every input") {
    import graft.ops.Skyline
    val pts = (1L to 300L)
      .map(i => (i, (u(i) * 50).toLong, u(i * 13 + 1))).toDF("id", "x", "y")
    val front = Skyline.frontier2d(pts, "x", "y", "id")
      .select("x", "y").as[(Long, Double)].collect()
    def dominates(a: (Long, Double), b: (Long, Double)): Boolean =
      a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)
    // no frontier point dominates another (antichain)
    for (a <- front; b <- front if a != b) assert(!dominates(a, b))
    // every input point is a frontier point or dominated by one
    val all = pts.select("x", "y").as[(Long, Double)].collect()
    for (p <- all)
      assert(front.contains(p) || front.exists(f => dominates(f, p)))
  }

  test("bhAdjust q-values are monotone in p-rank and bounded by 1") {
    import graft.ops.Hypothesis
    val df = (1L to 150L).map(i => (i, u(i * 3 + 1))).toDF("id", "p")
    val r = Hypothesis.bhAdjust(df, "p", "id").orderBy("rank")
      .select("q_value").as[Double].collect()
    assert(r.forall(q => q >= 0.0 && q <= 1.0))
    r.sliding(2).foreach { case Array(a, b) => assert(a <= b); case _ => }
  }

  test("gini is 0 for constants and bounded by 1 - 1/n") {
    import graft.ops.GroupStats
    val df = ((1L to 50L).map(i => ("c", 7L, i)) ++
      (1L to 50L).map(i => ("r", (u(i) * 1000).toLong + 1, i + 100)))
      .toDF("g", "x", "id")
    val m = GroupStats.gini(df, "g", "x", "id").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(m("c") == 0.0)
    assert(m("r") >= 0.0 && m("r") <= 1.0 - 1.0 / 50)
  }

  test("ewma of a constant series is that constant; bounds hold") {
    import graft.ops.Rolling
    val const = (1L to 30L).map(i => (1L, i, i, 42.5)).toDF("k", "ts", "id", "v")
    val r1 = Rolling.ewma(const, Seq("k"), Seq(col("ts"), col("id")), "v",
      alpha = 0.25).collect().head
    assert(r1.getDouble(2) == 42.5)
    // EWMA stays inside [min, max] of the series
    val mixed = (1L to 40L).map(i => (1L, i, i, u(i) * 9.0))
      .toDF("k", "ts", "id", "v")
    val r2 = Rolling.ewma(mixed, Seq("k"), Seq(col("ts"), col("id")), "v",
      alpha = 0.25).collect().head.getDouble(2)
    val vs = (1L to 40L).map(i => u(i) * 9.0)
    assert(r2 >= vs.min - 1e-9 && r2 <= vs.max + 1e-9)
  }

  test("chiSquare is ~0 for an exactly independent contingency table") {
    import graft.ops.Hypothesis
    // counts are an exact outer product: o = [[10,20],[20,40]], so
    // e_ab = ra*cb/n equals o_ab everywhere and the statistic is 0
    val rows = Seq(("x", "u", 10), ("x", "v", 20), ("y", "u", 20),
      ("y", "v", 40)).flatMap { case (a, b, n) => Seq.fill(n)((a, b)) }
    val r = Hypothesis.chiSquare(rows.toDF("a", "b"), "a", "b")
      .collect().head
    assert(math.abs(r.getDouble(0)) < 1e-9)
  }
}
