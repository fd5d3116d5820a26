package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit suite for the wave-7 inference statistics: ANOVA F, Wilson
  * intervals, Cramér's V, mutual information, Cohen's kappa.
  */
class Wave7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("anovaF: hand-computed two-group F statistic") {
    // groups {1,2,3} and {4,5,6}: means 2/5, grand 3.5; SSB = 2*1.5^2*3
    // = 13.5, SSW = 2+2 = 4; F = (13.5/1)/(4/4) = 13.5
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(4, 5, 6).map(("b", _)))
      .toDF("g", "v").select(col("g"), col("v").cast("double").as("v"))
    val r = Hypothesis.anovaF(df, "g", "v").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((2L, 6L)))
    assert(r.getLong(2) == 1350L) // SSB*100
    assert(r.getLong(3) == 400L)  // SSW*100
    assert(math.abs(r.getDouble(4) - 13.5) < 1e-9)
  }

  test("anovaF: identical groups give F = 0") {
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(1, 2, 3).map(("b", _)))
      .toDF("g", "v").select(col("g"), col("v").cast("double").as("v"))
    val r = Hypothesis.anovaF(df, "g", "v").collect().head
    assert(r.getLong(2) == 0L && r.getDouble(4) == 0.0)
  }

  test("wilson: interval brackets p_hat and stays inside [0,1]") {
    val df = (Seq.fill(90)(("g1", true)) ++ Seq.fill(10)(("g1", false)) ++
      Seq.fill(1)(("g2", true)) ++ Seq.fill(1)(("g2", false)))
      .toDF("g", "ok")
    val rows = Hypothesis.wilson(df.toDF("g", "ok"), "g", col("ok"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val (p1, lo1, hi1) = rows("g1")
    assert(p1 == 0.9 && lo1 < 0.9 && hi1 > 0.9 && hi1 <= 1.0)
    // n=2, p=0.5: the interval is wide but clamped to [0,1]
    val (_, lo2, hi2) = rows("g2")
    assert(lo2 >= 0.0 && hi2 <= 1.0 && hi2 - lo2 > 0.5)
  }

  test("cramersV: perfect association gives V = 1, independence 0") {
    val perfect = (Seq.fill(30)(("x", "u")) ++ Seq.fill(30)(("y", "v")))
      .toDF("a", "b")
    val r1 = Hypothesis.cramersV(perfect, "a", "b").collect().head
    assert(r1.getDouble(3) == 1.0)
    val indep = (for { a <- Seq("x", "y"); b <- Seq("u", "v") }
      yield Seq.fill(15)((a, b))).flatten.toDF("a", "b")
    val r2 = Hypothesis.cramersV(indep, "a", "b").collect().head
    assert(r2.getDouble(0) == 0.0 && r2.getDouble(3) == 0.0)
  }

  test("mutualInfo: identical columns give MI = H, NMI = 1") {
    val df = (Seq.fill(25)("x") ++ Seq.fill(75)("y")).map(v => (v, v))
      .toDF("a", "b")
    val r = Hypothesis.mutualInfo(df, "a", "b").collect().head
    val h = -(0.25 * math.log(0.25) + 0.75 * math.log(0.75))
    assert(math.abs(r.getDouble(1) - h) < 1e-5)  // mi = entropy
    assert(math.abs(r.getDouble(2) - h) < 1e-5)
    assert(r.getDouble(4) == 1.0)                // nmi
  }

  test("mutualInfo: independent columns give MI = 0") {
    val df = (for { a <- Seq("x", "y"); b <- Seq("u", "v") }
      yield Seq.fill(10)((a, b))).flatten.toDF("a", "b")
    val r = Hypothesis.mutualInfo(df, "a", "b").collect().head
    assert(r.getDouble(1) == 0.0)
  }

  test("adamicAdar: path graph predicts the endpoints, skips edges") {
    // a-b-c-d: non-edges (a,c),(b,d) share one deg-2 neighbor each
    // (score 1/ln 2); (a,d) shares none; edges are excluded.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = graft.ops.Graph.adamicAdar(edges, maxDeg = 64L, topK = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getDouble(3)))
    assert(r.map(t => (t._1, t._2)).toSet == Set((1L, 3L), (2L, 4L)))
    r.foreach { t =>
      assert(t._3 == 1L)
      assert(math.abs(t._4 - 1.0 / math.log(2.0)) < 1e-6)
    }
  }

  test("adamicAdar: maxDeg cap drops wedges through hubs") {
    // star: hub 1 connects 2,3,4 (deg 3). With maxDeg=2 no wedge
    // survives (leaf centers have deg 1 -> no pairs).
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    assert(graft.ops.Graph.adamicAdar(edges, maxDeg = 2L, topK = 10)
      .count() == 0L)
  }

  test("meanShiftChangepoint: finds the step in a step series") {
    val df = Seq(("k", 1, 1.0), ("k", 2, 1.0), ("k", 3, 1.0),
      ("k", 4, 5.0), ("k", 5, 5.0), ("k", 6, 5.0))
      .toDF("g", "i", "v")
    val r = graft.ops.Trend.meanShiftChangepoint(df, "g", "i", "v")
      .collect().head
    assert(r.getInt(1) == 3)                 // split after idx 3
    assert((r.getLong(2), r.getLong(3)) == ((3L, 3L)))
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 5.0)
    // gain = (1-5)^2 * 3*3/6 = 24
    assert(math.abs(r.getDouble(6) - 24.0) < 1e-9)
  }

  test("crossCorrelation: lagged copy peaks at its lag") {
    val x = Seq(1.0, 7.0, 2.0, 9.0, 3.0, 8.0, 1.0, 6.0, 2.0, 9.0,
      4.0, 7.0, 2.0, 8.0, 3.0, 9.0)
    // y leads x by 2: y_t = x_{t+2} would peak at... we want
    // y_{t+2} = x_t, i.e. y is x DELAYED by 2.
    val y = Seq(0.0, 0.0) ++ x.dropRight(2)
    val df = x.indices.map(i => (i, x(i), y(i))).toDF("i", "x", "y")
    val r = graft.ops.Trend.crossCorrelation(df, "i", "x", "y", 3)
      .collect().head
    val rs = (0 to 3).map(k => r.getDouble(1 + k))
    // the zero padding + lag-trimmed windows dilute the peak below a
    // textbook 1.0; what matters is that lag 2 dominates every other lag
    assert(rs(2) > 0.7 && rs(2) > rs(0) && rs(2) > rs(1) && rs(2) > rs(3))
  }

  test("cohenKappa: perfect agreement 1, marginal-independent 0") {
    val same = Seq.fill(40)(("h", "h")) ++ Seq.fill(60)(("l", "l"))
    val r1 = Hypothesis.cohenKappa(same.toDF("a", "b"), "a", "b")
      .collect().head
    assert(r1.getDouble(4) == 1.0)
    // agreement exactly at chance: po = pe -> kappa = 0
    val chance = Seq.fill(25)(("h", "h")) ++ Seq.fill(25)(("h", "l")) ++
      Seq.fill(25)(("l", "h")) ++ Seq.fill(25)(("l", "l"))
    val r2 = Hypothesis.cohenKappa(chance.toDF("a", "b"), "a", "b")
      .collect().head
    assert(r2.getDouble(4) == 0.0)
  }
}
