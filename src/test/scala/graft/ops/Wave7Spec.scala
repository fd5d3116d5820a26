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
