package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checkable fixtures for the wave 42–43 operators. */
class Wave42to43OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("eceMce: perfectly calibrated bins give ece = mce = 0") {
    // bin [0.6,0.7): p=0.65 everywhere, 13/20 positive -> acc=conf=0.65
    val rows = (1 to 20).map(i => (0.65, i <= 13))
    val r = graft.ops.ext.Eval.eceMce(rows.toDF("p", "pos"), "p", "pos")
      .head()
    assert(r.getAs[Double]("ece") == 0.0 && r.getAs[Double]("mce") == 0.0)
  }

  test("eceMce: a fully miscalibrated bin shows its gap") {
    // p=0.95 but nothing positive: gap 0.95 in one bin
    val rows = (1 to 10).map(_ => (0.95, false))
    val r = graft.ops.ext.Eval.eceMce(rows.toDF("p", "pos"), "p", "pos")
      .head()
    assert(r.getAs[Double]("mce") == 0.95)
    assert(r.getAs[Double]("ece") == 0.95)
  }

  test("brierDecomposition: identity brier = rel - res + unc holds") {
    val rows = Seq((0.8, true), (0.8, true), (0.8, false), (0.3, false),
      (0.3, true), (0.1, false), (0.1, false), (0.6, true))
    val r = graft.ops.ext.Eval.brierDecomposition(
      rows.toDF("p", "pos"), "p", "pos").head()
    val id = r.getAs[Double]("reliability") - r.getAs[Double]("resolution") +
      r.getAs[Double]("uncertainty")
    assert(math.abs(r.getAs[Double]("brier") - id) < 1e-4,
      s"Murphy identity broken: $r")
  }

  test("krippendorffAlpha: perfect agreement gives alpha = 1") {
    val rows = (1 to 10).flatMap(u => Seq((u.toLong, "x"), (u.toLong, "x"),
      (u.toLong, if (u % 2 == 0) "x" else "x")))
    val a = graft.ops.ext.Eval.krippendorffAlpha(
      rows.toDF("u", "c"), "u", "c").head().getAs[Double]("alpha")
    assert(a == 1.0)
  }

  test("krippendorffAlpha: known worked example") {
    // Krippendorff's classic: 2 raters, units with values —
    // a simple case verified by hand: units (a,a),(a,b),(b,b),(b,b)
    // n=8, n_a=3, n_b=5; disagreeing units: 1 with qd=2*1e6/(1)=2e6
    // Do/De = (2)*(7)/(64-34)=14/30 -> alpha = 1 - 14/30 = 0.533333
    val rows = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (4L, "b"), (4L, "b"))
    val a = graft.ops.ext.Eval.krippendorffAlpha(
      rows.toDF("u", "c"), "u", "c").head().getAs[Double]("alpha")
    assert(math.abs(a - (1.0 - 14.0 / 30.0)) < 1e-6, s"alpha=$a")
  }

  test("neymanAllocation: allocations sum to the budget exactly") {
    val rows = Seq.tabulate(300)(i =>
      (s"s${i % 3}", (i % 3 match {
        case 0 => 100L + (i % 7)       // low variance
        case 1 => 100L + 40L * (i % 5) // high variance
        case _ => 100L                 // zero variance
      })))
    val out = graft.ops.ext.Sampling.neymanAllocation(
      rows.toDF("g", "v"), "g", "v", budget = 97L).collect()
    assert(out.map(_.getAs[Long]("n_alloc")).sum == 97L)
    val m = out.map(r => r.getAs[String]("stratum") ->
      r.getAs[Long]("n_alloc")).toMap
    assert(m("s1") > m("s0"), "higher variance must draw more budget")
    assert(m("s2") == 0L, "zero-variance stratum needs no samples")
  }

  test("partitionPlan: arithmetic is exact") {
    val df = Seq.fill(1000)("x" * 100).toDF("t")
    val r = graft.ops.Profile.partitionPlan(df, length(col("t")),
      targetBytes = 10000L).head()
    assert(r.getAs[Long]("rows_per_partition") == 100L)
    assert(r.getAs[Long]("n_partitions") == 10L)
  }

  test("dpCountAudit: noise magnitude scales with 1/epsilon") {
    val df = (1 to 100).map(i => s"g${i % 4}").toDF("g")
    val out = graft.ops.ext.Privacy.dpCountAudit(df, "g", Seq(0.1, 10.0))
      .collect()
    val byEps = out.groupBy(_.getAs[Double]("eps"))
      .map { case (e, rs) => e -> rs.map(_.getAs[Double]("abs_err")).sum }
    assert(byEps(0.1) > byEps(10.0),
      s"smaller epsilon must mean more noise: $byEps")
  }
}
