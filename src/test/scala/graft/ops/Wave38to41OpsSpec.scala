package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-built fixtures for the round-5 wave 38–41 operators — each
  * checks a case small enough to verify on paper, complementing the
  * DuckDB oracle gate (which checks engine equivalence, not
  * textbook correctness).
  */
class Wave38to41OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("grubbs: pins the planted outlier with the right G") {
    // values 10,10,10,10,50 -> mean 18, sd = sqrt((5*2900-90^2)/20)=sqrt(320)
    val df = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L),
      ("a", 4L, 10L), ("a", 5L, 50L)).toDF("g", "id", "v")
    val r = Hypothesis.grubbs(df, "g", "v", "id").head()
    assert(r.getAs[Long]("outlier_id") == 5L)
    assert(r.getAs[Long]("outlier_val") == 50L)
    val expected = (50.0 - 18.0) / math.sqrt((5.0 * 2900 - 8100) / 20.0)
    assert(math.abs(r.getAs[Double]("g_stat") - expected) < 1e-6)
  }

  test("cohensD: equal-variance two-group textbook case") {
    // arm1: 4,6 (m=5); arm0: 0,2 (m=1); pooled sd = sqrt((2+2)/2)=sqrt(2)
    val df = Seq(("g", true, 4L), ("g", true, 6L),
      ("g", false, 0L), ("g", false, 2L)).toDF("k", "arm", "v")
    val r = Hypothesis.cohensD(df, "k", col("arm"), "v").head()
    val d = 4.0 / math.sqrt(2.0)
    assert(math.abs(r.getAs[Double]("d") - math.rint(d * 1e6) / 1e6) < 1e-9)
    val g = d * (1.0 - 3.0 / (4.0 * 4 - 9.0))
    assert(math.abs(r.getAs[Double]("hedges_g") - math.rint(g * 1e6) / 1e6)
      < 1e-9)
  }

  test("brownForsythe: identical spreads give F ~ 0") {
    // two groups, same |dev| structure around their medians
    val rows = for (g <- Seq("a", "b"); i <- 1 to 9)
      yield (g, i.toLong + (if (g == "b") 100 else 0), 1000L * i)
    val r = Hypothesis.brownForsythe(rows.toDF("g", "id", "v"),
      "g", "v", "id").head()
    assert(r.getAs[Double]("f") < 1e-6)
  }

  test("chowTest: a real slope break yields a large F") {
    // flat then steep, with ±1 noise so per-segment SSR > 0 (a perfect
    // fit makes F undefined → null by design, asserted below)
    val rows = (1 to 20).map(t =>
      ("k", t.toLong, (t % 2) + (if (t <= 10) 10L else 10L + 50L * (t - 10))))
    val f = Trend.chowTest(rows.toDF("g", "t", "v"), "g", "t", "v")
      .head().getAs[Double]("f")
    assert(f > 10.0, s"expected a strong break, got F=$f")
    // perfectly-fit segments: F is null, not a crash
    val perfect = (1 to 20).map(t =>
      ("k", t.toLong, if (t <= 10) 10L else 10L + 50L * (t - 10)))
    val r = Trend.chowTest(perfect.toDF("g", "t", "v"), "g", "t", "v").head()
    assert(r.isNullAt(r.fieldIndex("f")))
  }

  test("maxDrawdown: drop from the running peak, trough pinned") {
    val df = Seq(("k", 1L, 100L), ("k", 2L, 150L), ("k", 3L, 40L),
      ("k", 4L, 120L), ("k", 5L, 30L)).toDF("g", "t", "v")
    val r = Trend.maxDrawdown(df, "g", "t", "v").head()
    assert(r.getAs[Long]("max_drawdown") == 120L) // 150 -> 30
    assert(r.getAs[Long]("trough_t") == 5L)
  }

  test("hurstRs: alternating series reads anti-persistent (H < 0.5)") {
    val rows = (1 to 64).map(t => ("k", t.toLong,
      if (t % 2 == 0) 100L else 0L))
    val h = Trend.hurstRs(rows.toDF("g", "t", "v"), "g", "t", "v")
      .head().getAs[Double]("hurst")
    assert(h < 0.35, s"alternating series should be anti-persistent: $h")
  }

  test("hurstRs: monotone ramp reads persistent (H near 1)") {
    val rows = (1 to 64).map(t => ("k", t.toLong, 10L * t))
    val h = Trend.hurstRs(rows.toDF("g", "t", "v"), "g", "t", "v")
      .head().getAs[Double]("hurst")
    assert(h > 0.8, s"ramp should be strongly persistent: $h")
  }

  test("periodogram: pure 4-cycle concentrates power at its period") {
    val rows = (0 until 32).map(t => ("k", t.toLong,
      if (t % 4 < 2) 1500L else 500L))
    val out = Trend.periodogram(rows.toDF("g", "t", "v"), "g", "t", "v",
        Seq(4, 7)).collect().map(r =>
      r.getAs[Long]("period") -> r.getAs[Double]("power")).toMap
    assert(out(4L) > 10 * out(7L),
      s"power at the true period should dominate: $out")
  }

  test("saxMotifs: constant-up pattern yields one dominant word") {
    val rows = (1 to 30).map(t => ("k", t.toLong,
      (t % 4).toLong * 100L))
    val top = Trend.saxMotifs(rows.toDF("g", "t", "v"), "g", "t", "v", 3)
      .filter(col("rank") === 1).head()
    assert(top.getAs[Long]("n_occurrences") >= 5)
  }

  test("jaccardLinkPred: triangle-missing-edge scores highest") {
    // 1-2, 1-3, 2-3 absent? build: hub 0 connects 1,2,3; plus 1-2.
    // candidate (1,3): common {0}; (2,3): common {0}; (1,2) adjacent.
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L)).toDF("src", "dst")
    val out = Graph.jaccardLinkPred(e, maxDeg = 10, topK = 5).collect()
    val pairs = out.map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"))).toSet
    assert(!pairs.contains((1L, 2L)), "existing edge must be excluded")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
  }

  test("richClub: complete graph has phi = 1 below its degree") {
    val nodes = (1L to 5L)
    val e = (for (a <- nodes; b <- nodes if a < b) yield (a, b))
      .toDF("src", "dst")
    val out = Graph.richClub(e, maxK = 5).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n_k"), r.getAs[Double]("phi"))).toMap
    // every node has degree 4: k=3 club = all 5 nodes, fully connected
    assert(out(3L) == ((5L, 1.0)))
    assert(out(4L)._1 == 0L) // nobody has degree > 4
  }

  test("msttr: repeated vocabulary lowers the ratio") {
    val rich = ("r", 1L, (1 to 100).map(i => s"w$i").mkString(" "))
    val poor = ("p", 2L, Seq.fill(100)("w").mkString(" "))
    val out = graft.ops.ext.TextAnalysis.msttr(
        Seq(rich, poor).toDF("g", "id", "text"), "g", "id", "text", 50)
      .collect().map(r => r.getAs[String]("g") ->
        r.getAs[Double]("msttr")).toMap
    assert(out("r") == 1.0)
    assert(out("p") == 0.02) // 1 distinct / 50
  }

  test("rakeKeywords: multiword phrases outscore single words") {
    val docs = Seq(
      (1L, "deep learning is the best and deep learning wins"),
      (2L, "deep learning and nothing else")).toDF("id", "text")
    val out = graft.ops.ext.TextAnalysis.rakeKeywords(docs, "id", "text",
      Seq("is", "the", "and", "else"), k = 5).collect()
      .map(r => r.getAs[String]("phrase") -> r.getAs[Double]("score"))
    // RAKE favors longer phrases: the 3-word run tops, then the pure
    // 2-word phrase; both beat every single word
    assert(out.head._1 == "deep learning wins")
    val m = out.toMap
    assert(m("deep learning") > m("nothing"))
    assert(m("deep learning") > m("best"))
  }
}
