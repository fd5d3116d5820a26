package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics specs for the wave-31..36 operators (q277–q300) on
  * hand-computable fixtures; the oracle gate checks them end-to-end.
  */
class Wave31to36OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("motif: the repeated pattern wins over the distinct window") {
    // series: two identical up-down-up weeks, then a flat-ish tail
    val vals = Seq(1.0, 5.0, 1.0, 5.0, 1.0, 5.0, 1.0,
      1.0, 5.0, 1.0, 5.0, 1.0, 5.0, 1.0, 2.0, 3.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("k", (i + 1).toLong, v) }.toDF("k", "idx", "v")
    val r = Trend.motif(df, "k", "idx", "v", 7).collect()(0)
    // windows 1 and 8 are identical -> z-normalized distance 0
    assert(r.getAs[Long]("start_a") == 1L && r.getAs[Long]("start_b") == 8L)
    assert(r.getAs[Double]("dist") == 0.0)
  }

  test("copulaGrid: perfectly dependent data concentrates the diagonal") {
    val df = (1L to 100L).map(i => (i, i)).toDF("x", "y")
    val r = Hypothesis.copulaGrid(df, "x", "y", 5).collect()
    val diag = r.filter(x => x.getAs[Long]("bx") == x.getAs[Long]("by"))
      .map(_.getAs[Long]("n")).sum
    assert(diag == 100L) // all mass on the diagonal
    assert(r.length == 25)
  }

  test("keySkewAudit: a single hot key dominates") {
    val rows = (1L to 90L).map(_ => 7L) ++ (1L to 10L)
    val df = rows.toDF("k")
    val r = Skew.keySkewAudit(df, "k", 10, 1).collect()(0)
    assert(r.getAs[Long]("n_rows") == 100L)
    assert(r.getAs[Double]("topk_share") >= 0.9)
    assert(r.getAs[Double]("skew_ratio") > 5.0)
  }

  test("alphaBeta: constant series settles at the constant") {
    val df = (1 to 10).map(i => ("k", i.toLong, 5.0)).toDF("k", "i", "v")
    val r = Trend.alphaBeta(df, "k", "i", "v", 0.5, 0.1).collect()(0)
    assert(r.getAs[Double]("x") == 5.0 && r.getAs[Double]("v") == 0.0)
  }

  test("bCubed: perfect clustering scores 1.0") {
    val a = Seq((1L, "c1"), (2L, "c1"), (3L, "c2")).toDF("item", "cluster")
    val t = Seq((1L, "g1"), (2L, "g1"), (3L, "g2")).toDF("item", "gold")
    val r = graft.ops.ext.ClusterEval.bCubed(a, t).collect()(0)
    assert(r.getAs[Double]("b3_precision") == 1.0)
    assert(r.getAs[Double]("b3_recall") == 1.0)
    assert(r.getAs[Double]("b3_f1") == 1.0)
  }

  test("ratioToParent: shares sum to 1 within every parent") {
    val df = Seq(("r1", "n1", 10L), ("r1", "n2", 30L), ("r2", "n3", 60L))
      .toDF("r", "n", "v")
    val rows = GroupStats.ratioToParent(df, Seq("r", "n"), "v").collect()
    val l1 = rows.filter(_.getString(0) == "r").map(_.getAs[Double]("parent_share"))
    assert(math.abs(l1.sum - 1.0) < 1e-9)
    val r1kids = rows.filter(x => x.getString(0) == "n"
      && x.getString(1).startsWith("r1/"))
    assert(math.abs(r1kids.map(_.getAs[Double]("parent_share")).sum - 1.0) < 1e-9)
  }

  test("countSketch: heavy keys estimate near truth, never absent") {
    val rows = (1 to 500).map(_ => 1L) ++ (1L to 50L)
    val df = rows.toDF("k")
    val r = graft.ops.ext.Sketches
      .countSketchEstimate(df, "k", depth = 5, width = 64).collect()
      .map(x => x.getLong(0) -> (x.getAs[Long]("n_true"),
        x.getAs[Long]("cs_estimate"))).toMap
    assert(r(1L)._1 == 501L)
    assert(math.abs(r(1L)._2 - 501L) <= 60L) // heavy key well-estimated
  }

  test("pChart: an extreme day flags out of control") {
    val rows = (1 to 9).flatMap(d =>
      (1 to 100).map(i => (s"d$d", i <= 50))) ++
      (1 to 100).map(i => ("d9x", i <= 99))
    val df = rows.toDF("day", "ok")
    val r = Experiment.pChart(df, "day", "ok").collect()
      .map(x => x.getString(0) -> x.getAs[Boolean]("out_of_control")).toMap
    assert(r("d9x") && !r("d1"))
  }

  test("anisotropy: identical unit vectors give exactly 1") {
    val df = (1L to 20L).map(i => (i, Seq(1.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val r = graft.ops.ext.Similarity
      .anisotropy(df.withColumn("label", lit(1L)), "embedding", "label")
      .collect()(0)
    assert(r.getAs[Double]("anisotropy") == 1.0)
  }

  test("shapeSummary: a fully reciprocal pair counts both edges") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val r = Graph.shapeSummary(e).collect()(0)
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Long]("reciprocal_edges") == 2L)
  }

  test("greedy coverage picks the spanning docs in gain order") {
    val df = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b")),
      (3L, Seq("e", "f", "g")),
      (4L, Seq("e"))).toDF("doc_id", "toks")
    val r = graft.ops.ext.CoverageSelect.greedy(df, "doc_id", "toks", 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r(0) == (1L, 1L, 4L)) // doc 1 covers 4
    assert(r(1) == (2L, 3L, 3L)) // then doc 3 adds 3
    // every element is covered after two picks -> the greedy stops
    assert(r.length == 2)
  }

  test("QTE: a constant shift appears at every quantile") {
    val rows = (1L to 100L).map(v => (false, v)) ++
      (1L to 100L).map(v => (true, v + 10L))
    val df = rows.toDF("arm", "v")
    val r = Experiment.quantileTreatmentEffects(df, "arm", "v",
        Seq((1, 2), (3, 4))).collect()
    assert(r.forall(_.getAs[Long]("qte") == 10L))
  }

  test("trailingOlsSlope: a linear ramp has its own slope everywhere") {
    val df = (1L to 10L).map(i => (i, 3L * i)).toDF("i", "y")
    val r = Rolling.trailingOlsSlope(df, "i", "y", 3).collect()
      .map(x => x.getLong(0) -> x.getAs[Double]("slope")).toMap
    assert(r(5L) == 3.0 && r(10L) == 3.0)
  }

  test("burstiness: a clumped token has higher VMR than a spread one") {
    val docs = Seq(
      (1L, "spread spread clump clump clump clump clump clump"),
      (2L, "spread spread"), (3L, "spread spread"), (4L, "spread spread"))
    val df = docs.toDF("doc_id", "text")
    val r = graft.ops.ext.TextAnalysis.burstiness(df, "text", "doc_id", 5)
      .collect().map(x => x.getString(0) -> x.getAs[Double]("vmr")).toMap
    assert(r("clump") > r("spread"))
  }

  test("interarrivalFit: regular arrivals give mean = the spacing") {
    val df = (0L to 20L).map(i => ("k", i * 10L * 1000000L)).toDF("k", "us")
    val r = Trend.interarrivalFit(df, "k", "us").collect()(0)
    assert(r.getAs[Long]("n_gaps") == 20L)
    assert(r.getAs[Double]("mean_gap_s") == 10.0)
    assert(math.abs(r.getAs[Double]("lambda") - 0.1) < 1e-9)
  }

  test("theilsU: a deterministic mapping gives u(x|y) = 1") {
    // x is a function of y -> knowing y removes all of x's entropy
    val df = Seq(("a", "p"), ("a", "p"), ("b", "q"), ("b", "q"),
      ("c", "r")).toDF("x", "y")
    val r = Hypothesis.theilsU(df, "x", "y").collect()
      .map(x => x.getString(0) -> x.getAs[Double]("u")).toMap
    assert(r("x|y") == 1.0 && r("y|x") == 1.0)
  }

  test("generalizationLadder: coarser buckets only improve coverage") {
    val df = (1L to 100L).map(i => (i % 3, i * 7L)).toDF("g", "y")
    val r = graft.ops.ext.Privacy.generalizationLadder(df, Seq("g"),
        "y", Seq(10L, 100L), k = 5L)
      .collect().sortBy(_.getAs[Long]("level"))
      .map(_.getAs[Double]("coverage"))
    assert(r.sliding(2).forall(p => p(0) <= p(1) + 1e-9))
    assert(r.last == 1.0) // numeric QI dropped -> 3 groups of ~33
  }

  test("dictEstimate: low-cardinality strings compress well") {
    val df = (1L to 1000L).map(i => (if (i % 2 == 0) "AAAA" else "BBBB"))
      .toDF("c")
    val r = Profile.dictEstimate(df, Seq("c")).collect()(0)
    assert(r.getAs[Long]("n_distinct") == 2L)
    assert(r.getAs[Long]("code_bits") == 1L)
    assert(r.getAs[Double]("ratio") < 0.1)
  }
}
