package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics specs for the wave-24..26 operators (q249–q260). The
  * oracle gate checks them end-to-end against DuckDB; these pin the
  * local algebra on hand-computable fixtures.
  */
class Wave24to26OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------- HITS
  test("hits: star graph puts all authority on the hub target") {
    // edges 1->10, 2->10, 3->10, 3->11
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L))
      .toDF("src", "dst")
    val r = Graph.hits(e, rounds = 2).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    val scale = 1000000000000L
    // node 10 gathers all three hubs -> max authority; node 11 only
    // hears from hub 3 (score s after round-1 norm) while 10 gathers
    // 3/4 + 3/4 + 1 = 2.5 -> auth(11) = s / 2.5 = 0.4 scale
    assert(r(10L)._2 == scale)
    assert(r(11L)._2 == scale * 2 / 5)
    // hub: node 3 points at both authorities -> max hub
    assert(r(3L)._1 == scale)
    assert(r(1L)._1 == r(2L)._1)
    assert(r(1L)._1 < r(3L)._1)
    // sources have no authority; sinks no hub score
    assert(r(1L)._2 == 0L && r(10L)._1 == 0L)
  }

  // ----------------------------------------------------- Mann-Whitney
  test("mannWhitney: disjoint samples give extreme U and correct n") {
    // a = {1,2,3}, b = {10,20} -> U_a = 0, U_b = 6
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L), ("b", 20L))
      .toDF("g", "v")
    val r = NonParam.mannWhitney(df, "v", "g", "a", "b").collect()(0)
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Double]("u_a") == 0.0)
    assert(r.getAs[Double]("u_b") == 6.0)
    assert(r.getAs[Long]("tie_term") == 0L)
    assert(r.getAs[Double]("z") < 0)
  }

  test("mannWhitney: all-tied input has U = n_a*n_b/2") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L))
      .toDF("g", "v")
    val r = NonParam.mannWhitney(df, "v", "g", "a", "b").collect()(0)
    assert(r.getAs[Double]("u_a") == 2.0 && r.getAs[Double]("u_b") == 2.0)
    // t = 4 tied -> tie_term = 4^3 - 4 = 60; sigma = 0 -> z null
    assert(r.getAs[Long]("tie_term") == 60L)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  // ------------------------------------------------------ Kendall tau
  test("kendallTau: perfect concordance and discordance") {
    val df = Seq(
      ("up", 1L, 1L, 10L), ("up", 2L, 2L, 20L), ("up", 3L, 3L, 30L),
      ("dn", 1L, 1L, 30L), ("dn", 2L, 2L, 20L), ("dn", 3L, 3L, 10L))
      .toDF("g", "id", "x", "y")
    val r = NonParam.kendallTau(df, "g", "x", "y", "id").collect()
      .map(x => x.getString(0) -> x.getAs[Double]("tau")).toMap
    assert(r("up") == 1.0 && r("dn") == -1.0)
  }

  test("kendallTau: ties shrink the denominator (tau-b)") {
    // x = (1,1,2), y = (1,2,3): pairs = 3, tied-x pair = 1, nc = 2
    // tau-b = 2 / sqrt((3-1)*3) = 0.816497
    val df = Seq(("g", 1L, 1L, 1L), ("g", 2L, 1L, 2L), ("g", 3L, 2L, 3L))
      .toDF("g", "id", "x", "y")
    val r = NonParam.kendallTau(df, "g", "x", "y", "id").collect()(0)
    assert(r.getAs[Long]("nc") == 2 && r.getAs[Long]("nd") == 0)
    assert(math.abs(r.getAs[Double]("tau") - 0.816497) < 1e-6)
  }

  // --------------------------------------------------------- log-rank
  test("logRank: identical groups give chi2 ~ 0") {
    val rows = (1 to 20).map(i => (i.toLong % 10 + 1, true,
      if (i <= 10) "a" else "b"))
    val df = rows.toDF("t", "obs", "g")
    val r = Survival.logRank(df, "t", "obs", "g", "a", "b").collect()(0)
    assert(r.getAs[Long]("o_1") == 10 && r.getAs[Long]("o_2") == 10)
    assert(math.abs(r.getAs[Double]("chi2")) < 1e-6)
  }

  // ---------------------------------------------------------- McNemar
  test("mcnemar: only discordant cells count") {
    val df = Seq((true, true), (false, false), (true, false),
      (true, false), (true, false), (false, true))
      .toDF("a", "b")
    val r = Experiment.mcnemar(df, "a", "b").collect()(0)
    assert(r.getAs[Long]("b01") == 3 && r.getAs[Long]("b10") == 1)
    // chi2 = (3-1)^2/4 = 1.0; cc = (|2|-1)^2/4 = 0.25
    assert(r.getAs[Double]("chi2") == 1.0)
    assert(r.getAs[Double]("chi2_cc") == 0.25)
  }

  // -------------------------------------------------------------- CMH
  test("cmh: perfectly balanced strata give chi2 ~ 0") {
    val rows = for {
      s <- Seq("s1", "s2"); e <- Seq(true, false); o <- Seq(true, false)
      _ <- 1 to 5
    } yield (s, e, o)
    val df = rows.toDF("s", "e", "o")
    val r = Hypothesis.cmh(df, "s", "e", "o").collect()(0)
    assert(r.getAs[Long]("n_strata") == 2)
    // each stratum: a = 5, E = 10*10/20 = 5 -> sum (O-E) = 0
    assert(math.abs(r.getAs[Double]("chi2")) < 1e-6)
  }

  // ------------------------------------------------------ t-closeness
  test("tCloseness: class matching the global distribution scores 0") {
    // two classes with identical bucket distributions -> both t = 0
    val rows = for (c <- Seq("x", "y"); b <- 0L to 3L; _ <- 1 to 3)
      yield (c, b)
    val df = rows.toDF("cls", "b")
    val r = graft.ops.ext.Privacy.tCloseness(df, "cls", "b", 4).collect()
    assert(r.forall(_.getAs[Double]("t") == 0.0))
  }

  test("tCloseness: fully skewed class gets the maximal EMD") {
    // class x all in bucket 0, class y all in bucket 3 (k = 4):
    // global is 50/50 split; each class EMD = (0.5*3)/(4-1) = 0.5
    val rows = (1 to 6).map(_ => ("x", 0L)) ++ (1 to 6).map(_ => ("y", 3L))
    val df = rows.toDF("cls", "b")
    val r = graft.ops.ext.Privacy.tCloseness(df, "cls", "b", 4).collect()
      .map(x => x.getString(0) -> x.getAs[Double]("t")).toMap
    assert(r("x") == 0.5 && r("y") == 0.5)
  }

  // ----------------------------------------------------------- ItemCf
  test("itemCf: cosine and ranks on a hand-built basket set") {
    // baskets: {1,2}, {1,2}, {1,3} -> c_1=3, c_2=2, c_3=1
    // co(1,2)=2 -> sim = 2/sqrt(6); co(1,3)=1 -> 1/sqrt(3)
    val df = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L)).toDF("bk", "item")
    val r = graft.ops.ext.ItemCf.topNeighbors(df, "bk", "item", 5, 1L)
      .collect()
      .map(x => (x.getAs[Long]("item"), x.getAs[Long]("neighbor")) ->
        (x.getAs[Long]("rank"), x.getAs[Double]("sim"))).toMap
    assert(r((1L, 2L))._2 == math.floor(2.0 / math.sqrt(6.0) * 1e6 + 0.5) / 1e6
      || math.abs(r((1L, 2L))._2 - 2.0 / math.sqrt(6.0)) < 1e-6)
    assert(r((1L, 2L))._1 == 1) // higher sim than (1,3)
    assert(r((1L, 3L))._1 == 2)
    assert(math.abs(r((3L, 1L))._2 - 1.0 / math.sqrt(3.0)) < 1e-6)
  }

  // ---------------------------------------------------- Durbin-Watson
  test("durbinWatson: a perfect linear series leaves dw of ~0 residuals") {
    // y = 2x + 1 exactly -> residuals 0 -> sse = 0 -> dw NaN/null;
    // add one bump so sse > 0 and the fit stays deterministic
    val rows = Seq(("k", 1L, 3.0), ("k", 2L, 5.0), ("k", 3L, 7.25),
      ("k", 4L, 9.0), ("k", 5L, 11.0))
    val df = rows.toDF("g", "x", "y")
    val r = Trend.durbinWatson(df, "g", "x", "y").collect()(0)
    assert(r.getAs[Long]("n") == 5)
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 0.1)
    val dw = r.getAs[Double]("dw")
    assert(dw > 0.0 && dw < 4.0)
  }

  // ------------------------------------------------- second eigenpair
  test("topTwoEigen: recovers two planted orthogonal axes") {
    // vectors along e0 (strong) and e1 (weaker), tiny noise-free mix
    val rows = (1 to 40).map { i =>
      val v = new Array[Double](8)
      if (i % 4 == 0) { v(1) = 1.0 } else { v(0) = 1.5 }
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val r = graft.ops.ext.Spectral
      .topTwoEigen(df, "embedding", dims = 8, iters = 6)
      .collect().sortBy(_.getAs[Long]("dim"))
    val l1 = r.map(_.getAs[Double]("loading1"))
    val l2 = r.map(_.getAs[Double]("loading2"))
    assert(math.abs(math.abs(l1(0)) - 1.0) < 0.01) // v1 ~ e0
    assert(math.abs(math.abs(l2(1)) - 1.0) < 0.01) // v2 ~ e1
    assert(math.abs(r(0).getAs[Double]("v1_dot_v2")) < 1e-3)
    assert(r(0).getAs[Double]("eig1") > r(0).getAs[Double]("eig2"))
  }
}
