package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics specs for the wave-27..30 operators (q261–q276) on
  * hand-computable fixtures; the oracle gate checks them end-to-end.
  */
class Wave27to30OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------- personalized PR
  test("personalizedPageRank: restart mass only lands on seeds") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r = Graph.personalizedPageRank(e, seeds, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // node 4 has no in-edges and is not a seed -> rank exactly 0
    assert(r(4L) == 0L)
    // the seed keeps the restart floor; everything positive flows from it
    assert(r(1L) > r(2L) && r(2L) > r(3L) && r(3L) > 0L)
  }

  // ---------------------------------------------------------------- BFS
  test("bfsDistances: exact hops on a path graph, -1 beyond the cap") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r = Graph.bfsDistances(e, seeds, maxHops = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 0 && r(2L) == 1 && r(3L) == 2 && r(4L) == 3)
    assert(r(5L) == -1 && r(6L) == -1)
  }

  // ----------------------------------------------------------- FD audit
  test("fdAudit: exact FD scores zero violations; g3 counts the rest") {
    val df = Seq((1L, "x", "m"), (2L, "x", "m"), (3L, "y", "m"),
      (4L, "y", "n")).toDF("id", "a", "b")
    val r = Profile.fdAudit(df, Seq(("id", "a"), ("a", "b")))
      .collect().map(x => x.getString(0) -> x.getAs[Long]("violations"))
      .toMap
    assert(r("id->a") == 0L)
    // a=y maps to {m, n} -> delete 1 row to restore the FD
    assert(r("a->b") == 1L)
  }

  // ------------------------------------------------------- readability
  test("readability: counts and the Flesch chain") {
    val df = Seq((1L, "the cat sat. the dog ran!")).toDF("id", "text")
    val r = graft.ops.ext.TextAnalysis.readability(df, "text").collect()(0)
    assert(r.getAs[Long]("n_sentences") == 2)
    assert(r.getAs[Long]("n_words") == 6)
    // syllable heuristic: vowel-group runs (the=1,cat=1,sat=1,dog=1,ran=1)
    assert(r.getAs[Long]("n_syllables") == 6)
    val f = r.getAs[Double]("flesch")
    assert(f > 100 && f < 130) // short words, short sentences
  }

  // ------------------------------------------------- trailing windows
  test("trailingDistinct: windows accumulate exactly") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "b"), (3L, "c"))
      .toDF("i", "k")
    val r = Rolling.trailingDistinct(df, "i", "k", 2)
      .collect().map(x => x.getLong(0) -> (x.getAs[Long]("n_distinct"),
        x.getAs[Long]("n_daily"))).toMap
    assert(r(1L) == (2L, 2L))         // {a,b}
    assert(r(2L) == (2L, 1L))         // {a,b} from 1 + {b}
    assert(r(3L) == (2L, 1L))         // {b} from 2 + {c}
  }

  test("trailingQuantile: p90 on a known window") {
    val rows = (1L to 10L).map(v => (1L, v))
    val df = rows.toDF("i", "v")
    val r = Rolling.trailingQuantile(df, "i", "v", 1, 9, 10).collect()(0)
    // ceil(0.9*10) = 9 -> the 9th smallest = 9
    assert(r.getAs[Long]("n") == 10 && r.getAs[Long]("p") == 9L)
  }

  // ----------------------------------------------- systematic resample
  test("systematicResample: equal weights select evenly, exactly n draws") {
    val df = (1L to 10L).map(k => (k, 10L)).toDF("k", "wt")
    val r = graft.ops.ext.Sampling.systematicResample(df, "k", "wt", 10)
      .collect().map(x => x.getAs[Long]("draw") -> x.getAs[Long]("k"))
    assert(r.length == 10)
    // with equal weights every item is drawn exactly once, in key order
    assert(r.sortBy(_._1).map(_._2).toSeq == (1L to 10L).toSeq)
  }

  test("systematicResample: a dominant weight takes proportional draws") {
    val df = Seq((1L, 70L), (2L, 20L), (3L, 10L)).toDF("k", "wt")
    val r = graft.ops.ext.Sampling.systematicResample(df, "k", "wt", 10)
      .collect().groupBy(_.getAs[Long]("k")).view.mapValues(_.length).toMap
    assert(r(1L) == 7 && r(2L) == 2 && r(3L) == 1)
  }

  // -------------------------------------------------------- E-S sample
  test("esSample: returns k per stratum, deterministic across reruns") {
    val df = (1L to 100L).map(k => (k, if (k % 2 == 0) "e" else "o",
      k * 10L)).toDF("k", "s", "wt")
    val a = graft.ops.ext.Sampling.esSample(df, "k", "s", "wt", 3)
      .collect().map(r => (r.getString(0), r.getAs[Long]("rank"),
        r.getAs[Long]("key"))).toSet
    val b = graft.ops.ext.Sampling.esSample(
        df.repartition(7), "k", "s", "wt", 3)
      .collect().map(r => (r.getString(0), r.getAs[Long]("rank"),
        r.getAs[Long]("key"))).toSet
    assert(a == b && a.size == 6)
  }

  // --------------------------------------------------------------- RBO
  test("rbo: identical lists score ~1; disjoint lists score 0") {
    val a = (1L to 10L).map(i => (i, i)).toDF("item", "rank")
    val b = (1L to 10L).map(i => (i + 100L, i)).toDF("item", "rank")
    val same = graft.ops.ext.RecMetrics.rbo(a, a, 10, 0.9).collect()(0)
    val diff = graft.ops.ext.RecMetrics.rbo(a, b, 10, 0.9).collect()(0)
    assert(same.getAs[Long]("overlap_at_k") == 10)
    // truncated RBO of identical lists = (1-p) sum p^(d-1) < 1
    val w = graft.ops.ext.RecMetrics.rboWeights(0.9, 10).sum
    assert(math.abs(same.getAs[Double]("rbo") - 0.1 * w) < 1e-5)
    assert(diff.getAs[Double]("rbo") == 0.0)
  }

  // -------------------------------------------------- geometric median
  test("geometricMedian: resists the outlier the mean chases") {
    // 9 points at (1,0), 1 far outlier at (100,0): mean x = 10.9,
    // geometric median stays near 1
    val rows = (1 to 9).map(i => (i.toLong, Seq(1.0, 0.0))) :+
      (10L, Seq(100.0, 0.0))
    val df = rows.toDF("vec_id", "embedding")
    val r = graft.ops.ext.GeoMedian
      .geometricMedian(df, "embedding", "vec_id", 2, 4)
      .collect().map(x => x.getLong(0) -> x.getAs[Double]("coord")).toMap
    assert(r(0L) < 5.0)
    assert(math.abs(r(1L)) < 1e-6)
  }

  // ---------------------------------------------------------------- JSD
  test("jsDivergence: identical corpora diverge by 0; disjoint by ln 2") {
    val df = Seq(("s1", "aa bb cc"), ("s2", "aa bb cc"),
      ("s3", "xx yy zz")).toDF("src", "text")
    val r = graft.ops.ext.TextAnalysis.jsDivergence(df, "text", "src")
      .collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getAs[Double]("jsd"))
      .toMap
    assert(r(("s1", "s2")) == 0.0)
    assert(math.abs(r(("s1", "s3")) - math.log(2.0)) < 1e-6)
  }

  // ------------------------------------------------------- prefix join
  test("prefix-filter jaccard join finds exactly the high-sim pairs") {
    val df = Seq(
      (1L, Seq("a", "b", "c", "d", "e")),
      (2L, Seq("a", "b", "c", "d", "f")),   // jac 4/6 = 0.667 with 1
      (3L, Seq("p", "q", "r", "s", "t")))
      .toDF("doc_id", "toks")
    val r = graft.ops.ext.PrefixJoin
      .jaccardJoin(df, "doc_id", "toks", 3, 5).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("a") == 1L && r(0).getAs[Long]("b") == 2L)
    assert(math.abs(r(0).getAs[Double]("jaccard") - 4.0 / 6.0) < 1e-6)
  }

  // ---------------------------------------------------------- bitmaps
  test("activityHistogram: popcounts and overlap on a tiny log") {
    val df = Seq((1L, 0L, "view"), (1L, 0L, "purchase"), (1L, 1L, "view"),
      (2L, 2L, "view")).toDF("u", "day", "t")
    val r = graft.ops.ext.Bitmaps
      .activityHistogram(df, "u", "day", "t", "view", "purchase")
      .collect()
      .map(x => x.getAs[Long]("active_days") ->
        (x.getAs[Long]("n_users"), x.getAs[Long]("overlap_days"))).toMap
    assert(r(2L) == (1L, 1L)) // user 1: days {0,1}, overlap day 0
    assert(r(1L) == (1L, 0L)) // user 2
  }
}
