package graft.ops

import graft.TestSpark
import graft.ops.ext.{LabelSpread, ClusterEval}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the wave-21 operators: label propagation, RANSAC
  * consensus, and the moment-decomposed energy distance.
  */
class Wave21OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("labelSpread: two far blobs propagate their seed labels") {
    // blob A along the x axis, blob B along the y axis — orthogonal
    // directions so cosine separates them cleanly (and no zero vectors)
    val rows = (0 until 12).map { k =>
      val j = (k / 2) * 0.01
      (k.toLong, if (k % 2 == 0) Array(1.0 + j, 0.02)
        else Array(0.02, 1.0 + j))
    }
    val df = rows.toDF("id", "v")
    val edges = LabelSpread.knnEdges(df, "id", "v", k = 3)
    val seeds = Seq((0L, 100), (1L, 200)).toDF("id", "lab")
    val out = LabelSpread.propagate(edges, seeds, rounds = 3).collect()
    // everyone ends up labeled, blobs keep to their seed's label
    assert(out.length == 12)
    out.foreach { r =>
      val id = r.getAs[Long]("id")
      val expected = if (id % 2 == 0) 100 else 200
      assert(r.getAs[Int]("lab") == expected, s"node $id")
    }
  }

  test("labelSpread: knn edges are exactly k per node, no self loops") {
    val rows = (0 until 9).map(k => (k.toLong, Array(k * 1.0, 1.0)))
    val e = LabelSpread.knnEdges(rows.toDF("id", "v"), "id", "v", 4)
      .collect()
    assert(e.length == 9 * 4)
    assert(!e.exists(r => r.getAs[Long]("id") == r.getAs[Long]("nb")))
  }

  test("ivfKnnEdges: finds planted twins, rank-disciplined, no self loops") {
    // 16 base vectors in distinct directions; each id 100+i is a
    // near-identical twin of id i — the twin's cosine is ~1, so the
    // twin MUST land in the same IVF cell (or its probe set) and be
    // that node's rank-1 neighbor, the q17 planted-pair invariant.
    val rows = (0 until 16).flatMap { i =>
      val ang = 0.2 * i
      val v = Array(math.cos(ang), math.sin(ang), 0.3)
      val tw = Array(math.cos(ang) + 1e-6, math.sin(ang), 0.3)
      Seq((i.toLong, v), (100L + i, tw))
    }
    val e = LabelSpread.ivfKnnEdges(rows.toDF("id", "v"), "id", "v", k = 3)
      .collect()
    assert(!e.exists(r => r.getAs[Long]("id") == r.getAs[Long]("nb")))
    val byId = e.groupBy(_.getAs[Long]("id"))
    byId.foreach { case (id, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.toSeq == (1 to ranks.length).toSeq,
        s"node $id ranks must be consecutive from 1: ${ranks.toSeq}")
    }
    (0 until 16).foreach { i =>
      val top = byId(i.toLong).minBy(_.getAs[Int]("rank"))
      assert(top.getAs[Long]("nb") == 100L + i,
        s"node $i rank-1 neighbor must be its planted twin")
    }
  }

  test("ivfKnnEdges: agrees with the exact builder on clustered data") {
    // three tight orthogonal clusters, one centroid landing in each
    // (spacing = ceil(sqrt(18)) = 5; ids 0,5,10,15 are centroids) —
    // probing 2 cells always covers the node's own cluster, so the
    // IVF graph equals the exact brute-force graph.
    val rows = (0 until 18).map { i =>
      val axis = i % 3
      val eps = 0.001 * (i / 3)
      val v = Array(0.01, 0.01, 0.01)
      v(axis) = 1.0 + eps
      (i.toLong, v)
    }
    val df = rows.toDF("id", "v")
    val ivf = LabelSpread.ivfKnnEdges(df, "id", "v", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = LabelSpread.knnEdges(df, "id", "v", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf == exact)
  }

  test("ransacLine: recovers a planted line through noise") {
    // 30 points on y=3x+5 (ids multiple of 7 included in sample);
    // 10 far-off outliers
    val inline = (1L to 30L).map(i => (i * 7, i.toDouble, 3.0 * i + 5.0))
    val noise = (1L to 10L).map(i => (i * 7 + 3, i.toDouble, 500.0 + i))
    val out = Robust.ransacLine((inline ++ noise).toDF("id", "x", "y"),
      "id", sampleMod = 7L, sampleLimit = 10, tol = 0.5, keep = 1)
      .collect()
    assert(out.length == 1)
    assert(math.abs(out.head.getAs[Double]("slope") - 3.0) < 1e-9)
    assert(math.abs(out.head.getAs[Double]("icept") - 5.0) < 1e-9)
    assert(out.head.getAs[Long]("n_inliers") == 30L)
  }

  test("ransacLine: vertical sample pairs are skipped, not divided by") {
    val pts = Seq((7L, 1.0, 1.0), (14L, 1.0, 9.0), (21L, 2.0, 2.0),
      (5L, 3.0, 3.0)).toDF("id", "x", "y")
    val out = Robust.ransacLine(pts, "id", 7L, 10, tol = 0.25, keep = 10)
      .collect()
    // (7,14) shares x=1.0 → only the two sloped candidates remain
    assert(out.length == 2)
  }

  test("energyDistanceMatrix: identical clusters have ~0 energy") {
    val rows = (0 until 20).map(k =>
      (k % 2, Array((k / 2) * 1.0, ((k / 2) % 3) * 2.0)))
    val out = ClusterEval.energyDistanceMatrix(rows.toDF("cl", "v"),
      "cl", "v").collect()
    assert(out.length == 1)
    assert(math.abs(out.head.getAs[Double]("energy")) < 1e-3)
  }

  test("energyDistanceMatrix: separated clusters score high, ordered") {
    // three clusters at distance 0, 10, 100 on one axis
    val rows = (0 until 30).map { k =>
      val cl = k % 3
      val c = if (cl == 0) 0.0 else if (cl == 1) 10.0 else 100.0
      (cl, Array(c + (k / 3) * 0.01, 0.0))
    }
    val out = ClusterEval.energyDistanceMatrix(rows.toDF("cl", "v"),
      "cl", "v").collect()
      .map(r => (r.getAs[Int]("ci"), r.getAs[Int]("cj")) ->
        r.getAs[Double]("energy")).toMap
    assert(out((0, 1)) > 50.0)           // d²≈100 scale
    assert(out((1, 2)) > out((0, 1)))    // 90² > 10²
    assert(out((0, 2)) > out((1, 2)))    // 100² largest
  }
}
