package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form invariants for the graph-structure metrics on graphs
  * whose answers are known exactly (cliques, paths, stars).
  */
class GraphMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clique(n: Int, offset: Long = 0L): Seq[(Long, Long)] =
    for {
      i <- 0 until n; j <- (i + 1) until n
    } yield (offset + i, offset + j)

  test("triangleStats: K5 has C(4,2)=6 triangles per node, clustering 1") {
    val e = clique(5).toDF("src", "dst")
    val r = Graph.triangleStats(e).collect()
    assert(r.length == 5)
    r.foreach { row =>
      assert(row.getLong(1) == 4 && row.getLong(2) == 6 &&
        row.getDouble(3) == 1.0)
    }
  }

  test("triangleStats: a path has no triangles; interior clustering 0") {
    val e = (0L to 5L).sliding(2).map { case Seq(a, b) => (a, b) }
      .toSeq.toDF("src", "dst")
    val r = Graph.triangleStats(e).collect()
    assert(r.forall(_.getLong(2) == 0L))
    assert(r.forall(_.getDouble(3) == 0.0))
  }

  test("triangleStats counts each triangle once regardless of edge orientation") {
    // same K4 given with reversed + duplicate edges
    val e = (clique(4) ++ clique(4).map(_.swap) ++ clique(4))
      .toDF("src", "dst")
    val r = Graph.triangleStats(e).collect()
    r.foreach(row => assert(row.getLong(2) == 3)) // C(3,2)
  }

  test("kCorePeel: pendant chain peels off a clique, core survives") {
    // K6 (nodes 0-5) + chain 5-10-11-12: chain degrees < 3 peel away
    val chain = Seq((5L, 10L), (10L, 11L), (11L, 12L))
    val e = (clique(6) ++ chain).toDF("src", "dst")
    val r = Graph.kCorePeel(e, k = 3L, rounds = 3).collect()
    val nodes = r.map(_.getLong(0)).toSet
    assert(nodes == (0L to 5L).toSet)
    r.foreach { row =>
      assert(row.getLong(1) == 5L && row.getBoolean(2))
    }
  }

  test("degreeAssortativity: star graph is perfectly disassortative") {
    val e = (1L to 8L).map(i => (0L, i)).toDF("src", "dst")
    val r = Graph.degreeAssortativity(e).collect().head
    assert(r.getLong(0) == 8L)
    assert(r.getDouble(1) == -1.0)
  }

  test("coOccurrenceEdges: threshold keeps only pairs sharing enough groups") {
    val df = Seq(
      (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), // (10,20) shares 2
      (3L, 10L), (3L, 30L)                        // (10,30) shares 1
    ).toDF("g", "item")
    val e = Graph.coOccurrenceEdges(df, "g", "item", minShared = 2L)
      .as[(Long, Long)].collect().toSet
    assert(e == Set((10L, 20L)))
  }
}
