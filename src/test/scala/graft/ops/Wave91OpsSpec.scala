package graft.ops

import graft.TestSpark
import graft.ops.ext.{Eval, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-91 operator semantics: k-truss peel, pass@k, vocab richness. */
class Wave91OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------- trussPeel

  /** K4 on {1,2,3,4} (every edge in 2 triangles — a 4-truss) plus a
    * pendant triangle {4,5,6} and a dangling edge (6,7). A 4-truss
    * peel must keep exactly the K4: the triangle's edges have support
    * 1 < 2 and fall in round 1; the dangling edge has support 0.
    */
  private def k4PlusTail = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (4L, 6L), (5L, 6L),
    (6L, 7L)
  ).toDF("src", "dst")

  test("trussPeel keeps exactly the K4 at k=4") {
    val out = Graph.trussPeel(k4PlusTail, k = 4L, rounds = 3)
      .orderBy("src", "dst").collect()
    assert(out.length == 6)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    // inside K4 every edge sits in both remaining triangles
    assert(out.forall(_.getLong(2) == 2L))
    assert(out.forall(_.getBoolean(3)))
  }

  test("trussPeel at k=3 keeps both triangle components, drops the tail") {
    val out = Graph.trussPeel(k4PlusTail, k = 3L, rounds = 2)
      .orderBy("src", "dst").collect()
    // K4 edges + pendant-triangle edges survive (support >= 1)
    assert(out.length == 9)
    assert(!out.exists(r => r.getLong(0) == 6L && r.getLong(1) == 7L))
  }

  // --------------------------------------------------------------- passAtK

  test("passAtK matches the exact combinatorial value") {
    def comb(n: Int, k: Int): Double =
      if (k > n) 0.0
      else (0 until k).map(i => (n - i).toDouble / (k - i)).product
    val tasks = Seq((1L, 10L, 3L), (2L, 12L, 0L), (3L, 10L, 8L))
      .toDF("task", "n", "c")
    val out = Eval.passAtK(tasks, "n", "c", Seq(1, 5, 10))
      .orderBy("task").collect()
    def expect(n: Int, c: Int, k: Int): Double =
      math.rint((1.0 - comb(n - c, k) / comb(n, k)) * 1e6) / 1e6
    assert(out(0).getDouble(3) == expect(10, 3, 1))
    assert(out(0).getDouble(4) == expect(10, 3, 5))
    // n - c = 7 < 10: some 10-subset must contain a correct sample
    assert(out(0).getDouble(5) == 1.0)
    // c = 0: pass@k = 0 for every k
    assert(out(1).getDouble(3) == 0.0 && out(1).getDouble(5) == 0.0)
    assert(out(2).getDouble(4) == expect(10, 8, 5))
  }

  // --------------------------------------------------------- vocabRichness

  test("vocabRichness computes the Chao1 spectrum exactly") {
    // tokens: a a a b b c d -> N=7 D=4 f1=2 (c,d) f2=1 (b)
    val docs = Seq(("s1", "a a a b"), ("s1", "b c d")).toDF("source", "text")
    val r = TextAnalysis.vocabRichness(docs, "text", "source").collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(1) == 7L && row.getLong(2) == 4L)
    assert(row.getLong(3) == 2L && row.getLong(4) == 1L)
    // chao1 = 4 + 2*1/(2*2) = 4.5
    assert(row.getDouble(5) == 4.5)
    assert(row.getDouble(6) == math.rint(2.0 / 7.0 * 1e6) / 1e6)
    assert(row.getDouble(7) == math.rint((1 - 2.0 / 7.0) * 1e6) / 1e6)
  }
}
