package graft.ops

import graft.TestSpark
import graft.ops.ext.{Eval, Winnow}
import org.scalatest.funsuite.AnyFunSuite

/** Wave-93 operator semantics: average precision, soft-dedup weights. */
class Wave93OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("averagePrecision matches the hand-computed ranking") {
    // group g: ranks by score desc -> ids 1(rel),2,3(rel),4
    // AP = (1/1 + 2/3) / 2 = 0.833333
    // group h: no relevant docs -> ap = 0
    val scored = Seq(
      ("g", 1L, 4.0, true), ("g", 2L, 3.0, false),
      ("g", 3L, 2.0, true), ("g", 4L, 1.0, false),
      ("h", 5L, 9.0, false), ("h", 6L, 8.0, false)
    ).toDF("q", "id", "score", "rel")
    val out = Eval.averagePrecision(scored, "q", "score", "id", "rel")
      .orderBy("q").collect()
    assert(out(0).getLong(1) == 4L && out(0).getLong(2) == 2L)
    assert(out(0).getDouble(3) == 0.833333)
    assert(out(1).getLong(2) == 0L && out(1).getDouble(3) == 0.0)
    // ties broken by id: equal scores, relevant doc with LOWER id
    // ranks first -> AP = 1.0
    val tied = Seq(("t", 1L, 5.0, true), ("t", 2L, 5.0, false))
      .toDF("q", "id", "score", "rel")
    val tr = Eval.averagePrecision(tied, "q", "score", "id", "rel")
      .collect()(0)
    assert(tr.getDouble(3) == 1.0)
  }

  test("commonalityWeights: duplicated text down-weighted, unique kept") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, shared), (2L, shared),
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val out = Winnow.commonalityWeights(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // the two identical docs share every fingerprint -> weight 0
    assert(byId(1L)._2 == byId(1L)._1 && byId(1L)._3 == 0.0)
    assert(byId(2L)._3 == 0.0)
    // the unique doc shares none -> weight 1
    assert(byId(3L)._2 == 0L && byId(3L)._3 == 1.0)
  }
}
