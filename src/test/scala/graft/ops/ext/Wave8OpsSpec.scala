package graft.ops.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-8 operator units: incremental cross-corpus near-dup, the epoch
  * scheduler's arithmetic, and PQ codebook shape/determinism.
  */
class Wave8OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("minhashNearDupsAcross finds batch→history near-dups, no self pairs") {
    val mk = (i: Int, extra: String) =>
      (1 to 40).map(k => s"tok$k").mkString(" ") + extra
    val history = Seq(
      (1L, mk(1, "")), (2L, (1 to 40).map(k => s"other$k").mkString(" ")))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, mk(1, " tail")),                      // near-dup of doc 1
      (101L, (1 to 40).map(k => s"c$k").mkString(" "))) // novel
      .toDF("doc_id", "text")
    val got = Dedup.minhashNearDupsAcross(history, batch, "text", "doc_id",
        threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L)), s"got $got")
  }

  test("epochSchedule: targets, caps, and repeat factors are exact") {
    // en has 1000 tokens, fr 100; budget = 2x total = 2200;
    // en target = floor(.8*2200) = 1760 (< 4*1000, uncapped);
    // fr target = floor(.2*2200) = 440 -> capped at 4*100 = 400
    val docs = Seq(("en", 600L), ("en", 400L), ("fr", 100L))
      .toDF("lang", "n_tokens")
    val got = Mixture.epochSchedule(docs, "lang", "n_tokens",
        Map("en" -> 0.8, "fr" -> 0.2), budgetMultiplier = 2.0,
        maxEpochs = 4)
      .orderBy("lang")
      .select("lang", "available", "target", "planned", "full_epochs",
        "tail_tokens", "repeat_factor")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("en", 1000L, 1760L, 1760L, 1L, 760L, 1.76),
      ("fr", 100L, 440L, 400L, 4L, 0L, 4.0)), s"got $got")
  }

  test("pqTrain: m subspaces of subDim dims, deterministic across runs") {
    val vecs = (0L until 50L).map { i =>
      (i, (0 until 8).map(d => (i % 7 + d).toDouble / 3.0).toArray)
    }.toDF("id", "vec")
    def run() = KMeans.pqTrain(vecs, "vec", "id", subspaces = 2,
        subDim = 4, centroidEvery = 10, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val a = run()
    assert(a == run(), "PQ training must be deterministic")
    val subspaces = a.map(_._1)
    assert(subspaces == Set(0L, 1L))
    // every (subspace, cid) block carries exactly subDim dims 0..3
    val dims = a.groupBy(t => (t._1, t._2)).values.map(_.map(_._3))
    dims.foreach(d => assert(d == Set(0L, 1L, 2L, 3L), s"dims $d"))
  }
}
