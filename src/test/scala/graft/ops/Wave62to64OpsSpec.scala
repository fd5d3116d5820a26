package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checkable fixtures for the wave 62–64 operators — beside the
  * DuckDB oracle gate (engine equivalence) these pin textbook
  * correctness on cases small enough to verify on paper.
  */
class Wave62to64OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("naiveBayesConfusion: separable two-class corpus is diagonal") {
    // even ids train, odd ids score; token vocabularies are disjoint so
    // the count-table argmax is unambiguous
    val docs = Seq(
      (0L, "cat cat cat feline", "A"),
      (2L, "cat feline whiskers", "A"),
      (4L, "dog dog canine bark", "B"),
      (6L, "dog canine growl", "B"),
      (1L, "cat whiskers", "A"),
      (3L, "feline cat cat", "A"),
      (5L, "bark dog", "B")).toDF("doc_id", "text", "lang")
    val out = graft.ops.ext.Classify
      .naiveBayesConfusion(docs, "text", "lang", "doc_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSet == Set(("A", "A", 2L), ("B", "B", 1L)),
      s"expected a diagonal confusion, got ${out.mkString(", ")}")
  }

  test("ridgeClosedForm: lambda=0 recovers an exact linear relation") {
    // y = 2*x1 + 3*x2 + 5 exactly; lambda=0 makes ridge OLS, so the
    // closed form must reproduce the coefficients and r2 = 1
    val rows = Seq((1L, 1L), (2L, 1L), (1L, 2L), (3L, 5L), (4L, 2L), (6L, 3L))
      .map { case (x1, x2) => ("g", x1, x2, 2 * x1 + 3 * x2 + 5) }
    val df = rows.toDF("g", "x1", "x2", "y")
    val r = graft.ops.ext.Classify.ridgeClosedForm(
      df, "g", col("x1"), col("x2"), col("y"), lambda = 0.0).head()
    assert(math.abs(r.getAs[Double]("b1") - 2.0) < 1e-6, r.toString)
    assert(math.abs(r.getAs[Double]("b2") - 3.0) < 1e-6, r.toString)
    assert(math.abs(r.getAs[Double]("intercept") - 5.0) < 1e-6, r.toString)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-6, r.toString)
  }

  test("rocchioConfusion: well-separated clusters transfer diagonally") {
    def vec(hot: Int, v: Double): Array[Float] =
      Array.tabulate(4)(i => if (i == hot) v.toFloat else 0.05f)
    val emb = Seq(
      (0L, vec(0, 1.0), 0), (2L, vec(0, 0.9), 0),   // train label 0
      (4L, vec(1, 1.0), 1), (6L, vec(1, 0.9), 1),   // train label 1
      (1L, vec(0, 0.95), 0), (5L, vec(1, 0.95), 1)) // test
      .toDF("vec_id", "embedding", "label")
    val out = graft.ops.ext.Classify
      .rocchioConfusion(emb, "embedding", "label", "vec_id")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(out.toSet == Set((0, 0, 1L), (1, 1, 1L)),
      s"expected diagonal transfer, got ${out.mkString(", ")}")
  }

  test("ngramExposure: duplicated docs land in decile 9, unique in 0") {
    // 3-token docs yield ONE partial 8-gram shingle each; two identical
    // docs expose every shingle (share 1.0), the unique doc none
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta")).toDF("doc_id", "text")
    val out = graft.ops.ext.TextAnalysis
      .ngramExposure(docs, "text", "doc_id", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((0L, 1L, 0.0), (9L, 2L, 1.0)),
      s"got ${out.mkString(", ")}")
  }

  test("decontaminationCensus: a planted twin is flagged at 0.8") {
    def vec(hot: Int): Array[Float] =
      Array.tabulate(4)(i => if (i == hot) 1.0f else 0.0f)
    // train ids 2,4 (both centroids at centroidEvery=1); eval id 1 is
    // id 2's exact twin -> top1 cosine 1.0 >= 0.8
    val emb = Seq((2L, vec(0)), (4L, vec(1)), (1L, vec(0)))
      .toDF("vec_id", "embedding")
    val out = graft.ops.ext.Similarity.decontaminationCensus(
      emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 === 1),
      "embedding", "vec_id", threshold = 0.8, centroidEvery = 1,
      nprobe = 1).head()
    assert(out.getAs[Long]("n_eval") == 1L)
    assert(out.getAs[Long]("n_train") == 2L)
    assert(out.getAs[Long]("n_flagged") == 1L)
    assert(math.abs(out.getAs[Double]("mean_top1") - 1.0) < 1e-5)
  }
}
