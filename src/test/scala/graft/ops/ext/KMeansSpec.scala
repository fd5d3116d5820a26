package graft.ops.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two obvious blobs converge to their exact means in 2 rounds") {
    val pts = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(10.0, 10.0)), (4L, Seq(11.0, 10.0)), (5L, Seq(10.0, 11.0)))
    // centroidEvery = 3 -> initial centroids are ids 0 and 3, one per blob
    val got = KMeans.lloyd(pts.toDF("vec_id", "embedding"), "embedding",
      "vec_id", centroidEvery = 3, iters = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == Map(
      (0L, 0L) -> ((3L, 1.0 / 3)), (0L, 1L) -> ((3L, 1.0 / 3)),
      (3L, 0L) -> ((3L, 31.0 / 3)), (3L, 1L) -> ((3L, 31.0 / 3)))
      .map { case (k, (n, m)) => k -> ((n,
        BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)) })
  }

  test("clusters that lose every member disappear") {
    // both initial centroids sit in one blob; everything assigns to the
    // lower id on round 1, centroid 3's cluster vanishes
    val pts = Seq(
      (0L, Seq(0.0, 0.0)), (3L, Seq(0.0, 0.0)),
      (1L, Seq(0.1, 0.0)), (2L, Seq(0.0, 0.1)))
    val cids = KMeans.lloyd(pts.toDF("vec_id", "embedding"), "embedding",
      "vec_id", centroidEvery = 3, iters = 2)
      .select("cid").as[Long].collect().toSet
    assert(cids == Set(0L))
  }

  test("assignment is deterministic across runs") {
    val rng = new scala.util.Random(7)
    val pts = (0L until 60L).map(i => (i, Seq.fill(8)(rng.nextDouble())))
    val df = pts.toDF("vec_id", "embedding")
    val a = KMeans.lloyd(df, "embedding", "vec_id", 20, 2).collect().toSet
    val b = KMeans.lloyd(df, "embedding", "vec_id", 20, 2).collect().toSet
    assert(a == b)
  }
}
