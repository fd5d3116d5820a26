package graft.ops

import graft.TestSpark
import graft.ops.ext.{Contrastive, Binning, RecMetrics}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the wave-22 operators: Shapley attribution, hard
  * negatives, monotone binning, and recommendation-list metrics.
  */
class Wave22OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shapley: single decisive channel gets all the credit") {
    // channel 0 alone converts; channels 1,2 never do
    val rows =
      (1L to 10L).map(u => (u, 0, 1L)) ++        // exposed to 0, convert
      (11L to 20L).map(u => (u, 1, 0L)) ++       // exposed to 1, no conv
      (21L to 30L).map(u => (u, 2, 0L))
    val out = Shapley.channelAttribution(rows.toDF("unit", "channel", "conv"),
      c = 3).collect().map(r => r.getAs[Long]("channel") -> r).toMap
    // hand lattice: v({0})=1, v({1})=v({2})=0, unseen → 0.
    // φ₀ = w(0)·(v({0})−v(∅)) = (2/6)·1 = 1/3; the empty channels
    // each "destroy" value next to 0: φ₁ = φ₂ = w(1)·(0 − v({0})) = −1/6
    assert(math.abs(out(0L).getAs[Double]("shapley") - 1.0 / 3) < 1e-5)
    assert(math.abs(out(1L).getAs[Double]("shapley") + 1.0 / 6) < 1e-5)
    assert(math.abs(out(2L).getAs[Double]("shapley") + 1.0 / 6) < 1e-5)
    assert(out(0L).getAs[Long]("n_exposed_units") == 10L)
  }

  test("shapley: efficiency — values sum to v(grand) - v(empty) when " +
      "every unit saw every channel") {
    // all units exposed to both channels; half convert
    val rows = (1L to 8L).flatMap(u =>
      Seq((u, 0, (u % 2)), (u, 1, (u % 2))))
    val out = Shapley.channelAttribution(rows.toDF("unit", "channel", "conv"),
      c = 2).collect()
    val total = out.map(_.getAs[Double]("shapley")).sum
    // only mask 3 observed: v(3)=0.5, all smaller coalitions 0
    assert(math.abs(total - 0.5) < 1e-5)
  }

  test("hardNegatives: planted near-duplicate across labels has " +
      "near-zero margin") {
    val rows = Seq(
      (0L, 1, Array(1.0, 0.0, 0.0)),   // anchor (id%4==0)
      (1L, 1, Array(0.9, 0.1, 0.0)),   // positive
      (2L, 2, Array(0.99, 0.01, 0.0)), // hard negative (nearly anchor)
      (3L, 2, Array(0.0, 1.0, 0.0)))   // easy negative
    val out = Contrastive.hardNegatives(rows.toDF("id", "lab", "v"),
      "id", "lab", "v", col("id") % 4 === 0, kNeg = 2)
      .orderBy("neg_rank").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("neg_id") == 2L)     // hard one ranks first
    assert(out(0).getAs[Double]("margin") < 0.01)  // nearly identical
    assert(out(1).getAs[Double]("margin") > 0.5)   // easy one far
    assert(out(0).getAs[Long]("pos_id") == 1L)
  }

  test("monotoneBins: iso rates are monotone and bins partition buckets") {
    // noisy increasing risk in x with one inversion PAV must pool
    val rows = (0 until 160).map { i =>
      val x = i / 10       // 16 buckets
      val rate = if (x == 7) 9 else x  // inversion at bucket 7
      (i.toLong, if (i % 10 < rate * 10 / 16) 1L else 0L, x.toLong)
    }.map { case (_, y, x) => (x, y) }
    val out = Binning.monotoneBins(rows.toDF("x", "y"), k = 16)
      .orderBy("bin").collect()
    val rates = out.map(_.getAs[Double]("iso_rate"))
    assert(rates.zip(rates.tail).forall { case (a, b) => a <= b })
    // bins tile the bucket range with no gaps
    val spans = out.map(r => (r.getAs[Long]("bucket_lo"),
      r.getAs[Long]("bucket_hi")))
    spans.zip(spans.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(lo2 == hi + 1)
    }
  }

  test("listMetrics: single-brand head collapse scores low diversity, " +
      "high popularity") {
    // every user interacts most with the same 5 items of one brand
    val inter = (1L to 10L).flatMap { u =>
      (1L to 5L).flatMap(i => Seq.fill(3)((u, i, "B1"))) ++
        Seq((u, 100 + u, "B" + u))     // one long-tail item each
    }
    val segs = (1L to 10L).map(u => (u, "S")).toSeq
    val out = RecMetrics.listMetrics(inter.toDF("user", "item", "attr"),
      segs.toDF("user", "seg"), k = 5).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_rec_items") == 5L)       // head collapse
    assert(r.getAs[Double]("mean_diversity") < 0.25) // one brand per list
    assert(r.getAs[Double]("mean_popularity") > 0.6)
  }
}
