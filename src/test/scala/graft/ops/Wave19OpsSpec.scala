package graft.ops

import graft.TestSpark
import graft.ops.ext.{Factorize, Preference, FeatureEncode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the wave-19 model-adjacent operators: rank-1 ALS,
  * CUPED, Bradley–Terry, and WoE/IV.
  */
class Wave19OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rank1Als: an exactly rank-1 integer matrix is recovered exactly") {
    // r(u, i) = a_u * b_i with integer factors → rank-1 ALS should
    // reproduce every rating (predq/1e12 == r) regardless of init
    val a = Map(1L -> 2L, 2L -> 3L, 3L -> 5L)
    val b = Map(10L -> 1L, 20L -> 4L, 30L -> 7L)
    val rows = for { (u, au) <- a.toSeq; (i, bi) <- b.toSeq }
      yield (u, i, au * bi)
    val out = Factorize.rank1Als(rows.toDF("cust", "item", "r"),
      "cust", "item", rounds = 1).collect()
    assert(out.length == 9)
    out.foreach { row =>
      val r = row.getAs[Long]("r").toDouble
      val pred = row.getAs[Long]("predq").toDouble / 1e12
      assert(math.abs(pred - r) < 1e-4, s"pred $pred vs r $r")
    }
  }

  test("rank1Als: factors are deterministic across evaluations") {
    val rows = Seq((1L, 10L, 4L), (1L, 20L, 8L), (2L, 10L, 6L),
      (2L, 30L, 3L), (3L, 20L, 9L))
    val df = rows.toDF("cust", "item", "r")
    val x = Factorize.rank1Als(df, "cust", "item").orderBy("cust", "item")
      .collect().map(_.getAs[Long]("predq")).toSeq
    val y = Factorize.rank1Als(df, "cust", "item").orderBy("cust", "item")
      .collect().map(_.getAs[Long]("predq")).toSeq
    assert(x == y)
  }

  test("cuped: y perfectly proportional to x collapses variance to ~0") {
    // y = 3x → theta = 3, adjusted metric is constant, reduction → 1
    val units = (1L to 40L)
      .map(i => (i % 2, i * 10, i * 30))
      .toDF("arm", "x", "y")
    val r = Experiment.cuped(units, "arm", scale = 1.0)
      .orderBy("arm").collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(math.abs(row.getAs[Double]("theta") - 3.0) < 1e-9)
      assert(row.getAs[Double]("var_reduction") > 0.999999)
    }
    // both arms adjust to the same grand mean
    val adj = r.map(_.getAs[Double]("mean_cuped"))
    assert(math.abs(adj(0) - adj(1)) < 1e-6)
  }

  test("cuped: x independent of y leaves means nearly untouched") {
    // x has period-4 structure, y period-2, chosen so cov(x,y) = 0
    // exactly; theta = 0 and the adjustment is a no-op
    val units = (1L to 40L)
      .map(i => (i % 2, if (i % 4 < 2) 0L else 100L,
        if (i % 2 == 0) 40L else 60L))
      .toDF("arm", "x", "y")
    val r = Experiment.cuped(units, "arm", scale = 1.0)
      .orderBy("arm").collect()
    r.foreach { row =>
      assert(math.abs(row.getAs[Double]("mean_raw")
        - row.getAs[Double]("mean_cuped")) < 1e-6)
    }
  }

  test("bradleyTerry: a player who wins every duel ranks strongest") {
    // 1 beats 2 five times, 2 beats 3 five times, 1 beats 3 five times
    val duels = Seq((1L, 2L, 5L), (2L, 3L, 5L), (1L, 3L, 5L))
      .toDF("i", "j", "wins")
    val r = Preference.bradleyTerry(duels, rounds = 3)
      .orderBy(col("strength").desc).collect()
    assert(r.map(_.getAs[Long]("player")).toSeq == Seq(1L, 2L, 3L))
    assert(r.head.getAs[Long]("wins") == 10L)
    assert(r.last.getAs[Long]("wins") == 0L)
    // strengths are positive and strictly ordered
    val s = r.map(_.getAs[Double]("strength"))
    assert(s(0) > s(1) && s(1) > s(2) && s(2) >= 0.0)
  }

  test("bradleyTerry: symmetric records give equal strengths") {
    val duels = Seq((1L, 2L, 4L), (2L, 1L, 4L)).toDF("i", "j", "wins")
    val r = Preference.bradleyTerry(duels).collect()
    val s = r.map(_.getAs[Double]("strength")).distinct
    assert(s.length == 1)
  }

  test("woeIv: a non-informative feature has IV ~ 0") {
    // same good:bad ratio in every category (consecutive pairs share a
    // category, so labels alternate inside every category)
    val rows = Seq.tabulate(400) { k =>
      (s"cat${(k / 2) % 4}", k % 2 == 0)
    }
    val r = FeatureEncode.woeIv(rows.toDF("category", "label"),
      "category", "label").collect()
    assert(r.length == 4)
    r.foreach { row =>
      assert(math.abs(row.getAs[Double]("woe")) < 0.01)
      assert(math.abs(row.getAs[Double]("iv")) < 0.001)
    }
  }

  test("woeIv: a separating feature has large IV and signed WoE") {
    val rows = Seq.fill(50)(("good_cat", true)) ++
      Seq.fill(50)(("bad_cat", false)) ++
      Seq.tabulate(100)(k => ("mixed", k % 2 == 0))
    val r = FeatureEncode.woeIv(rows.toDF("category", "label"),
      "category", "label").collect()
      .map(x => x.getAs[String]("category") -> x).toMap
    assert(r("good_cat").getAs[Double]("woe") > 1.0)
    assert(r("bad_cat").getAs[Double]("woe") < -1.0)
    assert(math.abs(r("mixed").getAs[Double]("woe")) < 0.1)
    assert(r("mixed").getAs[Double]("iv") > 0.5) // feature-level total
  }
}
