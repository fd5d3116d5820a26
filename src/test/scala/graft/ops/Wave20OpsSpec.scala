package graft.ops

import graft.TestSpark
import graft.ops.ext.{Privacy, ClusterEval}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the wave-20 operators: l-diversity, silhouette,
  * LOGO influence, and 3-itemset rules.
  */
class Wave20OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lDiversity: single-sensitive-value groups are weak, entropy 0") {
    // group A: one sensitive value (weak, H=0); group B: two balanced
    val rows = Seq.fill(4)(("r", "A", "s1")) ++
      Seq.fill(3)(("r", "B", "s1")) ++ Seq.fill(3)(("r", "B", "s2"))
    val out = Privacy.lDiversity(rows.toDF("rep", "qi", "sens"),
      "rep", Seq("qi"), "sens").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("min_l") == 1L)
    assert(r.getAs[Long]("n_weak_groups") == 1L)
    // mean of H(A)=0 and H(B)=ln 2
    assert(math.abs(r.getAs[Double]("mean_entropy")
      - math.log(2.0) / 2.0) < 1e-5)
  }

  test("silhouette: well-separated clusters score near 1") {
    val rows = (0 until 8).map { k =>
      val cl = k % 2
      // cluster 0 near origin, cluster 1 far away; tiny within-cluster jitter
      (k.toLong, cl, Array(cl * 100.0 + (k / 2) * 0.01, cl * 100.0))
    }
    val out = ClusterEval.silhouette(rows.toDF("id", "cl", "v"),
      "id", "cl", "v", lit(true)).collect()
    assert(out.length == 2)
    out.foreach(r =>
      assert(r.getAs[Double]("mean_silhouette") > 0.99))
  }

  test("silhouette: a point set split arbitrarily scores near 0 or below") {
    // one tight blob labelled half/half — silhouette must not be high
    val rows = (0 until 10).map(k =>
      (k.toLong, k % 2, Array(k * 0.001, 0.0)))
    val out = ClusterEval.silhouette(rows.toDF("id", "cl", "v"),
      "id", "cl", "v", lit(true)).collect()
    out.foreach(r => assert(r.getAs[Double]("mean_silhouette") < 0.5))
  }

  test("logoSlope: removing the outlier group moves the slope") {
    // groups a,b on y=2x exactly; group c is a gross outlier cloud
    val clean = for (g <- Seq("a", "b"); x <- 1L to 10L)
      yield (g, x, 2 * x)
    val outlier = (1L to 10L).map(x => ("c", x, 100 * x))
    val out = Influence.logoSlope((clean ++ outlier).toDF("g", "x", "y"),
      "g", yScale = 1.0).collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    // leaving out c recovers the clean slope 2 exactly
    assert(math.abs(out("c").getAs[Double]("beta_loo") - 2.0) < 1e-6)
    // leaving out a clean group barely moves the (contaminated) slope
    assert(math.abs(out("a").getAs[Double]("delta_beta")) <
      math.abs(out("c").getAs[Double]("delta_beta")))
    // beta_global identical on every row
    assert(out.values.map(_.getAs[Double]("beta_global")).toSet.size == 1)
  }

  test("tripleRules: a planted always-together triple has max support") {
    val baskets = (1L to 20L).flatMap { b =>
      Seq((b, "x"), (b, "y"), (b, "z")) ++
        (if (b <= 5) Seq((b, "w")) else Nil)
    }
    val out = Association.tripleRules(baskets.toDF("g", "item"),
      "g", "item", minShared = 2L).collect()
    val xyz = out.find(r => r.getAs[String]("a") == "x" &&
      r.getAs[String]("b") == "y" && r.getAs[String]("c") == "z").get
    assert(xyz.getAs[Long]("s_abc") == 20L)
    assert(math.abs(xyz.getAs[Double]("support") - 1.0) < 1e-9)
    assert(math.abs(xyz.getAs[Double]("lift3") - 1.0) < 1e-9)
    // the w-triples only reach 5 baskets
    out.filter(_.getAs[String]("a") == "w")
      .foreach(r => assert(r.getAs[Long]("s_abc") == 5L))
  }

  test("tripleRules: Apriori prune drops triples under the floor") {
    val baskets = (1L to 10L).flatMap(b =>
      if (b <= 2) Seq((b, "p"), (b, "q"), (b, "r"))
      else Seq((b, "p")))
    val out = Association.tripleRules(baskets.toDF("g", "item"),
      "g", "item", minShared = 3L).collect()
    assert(out.isEmpty)
  }
}
