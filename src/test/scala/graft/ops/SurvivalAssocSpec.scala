package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form invariants for the survival / association / Welch wave. */
class SurvivalAssocSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def u(i: Long): Double =
    ((i * 2654435761L) % 1000003L).toDouble / 1000003.0

  test("kaplanMeier: all observed telescopes to survivors/n; hits 0 at max t") {
    // durations 1,1,2,3 all observed: S(1)=2/4, S(2)=1/4, S(3)=0
    val df = Seq((1L, true), (1L, true), (2L, true), (3L, true))
      .toDF("dur", "obs")
    val r = Survival.kaplanMeier(df, "dur", "obs").orderBy("dur").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(4L, 2L, 1L)) // at-risk
    assert(r.map(_.getDouble(4)).toSeq == Seq(0.5, 0.25, 0.0))
  }

  test("kaplanMeier: fully censored data keeps survival at 1") {
    val df = (1L to 20L).map(i => (i % 5, false)).toDF("dur", "obs")
    val r = Survival.kaplanMeier(df, "dur", "obs").collect()
    assert(r.forall(_.getDouble(4) == 1.0))
    assert(r.map(_.getLong(3)).sum == 20L) // everyone censored
  }

  test("kaplanMeier: survival is non-increasing in t") {
    val df = (1L to 60L).map(i => ((u(i) * 8).toLong, u(i * 3) > 0.4))
      .toDF("dur", "obs")
    val s = Survival.kaplanMeier(df, "dur", "obs").orderBy("dur")
      .select("survival").as[Double].collect()
    s.sliding(2).foreach { case Array(a, b) => assert(b <= a); case _ => }
  }

  test("association rules: a pair present in every basket has conf = lift = 1") {
    val always = (1L to 10L).flatMap(g => Seq((g, 1L), (g, 2L)))
    val some = (1L to 4L).map(g => (g, 3L))
    val r = Association.rules((always ++ some).toDF("g", "item"),
      "g", "item", minShared = 2L).collect()
      .map(row => (row.getLong(0), row.getLong(1)) -> row).toMap
    val full = r((1L, 2L))
    assert(full.getLong(4) == 10L && full.getDouble(5) == 1.0 &&
      full.getDouble(6) == 1.0 && full.getDouble(7) == 1.0)
    // (1,3): s_ab=4, conf_ab=0.4, conf_ba=1.0, lift = 10*4/(10*4) = 1
    val part = r((1L, 3L))
    assert(part.getLong(4) == 4L && part.getDouble(5) == 0.4 &&
      part.getDouble(6) == 1.0 && part.getDouble(7) == 1.0)
  }

  test("welchT: identical samples give t = 0 and df = 2(n-1)") {
    val a = (1L to 40L).map(i => ("a", u(i) * 7 + 1))
    val b = (1L to 40L).map(i => ("b", u(i) * 7 + 1))
    val r = NonParam.welchT((a ++ b).toDF("grp", "v"), "v", "grp", "a", "b")
      .collect().head
    assert(r.getLong(0) == 40L && r.getLong(1) == 40L)
    assert(r.getDouble(4) == 0.0)
    assert(r.getDouble(5) == 78.0)
  }

  test("welchT is antisymmetric in the group order") {
    val df = ((1L to 30L).map(i => ("a", u(i * 7) * 5)) ++
      (1L to 50L).map(i => ("b", u(i * 11) * 9))).toDF("grp", "v")
    val ab = NonParam.welchT(df, "v", "grp", "a", "b").collect().head
    val ba = NonParam.welchT(df, "v", "grp", "b", "a").collect().head
    assert(ab.getDouble(4) == -ba.getDouble(4))
    assert(ab.getDouble(5) == ba.getDouble(5))
  }
}
