package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property invariants for the trend/changepoint wave — closed-form
  * identities on deterministic series (no RNG to drift).
  */
class TrendPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def u(i: Long): Double =
    ((i * 2654435761L) % 1000003L).toDouble / 1000003.0

  test("mannKendall: monotone series saturate S; linear series pin Theil–Sen") {
    val n = 25L
    val up = (1L to n).map(i => ("up", i, 3.5 * i + 2.0))
    val down = (1L to n).map(i => ("down", i, -1.25 * i))
    val const = (1L to n).map(i => ("const", i, 7.0))
    val df = (up ++ down ++ const).toDF("k", "idx", "v")
    val r = Trend.mannKendall(df, "k", "idx", "v").collect()
      .map(row => row.getString(0) ->
        (row.getLong(2), row.getLong(3), row.getDouble(4))).toMap
    val pairs = n * (n - 1) / 2
    assert(r("up") == ((pairs, pairs, 3.5)))       // S = +n_pairs, exact slope
    assert(r("down") == ((pairs, -pairs, -1.25)))  // S = -n_pairs
    assert(r("const")._2 == 0L && r("const")._3 == 0.0)
  }

  test("mannKendall S is antisymmetric under value negation") {
    val df = (1L to 40L).map(i => ("a", i, u(i * 3 + 1))).toDF("k", "idx", "v")
    val s1 = Trend.mannKendall(df, "k", "idx", "v")
      .collect().head.getLong(3)
    val s2 = Trend.mannKendall(df.withColumn("v", -col("v")), "k", "idx", "v")
      .collect().head.getLong(3)
    assert(s1 == -s2)
  }

  test("holt: constant series has level = c, trend = 0, forecast = c") {
    val df = (1L to 30L).map(i => ("k1", i, 42.5)).toDF("k", "idx", "v")
    val r = Trend.holt(df, "k", "idx", "v", beta = 0.25).collect().head
    assert(r.getDouble(2) == 42.5 && r.getDouble(3) == 0.0 &&
      r.getDouble(4) == 42.5)
  }

  test("holt level stays inside the series envelope") {
    val df = (1L to 50L).map(i => ("k1", i, u(i * 7 + 2) * 9.0))
      .toDF("k", "idx", "v")
    val vals = df.select("v").as[Double].collect()
    val lvl = Trend.holt(df, "k", "idx", "v", beta = 0.25)
      .collect().head.getDouble(2)
    assert(lvl >= vals.min - 5e-7 && lvl <= vals.max + 5e-7) // level is 6-dp rounded
  }

  test("cusum: series at target is 0; constant excess accumulates n·d") {
    val at = (1L to 20L).map(i => ("at", i, 5.0, 5.0))
    val over = (1L to 20L).map(i => ("over", i, 5.25, 5.0))
    val df = (at ++ over).toDF("k", "idx", "v", "tgt")
    val r = Trend.cusum(df, "k", "idx", "v", "tgt").collect()
      .map(row => row.getString(0) -> row.getDouble(2)).toMap
    assert(r("at") == 0.0)
    assert(r("over") == 20 * 0.25)
  }

  test("cusum window closed form matches the direct recurrence") {
    val xs = (1L to 60L).map(i => u(i * 11 + 5) * 4.0)
    val tgt = 2.0
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v, tgt) }
      .toDF("k", "idx", "v", "tgt")
    val got = Trend.cusum(df, "k", "idx", "v", "tgt")
      .collect().head.getDouble(2)
    var s = BigDecimal(0); var m = BigDecimal(0)
    for (x <- xs) {
      s = (s + BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        - BigDecimal(tgt)).max(0)
      m = m.max(s)
    }
    assert(math.abs(got - m.toDouble) < 1e-6)
  }
}
