package graft.expr

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native Jaro-Winkler kernel to the de-facto standard
  * variant (prefix weight 0.1, boost threshold 0.7) on the classic
  * literature pairs and the degenerate cases, plus a property run
  * against an independent straight-from-the-paper reference.
  */
class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic literature pairs (DuckDB-verified values)") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964)
      < 1e-12)
    assert(math.abs(jw("duane", "dwayne") - 0.8400000000000001) < 1e-12)
  }

  test("boost threshold: no prefix bonus at or below jaro 0.7") {
    // "sort"/"scan": jaro = 0.5 <= 0.7 -> jw stays 0.5 despite the
    // shared 's' prefix (DuckDB-verified)
    assert(jw("sort", "scan") == 0.5)
    assert(math.abs(jw("stream", "sort") - 0.6388888888888888) < 1e-12)
  }

  test("degenerate cases") {
    assert(jw("", "") == 1.0)
    assert(jw("a", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("same", "same") == 1.0)
    assert(jw("ab", "cd") == 0.0)
  }

  test("property: kernel equals an independent reference on word pairs") {
    def ref(s1: String, s2: String): Double = {
      if (s1 == s2) return 1.0
      val (l1, l2) = (s1.length, s2.length)
      if (l1 == 0 || l2 == 0) return 0.0
      val w = math.max(0, math.max(l1, l2) / 2 - 1)
      val m1 = Array.fill(l1)(false); val m2 = Array.fill(l2)(false)
      var m = 0
      for (i <- 0 until l1) {
        var j = math.max(0, i - w)
        var done = false
        while (j < math.min(l2, i + w + 1) && !done) {
          if (!m2(j) && s2(j) == s1(i)) {
            m1(i) = true; m2(j) = true; m += 1; done = true
          }
          j += 1
        }
      }
      if (m == 0) return 0.0
      var t = 0; var k = 0
      for (i <- 0 until l1 if m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      t /= 2
      val j0 = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3
      if (j0 <= 0.7) j0
      else {
        val l = s1.zip(s2).take(4).takeWhile(p => p._1 == p._2).size
        j0 + l * 0.1 * (1 - j0)
      }
    }
    val words = Seq("alpha", "alhpa", "alpah", "beta", "betta", "gamma",
      "gama", "delta", "dleta", "stream", "strean", "spark", "sprak",
      "shuffle", "shufle", "partition", "partiton", "aggregate",
      "agregate", "12345", "12354")
    for (a <- words; b <- words) {
      assert(jw(a, b) == ref(a, b), s"mismatch on ($a, $b)")
    }
  }

  test("the Column wrapper stays inside codegen on a real scan") {
    val df = Seq(("alpha", "alhpa"), ("beta", "betta"))
      .toDF("a", "b")
      .select(graft.ops.FuzzyJoin.jaroWinkler(col("a"), col("b")).as("jw"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython"))
    val vals = df.collect().map(_.getDouble(0))
    assert(vals.forall(v => v > 0.8 && v < 1.0))
  }
}
