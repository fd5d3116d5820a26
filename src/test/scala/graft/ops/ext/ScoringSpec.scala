package graft.ops.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class LogisticQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double, Boolean)] =
    TextAnalysis.logisticQuality(df, "text")
      .select("doc_id", "p_keep", "keep")
      .as[(Long, Double, Boolean)].collect().sortBy(_._1).toSeq

  test("sigmoid of the closed-form z, rounded to 6 dp") {
    val df = Seq((1L, "the cat and the dog sat in the warm sun")).toDF("doc_id", "text")
    // 10 tokens; en stopword hits: the x3 + and + in = 5 -> sr = 0.5; pr = 0
    val z = -1.0 + 0.5 * 4.0 + 0.0 * -6.0 + math.log(11.0) * 0.5
    val exp = BigDecimal(1.0 / (1.0 + math.exp(-z)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(run(df) == Seq((1L, exp, true)))
  }

  test("punctuation soup is dropped, clean prose kept") {
    val df = Seq(
      (1L, "the cat and the dog sat in the warm sun for a while today"),
      (2L, "%$#@! ~~ ++ == ;; :: ,, .. !! ?? ** (( ))")).toDF("doc_id", "text")
    val keep = run(df).map(t => t._1 -> t._3).toMap
    assert(keep == Map(1L -> true, 2L -> false))
  }
}

class OovRateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokens under the count floor are OOV") {
    // 'common' appears 3 times (>= 2), each 'rareN' once
    val df = Seq(
      (1L, "common common rare1"),
      (2L, "common rare2 rare3")).toDF("doc_id", "text")
    val got = LmScore.oovRate(df, "text", "doc_id", minCount = 2L)
      .select("doc_id", "n_tokens", "n_oov", "oov_rate")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((1L, 3L, 1L, r6(1.0 / 3)), (2L, 3L, 2L, r6(2.0 / 3))))
  }

  test("fully in-vocabulary docs score 0") {
    val df = Seq((1L, "a a"), (2L, "a a a")).toDF("doc_id", "text")
    val rates = LmScore.oovRate(df, "text", "doc_id", minCount = 2L)
      .select("doc_id", "oov_rate").as[(Long, Double)].collect().toMap
    assert(rates == Map(1L -> 0.0, 2L -> 0.0))
  }
}
