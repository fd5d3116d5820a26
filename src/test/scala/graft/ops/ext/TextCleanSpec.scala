package graft.ops.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextCleanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def redactOne(text: String): (String, Int, Int, Int, Int) =
    Seq(text).toDF("text")
      .select(TextClean.redact($"text").as("r") +:
        TextClean.matchCounts($"text"): _*)
      .as[(String, Int, Int, Int, Int)].head()

  test("each PII kind redacts to its typed placeholder") {
    val (r, u, e, i, p) = redactOne(
      "mail a.b-c@mail.example.org call +1 (555) 010-1234 " +
        "see https://ex.com/x?q=1 host 10.1.2.3 done")
    assert(r == "mail [EMAIL] call [PHONE] see [URL] host [IP] done")
    assert((u, e, i, p) == (1, 1, 1, 1))
  }

  test("IP and email inside a URL redact as URL, not separately") {
    val (r, u, e, i, p) = redactOne("go http://10.0.0.1/reset?u=x@y.com now")
    assert(r == "go [URL] now")
    assert((u, e, i, p) == (1, 0, 0, 0))
  }

  test("phone never eats digits out of an already-redacted form") {
    val (r, _, _, _, p) = redactOne("ip 192.168.0.1 tail")
    assert(r == "ip [IP] tail")
    assert(p == 0)
  }

  test("clean text passes through untouched") {
    val (r, u, e, i, p) = redactOne("just ordinary words here")
    assert(r == "just ordinary words here")
    assert((u, e, i, p) == (0, 0, 0, 0))
  }
}

class RepetitionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("repeated phrases raise dup ratios; unique text stays near zero") {
    val df = Seq(
      (1L, "buy now buy now buy now buy now"),
      (2L, "eight totally distinct tokens appear exactly once here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionFeatures(df, "text")
      .select("doc_id", "distinct_token_ratio", "dup_2gram_ratio",
        "dup_3gram_ratio")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // 8 tokens, 2 distinct; 7 bigrams, 2 distinct; 6 trigrams, 2
    // distinct; ratios rounded to 6 places by the operator
    assert(out(1L) == ((0.25, 0.714286, 0.666667)))
    assert(out(2L) == ((1.0, 0.0, 0.0)))
  }
}
