package graft.ops.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BigramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigram NLL matches the closed form on a hand corpus") {
    // pairs: (a,b) x2 from doc1+doc2, (b,a) from doc1; prefixes: a->2, b->1
    // vocab V = 2
    val df = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val got = LmScore.bigramNll(df, "text", "doc_id")
      .select("doc_id", "n_bigrams", "nll")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // c(a,b)=2 c(b,a)=1; c1(a)=2 c1(b)=1; V=2
    val ab = math.log(3) - math.log(4) // ln((2+1)/(2+2))
    val ba = math.log(2) - math.log(3) // ln((1+1)/(1+2))
    val exp1 = -(ab + ba) / 2
    val exp2 = -ab / 1
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got.map(_._2) == Seq(2L, 1L))
    assert(math.abs(got(0)._3 - exp1) < 1e-6)
    assert(math.abs(got(1)._3 - exp2) < 1e-6)
  }

  test("docs with fewer than two tokens drop out") {
    val df = Seq((1L, "a b"), (2L, "one"), (3L, "")).toDF("doc_id", "text")
    val ids = LmScore.bigramNll(df, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }
}

class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("batch dedups internally and against history; history passes through") {
    val history = Seq((1L, "kept"), (2L, "seen")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "seen"),   // already in history -> dropped
      (11L, "fresh"),  // new
      (12L, "fresh"),  // intra-batch dup of 11 -> dropped (min id wins)
      (13L, "more")
    ).toDF("doc_id", "text")
    val got = Dedup.incremental(history, batch, "text", "doc_id")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "kept"), (2L, "seen"), (11L, "fresh"), (13L, "more")))
  }
}

class ContainmentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("finds asymmetric containment jaccard would miss") {
    val small = "alpha beta gamma delta epsilon" // 3 shingles
    val big = s"$small zeta eta theta iota kappa lambda mu nu xi"
    val df = Seq((1L, small), (2L, big), (3L, "totally different words here now"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "text", "doc_id", tau = 0.9)
      .select("id_a", "id_b", "containment")
      .as[(Long, Long, Double)].collect().toSet
    // small fully contained in big; reverse containment = 3/12 (miss)
    assert(got == Set((1L, 2L, 1.0)))
  }

  test("maxDf caps candidate generation to rare shingles") {
    // the shared shingle appears in all 4 docs -> df 4 > cap 3 -> no pairs
    val df = (1 to 4).map(i => (i.toLong, s"common shared shingle tail$i"))
      .toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(df, "text", "doc_id",
      tau = 0.1, maxDf = 3)
    assert(capped.count() == 0)
    val uncapped = Dedup.containmentPairs(df, "text", "doc_id", tau = 0.1)
    assert(uncapped.count() > 0)
  }
}
