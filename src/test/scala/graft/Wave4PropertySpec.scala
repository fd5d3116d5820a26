package graft

import graft.ops.{Diff, Intervals}
import graft.ops.ext.{CorpusClean, TrainOrder}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property suites for the round-4 operators — fixed-seed scalacheck,
  * small case counts (each case is a Spark job).
  */
class Wave4PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop, n: Int = 5): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("property: interval union invariant under duplication + permutation") {
    val iv = for {
      s <- Gen.choose(0L, 50L); len <- Gen.choose(1L, 20L)
    } yield (1L, s, s + len)
    check(Prop.forAll(Gen.listOfN(8, iv)) { ivs =>
      val base = Intervals.unionPerKey(ivs.toDF("k", "s", "e"), "k", "s", "e")
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
      // duplicating every interval and reversing the input changes nothing
      val doubled = Intervals.unionPerKey(
        (ivs.reverse ++ ivs).toDF("k", "s", "e"), "k", "s", "e")
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
      base == doubled
    })
  }

  test("property: interval union covered bounded by span and by sum") {
    val iv = for {
      s <- Gen.choose(0L, 100L); len <- Gen.choose(1L, 30L)
    } yield (1L, s, s + len)
    check(Prop.forAll(Gen.listOfN(6, iv)) { ivs =>
      val r = Intervals.unionPerKey(ivs.toDF("k", "s", "e"), "k", "s", "e")
        .collect().head
      val covered = r.getLong(2)
      val span = ivs.map(_._3).max - ivs.map(_._2).min
      val sum = ivs.map(t => t._3 - t._2).sum
      covered <= span && covered <= sum && covered >= ivs.map(t => t._3 - t._2).max
    })
  }

  test("property: diff of a snapshot with itself is empty") {
    val row = for {
      k <- Gen.choose(0L, 30L); v <- Gen.choose(-5.0, 5.0)
    } yield (k, v)
    check(Prop.forAll(Gen.listOfN(10, row)) { rows0 =>
      val rows = rows0.distinctBy(_._1)
      val df = rows.toDF("k", "v")
      Diff.snapshots(df, df, "k", Seq("v")).count() == 0L
    })
  }

  test("property: train order is a permutation at any shard count") {
    check(Prop.forAll(Gen.choose(1, 6), Gen.choose(10, 60)) { (shards, n) =>
      val df = spark.range(0, n).toDF("id")
      val out = TrainOrder.shuffled(df, "id", seed = 99L, nShards = shards)
        .collect()
      out.length == n &&
        out.map(_.getLong(0)).toSet.size == n &&
        out.map(r => (r.getLong(2), r.getLong(3))).toSet.size == n // (shard,pos) unique
    })
  }

  test("property: paragraphDedup is idempotent on its own output") {
    val para = Gen.oneOf("aa bb", "cc dd", "ee ff", "gg hh")
    val doc = Gen.listOfN(3, para).map(_.mkString("\n"))
    check(Prop.forAll(Gen.listOfN(4, doc)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = CorpusClean.paragraphDedup(df, "text", "doc_id")
        .select("doc_id", "text_clean")
      val twice = CorpusClean.paragraphDedup(
        once.withColumnRenamed("text_clean", "text"), "text", "doc_id")
      val a = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val b = twice.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      a == b
    })
  }
}
