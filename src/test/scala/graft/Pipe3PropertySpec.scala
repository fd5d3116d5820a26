package graft

import graft.ops.Cdc
import graft.ops.ext.{Mixture, SpanDedup}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property suites for the round-3 operators. Spark-touching properties
  * keep case counts small (each case is a Spark job).
  */
class Pipe3PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop, n: Int = 5): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("property: span stats vs a scala reference on random corpora") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val doc = Gen.choose(1, 9).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    check(Prop.forAll(Gen.listOfN(6, doc)) { texts =>
      val w = 3
      def spansOf(t: String): Set[Seq[String]] = {
        val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
        if (toks.size <= w) Set(toks) else toks.sliding(w).map(_.toSeq).toSet
      }
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val ref: Map[Long, (Long, Long)] = docs.map { case (id, t) =>
        val mine = spansOf(t)
        val others = docs.filter(_._1 != id).flatMap(d => spansOf(d._2)).toSet
        id -> ((mine.size.toLong, mine.count(others.contains).toLong))
      }.toMap
      val got = SpanDedup.spanStats(docs.toDF("doc_id", "text"),
          "text", "doc_id", w)
        .select("doc_id", "n_spans", "n_dup_spans")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      got == ref
    }, n = 5)
  }

  test("property: mixture output counts are exactly floor(w_g * T)") {
    val langs = Seq("en", "de", "fr")
    val sizes = Gen.listOfN(3, Gen.choose(1, 40))
    val weights = Gen.listOfN(3, Gen.choose(1, 10))
    check(Prop.forAll(sizes, weights) { (ns, ws) =>
      val total = ws.sum.toDouble
      val wmap = langs.zip(ws.map(_ / total)).toMap
      val rows = langs.zip(ns).flatMap { case (l, n) =>
        (1 to n).map(i => (s"$l-$i".hashCode.toLong, l))
      }
      val t = langs.zip(ns).map { case (l, n) =>
        math.floor(n / wmap(l)) }.min
      val expected = langs.map(l => l -> math.floor(wmap(l) * t).toLong).toMap
      val got = Mixture.rebalance(rows.toDF("id", "lang"), "id", "lang", wmap)
        .groupBy("lang").count().as[(String, Long)].collect().toMap
      langs.forall(l => got.getOrElse(l, 0L) == expected(l))
    }, n = 5)
  }

  test("property: CDC apply matches a scala fold of the changelog") {
    val key = Gen.choose(1L, 8L)
    val op = Gen.oneOf("U", "D")
    val change = for { k <- key; o <- op; v <- Gen.choose(0, 99) } yield (k, o, v)
    check(Prop.forAll(Gen.listOfN(10, change)) { changes =>
      val snap = (1L to 5L).map(k => (k, (k * 10).toInt))
      // reference: replay in seq order onto a map
      val finalState = changes.zipWithIndex.foldLeft(
        snap.map { case (k, v) => k -> Option(v) }.toMap) {
        case (m, ((k, o, v), _)) =>
          if (o == "D") m.updated(k, None) else m.updated(k, Some(v))
      }.collect { case (k, Some(v)) => (k, v) }.toSet
      val changeDf = changes.zipWithIndex
        .map { case ((k, o, v), i) => (k, v, (i + 1).toLong, o) }
        .toDF("k", "v", "seq", "op")
      val got = Cdc.applyChangelog(snap.toDF("k", "v"), changeDf, "k", "seq", "op")
        .as[(Long, Int)].collect().toSet
      got == finalState
    }, n = 10)
  }
}
