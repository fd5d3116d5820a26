package graft.ops

import graft.TestSpark
import graft.ops.ext.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def ts(min: Long, micro: Long = 0): Timestamp = {
    val t = new Timestamp(min * 60000L)
    t.setNanos((micro * 1000L).toInt)
    t
  }

  test("gap over threshold starts a new session; boundary gap does not") {
    // user a: events at 0, 10, 40 (gap 30 = exactly threshold, NOT new),
    // 71 (gap 31 > threshold -> new session)
    val df = Seq(
      ("a", 1L, ts(0)), ("a", 2L, ts(10)), ("a", 3L, ts(40)),
      ("a", 4L, ts(71)), ("b", 5L, ts(0)))
      .toDF("user_id", "event_id", "ts")
    val got = Sessionize.sessionize(df, "user_id", "ts", "event_id",
        gapSeconds = 1800)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
  }

  test("sub-second gaps compare in integer microseconds") {
    // 1800.000001 s gap: a whole-second comparison would call it equal
    val df = Seq(("a", 1L, ts(0)), ("a", 2L, ts(30, 1)))
      .toDF("user_id", "event_id", "ts")
    val got = Sessionize.sessionize(df, "user_id", "ts", "event_id", 1800)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L))
  }

  test("sessionStats rolls up count and bounds per session") {
    val df = Seq(
      ("a", 1L, ts(0)), ("a", 2L, ts(10)), ("a", 3L, ts(100)))
      .toDF("user_id", "event_id", "ts")
    val got = Sessionize.sessionStats(df, "user_id", "ts", "event_id", 1800)
      .select("session_idx", "n_events").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 1L -> 1L))
  }
}

class RollingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trailing frame is bounded at nRows and partitioned per key") {
    val df = (1 to 6).map(i => ("a", i.toLong, i.toDouble))
      .toDF("k", "seq", "v")
      .unionByName(Seq(("b", 1L, 100.0)).toDF("k", "seq", "v"))
    val got = Rolling.rollingSumAvg(df, Seq("k"), Seq(col("seq")), "v", 3)
      .select("k", "seq", "moving_n", "moving_sum", "moving_avg")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got(("a", 1L)) == ((1L, 1.0, 1.0)))
    assert(got(("a", 3L)) == ((3L, 6.0, 2.0)))
    // row 6 sees only rows 4,5,6 — frame evicts row 3
    assert(got(("a", 6L)) == ((3L, 15.0, 5.0)))
    assert(got(("b", 1L)) == ((1L, 100.0, 100.0)))
  }
}

class SessionRollingPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.scalacheck.{Gen, Prop, Test => SCTest}

  private def check(p: Prop, n: Int = 5): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("property: rolling moving_sum equals a brute-force trailing sum") {
    val gen = Gen.listOfN(12, Gen.choose(-100, 100))
    check(Prop.forAll(gen) { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v.toDouble) }
      val got = Rolling.rollingSumAvg(rows.toDF("k", "seq", "v"),
          Seq("k"), Seq(col("seq")), "v", 4)
        .select("seq", "moving_sum").as[(Long, Double)].collect().toMap
      rows.indices.forall { i =>
        val want = vs.slice(math.max(0, i - 3), i + 1).map(_.toDouble).sum
        got(i.toLong) == want
      }
    })
  }

  test("property: every within-session gap <= threshold, every session break > threshold") {
    val gapGen = Gen.listOfN(10, Gen.choose(1L, 4000L)) // seconds between events
    check(Prop.forAll(gapGen) { gaps =>
      val times = gaps.scanLeft(0L)(_ + _)
      val rows = times.zipWithIndex.map { case (t, i) =>
        ("u", i.toLong, new java.sql.Timestamp(t * 1000L))
      }
      val got = Sessionize.sessionize(rows.toDF("user_id", "event_id", "ts"),
          "user_id", "ts", "event_id", gapSeconds = 1800)
        .select("event_id", "session_idx").as[(Long, Long)].collect()
        .sortBy(_._1).map(_._2)
      got.indices.tail.forall { i =>
        val sameSession = got(i) == got(i - 1)
        if (gaps(i - 1) > 1800) !sameSession
        else sameSession
      } && got.head == 0L
    })
  }

  test("property: saltedJoin result set equals the plain join") {
    val keyGen = Gen.listOfN(20, Gen.choose(1L, 5L))
    check(Prop.forAll(keyGen) { ks =>
      val big = ks.zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("k", "row_id")
      val small = Seq((1L, "a"), (2L, "b"), (7L, "c")).toDF("k", "name")
      val plain = big.join(small, Seq("k")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      salted == plain
    })
  }
}

class TfIdfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rare terms outscore ubiquitous ones; rank ties break by term") {
    // "common" in all 3 docs (idf = ln(4/4) = 0 -> score 0);
    // "rare" only in doc 1
    val docs = Seq(
      (1L, "common rare rare"), (2L, "common x"), (3L, "common y"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tfIdfTopTerms(docs, "text", "doc_id", k = 2)
      .select("doc_id", "rank", "term", "score")
      .as[(Long, Long, String, Double)].collect()
      .filter(_._1 == 1L).sortBy(_._2)
    assert(got.head._3 == "rare")
    assert(got.head._4 == math.rint(2.0 * math.log(4.0 / 2.0) * 1e6) / 1e6)
    assert(got(1)._3 == "common" && got(1)._4 == 0.0)
  }
}

class SaltedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val big = ((1 to 500).map(i => (1L, i.toDouble)) ++ // hot key
    (1 to 50).map(i => (i.toLong % 7 + 2, i.toDouble))).toDF("k", "v")
  val small = (1L to 10L).map(i => (i, s"name$i")).toDF("k", "name")

  test("salted inner join equals the plain join") {
    val plain = big.join(small, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq.sorted
    val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq.sorted
    assert(salted == plain)
  }

  test("salted left join keeps unmatched big-side rows exactly once") {
    val bigPlus = big.unionByName(Seq((99L, -1.0)).toDF("k", "v"))
    val salted = Skew.saltedJoin(bigPlus, small, Seq("k"), salts = 4,
        joinType = "left")
      .filter(col("k") === 99L).collect()
    assert(salted.length == 1 && salted.head.isNullAt(2))
  }

  test("right joins are rejected (would duplicate small-side rows)") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, Seq("k"), salts = 4, joinType = "right")
    }
  }
}
