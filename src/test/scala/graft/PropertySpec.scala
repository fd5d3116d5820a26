package graft

import graft.io.{DsvReader, Sniffer}
import graft.ops.Melt
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based suites (SURVEY §5.2.4) — scalacheck generators with a
  * fixed seed; Spark-touching properties keep case counts small (each
  * case is a Spark job).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("property: melt . pivot is identity on (id, a, b) frames") {
    val gen = Gen.listOfN(6, Gen.choose(-1000, 1000))
    check(Prop.forAll(gen, gen) { (as, bs) =>
      val rows = as.zip(bs).zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a.toDouble, b.toDouble) }
      val df = rows.toDF("id", "a", "b")
      val back = Melt.melt(df, Seq("id"), Seq("a", "b"))
        .groupBy("id").pivot("variable", Seq("a", "b")).agg(first("value"))
        .orderBy("id")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      back.toSeq == rows
    }, n = 5)
  }

  test("property: normalizeNames is idempotent") {
    val name = Gen.listOfN(8,
      Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const('.'))).map(_.mkString)
    check(Prop.forAll(Gen.listOfN(6, name)) { names =>
      val once = DsvReader.normalizeNames(names)
      DsvReader.normalizeNames(once) == once
    }, n = 50)
  }

  test("property: normalized names are unique and trimmed-lowercase") {
    val name = Gen.oneOf("Gene", "gene", " GENE ", "score", "Score ", "p.value")
    check(Prop.forAll(Gen.listOfN(8, name)) { names =>
      val out = DsvReader.normalizeNames(names)
      out.distinct == out && out.forall(n => n == n.trim.toLowerCase)
    }, n = 50)
  }

  test("property: sniffer recovers the separator of well-formed files") {
    val cell = Gen.listOfN(4, Gen.alphaNumChar).map(_.mkString)
    val sepGen = Gen.oneOf('\t', ',', ';', '|')
    check(Prop.forAll(sepGen, Gen.listOfN(4, Gen.listOfN(3, cell))) {
      (sep, rows) =>
        val lines = rows.map(_.mkString(sep.toString))
        Sniffer.sniffFromLines(lines) == sep
    }, n = 50)
  }

  test("property: melt output row count = rows x value columns") {
    check(Prop.forAll(Gen.choose(0, 30)) { n =>
      val df = (0 until n).map(i => (i, i * 1.0, i * 2.0, i * 3.0))
        .toDF("id", "a", "b", "c")
      Melt.melt(df, Seq("id"), Seq("a", "b", "c")).count() == n * 3L
    }, n = 5)
  }

  test("property: exact dedup is idempotent") {
    import graft.ops.ext.Dedup
    check(Prop.forAll(Gen.listOfN(12, Gen.oneOf("x", "y", "z", "w"))) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = Dedup.exactByHash(df, "text", "doc_id")
      val twice = Dedup.exactByHash(once, "text", "doc_id")
      once.count() == twice.count() &&
        once.count() == texts.distinct.size.toLong
    }, n = 5)
  }

  test("property: shingle-hash cardinality equals distinct string windows") {
    import graft.ops.ext.Dedup
    val tok = Gen.oneOf("aa", "bb", "cc", "dd", "x1")
    check(Prop.forAll(Gen.listOfN(12, tok), Gen.choose(1, 4)) { (toks, n) =>
      val text = toks.mkString(" ")
      val want =
        if (toks.size <= n) Set(toks)
        else toks.sliding(n).map(_.toList).toSet
      val got = Seq(text).toDF("text")
        .select(Dedup.shingles($"text", n)).head.getSeq[Long](0)
      got.size == want.size && got.distinct.size == got.size
    }, n = 15)
  }

  test("property: sequence packing conserves tokens and respects budget") {
    import graft.ops.ext.Chunking
    val size = Gen.choose(1L, 120L)
    check(Prop.forAll(Gen.nonEmptyListOf(size), Gen.choose(64, 256)) {
      (sizes, budget) =>
        val df = sizes.zipWithIndex
          .map { case (s, i) => (i.toLong % 3, i.toLong, 0, s) }
          .toDF("shard", "doc_id", "chunk_id", "n")
        val packed = Chunking.packSequences(df, "shard",
          Seq("doc_id", "chunk_id"), "n", budget)
        val perSeq = packed.groupBy("shard", "seq_id")
          .agg(sum("tok_in_seq").as("t")).select("t")
          .as[Long].collect()
        // every token lands exactly once; no sequence exceeds budget
        perSeq.sum == sizes.sum && perSeq.forall(_ <= budget)
    }, n = 10)
  }
}
