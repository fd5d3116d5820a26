package graft.expr

import graft.TestSpark
import graft.ops.ext.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShingleHashesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference model: distinct sliding token windows as strings. */
  private def refWindows(text: String, n: Int): Set[Seq[String]] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    if (toks.size <= n) Set(toks)
    else toks.sliding(n).map(_.toSeq).toSet
  }

  test("cardinality equals the distinct string-window count") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a a",                       // heavy dedup
      "a b a b a b a b",                   // period-2 windows
      "one two",                           // shorter than n
      "single",
      "",                                  // empty
      "Punct!! and,, splits--everywhere..ok")
    for (t <- texts) {
      val got = Seq(t).toDF("text")
        .select(Dedup.shingles($"text", 3)).head.getSeq[Long](0)
      assert(got.size == refWindows(t, 3).size, s"cardinality for '$t'")
      assert(got.distinct.size == got.size, s"duplicates for '$t'")
    }
  }

  test("equal windows hash equal across documents, distinct ones differ") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "zzz alpha beta gamma yyy"),    // shares window (alpha,beta,gamma)
      (3L, "totally different text here")
    ).toDF("doc_id", "text")
    val sets = df.select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sets(1L).toSet.intersect(sets(2L).toSet).size == 1)
    assert(sets(1L).toSet.intersect(sets(3L).toSet).isEmpty)
  }

  test("interpreted eval matches codegen output") {
    val df = (1L to 50L)
      .map(i => (i, (0 to (i % 13).toInt).map(j => s"w${(i + j) % 7}").mkString(" ")))
      .toDF("doc_id", "text")
    val codegen = df.select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    // force the interpreted path by evaluating the expression directly
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val interpreted = df.as[(Long, String)].collect().map { case (id, t) =>
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val arr = ArrayData.toArrayData(toks.map(UTF8String.fromString))
      id -> ShingleHashes.compute(arr, 3).toLongArray().toSeq
    }.toMap
    assert(codegen == interpreted)
  }

  test("shingle_hashes is SQL-callable via GraftExtensions") {
    Seq("alpha beta gamma delta").toDF("text")
      .createOrReplaceTempView("sh_ext_docs")
    val viaSql = spark.sql(
      """SELECT shingle_hashes(
        |  filter(split(lower(text), '[^a-z0-9]+'), t -> length(t) > 0), 3) AS sh
        |FROM sh_ext_docs""".stripMargin).head.getSeq[Long](0)
    val viaColumn = Seq("alpha beta gamma delta").toDF("text")
      .select(Dedup.shingles($"text", 3)).head.getSeq[Long](0)
    assert(viaSql == viaColumn)
    // default shingle size is 3
    val viaDefault = spark.sql(
      """SELECT shingle_hashes(
        |  filter(split(lower(text), '[^a-z0-9]+'), t -> length(t) > 0)) AS sh
        |FROM sh_ext_docs""".stripMargin).head.getSeq[Long](0)
    assert(viaDefault == viaColumn)
    // non-literal shingle size is rejected with the usage message
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(array('a'), 1 + 2) FROM sh_ext_docs")
        .collect()
    }
    assert(e.getMessage.contains("shingle_hashes"))
  }

  test("jaccard over hashed shingles equals jaccard over string windows") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox leaps over the lazy dog again and again"
    val df = Seq((a, b)).toDF("ta", "tb")
      .select(Dedup.jaccard(Dedup.shingles($"ta", 3),
        Dedup.shingles($"tb", 3)).as("j"))
    val wa = refWindows(a, 3); val wb = refWindows(b, 3)
    val want = wa.intersect(wb).size.toDouble / wa.union(wb).size
    assert(math.abs(df.head.getDouble(0) - want) < 1e-12)
  }
}
