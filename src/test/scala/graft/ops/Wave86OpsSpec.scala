package graft.ops

import graft.TestSpark
import graft.ops.ext.{BloomDecon, ProtoPrune}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-86 operator semantics: D4-style prototype pruning and Bloom
  * n-gram decontamination.
  */
class Wave86OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------ ProtoPrune

  /** Two well-separated cells on the 2D unit circle: ids 0 and 50 are
    * the centroids (every-50th rule); members cluster tightly around
    * each. Angles are small enough that assignment is unambiguous.
    */
  private def twoCells = {
    def v(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    Seq(
      (0L, v(0.0)), (1L, v(2.0)), (2L, v(-3.0)), (3L, v(5.0)),
      (50L, v(90.0)), (51L, v(88.0)), (52L, v(94.0)), (53L, v(85.0)),
      (54L, v(97.0))
    ).toDF("vec_id", "embedding")
  }

  test("prototype prune: assignment, rank, and integer drop fraction") {
    val out = ProtoPrune.prune(twoCells, "embedding", "vec_id",
      centroidEvery = 50, dropNum = 1, dropDen = 4)
    val rows = out.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getBoolean(4))).toMap
    // every point lands in its geometric cell
    assert(Seq(0L, 1L, 2L, 3L).forall(rows(_)._1 == 0L))
    assert(Seq(50L, 51L, 52L, 53L, 54L).forall(rows(_)._1 == 50L))
    // centroids are their own most-prototypical member (rank 1)
    assert(rows(0L)._2 == 1L && rows(50L)._2 == 1L)
    // cell of 4 drops floor(4/4)=1 (the centroid); cell of 5 likewise
    assert(rows.values.count { case (c, _, d) => c == 0L && d } == 1)
    assert(rows.values.count { case (c, _, d) => c == 50L && d } == 1)
    assert(rows(0L)._3 && rows(50L)._3)
    // a 1e-6-quantized cosine column rides along
    assert(out.columns.toSeq ==
      Seq("id", "cent_id", "cosine", "rank_in_cell", "dropped"))
  }

  test("prototype prune: dropNum=0 keeps everything") {
    val out = ProtoPrune.prune(twoCells, "embedding", "vec_id",
      centroidEvery = 50, dropNum = 0, dropDen = 4)
    assert(out.filter(col("dropped")).count() == 0)
  }

  // ------------------------------------------------------------ BloomDecon

  private val evalDocs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (97L, "pack my box with five dozen liquor jugs")
  ).toDF("doc_id", "text")

  test("bloom decon: verbatim contamination flags, disjoint text does not") {
    val m = 1 << 12
    val bits = BloomDecon.buildBits(evalDocs, "text", n = 3, mBits = m)
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // verbatim
      (2L, "completely unrelated words about spark plans here"),
      (3L, "prefix noise then the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val flagged = BloomDecon.flag(train, "text", "doc_id", bits,
      mBits = m, n = 3, tauNum = 3, tauDen = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged.contains(1L), "verbatim copy must flag")
    assert(flagged.contains(3L), "embedded copy keeps most grams hot")
    assert(!flagged.contains(2L), "disjoint text must not flag")
  }

  test("bloom decon: hit counts are exact when the filter is collision-free") {
    val m = 1 << 18 // tiny corpus, collisions astronomically unlikely
    val bits = BloomDecon.buildBits(evalDocs, "text", n = 3, mBits = m)
    // doc = 4 eval grams + 4 fresh grams -> 8 distinct 3-grams, 4 hits
    val train = Seq((1L,
      "the quick brown fox jumps over xx yy zz aa bb cc")
    ).toDF("doc_id", "text")
    val r = BloomDecon.flag(train, "text", "doc_id", bits,
      mBits = m, n = 3, tauNum = 0, tauDen = 1).head()
    assert(r.getLong(1) == 10L, "12 tokens -> 10 3-grams")
    assert(r.getLong(2) == 4L,
      "exactly the 4 grams inside 'the quick brown fox jumps over'")
  }

  test("bloom decon: short docs contribute their whole-doc gram") {
    val m = 1 << 12
    val bits = BloomDecon.buildBits(Seq((0L, "ab cd")).toDF("doc_id", "text"),
      "text", n = 3, mBits = m)
    val r = BloomDecon.flag(Seq((1L, "ab cd")).toDF("doc_id", "text"),
      "text", "doc_id", bits, mBits = m, n = 3, tauNum = 1, tauDen = 1)
    assert(r.count() == 1, "the single clamped gram matches itself")
  }
}
