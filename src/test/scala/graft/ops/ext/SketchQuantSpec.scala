package graft.ops.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys =
    (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")

  test("cms estimates never undercount and are exact sans collisions") {
    val sketch = Sketches.cmsBuild(keys, "k", depth = 2, width = 4096)
    val truth = keys.groupBy("k").agg(count(lit(1)).as("n"))
    val est = Sketches.cmsEstimate(sketch, truth, "k", 2, 4096)
      .join(truth, "k").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(est.keySet == Set("a", "b", "c"))
    for ((k, (e, n)) <- est) assert(e >= n, s"undercount for $k")
    // 3 keys in 4096 buckets x2 rows: collision-free -> exact
    assert(est("a") == ((5L, 5L)) && est("b") == ((3L, 3L)) &&
      est("c") == ((1L, 1L)))
  }

  test("sketch size is bounded by depth*width regardless of row count") {
    val many = (1L to 2000L).map(i => s"k$i").toDF("k")
    val sketch = Sketches.cmsBuild(many, "k", depth = 3, width = 16)
    assert(sketch.count() <= 3 * 16)
    // total mass per depth row == row count (counts are conserved)
    val perRow = sketch.groupBy("d").agg(sum("counter").as("s"))
      .collect().map(_.getLong(1)).toSeq
    assert(perRow == Seq(2000L, 2000L, 2000L))
  }
}

class QuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("int8 codes, checksum and error bound on a known vector") {
    val df = Seq(Tuple1(Seq(1.0f, -0.5f, 0.25f))).toDF("v")
    val r = df.select(
      Quantize.int8Scale(col("v")).as("s"),
      Quantize.int8Codes(col("v")).as("q"),
      Quantize.int8MaxError(col("v")).as("e"),
      Quantize.int8Checksum(col("v")).as("c")).head
    assert(math.abs(r.getDouble(0) - 1.0 / 127) < 1e-15)
    // -0.5/(1/127) = -63.5 rounds away from zero to -64; 0.25 -> 31.75 -> 32
    assert(r.getSeq[Long](1) == Seq(127L, -64L, 32L))
    assert(r.getDouble(2) <= r.getDouble(0) / 2 + 1e-12)
    assert(r.getLong(3) == 127L * 1 - 64L * 2 + 32L * 3)
  }

  test("zero and empty vectors pass through as zeros") {
    val df = Seq(Tuple1(Seq(0.0f, 0.0f)), Tuple1(Seq.empty[Float]))
      .toDF("v")
    val rs = df.select(Quantize.int8Scale(col("v")),
      Quantize.int8Codes(col("v")), Quantize.int8MaxError(col("v")),
      Quantize.int8Checksum(col("v"))).collect()
    assert(rs(0).getDouble(0) == 0.0 &&
      rs(0).getSeq[Long](1) == Seq(0L, 0L) &&
      rs(0).getDouble(2) == 0.0 && rs(0).getLong(3) == 0L)
    assert(rs(1).getDouble(0) == 0.0 && rs(1).getSeq[Long](1).isEmpty &&
      rs(1).getDouble(2) == 0.0 && rs(1).getLong(3) == 0L)
  }
}

class CollocationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigrams are consecutive token pairs, none for 1-token text") {
    val rows = Seq("one two three", "solo", "").toDF("text")
      .select(Collocations.bigrams(col("text")).as("b")).collect()
    assert(rows(0).getSeq[org.apache.spark.sql.Row](0).map(r =>
      (r.getString(0), r.getString(1))) ==
      Seq(("one", "two"), ("two", "three")))
    assert(rows(1).getSeq[Any](0).isEmpty)
    assert(rows(2).getSeq[Any](0).isEmpty)
  }

  test("pmiTopK scores the glued pair from exact integer counts") {
    val docs = Seq("the cat sat", "the dog sat", "san francisco",
      "san francisco").toDF("text")
    val top = Collocations.pmiTopK(docs, "text", minCount = 2, k = 10)
      .collect()
    // only (san, francisco) reaches minCount=2: c_ab=2, c_a=c_b=2, N=6
    assert(top.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("san", "francisco")))
    val r = top.head
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L && r.getLong(4) == 2L)
    assert(r.getLong(5) == 2L * 6 * 1000000 / (2 * 2))
  }
}

class StratifiedExactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("keeps exactly ceil(n/5) per stratum, deterministically") {
    val df = ((1L to 7L).map(i => (i, "big")) ++
      (8L to 10L).map(i => (i, "small"))).toDF("id", "g")
    val take = Sampling.stratifiedExact(df, "id", "g", num = 1, den = 5)
    val counts = take.groupBy("g").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("big" -> 2L, "small" -> 1L)) // ceil(7/5), ceil(3/5)
    val again = Sampling.stratifiedExact(df, "id", "g", 1, 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(take.select("id").collect().map(_.getLong(0)).toSet == again)
  }
}

class InvertedIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sharded postings reassemble per token; minDf drops the tail") {
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "b")).toDF("id", "text")
    val idx = TextAnalysis.invertedIndex(docs, "id", "text",
        nShards = 2, minDf = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // only "b" has df >= 2; doc_id % 2 routes 2 -> shard 0, 1,3 -> shard 1
    assert(idx.keySet == Set(("b", 0L), ("b", 1L)))
    assert(idx(("b", 0L)) == ((3L, 1L, "2")))
    assert(idx(("b", 1L)) == ((3L, 2L, "1,3")))
  }
}
