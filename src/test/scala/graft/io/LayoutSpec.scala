package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def perFileRange(dir: String, c: String): Seq[(Long, Long)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
    files.map { f =>
      val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head
      (r.getLong(0), r.getLong(1))
    }
  }

  test("sortedWrite yields pairwise-disjoint per-file ranges") {
    val dir = Files.createTempDirectory("layout_sorted").toString
    val df = (1L to 10000L).map(i => (i * 2654435761L % 100000L, i))
      .toDF("k", "v")
    Layout.sortedWrite(df, Seq("k"), dir, numFiles = 8)
    val ranges = perFileRange(dir, "k").sortBy(_._1)
    assert(ranges.size >= 2)
    ranges.sliding(2).foreach { case Seq((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping file ranges: $ranges")
    case _ => ()
    }
  }

  test("zorderKey interleaves bits (locality: close points, close keys)") {
    val got = Seq((3L, 5L)).toDF("a", "b")
      .select(Layout.zorderKey($"a", $"b", 4)).head.getLong(0)
    // a=0011 even positions, b=0101 odd positions -> 0b100111 = 39
    assert(got == 39L)
  }

  test("zorderWrite bounds per-file rectangles on BOTH columns") {
    val dir = Files.createTempDirectory("layout_z").toString
    // 64x64 grid, row-major insertion order (worst case for naive writes)
    val df = (0L until 4096L).map(i => (i / 64L, i % 64L)).toDF("a", "b")
    Layout.zorderWrite(df, "a", "b", dir, numFiles = 16, bits = 6)
    val ra = perFileRange(dir, "a")
    val rb = perFileRange(dir, "b")
    val avgSpanA = ra.map { case (lo, hi) => hi - lo }.sum.toDouble / ra.size
    val avgSpanB = rb.map { case (lo, hi) => hi - lo }.sum.toDouble / rb.size
    // 16 z-ordered files over a 64x64 grid cover ~16x16 tiles; a naive
    // row-major split would give avg span ~63 on b. Require BOTH
    // dimensions clustered well below the global span.
    assert(avgSpanA <= 32, s"a not clustered: $ra")
    assert(avgSpanB <= 32, s"b not clustered: $rb")
  }

  test("partitionedWrite prunes directories at planning time") {
    val dir = Files.createTempDirectory("layout_part").toString
    val df = (1L to 300L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    Layout.partitionedWrite(df, "g", dir)
    // one directory per partition value
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("g=g0", "g=g1", "g=g2"))
    val read = spark.read.parquet(dir).filter(col("g") === "g1")
    val plan = read.queryExecution.executedPlan.toString
    // the predicate lands in PartitionFilters (planning-time directory
    // skip), NOT in the data Filter
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("g"), plan)
    assert(read.count() == 100)
    // files actually scanned: only the g=g1 directory's
    val scanned = read.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("g=g1")),
      scanned.mkString(","))
  }
}
