package graft.ops

import graft.TestSpark
import graft.model.{ColMeta, FieldsCatalog, MeltEnd, MeltSpec, TokenSpec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TokensSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("tokenNames preserves order") {
    assert(Tokens.tokenNames("data/[A]/x/[B]/f.txt") == Seq("A", "B"))
  }

  test("toGlob replaces tokens with *") {
    assert(Tokens.toGlob("data/[GENE]/rra.txt") == "data/*/rra.txt")
  }

  test("toRegex quotes literal dots") {
    val re = Tokens.toRegex("d/[G]/a.b.txt")
    assert("d/XYZ/a.b.txt".matches(re))
    assert(!"d/XYZ/aXbXtxt".matches(re)) // '.' must not be a wildcard
  }

  test("extraction pulls mid-path segment, URL-decoded") {
    import java.nio.file.{Files, Paths}
    val base = Files.createTempDirectory("graft-tok")
    val dir = base.resolve("data").resolve("MIDDLE EAST")
    Files.createDirectories(dir)
    Files.write(dir.resolve("f.tsv"), "a\n1\n".getBytes)
    val pattern = s"$base/data/[region]/f.tsv"
    val df = spark.read.option("header", "true").csv(Tokens.toGlob(pattern))
    val out = Tokens.withTokenColumns(df, pattern,
      Seq(TokenSpec("region", Some("region"))))
    assert(out.select("region").head.getString(0) == "MIDDLE EAST")
  }

  test("multi-token pattern extracts both segments end to end") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-tok2")
    val dir = base.resolve("data/expA/rep2")
    Files.createDirectories(dir)
    Files.write(dir.resolve("f.tsv"), "x\n1\n".getBytes)
    val pattern = s"$base/data/[EXP]/[REP]/f.tsv"
    val df = spark.read.option("header", "true").csv(Tokens.toGlob(pattern))
    val out = Tokens.withTokenColumns(df, pattern,
      Seq(TokenSpec("EXP"), TokenSpec("REP"))).head
    assert(out.getString(1) == "expA" && out.getString(2) == "rep2")
  }

  test("resolveDataDirectory anchors to leading segment") {
    assert(Tokens.resolveDataDirectory("data/x.csv", "/root/d") == "/root/d/x.csv")
    assert(Tokens.resolveDataDirectory("$data_directory/x.csv", "/root/d") == "/root/d/x.csv")
    // a path merely containing "data" is not rewritten (SURVEY §1.5.5)
    assert(Tokens.resolveDataDirectory("metadata/x.csv", "/root/d") == "metadata/x.csv")
  }
}

class MeltSpec_ extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("melt folds value columns to long form") {
    val df = Seq((1, 10, 1.5), (2, 20, 2.5)).toDF("id", "a", "b")
    val out = Melt.melt(df, Seq("id"), Seq("a", "b")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set((1, "a", 10.0), (1, "b", 1.5),
      (2, "a", 20.0), (2, "b", 2.5)))
  }

  test("melt respects key/value names from spec") {
    val df = Seq((1, 2.0)).toDF("id", "x")
    val spec = MeltSpec(Some(MeltEnd("sample")), Some(MeltEnd("reads")),
      Seq("x"))
    val out = Melt(df, spec, Seq("id"))
    assert(out.columns.toSeq == Seq("id", "sample", "reads"))
  }

  test("string value columns melt without numeric cast") {
    val df = Seq((1, "p", "q")).toDF("id", "a", "b")
    val out = Melt.melt(df, Seq("id"), Seq("a", "b"))
    assert(out.count() == 2)
  }

  test("mixed string+numeric value columns melt to string (pandas object)") {
    val df = Seq((1, "p", 2.5, 7L)).toDF("id", "a", "b", "c")
    val out = Melt.melt(df, Seq("id"), Seq("a", "b", "c"))
    assert(out.schema("value").dataType.typeName == "string")
    assert(out.collect().map(_.getString(2)).toSet == Set("p", "2.5", "7"))
  }

  test("row count = ids x value columns") {
    val df = Seq((1, 1.0, 2.0, 3.0), (2, 4.0, 5.0, 6.0))
      .toDF("id", "a", "b", "c")
    assert(Melt.melt(df, Seq("id"), Seq("a", "b", "c")).count() == 6)
  }
}

class AnnotateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("project keeps spec order, normalizes names, attaches metadata") {
    val df = Seq((1, "x", 2.0)).toDF("B", "A", "C")
    val out = Annotate.project(df, Seq(
      ColMeta("a", Some("Alpha"), Some("first")),
      ColMeta("B", Some("Beta"), None)))
    assert(out.columns.toSeq == Seq("a", "b"))
    assert(out.schema("a").metadata.getString("name") == "Alpha")
    assert(out.schema("a").metadata.getString("desc") == "first")
  }

  test("metadata survives parquet round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-md").toString
    val df = Seq((1, 2)).toDF("x", "y")
    Annotate.project(df, Seq(ColMeta("x", Some("Ex"), Some("d"))))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("x").metadata.getString("name") == "Ex")
  }

  test("case-mismatched lookup resolves (SURVEY §1.5.1 fix)") {
    val df = Seq((1, 2)).toDF("Gene", "score")
    val out = Annotate.project(df, Seq(ColMeta("gene", Some("G"), None)))
    assert(out.columns.toSeq == Seq("gene"))
  }

  test("annotateAll keeps every column, annotating catalog hits only") {
    val df = Seq((1, 2)).toDF("gene", "mystery")
    val cat = FieldsCatalog(Seq(
      graft.model.FieldEntry("gene", name = "Gene", desc = "target")))
    val out = Annotate.annotateAll(df, cat)
    assert(out.columns.toSeq == Seq("gene", "mystery"))
    assert(out.schema("gene").metadata.getString("name") == "Gene")
    assert(out.schema("mystery").metadata.toString == "{}")
  }
}

class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile flags low-cardinality columns at threshold 10") {
    val df = (1 to 100).map(i => (i, i % 3)).toDF("hi", "lo")
    val rows = Profile.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows("hi") == (100L, false))
    assert(rows("lo") == (3L, true))
  }

  test("approx profile agrees with exact at tiny cardinalities") {
    val df = (1 to 100).map(i => (i % 4, "x")).toDF("lo", "s")
    val approx = Profile.profile(df, exact = false).collect()
      .map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(approx("lo") && approx("s")) // HLL exact at n << 10
  }

  test("numericSummary computes one-pass min/max/mean/stddev") {
    val df = Seq((1.0, "a"), (3.0, "b"), (5.0, "c")).toDF("v", "s")
    val r = Profile.numericSummary(df).head
    assert(r.getAs[Double]("v__min") == 1.0)
    assert(r.getAs[Double]("v__max") == 5.0)
    assert(r.getAs[Double]("v__mean") == 3.0)
    assert(math.abs(r.getAs[Double]("v__stddev") - 2.0) < 1e-12)
  }
}

class ConcatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unionByName fills missing columns with null") {
    val a = Seq((1, "x")).toDF("id", "a")
    val b = Seq((2, "y")).toDF("id", "b")
    val u = Concat.unionByName(Seq(a, b))
    assert(u.columns.toSet == Set("id", "a", "b"))
    assert(u.count() == 2)
  }

  test("driftReport counts per-column presence across frames") {
    val a = Seq((1, "x")).toDF("id", "a")
    val b = Seq((2, "y")).toDF("id", "b")
    val rep = Concat.driftReport(Seq(a, b))
    assert(rep == Map("id" -> 2, "a" -> 1, "b" -> 1))
  }

  test("property: concat row count is sum of parts") {
    // scalacheck-style property over generated sizes, deterministic seed
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val sizes = Seq.fill(3)(rnd.nextInt(20))
      val frames = sizes.map(n => (0 until n).map(i => Tuple1(i)).toDF("v"))
      assert(Concat.unionByName(frames).count() == sizes.sum)
    }
  }
}
