package graft.io

import graft.TestSpark
import graft.io.Hdf5Writer.{Ds, F32, F64, I32, I64}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class Hdf5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(name: String): String =
    Files.createTempDirectory("graft-h5").resolve(name).toString

  test("contiguous roundtrip: i64 + f64 + i32 columns") {
    val p = tmp("a.h5")
    Hdf5Writer.write(p, Seq(
      Ds("id", I64, Seq(4), Array(1L, 2L, 3L, 4L)),
      Ds("score", F64, Seq(4), Array(0.5, 1.5, -2.25, 1e9)),
      Ds("size", I32, Seq(4), Array(10L, -20L, 30L, 40L))))
    val dss = Hdf5Format.parse(Files.readAllBytes(java.nio.file.Paths.get(p)))
    assert(dss.map(_.name).sorted == Seq("id", "score", "size"))
    val byName = dss.map(d => d.name -> d).toMap
    assert(byName("id").data.asInstanceOf[Array[Long]].toSeq ==
      Seq(1L, 2L, 3L, 4L))
    assert(byName("score").data.asInstanceOf[Array[Double]].toSeq ==
      Seq(0.5, 1.5, -2.25, 1e9))
    assert(byName("size").data.asInstanceOf[Array[Long]].toSeq ==
      Seq(10L, -20L, 30L, 40L))
  }

  test("chunked + deflate roundtrip, including partial edge chunk") {
    val p = tmp("c.h5")
    val vals = (0 until 103).map(_.toLong).toArray
    Hdf5Writer.write(p, Seq(
      Ds("v", I64, Seq(103), vals, chunkDims = Some(Seq(32)),
        deflate = true)))
    val dss = Hdf5Format.parse(Files.readAllBytes(java.nio.file.Paths.get(p)))
    assert(dss.head.data.asInstanceOf[Array[Long]].toSeq == vals.toSeq)
  }

  test("rank-2 f32 dataset becomes an array column") {
    val p = tmp("m.h5")
    Hdf5Writer.write(p, Seq(
      Ds("emb", F32, Seq(3, 4),
        (0 until 12).map(_.toDouble / 4).toArray)))
    val dss = Hdf5Format.parse(Files.readAllBytes(java.nio.file.Paths.get(p)))
    assert(dss.head.dims == Seq(3L, 4L))
    val df = Hdf5Source.readToDataFrame(spark, Seq(p))
    assert(df.schema("emb").dataType.typeName == "array")
    val row0 = df.orderBy().collect().map(_.getSeq[Double](0))
    assert(row0.exists(_ == Seq(0.0, 0.25, 0.5, 0.75)))
  }

  test("hdf5ToParquet end to end over multiple files") {
    val dir = Files.createTempDirectory("graft-h5s")
    for (f <- 0 until 3) {
      Hdf5Writer.write(dir.resolve(s"part$f.h5").toString, Seq(
        Ds("k", I64, Seq(2), Array(f * 2L, f * 2L + 1)),
        Ds("x", F64, Seq(2), Array(f * 1.5, f * 2.5))))
    }
    val out = dir.resolve("out").toString
    val df = Hdf5Source.hdf5ToParquet(spark, s"$dir/*.h5", out)
    assert(df.columns.toSeq == Seq("k", "x"))
    val back = spark.read.parquet(out)
    assert(back.count() == 6)
    assert(back.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 6L).toSeq)
  }

  test("DSV2: one file splits into multiple chunk-aligned partitions") {
    val p = tmp("split.h5")
    val n = 1000
    Hdf5Writer.write(p, Seq(
      Ds("id", I64, Seq(n), (0 until n).map(_.toLong).toArray,
        chunkDims = Some(Seq(100)), deflate = true),
      Ds("val", F64, Seq(n), (0 until n).map(_ * 0.5).toArray,
        chunkDims = Some(Seq(100)))))
    val df = spark.read.format("hdf5")
      .option("rowsPerPartition", "300").load(p)
    assert(df.rdd.getNumPartitions == 4) // 1000 rows / 300 -> 4 ranges
    assert(df.count() == n)
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until n).map(identity))
    assert(rows.map(_.getDouble(1)).toSeq == (0 until n).map(_ * 0.5))
  }

  test("DSV2: column pruning reaches the hdf5 scan") {
    val p = tmp("prune.h5")
    Hdf5Writer.write(p, Seq(
      Ds("a", I64, Seq(5), Array(1L, 2L, 3L, 4L, 5L)),
      Ds("b", F64, Seq(5), Array(1.0, 2.0, 3.0, 4.0, 5.0))))
    val df = spark.read.format("hdf5").load(p).select("b")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hdf5 scan (b)"), s"pruning missed:\n$plan")
    assert(df.collect().map(_.getDouble(0)).toSeq ==
      Seq(1.0, 2.0, 3.0, 4.0, 5.0))
  }

  test("DSV2: row-range decode matches whole-file decode (rank 2)") {
    val p = tmp("range.h5")
    val n = 57
    Hdf5Writer.write(p, Seq(
      Ds("emb", F32, Seq(n, 3),
        (0 until n * 3).map(_.toDouble / 2).toArray,
        chunkDims = Some(Seq(10, 3)), deflate = true)))
    val df = spark.read.format("hdf5")
      .option("rowsPerPartition", "10").load(p)
    assert(df.rdd.getNumPartitions == 6)
    val got = df.collect().map(_.getSeq[Double](0)).toSet
    val want = (0 until n)
      .map(i => (i * 3 until (i + 1) * 3).map(_.toDouble / 2)).toSet
    assert(got == want)
  }

  test("property: writer -> reader roundtrip on random arrays") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.choose(1, 200)
      longs <- Gen.listOfN(n, Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))
      dbls <- Gen.listOfN(n, Gen.choose(-1e12, 1e12))
      chunked <- Gen.oneOf(true, false)
    } yield (longs.toArray, dbls.toArray, chunked)
    val prop = Prop.forAll(gen) { case (ls, ds, chunked) =>
      val p = tmp("prop.h5")
      val chunk = if (chunked) Some(Seq(17)) else None
      Hdf5Writer.write(p, Seq(
        Ds("l", I64, Seq(ls.length), ls, chunk, deflate = chunked),
        Ds("d", F64, Seq(ds.length), ds, chunk, deflate = chunked)))
      val back = Hdf5Format.parse(
        Files.readAllBytes(java.nio.file.Paths.get(p)))
        .map(x => x.name -> x).toMap
      back("l").data.asInstanceOf[Array[Long]].toSeq == ls.toSeq &&
        back("d").data.asInstanceOf[Array[Double]].toSeq == ds.toSeq
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("reader rejects what it cannot decode, clearly") {
    val junk = Array.fill[Byte](200)(7)
    val e = intercept[IllegalArgumentException](Hdf5Format.parse(junk))
    assert(e.getMessage.contains("signature"))
  }
}
