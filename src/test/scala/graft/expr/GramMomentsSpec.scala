package graft.expr

import graft.TestSpark
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GramMoments must be a BIT-EXACT twin of the explode → id-self-join
  * → groupBy(i,j) build it replaced in Spectral (same quantization,
  * same hi/lo split, long addition exactly associative) — asserted by
  * running both forms over the same frame and diffing every cell.
  */
class GramMomentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def kernelCells(df: org.apache.spark.sql.DataFrame, dims: Int) = {
    val agg = GraftExpressionBridge.column(
      GramMoments(
        GraftExpressionBridge.expression(col("v").cast("array<double>")),
        dims).toAggregateExpression())
    df.groupBy().agg(agg.as("cells"))
      .select(explode(col("cells")).as("c"))
      .select(col("c.i"), col("c.j"), col("c.n"), col("c.hi"), col("c.lo"))
  }

  private def joinCells(df: org.apache.spark.sql.DataFrame) = {
    val e = df.select(col("id"),
        posexplode(col("v").cast("array<double>")).as(Seq("i", "x")))
      .select(col("id"), col("i").cast("long").as("i"), col("x"))
    val q = floor((col("a.x") * col("b.x") + lit(4.0)) * lit(1e8)
      + lit(0.5)).cast("long")
    e.as("a").join(e.as("b"), Seq("id"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(count(lit(1)).as("n"),
        sum(shiftright(q, 20)).as("hi"),
        sum(q.bitwiseAND(lit(1048575L))).as("lo"))
  }

  test("bit-identical to the join form on a dense deterministic corpus") {
    val dims = 6
    val rows = (1 to 80).map { i =>
      (i.toLong, (0 until dims).map(d =>
        math.sin(i * 0.7 + d * 1.3) * 1.9).toSeq)
    }
    val df = rows.toDF("id", "v")
    val k = kernelCells(df, dims)
    val j = joinCells(df)
    assert(k.count() == dims.toLong * dims)
    val diff = k.join(j, Seq("i", "j"))
      .filter(k("n") =!= j("n") || k("hi") =!= j("hi") || k("lo") =!= j("lo"))
    assert(diff.count() == 0)
  }

  test("null elements: counted in n, skipped in the sums (join parity)") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, null, 0.5)),
      (2L, Seq[java.lang.Double](0.25, -1.0, null)),
      (3L, Seq[java.lang.Double](0.1, 0.2, 0.3)))
      .toDF("id", "v")
    val k = kernelCells(df, 3)
    val j = joinCells(df)
    val diff = k.join(j, Seq("i", "j"))
      .filter(k("n") =!= j("n") || k("hi") =!= j("hi") || k("lo") =!= j("lo"))
    assert(diff.count() == 0)
  }

  test("short vectors only fill their own cells") {
    val df = Seq((1L, Seq(1.0, 1.0)), (2L, Seq(1.0, 1.0, 1.0)))
      .toDF("id", "v")
    val k = kernelCells(df, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(k((0L, 0L)) == 2L && k((2L, 2L)) == 1L && k((0L, 2L)) == 1L)
  }

  test("partial-aggregate merge is exact across many partitions") {
    val dims = 4
    val rows = (1 to 64).map(i =>
      (i.toLong, (0 until dims).map(d => (i * d % 7) * 0.3 - 1.0).toSeq))
    val df1 = rows.toDF("id", "v").repartition(1)
    val df16 = rows.toDF("id", "v").repartition(16)
    val a = kernelCells(df1, dims).orderBy("i", "j").collect().toSeq
    val b = kernelCells(df16, dims).orderBy("i", "j").collect().toSeq
    assert(a == b)
  }
}
