package graft.plans

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 10 groups x 1000 rows, values scrambled deterministically
  private lazy val df = (1L to 10000L)
    .map(i => (i % 10, i * 2654435761L % 99991L, i))
    .toDF("g", "v", "id")

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  test("rewrite rule turns the row_number idiom into TopKPerGroupExec") {
    val q = windowTopK(3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupFinal"), plan)
    assert(plan.contains("TopKPerGroupPartial"), plan)
    assert(!plan.contains("WindowExec") && !plan.toLowerCase.contains("window("),
      s"window survived the rewrite:\n$plan")
    // partial runs BELOW the exchange (prune before shuffle)
    val iFinal = plan.indexOf("TopKPerGroupFinal")
    val iEx = plan.indexOf("Exchange")
    val iPartial = plan.indexOf("TopKPerGroupPartial")
    assert(iFinal < iEx && iEx < iPartial,
      s"expected final > exchange > partial:\n$plan")
  }

  test("rewritten plan matches a sort-based reference, rank included") {
    val got = windowTopK(3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    // reference computed without the rule firing: aggregate-free
    // driver-side sort of the same data
    val want = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(t => (t._2, t._3)).take(3).zipWithIndex
          .map { case ((g, v, id), i) => (g, v, id, i + 1) }
      }.toSet
    assert(got == want)
  }

  test("direct API (no rank) and ties/edge shapes") {
    val got = graft.ops.TopK.perGroup(df, Seq(col("g")),
        Seq(col("v"), col("id")), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(t => (t._2, t._3)).take(2).map(t => (t._1, t._2))
      }.toSet
    assert(got == want)
    // k larger than any group: everything comes back
    assert(graft.ops.TopK.perGroup(df, Seq(col("g")), Seq(col("v")),
      5000).count() == 10000)
    // descending order works
    val top1 = graft.ops.TopK.perGroup(df, Seq(col("g")),
        Seq(col("v").desc, col("id")), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val wantMax = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, rows) => g -> rows.map(_._2).max }
    assert(top1 == wantMax)
  }

  test("rule leaves non-top-k window filters alone") {
    val w = Window.partitionBy("g").orderBy(col("v"))
    // rank() (not row_number) must NOT rewrite
    val q1 = df.withColumn("r", rank().over(w)).filter(col("r") <= 3)
    assert(!q1.queryExecution.executedPlan.toString
      .contains("TopKPerGroup"))
    // filter on something else must NOT rewrite
    val q2 = df.withColumn("r", row_number().over(w)).filter(col("v") <= 3)
    assert(!q2.queryExecution.executedPlan.toString
      .contains("TopKPerGroup"))
  }
}
