package graft.expr

import graft.TestSpark
import graft.ops.ext.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecDotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The historical composed-expression fold VecDot replaced — the
    * equivalence reference (same fold the DuckDB oracles reproduce).
    */
  private def foldDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the composed aggregate(zip_with) fold") {
    // deterministic pseudo-random vectors, incl. negative + tiny values
    val rows = (1 to 200).map { i =>
      val rng = new scala.util.Random(i)
      (i.toLong, Seq.fill(64)(rng.nextDouble() - 0.5),
        Seq.fill(64)(rng.nextDouble() - 0.5))
    }
    val df = rows.toDF("id", "a", "b")
    val mismatches = df.select(
      Similarity.dot($"a", $"b").as("native"), foldDot($"a", $"b").as("fold"))
      .filter(col("native") =!= col("fold")) // exact double comparison
      .count()
    assert(mismatches == 0)
  }

  test("null semantics mirror zip_with: null array/element/length mismatch") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (2L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (3L, Seq[java.lang.Double](1.0), Seq[java.lang.Double](3.0, 4.0)),
      (4L, null, Seq[java.lang.Double](3.0, 4.0)),
      (5L, Seq.empty[java.lang.Double], Seq.empty[java.lang.Double])
    ).toDF("id", "a", "b")
    val got = df.select($"id", Similarity.dot($"a", $"b").as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(11.0), 2L -> None, 3L -> None,
      4L -> None, 5L -> Some(0.0)))
  }

  test("float arrays implicitly widen to double (analyzer cast)") {
    val df = Seq((1L, Seq(1.0f, 2.0f), Seq(2.0f, 0.5f))).toDF("id", "a", "b")
    val d = df.select(Similarity.dot($"a", $"b")).head.getDouble(0)
    assert(d == 1.0f.toDouble * 2.0f.toDouble + 2.0f.toDouble * 0.5f.toDouble)
  }

  test("SQL surface: vec_dot registered by GraftExtensions") {
    Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT vec_dot(a, b) FROM vecs").head.getDouble(0) == 11.0)
  }

  test("stays inside whole-stage codegen") {
    // spark.range keeps the projection non-foldable (a literal Seq
    // constant-folds to LocalTableScan and shows no codegen at all)
    val df = spark.range(8)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), col("id").cast("double")).as("b"))
      .select(Similarity.dot(col("a"), col("b")).as("d"))
    // the `*(n)` prefix marks operators inside a WholeStageCodegen
    // stage in the executed-plan string; the vec_dot Project must
    // carry it (a CodegenFallback expression would strip it)
    val plan = df.queryExecution.executedPlan.toString
    val projectLine = plan.linesIterator
      .find(_.contains("vec_dot")).getOrElse(fail(plan))
    assert(projectLine.trim.startsWith("*("), plan)
  }
}
