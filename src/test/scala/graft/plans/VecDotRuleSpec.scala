package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecDotRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // range-backed so ConstantFolding cannot collapse the projection to a
  // LocalRelation before the plan is inspected; id = 1 -> a = [1,2,3],
  // b = [0.5,-1,2]
  private lazy val vecs = {
    val df = spark.range(1, 2).select(
      array(col("id").cast("double"), lit(2.0), lit(3.0)).as("a"),
      array(lit(0.5), lit(-1.0), col("id").cast("double") + 1.0).as("b"))
    df.createOrReplaceTempView("vecdot_rule_vecs")
    df
  }

  private def optimized(sql: String): String = {
    vecs // ensure the view exists
    spark.sql(sql).queryExecution.optimizedPlan.toString
  }

  test("SQL higher-order dot-product idiom rewrites to vec_dot") {
    val q = """SELECT aggregate(zip_with(a, b, (x, y) -> x * y),
              |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d
              |FROM vecdot_rule_vecs""".stripMargin
    assert(optimized(q).contains("vec_dot"), optimized(q))
    assert(spark.sql(q).head.getDouble(0) == 1.0 * 0.5 - 2.0 + 3.0 * 2.0)
  }

  test("swapped lambda argument orders still match (IEEE-commutative)") {
    val q = """SELECT aggregate(zip_with(a, b, (x, y) -> y * x),
              |  CAST(0.0 AS DOUBLE), (acc, v) -> v + acc) AS d
              |FROM vecdot_rule_vecs""".stripMargin
    assert(optimized(q).contains("vec_dot"), optimized(q))
  }

  test("self-product norm idiom over a plain column rewrites") {
    val q = """SELECT sqrt(aggregate(transform(a, x -> x * x),
              |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)) AS n
              |FROM vecdot_rule_vecs""".stripMargin
    assert(optimized(q).contains("vec_dot"), optimized(q))
    assert(spark.sql(q).head.getDouble(0) == math.sqrt(14.0))
  }

  test("non-dot folds are left alone") {
    for (q <- Seq(
      // sum, not product
      """SELECT aggregate(zip_with(a, b, (x, y) -> x + y),
        |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) FROM vecdot_rule_vecs""".stripMargin,
      // non-zero seed
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y),
        |  CAST(1.0 AS DOUBLE), (acc, v) -> acc + v) FROM vecdot_rule_vecs""".stripMargin,
      // max-fold, not sum
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y),
        |  CAST(0.0 AS DOUBLE), (acc, v) -> greatest(acc, v)) FROM vecdot_rule_vecs""".stripMargin))
      assert(!optimized(q).contains("vec_dot"), optimized(q))
  }

  test("Column-API composed form rewrites identically") {
    val df = vecs.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    assert(df.head.getDouble(0) == 4.5)
  }
}
