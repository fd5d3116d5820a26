package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pre-commit data-shape guard: every declared query must ANALYZE against
  * the current sf0.001 data before a round can close. Round 3 shipped 32
  * queries that failed analysis on a drifted events-ts encoding because
  * nothing exercised plan analysis across the whole surface — this suite
  * turns the next such drift into a red test instead of a lost round.
  *
  * Batch queries stop at the analyzed plan (no job runs); streaming
  * queries execute inside their builder, which is exactly the coverage
  * the batch-analysis check can't give them.
  */
class AnalyzesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("queries and oracleSql declare the same names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q diff o).isEmpty, s"queries without oracle: ${q diff o}")
    assert((o diff q).isEmpty, s"oracles without query: ${o diff q}")
  }

  test("every declared query analyzes at sf0.001") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).queryExecution.analyzed; None }
        catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName} ${
              Option(e.getMessage).getOrElse("").linesIterator.take(3)
                .mkString(" | ")}")
        }
    }
    assert(bad.isEmpty, s"${bad.size} queries fail analysis:\n${
      bad.mkString("\n")}")
  }
}
