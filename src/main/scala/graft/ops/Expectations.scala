package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations: declarative per-row checks evaluated in
  * ONE pass over the table, plus referential-integrity counts — the
  * validation gate a pipeline runs before promoting a snapshot.
  *
  * Scale shape: all row checks fold into a single aggregation (each is
  * a sum of a when()), so N checks cost one scan with map-side
  * partials; the orphan check is one left-anti join on the key (AQE
  * broadcasts the smaller side). Nothing touches the driver beyond the
  * one-row summary.
  */
object Expectations {

  /** `checks` are (name, violation predicate) — a row matching the
    * predicate counts as a violation. Output: one row per check:
    * (check_name, n_violations, n_rows).
    */
  def check(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      checks.map { case (name, cond) =>
        sum(when(cond, 1L).otherwise(0L)).as(s"__v_$name")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = checks.flatMap { case (name, _) =>
      Seq(lit(name), col(s"__v_$name"))
    }
    one.select(explode(map(pairs: _*)).as(Seq("check_name", "n_violations")),
      col("n_rows"))
  }

  /** Rows of `child` whose key has no match in `parent` — counted, not
    * materialized. Output: (check_name, n_violations, n_rows).
    */
  def orphans(child: DataFrame, parent: DataFrame, childKey: String,
              parentKey: String, name: String): DataFrame = {
    val nRows = child.count()
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey),
        "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"),
        lit(nRows).as("n_rows"))
  }
}
