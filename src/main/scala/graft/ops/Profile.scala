package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling (SURVEY §2.4 A1): per-column distinct counts and the
  * reference's low-cardinality ("categorical") flag at `nunique < 10`
  * (`run_annotate.py:26-27` — applied to ALL columns, numeric included;
  * kept as a metadata flag, SURVEY §1.5.2).
  *
  * All counts are computed in ONE aggregation pass over the table (one
  * job, map-side partials, no per-column scans). `exact=false` switches to
  * HyperLogLog (`approx_count_distinct`) — the 100 TB path, where exact
  * per-column distincts over wide tables are needlessly expensive and the
  * flag only needs "< 10" fidelity (HLL error at cardinality ~10 is nil).
  */
object Profile {
  val CategoricalThreshold = 10

  def distinctCounts(df: DataFrame, exact: Boolean = true): DataFrame = {
    val aggs: Seq[Column] = df.columns.toSeq.map { c =>
      if (exact) countDistinct(graft.Cols.ref(c)).as(c)
      else approx_count_distinct(graft.Cols.ref(c)).as(c)
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Long-form profile: (column, n_distinct, low_cardinality). */
  def profile(df: DataFrame, exact: Boolean = true,
              threshold: Int = CategoricalThreshold): DataFrame = {
    val counts = distinctCounts(df, exact)
    val long = counts.unpivot(Array.empty[Column],
      df.columns.map(graft.Cols.ref), "column", "n_distinct")
    long.withColumn("low_cardinality", col("n_distinct") < lit(threshold))
  }

  /** Numeric summary stats (min/max/mean/stddev per numeric column) —
    * one pass, long form.
    */
  def numericSummary(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.NumericType
    val numCols = df.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSeq
    val aggs = numCols.flatMap { c => Seq(
      min(graft.Cols.ref(c)).cast("double").as(s"${c}__min"),
      max(graft.Cols.ref(c)).cast("double").as(s"${c}__max"),
      avg(graft.Cols.ref(c)).as(s"${c}__mean"),
      stddev(graft.Cols.ref(c)).as(s"${c}__stddev"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
