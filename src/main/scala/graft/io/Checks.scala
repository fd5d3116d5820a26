package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-time table constraints (the NOT NULL / CHECK / unique-key
  * enforcement every table format ships): audit a frame in ONE
  * distributed aggregation pass and either report the violation counts
  * or gate a [[TxLog]] commit on them.
  *
  * Scale notes: NOT NULL and CHECK are map-side sums folded in a single
  * `agg` (one pass, no shuffle beyond the final reduce); the unique-key
  * check is `count(*) - count(DISTINCT key-struct)` — one hash
  * aggregation on the key, the same cost as the dedup it guards
  * against. Nothing is collected row-wise to the driver; the audit
  * output is O(#constraints).
  *
  * The reference has no constraint surface (its ingest coerces and
  * moves on — SURVEY.md §1.4); this is part of the table-log family the
  * engine adds for lake deployments.
  */
object TableChecks {

  /** A constraint-gated commit was rejected; `audit` rows are in the
    * message. The table log is untouched (no version was created).
    */
  final class ConstraintViolationException(msg: String)
    extends RuntimeException(msg)

  /** One row per constraint: (constraint, violations).
    *
    * @param notNull   columns that must be non-null
    * @param checks    (name, SQL predicate) pairs; a row violates a
    *                  check when the predicate is not TRUE (so a NULL
    *                  predicate counts as a violation, matching ANSI
    *                  CHECK's inverse: ANSI accepts UNKNOWN — callers
    *                  wanting ANSI semantics add `OR <expr> IS NULL`)
    * @param uniqueKey columns whose tuple must be unique within `df`
    */
  def audit(df: DataFrame, notNull: Seq[String],
      checks: Seq[(String, String)],
      uniqueKey: Option[Seq[String]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nnAggs = notNull.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"not_null_$c"))
    val ckAggs = checks.map { case (name, pred) =>
      sum(when(!coalesce(expr(pred), lit(false)), 1L).otherwise(0L))
        .as(s"check_$name")
    }
    val ukAggs = uniqueKey.toSeq.map { keys =>
      (count(lit(1)) - count_distinct(struct(keys.map(col): _*)))
        .as(s"unique_${keys.mkString("_")}")
    }
    val aggs = nnAggs ++ ckAggs ++ ukAggs
    require(aggs.nonEmpty, "no constraints to audit")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val names = row.schema.fieldNames
    // "constraint_name", not "constraint": the census queries replay
    // this frame through the DuckDB oracle, where CONSTRAINT is reserved
    names.indices.map(i => (names(i), row.getLong(i)))
      .toDF("constraint_name", "violations")
  }

  /** Commit `df` to the table log ONLY if every constraint holds;
    * otherwise throw [[ConstraintViolationException]] with the per-
    * constraint counts and leave the log untouched. Returns the new
    * version on success.
    */
  def commitChecked(spark: SparkSession, table: String, df: DataFrame,
      notNull: Seq[String] = Seq.empty,
      checks: Seq[(String, String)] = Seq.empty,
      uniqueKey: Option[Seq[String]] = None,
      targetFiles: Int = 4): Int = {
    val bad = audit(df, notNull, checks, uniqueKey)
      .filter(col("violations") > 0).collect()
    if (bad.nonEmpty)
      throw new ConstraintViolationException(
        bad.map(r => s"${r.getString(0)}=${r.getLong(1)}")
          .mkString(s"constraint violations rejected commit to $table: ",
            ", ", ""))
    TxLog.commit(spark, table, df, targetFiles)
  }
}
