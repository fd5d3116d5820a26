package graft.ops

import graft.Cols.ref
import graft.model.MeltSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DoubleType, NumericType}

/** Melt / unpivot — the reference's signature reshaping operator
  * (SURVEY §2.8 R1; emitted at `run_annotate.py:202-211`, dialect
  * `json/example/transform.json:20`).
  *
  * Spark-first: `Dataset.unpivot` (Spark 3.4+), which plans as a single
  * narrow `Expand` — each input row emits one output row per value column
  * with NO shuffle and full whole-stage codegen, so a 100 TB melt is one
  * pass over the scan.
  *
  * Value columns of heterogeneous numeric types are cast to Double first
  * (unpivot requires a common type; pandas melt similarly upcasts to a
  * common dtype).
  */
object Melt {

  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           varName: String = "variable", valueName: String = "value")
      : DataFrame = {
    val values = if (valueCols.nonEmpty) valueCols
      else df.columns.filterNot(idCols.contains).toSeq
    val types = values.map(c => df.schema(c).dataType).distinct
    val allNumeric = types.forall(_.isInstanceOf[NumericType])
    // unpivot needs one common value type: numeric mix -> double;
    // heterogeneous (e.g. string + numeric) -> string, matching pandas
    // melt's upcast-to-object behavior (`run_annotate.py:202-211`)
    val prepared =
      if (allNumeric)
        values.foldLeft(df)((d, c) => d.withColumn(c, ref(c).cast(DoubleType)))
      else if (types.size > 1)
        values.foldLeft(df)((d, c) => d.withColumn(c, ref(c).cast("string")))
      else df
    prepared.unpivot(
      ids = idCols.map(ref).toArray,
      values = values.map(ref).toArray,
      variableColumnName = varName,
      valueColumnName = valueName)
  }

  /** Apply a manifest melt spec: ids = annotated `cols` of the command
    * (`run_annotate.py:202-211` — the melt folds everything not projected
    * as standard), key/value output names from the spec.
    */
  def apply(df: DataFrame, spec: MeltSpec, idCols: Seq[String]): DataFrame =
    melt(df, idCols,
      spec.valueColumns,
      spec.key.map(_.name).filter(_.nonEmpty).getOrElse("variable"),
      spec.value.map(_.name).filter(_.nonEmpty).getOrElse("value"))
}
