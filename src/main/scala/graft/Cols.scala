package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Safe column references for DATA-DERIVED names (DSV headers, catalog
  * entries). `col("p.value")` parses the dot as struct access and throws
  * UNRESOLVED_COLUMN for a flat column literally named `p.value` —
  * canonical MAGeCK headers hit exactly this. Everything that passes a
  * header-derived name to `col()` must go through [[Cols.ref]], which
  * backtick-quotes the name (doubling embedded backticks, Spark's own
  * escape). Aliases (`.as(name)`) take names literally and need no
  * quoting.
  */
object Cols {

  /** Backtick-quote an identifier so it resolves as one flat name. */
  def quote(name: String): String = "`" + name.replace("`", "``") + "`"

  /** `col()` for a data-derived (untrusted) column name. */
  def ref(name: String): Column = col(quote(name))
}
