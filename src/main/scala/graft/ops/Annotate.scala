package graft.ops

import graft.model.{ColMeta, FieldsCatalog}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.MetadataBuilder

/** Projection + metadata-preserving rename (SURVEY §2.2 P1/P2).
  *
  * The reference attaches `{name, desc}` to each kept column and drops
  * columns absent from the dictionary (`run_annotate.py:183-184`, `:286`,
  * `:309`). Spark's native way to carry that is `StructField.metadata`,
  * which survives a Parquet round-trip in the footer schema — no side
  * catalog needed for the data files themselves.
  */
object Annotate {

  def metadataFor(name: Option[String], desc: Option[String])
      : org.apache.spark.sql.types.Metadata = {
    val b = new MetadataBuilder()
    name.foreach(b.putString("name", _))
    desc.foreach(b.putString("desc", _))
    b.build()
  }

  /** Keep only `cols` (in spec order), attaching name/desc metadata.
    * Column matching is normalized (trim+lower) on both sides — the
    * deliberate fix for the reference's case-mismatch bug (SURVEY §1.5.1).
    * Spec columns missing from the frame are skipped (the reference
    * filters to the intersection, `run_annotate.py:183`).
    */
  def project(df: DataFrame, cols: Seq[ColMeta]): DataFrame = {
    val byNorm = df.columns.map(c => FieldsCatalog.norm(c) -> c).toMap
    val selected = cols.flatMap { m =>
      byNorm.get(FieldsCatalog.norm(m.col)).map { actual =>
        graft.Cols.ref(actual).as(FieldsCatalog.norm(m.col),
          metadataFor(m.name, m.desc))
      }
    }
    if (selected.isEmpty) df else df.select(selected: _*)
  }

  /** Annotate in place (no projection): attach metadata where the catalog
    * resolves, keep every column.
    */
  def annotateAll(df: DataFrame, catalog: FieldsCatalog,
                  process: String = "*", file: String = "*"): DataFrame = {
    val out = df.columns.map { c =>
      catalog.resolve(c, process, file) match {
        case Some(e) => graft.Cols.ref(c).as(c,
          metadataFor(Some(e.name).filter(_.nonEmpty),
                      Some(e.desc).filter(_.nonEmpty)))
        case None => graft.Cols.ref(c)
      }
    }
    df.select(out.toSeq: _*)
  }
}
