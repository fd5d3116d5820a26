package graft.ops

import org.apache.spark.sql.DataFrame

/** Concat (union-all) of a file group into one logical table
  * (SURVEY §2.7 U1; `run_annotate.py:195`).
  *
  * Preferred path is NOT this object: a single glob read already yields
  * one distributed scan over all files (see [[Tokens]]), which is the
  * scalable plan. `unionByName` exists for the drift case — per-file
  * schemas that disagree (SURVEY §7.4.3) — where each schema cluster is
  * read separately and aligned by name.
  */
object Concat {

  /** Union many frames by column name, tolerating missing columns
    * (filled with null). Order of rows follows input order of frames.
    */
  def unionByName(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "concat of zero frames")
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Validation report for schema drift across a file group: per-column
    * presence count. Driver-scale (schemas only).
    */
  def driftReport(frames: Seq[DataFrame]): Map[String, Int] =
    frames.flatMap(_.columns).groupBy(identity).map { case (c, xs) => c -> xs.size }
}
