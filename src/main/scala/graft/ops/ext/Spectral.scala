package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Spectral analysis of an embedding corpus: the dominant eigenvector
  * of the (uncentered) second-moment matrix M = (1/n)·Σ x·xᵀ by fixed-
  * round power iteration — the PCA-direction primitive under
  * whitening/compression decisions, made reproducible the same way
  * k-means and PageRank were:
  *
  *   - no RNG: v₀ = (1/√d, …, 1/√d) — one IEEE sqrt, identical in any
  *     engine (exactly 0.125 for the d = 64 corpus);
  *   - a fixed round count, not a float-sensitive convergence test;
  *   - the corpus-sized Gram sums use the split-long construction
  *     (the q124 rule — wide DECIMAL aggregation buffers are
  *     BigDecimal-backed and ~20× slower): each product shifts by +4
  *     (non-negative for |x| ≤ 2, the unit-ish embedding envelope),
  *     quantizes to `floor(q·10⁸ + 0.5)` as a long, and the `>>20` /
  *     `&0xFFFFF` halves sum as plain longs — order-independent
  *     exactness at native speed, recombined once per cell (DuckDB:
  *     HUGEINT). The tiny d-row matvec/norm sums stay DECIMAL(38,18).
  *
  * Scale shape: the Gram build is the only corpus-sized work, and it
  * runs as ONE native kernel — [[graft.expr.GramMoments]], a
  * TypedImperativeAggregate whose per-partition buffer holds the 3·d²
  * split-long cells, so the n·d² product stream never materializes as
  * rows (the previous explode → id-self-join → groupBy form streamed
  * 245 M rows through a hash aggregate at sf0.1 and was the entire
  * 5–9 s of q146; the kernel is the same arithmetic in a
  * register-resident loop, O(d²) traffic per partition independent of
  * n). Every iteration after that joins the d²-row matrix against a
  * d-row vector (both broadcast-sized for any practical d). Lineage
  * grows linearly in rounds.
  */
object Spectral {

  /** `iters` power-iteration rounds on the d-dimensional second-moment
    * matrix of `vecCol`. Output: (dim, loading, eigenvalue) — the unit
    * dominant eigenvector and ‖M·v‖ from the last round (the Rayleigh
    * estimate for unit v), both rounded to 6 dp.
    */
  def dominantEigen(df: DataFrame, vecCol: String, idCol: String,
      dims: Int, iters: Int): DataFrame = {
    require(iters >= 1 && dims >= 1)
    val spark = df.sparkSession
    val dec = DecimalType(38, 18)
    // split-long Gram sums via the native GramMoments kernel: shifted
    // product q = x·y + 4 ≥ 0, quantized to 1e-8 longs, hi/lo halves
    // summed as plain longs per partition; the -4·n un-shift uses the
    // cell's exact count (bit-identical to the explode/self-join form
    // this replaced — see GramMoments scaladoc)
    import org.apache.spark.sql.GraftExpressionBridge
    val cellsAgg = GraftExpressionBridge.column(
      graft.expr.GramMoments(
        GraftExpressionBridge.expression(
          col(vecCol).cast("array<double>")),
        dims).toAggregateExpression())
    val m = df.groupBy().agg(cellsAgg.as("cells"))
      .select(explode(col("cells")).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"),
        (((col("c.hi").cast("decimal(38,0)") * lit(1048576L) + col("c.lo"))
          .cast("double") / lit(1e8) - lit(4.0) * col("c.n")) / col("c.n"))
          .as("m"))
      .persist()
    var v = spark.range(0, dims.toLong)
      .select(col("id").as("i"),
        lit(1.0 / math.sqrt(dims.toDouble)).as("v"))
    var nrm: DataFrame = null
    for (_ <- 1 to iters) {
      val w = m.join(broadcast(v.select(col("i").as("j"), col("v").as("vj"))),
          Seq("j"))
        .groupBy(col("i"))
        .agg(sum((col("m") * col("vj")).cast(dec)).as("sw"))
        .select(col("i"), col("sw").cast("double").as("w"))
      nrm = w.agg(
        sqrt(sum((col("w") * col("w")).cast(dec)).cast("double")).as("nrm"))
      v = w.crossJoin(broadcast(nrm))
        .select(col("i"), (col("w") / col("nrm")).as("v"))
    }
    v.crossJoin(broadcast(nrm))
      .select(col("i").as("dim"), round(col("v"), 6).as("loading"),
        round(col("nrm"), 6).as("eigenvalue"))
      .orderBy("dim")
  }
}
