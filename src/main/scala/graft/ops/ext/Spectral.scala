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
  *   - every order-sensitive sum (Gram entries, matrix·vector
  *     components, the norm) accumulates per-term DECIMAL(38,18)
  *     products — exact and order-independent at any parallelism —
  *     with ONE double division/sqrt per scalar at the boundary.
  *
  * Scale shape: the Gram build is the only corpus-sized work — the
  * per-row outer product rides an `id`-keyed self-join of the exploded
  * components (n·d² product rows, map-side combined into d² cells);
  * every iteration after that joins the d²-row matrix against a d-row
  * vector (both broadcast-sized for any practical d). Lineage grows
  * linearly in rounds.
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
    val cnt = df.agg(count(lit(1)).as("__cnt"))
    val e = df.select(col(idCol).as("id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "x")))
      .select(col("id"), col("i").cast("long").as("i"), col("x"))
    val m = e.as("a").join(e.as("b"), Seq("id"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum((col("a.x") * col("b.x")).cast(dec)).as("s"))
      .crossJoin(broadcast(cnt))
      .select(col("i"), col("j"),
        (col("s").cast("double") / col("__cnt")).as("m"))
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
