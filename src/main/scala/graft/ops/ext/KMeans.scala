package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic Lloyd k-means — the iterative clustering primitive
  * under SemDeDup-style pipelines, made fully reproducible (and so
  * DuckDB-oracle-checkable) the same way the PageRank operator was:
  *
  *   - init has no RNG: centroids = every `centroidEvery`-th vector
  *     (the IVF quantizer's convention);
  *   - assignment ties break by centroid id;
  *   - centroid means accumulate through DECIMAL(38,18) — exact and
  *     order-independent at any parallelism — and divide back to
  *     double with one IEEE division per component;
  *   - a fixed round count instead of a float-sensitive convergence
  *     test.
  *
  * Scale shape per round: centroids broadcast (k·d doubles) to one
  * corpus scan for the argmin (VecDot codegen'd folds), one shuffle of
  * (cid, dim, x) for the component means — d·n rows of 24 bytes,
  * map-side combined. Lineage grows linearly in rounds (no iterative
  * self-join on the corpus), so no checkpointing is needed for small
  * fixed round counts; empty clusters drop out silently.
  */
object KMeans {

  /** `iters` assignment+update rounds; returns the final component
    * table: (cid, dim, n, centroid) — n members per cluster and the
    * centroid value per dimension (rounded to 6 dp, the repo contract).
    */
  def lloyd(df: DataFrame, vecCol: String, idCol: String,
      centroidEvery: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"need at least one round: $iters")
    val vecs = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
      .withColumn("xx", Similarity.dot(col("vec"), col("vec")))
    var cents = vecs.filter(col("id") % centroidEvery === 0)
      .select(col("id").as("cid"), col("vec").as("centv"))

    def assign(c: DataFrame): DataFrame = {
      val withCc = c.withColumn("cc",
        Similarity.dot(col("centv"), col("centv")))
      val scored = vecs.crossJoin(broadcast(withCc))
        .withColumn("d2", col("xx")
          - lit(2.0) * Similarity.dot(col("vec"), col("centv"))
          + col("cc"))
      // argmin as a MIN(struct) aggregate, not a row_number window:
      // same (d2 asc, cid asc) winner (struct ordering is
      // lexicographic; cid is unique per id so (d2, cid) ties cannot
      // reach the vec field), but the aggregate partial-combines
      // map-side — the shuffle carries one row per vector instead of
      // one per (vector × centroid) scored pair (k× fewer bytes; the
      // window form also had to sort every partition).
      scored.groupBy("id")
        .agg(min(struct(col("d2"), col("cid"), col("vec"))).as("__m"))
        .select(col("id"), col("__m.cid").as("cid"), col("__m.vec").as("vec"))
    }

    def components(a: DataFrame): DataFrame = a
      .select(col("cid"), posexplode(col("vec")).as(Seq("dim", "x")))
      .groupBy(col("cid"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(38, 18))).as("s"))
      .withColumn("m", col("s").cast("double") / col("n"))

    var comps = components(assign(cents))
    for (_ <- 2 to iters) {
      cents = comps.groupBy("cid")
        .agg(transform(
          sort_array(collect_list(struct(col("dim"), col("m")))),
          e => e.getField("m")).as("centv"))
      comps = components(assign(cents))
    }
    comps.select(col("cid"), col("dim"), col("n"),
      round(col("m"), 6).as("centroid"))
  }

  /** Product-quantization codebook training: split each vector into
    * `subspaces` contiguous `subDim`-wide slices and run the SAME
    * deterministic [[lloyd]] per subspace — PQ is exactly m independent
    * small k-means problems, so every reproducibility guarantee above
    * carries over verbatim (and the oracle is m instances of the q97
    * CTE over sliced lists). Output: (subspace, cid, dim, n, centroid).
    *
    * Scale shape: the m trainings share the corpus scan count of m
    * lloyd runs but each works on a subDim-wide slice — the shuffle per
    * round is (cid, dim, x) rows over subDim dims, so total bytes equal
    * ONE full-dim lloyd regardless of m. At 100 TB the corpus is
    * sampled before PQ training anyway (codebooks need ~100k vectors,
    * not the corpus) — the deterministic id-hash sample operators
    * compose in front.
    */
  def pqTrain(df: DataFrame, vecCol: String, idCol: String,
              subspaces: Int, subDim: Int,
              centroidEvery: Int, iters: Int): DataFrame =
    (0 until subspaces).map { s0 =>
      val sliced = df.select(col(idCol).as("id"),
        slice(col(vecCol).cast("array<double>"),
          s0 * subDim + 1, subDim).as("subv"))
      lloyd(sliced, "subv", "id", centroidEvery, iters)
        .withColumn("subspace", lit(s0.toLong))
        .select(col("subspace"), col("cid"), col("dim"), col("n"),
          col("centroid"))
    }.reduce(_.unionByName(_))
}
