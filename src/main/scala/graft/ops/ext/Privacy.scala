package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-risk audits past plain k-anonymity (q215): l-diversity of
  * a sensitive attribute within each quasi-identifier group — a
  * k-anonymous group whose members all share one sensitive value
  * still leaks it; l-diversity counts (and entropy-weighs) the
  * distinct sensitive values per group.
  *
  * Determinism: distinct-l is an exact integer; group entropy uses
  * `H = ln(n) − (Σ c·ln c)/n` where each `c·ln c` term quantizes to
  * 1e-9 fixed point BEFORE the per-group sum (order-free), and the
  * per-rollup mean quantizes each group's H to 1e-6 the same way.
  *
  * Scale shape: one hash aggregation on (QI, sensitive), one on QI,
  * one on the rollup key — pure map-side-combining aggregations, no
  * windows, no joins. QI-group skew is aggregation skew, handled by
  * partial aggregation like any groupBy.
  */
object Privacy {

  /** Per-QI-group l-diversity, rolled up per `reportCol`.
    * `df` columns: `reportCol` (rollup key, must be part of the QI),
    * `qiCols` (remaining quasi-identifiers), `sensitiveCol`.
    * Output per rollup key: n_groups, min_l, n_weak_groups
    * (distinct-l < minL), mean_entropy (nats, 6 dp).
    */
  def lDiversity(df: DataFrame, reportCol: String, qiCols: Seq[String],
      sensitiveCol: String, minL: Int = 2): DataFrame = {
    val qi = (col(reportCol) +: qiCols.map(col)) :+ col(sensitiveCol)
    val cells = df.groupBy(qi: _*).agg(count(lit(1)).as("c"))
    val groups = cells.groupBy(col(reportCol) +: qiCols.map(col): _*)
      .agg(count(lit(1)).as("l"),
        sum("c").as("n"),
        sum(floor(col("c").cast("double") * log(col("c").cast("double"))
          * 1000000000.0 + 0.5).cast("long")).as("slq"))
      .withColumn("entropy",
        log(col("n").cast("double")) -
          col("slq").cast("double") / 1000000000.0 / col("n").cast("double"))
    groups.groupBy(col(reportCol))
      .agg(count(lit(1)).as("n_groups"),
        min("l").as("min_l"),
        sum(when(col("l") < minL, 1L).otherwise(0L)).as("n_weak_groups"),
        sum(floor(col("entropy") * 1000000.0 + 0.5).cast("long")).as("seq"))
      .select(col(reportCol), col("n_groups"), col("min_l"),
        col("n_weak_groups"),
        round(col("seq").cast("double") / 1000000.0
          / col("n_groups").cast("double"), 6).as("mean_entropy"))
  }

  /** t-closeness audit (Li et al., ICDE 2007) over an ORDERED
    * sensitive attribute pre-bucketed into `0 .. nBuckets-1`: per
    * QI class, t = EMD(class dist, global dist) = Σᵢ |cumP_i − cumQ_i|
    * / (k−1). l-diversity (above) only counts distinct sensitive
    * values; t-closeness catches the class whose value DISTRIBUTION
    * differs from the population's.
    *
    * Determinism: all counts are integers; each cumulative-difference
    * term is two exact-operand divisions and quantizes to 1e-9 fixed
    * point BEFORE the per-class sum (the house rule for cross-row
    * float sums). The dense class×bucket grid comes from one
    * `sequence` explode, so absent buckets contribute an exact 0-count
    * row on both engines, and the cum windows walk k rows per class,
    * never the corpus.
    *
    * Scale shape: one corpus-sized hash aggregation to (class,
    * bucket); everything after runs on |classes|·k rows. Output per
    * class: `n`, `t` (6 dp), ordered by class.
    */
  def tCloseness(df: DataFrame, classCol: String, bucketCol: String,
                 nBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.groupBy(col(classCol).as("cls"),
        col(bucketCol).as("b"))
      .agg(count(lit(1)).as("c"))
    val grid = cells.select(col("cls")).distinct()
      .select(col("cls"),
        explode(sequence(lit(0), lit(nBuckets - 1))).as("b"))
    val dense = grid.join(cells, Seq("cls", "b"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val byCls = Window.partitionBy("cls").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the global cum ALSO rides the dense bucket spine — an inner join
    // on sparse global buckets would silently drop the |cumP − cumQ|
    // terms of globally-absent buckets (and every cum step after them)
    val spine = grid.select(col("b")).distinct()
    val glob = cells.groupBy(col("b")).agg(sum(col("c")).as("gc"))
    val gcum = spine.join(glob, Seq("b"), "left")
      .withColumn("gc", coalesce(col("gc"), lit(0L)))
      .withColumn("gcum",
        sum(col("gc")).over(Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = cells.agg(sum(col("c")).as("nn"))
    dense
      .withColumn("ccum", sum(col("c")).over(byCls))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("cls")))
      .join(broadcast(gcum.select(col("b"), col("gcum"))), Seq("b"))
      .crossJoin(broadcast(tot))
      .groupBy(col("cls"), col("n"))
      .agg(sum(floor(abs(col("ccum").cast("double")
          / col("n").cast("double")
          - col("gcum").cast("double") / col("nn").cast("double"))
        * lit(1e9) + lit(0.5)).cast("long")).as("sq"))
      .select(col("cls").as(classCol), col("n"),
        round(col("sq").cast("double") / lit(1e9)
          / lit((nBuckets - 1).toDouble), 6).as("t"))
  }

  /** Generalization-ladder audit: how coarse must the numeric
    * quasi-identifier get before k-anonymity holds? For each ladder
    * level (a bucket width over `numCol`, with the last level
    * dropping the numeric QI entirely), the per-group row counts give
    * the k-covered row share — the decision table behind "generalize
    * vs suppress". One hash aggregation per level on exact integers.
    * Output per level: level, bucket_width (0 = dropped), n_groups,
    * covered_rows, coverage (6 dp).
    */
  def generalizationLadder(df: DataFrame, baseCols: Seq[String],
      numCol: String, widths: Seq[Long], k: Long): DataFrame = {
    require(widths.nonEmpty && k >= 2)
    val levels = widths.zipWithIndex.map { case (wd, i) =>
      // integral div on a NON-NEGATIVE column (caller shifts): Spark's
      // div truncates toward zero while DuckDB's // floors — they only
      // agree for non-negative operands
      val bucket = expr(s"CAST($numCol AS BIGINT) div $wd")
      audit(df, baseCols.map(col) :+ bucket.as("__b"), i.toLong, wd, k)
    } :+ audit(df, baseCols.map(col), widths.size.toLong, 0L, k)
    levels.reduce(_ unionByName _)
  }

  private def audit(df: DataFrame,
      qi: Seq[org.apache.spark.sql.Column], level: Long, width: Long,
      k: Long): DataFrame =
    df.groupBy(qi: _*).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("c") >= k, col("c")).otherwise(0L))
          .as("covered_rows"),
        sum(col("c")).as("n"))
      .select(lit(level).as("level"), lit(width).as("bucket_width"),
        col("n_groups"), col("covered_rows"),
        round(col("covered_rows").cast("double")
          / col("n").cast("double"), 6).as("coverage"))

  /** Differentially-private count release audit: per group, the true
    * count beside its ε-calibrated Laplace-noised release and the
    * absolute error, across an ε ladder — "how much utility does each
    * privacy level cost on THIS table". The noise is DETERMINISTIC
    * (reproducible audits, not production DP): u ∈ [0,1) comes from
    * the first 6 md5 hex chars of (group, ε-index) — an exact rational
    * both engines derive identically — and the Laplace inverse CDF
    * −(1/ε)·sign(u−½)·ln(1−2|u−½|) quantizes to 1e-6 BEFORE the add,
    * so the released value is integer-exact + a fixed 6-dp noise.
    * Output: (group, eps, true_count, noised, abs_err).
    */
  def dpCountAudit(df: DataFrame, groupCol: String,
      epsilons: Seq[Double]): DataFrame = {
    val counts = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("true_count"))
    val s = df.sparkSession
    import s.implicits._
    val eps = epsilons.zipWithIndex.map { case (e, i) => (e, i.toLong) }
      .toDF("eps", "ei")
    counts.crossJoin(eps)
      .withColumn("u",
        conv(substring(md5(concat(col("g").cast("string"), lit(":"),
          col("ei"))), 1, 6), 16, 10).cast("long").cast("double")
          / lit(16777216.0))
      .withColumn("w", col("u") - lit(0.5))
      .withColumn("qn",
        floor(-(lit(1.0) / col("eps")) * signum(col("w"))
          * log(lit(1.0) - lit(2.0) * abs(col("w"))) * lit(1e6)
          + lit(0.5)).cast("long"))
      .select(col("g").as(groupCol), col("eps"), col("true_count"),
        round(col("true_count").cast("double")
          + col("qn").cast("double") / lit(1e6), 6).as("noised"),
        round(abs(col("qn").cast("double") / lit(1e6)), 6).as("abs_err"))
  }
}
