package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Candidate-key discovery: per column, distinct count, null count,
    * and the key verdict (`n_distinct == n_rows` — `countDistinct`
    * ignores nulls, so equality simultaneously proves uniqueness AND
    * no-null). The reference profiles columns one-by-one in pandas
    * (`run_annotate.py:26-27` nunique); here ALL columns resolve in ONE
    * aggregation pass (map-side partials, a single shuffle of one
    * partial row per column), then a driver-free `explode` reshapes the
    * 1×2N row to long form. At 100 TB swap `countDistinct` for HLL
    * exactly as [[distinctCounts]] does — the verdict only needs
    * equality fidelity near n_rows, where HLL's error bound is known.
    */
  def keyCandidates(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs: Seq[Column] = Seq(count(lit(1)).as("__n")) ++ cols.flatMap {
      c => Seq(
        countDistinct(graft.Cols.ref(c)).as(s"__nd__$c"),
        count(graft.Cols.ref(c)).as(s"__nn__$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column"),
        graft.Cols.ref(s"__nd__$c").as("n_distinct"),
        (col("__n") - graft.Cols.ref(s"__nn__$c")).as("n_nulls"),
        (graft.Cols.ref(s"__nd__$c") === col("__n")).as("is_key"))
    }
    row.select(explode(array(entries: _*)).as("e")).select("e.*")
  }

  /** Pearson correlation for every pair of `cols`, one aggregation
    * pass, exact order-independent moment sums at NATIVE LONG speed.
    *
    * Determinism contract (the repo's oracle rule) without the wide-
    * decimal aggregation buffer, which benchmarked 20× slower than
    * long sums (Spark keeps >18-digit decimals as BigDecimal in the
    * agg buffer; `round()` on double is also a BigDecimal path):
    *
    *  1. quantize each per-row moment to a scaled long,
    *     `v = floor(x·10^scale + 0.5)` — pure IEEE double arithmetic,
    *     bit-identical in any engine (== round-half-up for x ≥ 0);
    *  2. split v and sum the halves separately: Σ(v >> 20) and
    *     Σ(v & 0xFFFFF). Both stay far from long overflow (v ≤ 10^14
    *     at scale 4 ⇒ hi ≤ 10^8.2, so Σhi fits to ~10^10 rows — the
    *     100 TB regime — where a direct Σv would wrap at ~10^4.9 rows'
    *     worth of headroom less);
    *  3. recombine exactly ONCE on the 1-row result in DECIMAL(38,0)
    *     ((Σhi)·2^20 + Σlo = Σv, the shift/mask identity), cast to
    *     double, unscale, and evaluate the closed form in double.
    *
    * Shared moments (sum, sum-of-squares per column) are computed once
    * regardless of how many pairs use them. One shuffle of a single
    * partial row — scale-free in n. `scale` trades per-row rounding
    * error (10^-scale, identical on both engines) for overflow
    * headroom; moments must be non-negative (the oracle's `>>` on
    * negatives is engine-defined).
    */
  def correlationPairs(df: DataFrame, cols: Seq[String],
                       scale: Int = 4): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for { i <- cols.indices; j <- i + 1 until cols.size }
      yield (cols(i), cols(j))
    val quantum = math.pow(10.0, scale)
    def d(c: String) = graft.Cols.ref(c).cast("double")
    def v(c: Column) = floor(c * lit(quantum) + lit(0.5)).cast("long")
    val moments: Seq[(String, Column)] =
      cols.flatMap { c => Seq(
        (s"__s__$c", v(d(c))), (s"__ss__$c", v(d(c) * d(c)))) } ++
        pairs.map { case (a, b) => (s"__sp__${a}__${b}", v(d(a) * d(b))) }
    val aggs: Seq[Column] =
      Seq(count(lit(1)).cast("double").as("__n")) ++ moments.flatMap {
        case (nm, vc) => Seq(
          sum(shiftright(vc, 20)).as(s"${nm}__hi"),
          sum(vc.bitwiseAND(lit(1048575L))).as(s"${nm}__lo"))
      }
    val row = df.agg(aggs.head, aggs.tail: _*)
    def m(nm: String): Column =
      ((graft.Cols.ref(s"${nm}__hi").cast("decimal(38,0)") * lit(1048576L) +
        graft.Cols.ref(s"${nm}__lo")).cast("double")) / lit(quantum)
    val entries = pairs.map { case (a, b) =>
      val n = col("__n")
      val sx = m(s"__s__$a"); val sy = m(s"__s__$b")
      val sxx = m(s"__ss__$a"); val syy = m(s"__ss__$b")
      val sxy = m(s"__sp__${a}__${b}")
      val corr = (n * sxy - sx * sy) /
        sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        round(corr, 6).as("corr"))
    }
    row.select(explode(array(entries: _*)).as("e")).select("e.*")
  }

  /** Per-group ordinary least squares of `yCol` on `xCol`: slope,
    * intercept, r² from the same split-long exact moment sums as
    * [[correlationPairs]], but grouped — one hash aggregation shuffles
    * a handful of longs per group, and the model algebra runs on the
    * tiny grouped frame. Same constraints: moments must be
    * non-negative; `scale` quantizes each per-row moment to 10^-scale
    * before the exact hi/lo split-long accumulation, so the
    * reconstructed sums (and therefore slope/intercept/r²) are
    * bit-identical at any parallelism and on any engine.
    */
  def groupOls(df: DataFrame, groupCol: String, xCol: String, yCol: String,
               scale: Int = 4): DataFrame = {
    val quantum = math.pow(10.0, scale)
    def d(c: String) = graft.Cols.ref(c).cast("double")
    def v(c: Column) = floor(c * lit(quantum) + lit(0.5)).cast("long")
    val moments: Seq[(String, Column)] = Seq(
      ("__sx", v(d(xCol))), ("__sy", v(d(yCol))),
      ("__sxx", v(d(xCol) * d(xCol))), ("__syy", v(d(yCol) * d(yCol))),
      ("__sxy", v(d(xCol) * d(yCol))))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).cast("double").as("__n")) ++ moments.flatMap {
        case (nm, vc) => Seq(
          sum(shiftright(vc, 20)).as(s"${nm}__hi"),
          sum(vc.bitwiseAND(lit(1048575L))).as(s"${nm}__lo"))
      }
    val g = df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    def m(nm: String): Column =
      ((graft.Cols.ref(s"${nm}__hi").cast("decimal(38,0)") * lit(1048576L) +
        graft.Cols.ref(s"${nm}__lo")).cast("double")) / lit(quantum)
    val n = col("__n")
    val sx = m("__sx"); val sy = m("__sy")
    val sxx = m("__sxx"); val syy = m("__syy"); val sxy = m("__sxy")
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val r2 = ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    g.select(col(groupCol), n.cast("long").as("n"),
      round(slope, 6).as("slope"),
      round((sy - slope * sx) / n, 6).as("intercept"),
      round(r2, 6).as("r2"))
  }

  /** Equi-width histogram: two jobs — a min/max pass (one partial row),
    * then bucket-assign + count. The 1-row bounds frame is broadcast,
    * so the big side streams through codegen'd arithmetic and shuffles
    * only (bucket → count) partials. `x == max` lands in the last
    * bucket via `least` (the SQL-standard width_bucket edge rule).
    * Bucket edges are derived from the same doubles on both engine and
    * oracle sides — floor/least on IEEE doubles is bit-deterministic.
    */
  def histogram(df: DataFrame, c: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    val x = graft.Cols.ref(c).cast("double")
    val mm = df.agg(min(x).as("__mn"), max(x).as("__mx"))
    val width = (col("__mx") - col("__mn")) / lit(buckets.toDouble)
    df.select(x.as("__x"))
      .crossJoin(broadcast(mm))
      .select(col("__x"),
        least(floor((col("__x") - col("__mn")) / width),
          lit((buckets - 1).toDouble)).cast("long").as("bucket"),
        col("__mn"), width.as("__w"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        round(first(col("__mn")) + col("bucket") * first(col("__w")), 6)
          .as("lo"),
        round(first(col("__mn")) + (col("bucket") + 1) * first(col("__w")), 6)
          .as("hi"))
      .select(col("bucket"), col("lo"), col("hi"), col("n_rows"))
  }

  /** Numeric distribution drift (the QQ view): interpolated quantiles
    * of `c` for the rows matching `leftPred` vs the rest, in ONE
    * aggregation pass — `percentile(when(pred, x))` exploits
    * null-skipping aggregates, so both slices resolve in a single
    * scan/shuffle instead of two jobs plus a join. Long-form output
    * (quantile, left_v, right_v, delta). Exact `percentile` is
    * sort-based per aggregate; at 100 TB swap for
    * `approx_percentile` — the drift verdict needs far less
    * resolution than the sketch provides.
    */
  def quantileDrift(df: DataFrame, leftPred: Column, c: String,
                    qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty)
    val x = graft.Cols.ref(c).cast("double")
    val aggs: Seq[Column] = qs.zipWithIndex.flatMap { case (p, i) => Seq(
      percentile(when(leftPred, x), lit(p)).as(s"__l__$i"),
      percentile(when(!leftPred, x), lit(p)).as(s"__r__$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = qs.zipWithIndex.map { case (p, i) =>
      val l = col(s"__l__$i"); val r = col(s"__r__$i")
      struct(lit(p).as("quantile"), round(l, 6).as("left_v"),
        round(r, 6).as("right_v"), round(l - r, 6).as("delta"))
    }
    row.select(explode(array(entries: _*)).as("e")).select("e.*")
  }

  /** Categorical distribution drift between two frames (e.g. two
    * snapshots or two sources of a corpus): add-one-smoothed
    * probabilities per category and both directed KL contributions.
    * The grouped counts are the only shuffles over data; everything
    * after operates on the bounded category set (full-outer-joined so
    * a category present in only one side still drifts, smoothing keeps
    * log finite). Totals ride along via a broadcast 1-row cross join —
    * no global window.
    */
  def categoryDrift(left: DataFrame, right: DataFrame, c: String)
      : DataFrame = {
    def counts(df: DataFrame, as: String) =
      df.groupBy(graft.Cols.ref(c).as("category"))
        .agg(count(lit(1)).as(as))
    val joined = counts(left, "cnt_l")
      .join(counts(right, "cnt_r"), Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("cnt_l"), lit(0L)).as("cnt_l"),
        coalesce(col("cnt_r"), lit(0L)).as("cnt_r"))
    val tot = joined.agg(sum(col("cnt_l")).as("__tl"),
      sum(col("cnt_r")).as("__tr"), count(lit(1)).as("__k"))
    val p = (col("cnt_l") + 1).cast("double") /
      (col("__tl") + col("__k")).cast("double")
    val q = (col("cnt_r") + 1).cast("double") /
      (col("__tr") + col("__k")).cast("double")
    joined.crossJoin(broadcast(tot))
      .select(col("category"), col("cnt_l"), col("cnt_r"),
        round(p, 6).as("p"), round(q, 6).as("q"),
        round(p * log(p / q), 6).as("kl_pq"),
        round(q * log(q / p), 6).as("kl_qp"))
  }

  /** Population Stability Index between the rows matching `leftPred`
    * (reference) and the rest (current), over `buckets` equi-width
    * bins of `c` spanning the GLOBAL min/max (the [[histogram]] edge
    * rule, so both slices share one binning). Add-one-smoothed shares
    * keep the log finite on empty bins; the full bin domain is
    * generated so a bin empty on both sides still contributes its
    * smoothed (tiny) term. Two passes over the data (bounds, then one
    * counting aggregation); the PSI algebra runs on `buckets` rows,
    * and the total is a DECIMAL sum of the 6-dp-quantized
    * contributions (order-free). Output per bin: `bucket`, `lo`, `hi`,
    * `cnt_l`, `cnt_r`, `p`, `q`, `contrib`, and the repeated
    * `psi_total`.
    */
  def psiDrift(df: DataFrame, leftPred: Column, c: String,
               buckets: Int): DataFrame = {
    require(buckets > 0)
    val x = graft.Cols.ref(c).cast("double")
    val mm = df.agg(min(x).as("__mn"), max(x).as("__mx"))
    val width = (col("__mx") - col("__mn")) / lit(buckets.toDouble)
    val counted = df.select(x.as("__x"), leftPred.as("__l"))
      .crossJoin(broadcast(mm))
      .select(least(floor((col("__x") - col("__mn")) / width),
        lit((buckets - 1).toDouble)).cast("long").as("bucket"), col("__l"))
      .groupBy("bucket")
      .agg(sum(when(col("__l"), 1L).otherwise(0L)).as("cnt_l"),
        sum(when(!col("__l"), 1L).otherwise(0L)).as("cnt_r"))
    val domain = mm
      .select(explode(sequence(lit(0L), lit((buckets - 1).toLong)))
        .as("bucket"), col("__mn"), width.as("__w"))
    val joined = domain.join(counted, Seq("bucket"), "left")
      .select(col("bucket"),
        round(col("__mn") + col("bucket") * col("__w"), 6).as("lo"),
        round(col("__mn") + (col("bucket") + 1) * col("__w"), 6).as("hi"),
        coalesce(col("cnt_l"), lit(0L)).as("cnt_l"),
        coalesce(col("cnt_r"), lit(0L)).as("cnt_r"))
    val tot = joined.agg(sum(col("cnt_l")).as("__tl"),
      sum(col("cnt_r")).as("__tr"))
    val p = (col("cnt_l") + 1).cast("double") /
      (col("__tl") + buckets).cast("double")
    val q = (col("cnt_r") + 1).cast("double") /
      (col("__tr") + buckets).cast("double")
    val contrib = round((p - q) * log(p / q), 6)
    val wAll = Window.partitionBy(lit(1))
    joined.crossJoin(broadcast(tot))
      .select(col("bucket"), col("lo"), col("hi"), col("cnt_l"),
        col("cnt_r"), round(p, 6).as("p"), round(q, 6).as("q"),
        contrib.as("contrib"))
      .withColumn("psi_total",
        round(sum(floor(col("contrib") * lit(1000000.0) + lit(0.5))
          .cast("long")).over(wAll).cast("double") / lit(1000000.0), 6))
  }

  /** Approximate-functional-dependency audit for candidate A→B pairs:
    * for each candidate, the minimum rows to delete for the FD to hold
    * exactly is n − Σ_a max_b count(a,b) (the g3 error of Kivinen &
    * Mannila) — `violations`, reported with the violation rate. Holds
    * exactly iff violations = 0. Per candidate: one (A,B) hash
    * aggregation, one A-grouped max — two map-side-combining shuffles
    * on the candidate's key, no windows, no joins; candidates run
    * independently and union. All integers; the rate is the only
    * division. Output per candidate: fd, n, n_groups, violations,
    * rate (6 dp).
    */
  def fdAudit(df: DataFrame, candidates: Seq[(String, String)])
      : DataFrame = {
    val frames = candidates.map { case (a, b) =>
      val cells = df.groupBy(col(a).as("a"), col(b).as("b"))
        .agg(count(lit(1)).as("c"))
      cells.groupBy(col("a"))
        .agg(sum(col("c")).as("na"), max(col("c")).as("keep"))
      .agg(sum(col("na")).as("n"), count(lit(1)).as("n_groups"),
        (sum(col("na")) - sum(col("keep"))).as("violations"))
      .select(lit(s"$a->$b").as("fd"), col("n"), col("n_groups"),
        col("violations"),
        round(col("violations").cast("double") / col("n").cast("double"),
          6).as("rate"))
    }
    frames.reduce(_ unionByName _)
  }

  /** Run-length-encoding storage estimate per column: within each
    * `groupCol` block (the physical clustering unit — row-group,
    * file, or its key proxy) ordered by `orderCol`, a run breaks
    * whenever the value changes; `avg_run_len` = n / runs and
    * `rle_ratio` = runs / n approximate the RLE footprint a
    * sorted-layout writer would get — the storage-layout diagnostic
    * next to the z-order audit (q122). The lag windows partition by
    * the block key (parallel, bounded per block, no global sort);
    * runs never span blocks, matching how columnar encoders reset per
    * row group. All counts exact; the two ratios are the only floats.
    */
  def rleEstimate(df: DataFrame, groupCol: String, orderCol: String,
      cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = cols.map { c =>
      // the measured value is the FINAL ordering key: physical order
      // columns can tie (duplicate line numbers), and a tie broken
      // differently across engines would flip run counts — grouping
      // tied rows by value keeps the estimate deterministic
      val w = Window.partitionBy(col(groupCol))
        .orderBy(col(orderCol), col("v"))
      val breaks = df.select(col(groupCol), col(orderCol),
          col(c).cast("string").as("v"))
        .withColumn("brk",
          // null-safe inequality: first row of a block AND any value
          // change (incl. null <-> non-null) breaks; a continued null
          // run does not — DuckDB mirrors with IS DISTINCT FROM
          when(!(lag(col("v"), 1).over(w) <=> col("v")), 1L)
            .otherwise(0L))
      breaks.agg(count(lit(1)).as("n"), sum(col("brk")).as("runs"))
        .select(lit(c).as("column"), col("n"), col("runs"),
          round(col("n").cast("double") / col("runs").cast("double"), 6)
            .as("avg_run_len"),
          round(col("runs").cast("double") / col("n").cast("double"), 6)
            .as("rle_ratio"))
    }
    frames.reduce(_ unionByName _)
  }

  /** Join-cardinality estimation audit: per `groupCol`, the exact
    * |left ⋈ right| against the estimate from KEY-sampled inputs —
    * both sides keep a key iff the portable md5 bucket of the JOIN KEY
    * falls under `num/den` (the correlated-sampling trick: a sampled
    * key survives on BOTH sides, so its full join contribution is
    * kept and the estimate is the sampled count scaled by den/num,
    * unbiased over keys). This is the optimizer-calibration question
    * — "can a p% key sample predict the join size" — answered with
    * exact integers everywhere except the final scale/error division.
    * Output per group: exact_rows, sampled_rows, est_rows (6 dp),
    * rel_err (6 dp).
    */
  def joinCardinalityAudit(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, groupCol: String,
      num: Long, den: Long): DataFrame = {
    require(num > 0 && den >= num)
    val thr = graft.ops.ext.Sampling.thresholdHex(num.toDouble / den)
    def keep(c: Column) = graft.ops.ext.Sampling.hashBucket(c) < lit(thr)
    val exact = left.join(right, col(leftKey) === col(rightKey))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("exact_rows"))
    val sampled = left.filter(keep(col(leftKey)))
      .join(right.filter(keep(col(rightKey))),
        col(leftKey) === col(rightKey))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("sampled_rows"))
    exact.join(sampled, Seq(groupCol), "left")
      .na.fill(0L, Seq("sampled_rows"))
      .select(col(groupCol), col("exact_rows"), col("sampled_rows"),
        round(col("sampled_rows").cast("double")
          * lit(den.toDouble) / lit(num.toDouble), 6).as("est_rows"),
        round(abs(col("sampled_rows").cast("double")
            * lit(den.toDouble) / lit(num.toDouble)
            - col("exact_rows").cast("double"))
          / col("exact_rows").cast("double"), 6).as("rel_err"))
  }

  /** Dictionary-encoding benefit estimate per column: code width =
    * bit_length(n_distinct − 1) (via the binary-string trick — no
    * float log2, whose libm rounding at exact powers of two differs
    * across engines), encoded payload = ⌈n·bits/8⌉ bytes plus the
    * dictionary's string bytes, against the raw string payload — the
    * columnar-footprint companion to the RLE estimate
    * ([[rleEstimate]]). Integer arithmetic end to end except the
    * final compression ratio. Restrict `cols` to integer/string
    * columns: double→string renders differently across engines.
    * Output per column: n, n_distinct, code_bits, encoded_bytes,
    * dict_bytes, raw_bytes, ratio (6 dp).
    */
  def dictEstimate(df: DataFrame, cols: Seq[String]): DataFrame = {
    val frames = cols.map { c =>
      val v = df.select(col(c).cast("string").as("v"))
      val agg = v.agg(count(lit(1)).as("n"),
        countDistinct(col("v")).as("nd"),
        sum(length(col("v")).cast("long")).as("raw_bytes"))
      val dict = v.distinct()
        .agg(sum(length(col("v")).cast("long")).as("dict_bytes"))
      agg.crossJoin(dict)
        .withColumn("code_bits",
          when(col("nd") <= 1, 1L)
            .otherwise(length(bin(col("nd") - 1)).cast("long")))
        .select(lit(c).as("column"), col("n"), col("nd").as("n_distinct"),
          col("code_bits"),
          expr("(n * code_bits + 7) div 8").as("encoded_bytes"),
          col("dict_bytes"), col("raw_bytes"),
          round((expr("(n * code_bits + 7) div 8") + col("dict_bytes"))
            .cast("double") / col("raw_bytes").cast("double"), 6)
            .as("ratio"))
    }
    frames.reduce(_ unionByName _)
  }

  /** Partition-size planner: given a per-row byte estimate expression
    * and a target partition size, recommend rows-per-partition and the
    * partition count — the knob-setting card behind
    * `spark.sql.files.maxPartitionBytes` / repartition decisions,
    * derived from the table's ACTUAL row widths instead of folklore.
    * All integer arithmetic: rows_per_partition = target·n div Σbytes,
    * n_partitions = ⌈n / rpp⌉ — no float anywhere but the reported
    * 6-dp average. Output one row:
    * (n_rows, total_bytes_est, avg_row_bytes, rows_per_partition,
    * n_partitions).
    */
  def partitionPlan(df: DataFrame, rowBytes: Column,
      targetBytes: Long): DataFrame = {
    require(targetBytes >= 1)
    df.select(rowBytes.cast("long").as("b"))
      .agg(count(lit(1)).as("n_rows"), sum("b").as("total_bytes_est"))
      .select(col("n_rows"), col("total_bytes_est"),
        round(col("total_bytes_est").cast("double")
          / col("n_rows").cast("double"), 6).as("avg_row_bytes"),
        expr(s"greatest($targetBytes * n_rows div total_bytes_est, 1L)")
          .as("rows_per_partition"))
      .select(col("n_rows"), col("total_bytes_est"), col("avg_row_bytes"),
        col("rows_per_partition"),
        expr("(n_rows + rows_per_partition - 1) div rows_per_partition")
          .as("n_partitions"))
  }
}
