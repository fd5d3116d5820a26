package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics: ordered funnels and cohort retention —
  * the two queries every event warehouse runs daily.
  *
  * Scale shape: everything keys on the user id — per-stage minima are
  * hash aggregations with map-side partials, stage joins are keyed
  * equi-joins AQE can broadcast as the funnel narrows (each stage's
  * user set only shrinks). Retention's (user, day) distinct is one
  * shuffle; the cohort rollup reuses the same key. No windows over the
  * full event stream, no driver state.
  */
object Funnel {

  /** Strictly-ordered funnel: a user counts for stage k only with an
    * event of type k strictly after their stage-(k-1) time (earliest
    * occurrence chosen at every stage). Output: (stage, n_users), with
    * stages numbered so the order survives lexicographic sorts.
    */
  def stages(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, funnel: Seq[String]): DataFrame = {
    val perStage = funnel.scanLeft(Option.empty[DataFrame]) {
      case (prev, evType) =>
        val typed = events.filter(col(typeCol) === evType)
        val scoped = prev match {
          case None => typed
          case Some(p) => typed.join(p, userCol)
            .filter(col(tsCol) > col("__t"))
        }
        Some(scoped.groupBy(col(userCol))
          .agg(min(col(tsCol)).as("__t")))
    }.flatten
    perStage.zip(funnel).zipWithIndex.map { case ((df, evType), i) =>
      df.groupBy().agg(count(lit(1)).as("n_users"))
        .withColumn("stage", lit(s"${i + 1}_$evType"))
    }.reduce(_.unionByName(_)).select("stage", "n_users")
  }

  /** Consecutive event-type transitions per key (the empirical Markov
    * matrix the funnel is a slice of): lead() over each user's ordered
    * stream, then a transition rollup. One shuffle for the per-user
    * window, one for the count — ordering totals on (ts, tieCol) so
    * the matrix is reproducible at any parallelism.
    * Output: (from_type, to_type, n).
    */
  def transitions(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(typeCol), col(tsCol), col(tieCol))
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Multi-touch attribution, first- and last-touch models in one
    * pass: each user's FIRST conversion event credits (a) their
    * earliest touch and (b) their latest touch strictly before the
    * conversion, per model. Output per channel: conversions and
    * decimal-exact credited revenue under both models.
    *
    * Scale shape: conversions collapse to one row per converting user
    * (window on the conversion subset only), the touch join is a
    * keyed equi-join on the user id with a residual time predicate
    * (never a range cross product), and both row_number windows ride
    * the same user partitioning. Nothing global, nothing driver-side.
    */
  def attribution(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, idCol: String, valueCol: String,
                  conversionType: String, touchTypes: Seq[String])
      : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val firstConv = events.filter(col(typeCol) === conversionType)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(userCol).as("__cu"), col(tsCol).as("__cts"),
        col(idCol).as("__cid"), col(valueCol).as("__cval"))
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .join(firstConv, col(userCol) === col("__cu") &&
        (col(tsCol) < col("__cts") ||
          (col(tsCol) === col("__cts") && col(idCol) < col("__cid"))))
    val wAsc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    val ranked = touches
      .withColumn("__rf", row_number().over(wAsc))
      .withColumn("__rl", row_number().over(wDesc))
    def model(flag: String, n: String, rev: String) =
      ranked.filter(col(flag) === 1)
        .groupBy(col(typeCol).as("channel"))
        .agg(count(lit(1)).as(n),
          round(sum(col("__cval").cast("decimal(28,6)")).cast("double"), 6)
            .as(rev))
    model("__rf", "n_first", "rev_first")
      .join(model("__rl", "n_last", "rev_last"), Seq("channel"),
        "full_outer")
      .select(col("channel"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        coalesce(col("rev_first"), lit(0.0)).as("rev_first"),
        coalesce(col("n_last"), lit(0L)).as("n_last"),
        coalesce(col("rev_last"), lit(0.0)).as("rev_last"))
  }

  /** Cohort retention: users grouped by first-seen day, counted on each
    * later active day. Output: (cohort_day, day_offset, n_users).
    */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val cohort = events.groupBy(col(userCol))
      .agg(date_trunc("day", min(col(tsCol))).as("cohort_day"))
    val active = events
      .select(col(userCol), date_trunc("day", col(tsCol)).as("day"))
      .distinct()
    active.join(cohort, userCol)
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Behavioral entropy rate: the conditional entropy H(next | current)
    * of the per-user event-type transition process — 0 means fully
    * predictable next actions, ln(k) means uniform. Transition counts
    * come from one per-user lag window + one hash aggregation;
    * H(next|cur) = H(pair) − H(cur) with both entropies from the
    * quantized c·ln c sums (the l-diversity recipe). Output one row:
    * n_transitions, n_states, h_pair, h_cur, entropy_rate (6 dp).
    */
  def transitionEntropy(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(orderCol))
    val trans = events
      .withColumn("nxt", lead(col(typeCol), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col(typeCol).as("cur"), col("nxt"))
      .agg(count(lit(1)).as("c"))
      .persist()
    def slq(grouped: DataFrame): org.apache.spark.sql.Column =
      sum(floor(col("c").cast("double") * log(col("c").cast("double"))
        * lit(1e9) + lit(0.5)).cast("long"))
    val qPair = trans.agg(sum(col("c")).as("n"),
      countDistinct(col("cur")).as("n_states"), slq(trans).as("qp"))
    val curs = trans.groupBy("cur").agg(sum(col("c")).as("c"))
    val qCur = curs.agg(slq(curs).as("qc"))
    qPair.crossJoin(broadcast(qCur))
      .select(col("n").as("n_transitions"), col("n_states"),
        (log(col("n").cast("double")) - col("qp").cast("double")
          / lit(1e9) / col("n").cast("double")).as("h_pair"),
        (log(col("n").cast("double")) - col("qc").cast("double")
          / lit(1e9) / col("n").cast("double")).as("h_cur"))
      .select(col("n_transitions"), col("n_states"),
        round(col("h_pair"), 6).as("h_pair"),
        round(col("h_cur"), 6).as("h_cur"),
        round(col("h_pair") - col("h_cur"), 6).as("entropy_rate"))
  }

  /** Cohort LTV curve: users grouped by first-seen day, cumulative
    * per-user value by day offset — the "how much is a day-0 user
    * worth by day k" table that retention counts alone can't answer.
    * Two hash aggregations (first-seen, per-(cohort, offset) value
    * sums) + one bounded cum window over the offset domain; values
    * quantize via the caller's integral column so every cumulative sum
    * is exact. Output per (cohort_day, day_offset): n_users,
    * cum_value, ltv_per_user (6 dp).
    */
  def ltvCurve(events: DataFrame, userCol: String, tsCol: String,
      valueQCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events.select(col(userCol).as("u"),
      date_trunc("day", col(tsCol)).cast("date").as("day"),
      col(valueQCol).as("qv"))
    val cohort = ev.groupBy("u").agg(min(col("day")).as("cohort_day"))
    val sized = cohort.groupBy("cohort_day")
      .agg(count(lit(1)).as("n_users"))
    val daily = ev.join(cohort, "u")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long")
          .as("day_offset"))
      .agg(sum(col("qv")).as("v"))
    val w = Window.partitionBy("cohort_day").orderBy("day_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("cum_value", sum(col("v")).over(w))
      .join(sized, "cohort_day")
      .select(col("cohort_day").cast("string").as("cohort_day"),
        col("day_offset"), col("n_users"), col("cum_value"),
        round(col("cum_value").cast("double")
          / col("n_users").cast("double"), 6).as("ltv_per_user"))
  }

  /** Time-to-convert percentiles: per user, the first `fromType` event
    * and the first `toType` event strictly after it; latency buckets
    * to whole hours and the p25/p50/p75/p90 are EXACT order statistics
    * walked on the bucketed-value domain (the q59/q266 recipe —
    * ⌈q·n⌉ = (num·n + den − 1) div den, never a float percentile).
    * One per-user aggregation + one domain-sized window. Output one
    * row: n_from, n_converted, conv_rate (6 dp), p25/p50/p75/p90
    * latency hours.
    */
  def conversionLatency(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, fromType: String,
      toType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val us = unix_micros(col(tsCol))
    // two aggregations, no per-user event collection: first-from per
    // user, then min-to-after-it via one equi-join — a heavy user
    // costs its event count in the shuffle, never a collected array
    val firsts = events.filter(col(typeCol) === fromType)
      .groupBy(col(userCol).as("u")).agg(min(us).as("t_from"))
      .persist()
    val tos = events.filter(col(typeCol) === toType)
      .select(col(userCol).as("u"), us.as("t"))
      .join(firsts, Seq("u"))
      .filter(col("t") > col("t_from"))
      .groupBy(col("u")).agg(min(col("t") - col("t_from")).as("lat_us"))
    val tot = firsts.join(tos, Seq("u"), "left")
      .agg(count(lit(1)).as("n_from"),
        sum(when(col("lat_us").isNotNull, 1L).otherwise(0L))
          .as("n_converted"))
    val lat = tos
      .select(expr("lat_us div 3600000000").as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
    val w = Window.orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = lat.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(tot))
    def pick(num: Int, den: Int, name: String) =
      cum.filter(col("cum") >= expr(s"($num * n_converted + $den - 1) div $den"))
        .agg(min(col("h")).as(name))
    tot
      .crossJoin(broadcast(pick(1, 4, "p25_h")))
      .crossJoin(broadcast(pick(2, 4, "p50_h")))
      .crossJoin(broadcast(pick(3, 4, "p75_h")))
      .crossJoin(broadcast(pick(9, 10, "p90_h")))
      .select(col("n_from"), col("n_converted"),
        round(col("n_converted").cast("double")
          / col("n_from").cast("double"), 6).as("conv_rate"),
        col("p25_h"), col("p50_h"), col("p75_h"), col("p90_h"))
  }
}
