package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact Shapley-value attribution over observed touchpoint
  * coalitions — the game-theoretic alternative to first/last-touch
  * (q132) and Markov removal (q219): each channel's credit is its
  * average marginal contribution across all channel subsets,
  * `φ_i = Σ_{S ∌ i} |S|!·(c−1−|S|)!/c! · (v(S∪i) − v(S))`, with the
  * coalition value v(S) read off the data as the conversion rate of
  * units exposed to exactly S (unseen coalitions contribute 0).
  *
  * Exact enumeration is deliberate: channel alphabets in attribution
  * are small (≤ ~16), so the 2^c subset lattice is a few thousand
  * rows of driver-free frame — the data-sized work is ONE aggregation
  * to per-unit exposure bitmasks. Weights are rational `k/c!`
  * literals (no factorial of a float); marginal terms quantize to
  * 1e-9 fixed point before the per-channel sum.
  *
  * Scale shape: one hash aggregation unit→bitmask (map-side
  * combining), one mask→rate aggregation (≤ 2^c rows), then
  * lattice-sized joins. The corpus is scanned once.
  */
object Shapley {

  /** φ per channel. `exposures`: (unit, channel: Int index 0..c−1,
    * conv: 0/1 per unit — constant within a unit). `c` = channel
    * count (≤ 20). Output: (channel, n_exposed_units, shapley).
    */
  def channelAttribution(exposures: DataFrame, c: Int): DataFrame = {
    require(c >= 1 && c <= 20, "exact lattice needs a small alphabet")
    val spark = exposures.sparkSession
    import spark.implicits._
    // per-unit exposure bitmask (from the DISTINCT channel set — a sum
    // over raw rows would double-count repeated touches) + conversion
    val conv = exposures.groupBy("unit").agg(max("conv").as("conv"))
    val masks = exposures.select(col("unit"), col("channel")).distinct()
      .groupBy("unit")
      .agg(sum(expr("shiftleft(1L, cast(channel as int))")).as("mask"))
      .join(conv, "unit")
    val v = masks.groupBy("mask")
      .agg(count(lit(1)).as("n"), sum("conv").as("k"))
      .select(col("mask"), col("n"),
        (col("k").cast("double") / col("n").cast("double")).as("v"))
    // subset lattice S (all 2^c masks) × channels i with i ∉ S
    val lattice = (0L until (1L << c)).toDF("s")
    val chans = (0 until c).map(_.toLong).toDF("ch")
    val factorial: IndexedSeq[Long] =
      (1 to 20).scanLeft(1L)(_ * _.toLong) // factorial(k) = k!
    def fact(k: Column): Column =
      element_at(typedLit(factorial), (k + 1).cast("int"))
    val terms = lattice.crossJoin(chans)
      .filter(expr("shiftright(s, cast(ch as int)) % 2 = 0"))
      .withColumn("s1", expr("s + shiftleft(1L, cast(ch as int))"))
      .withColumn("sz", bit_count(col("s")).cast("long"))
      .withColumn("w",
        (fact(col("sz")) * fact(lit(c.toLong) - 1 - col("sz")))
          .cast("double") / lit(factorial(c - 1).toDouble * c))
      .join(v.select(col("mask").as("s"), col("v").as("v0")), Seq("s"),
        "left")
      .join(v.select(col("mask").as("s1"), col("v").as("v1")), Seq("s1"),
        "left")
      .select(col("ch"),
        floor(col("w") * (coalesce(col("v1"), lit(0.0))
          - coalesce(col("v0"), lit(0.0))) * 1000000000.0 + 0.5)
          .cast("long").as("tq"))
    val exposed = exposures.select(col("unit"), col("channel")).distinct()
      .groupBy(col("channel").cast("long").as("ch"))
      .agg(count(lit(1)).as("n_exposed_units"))
    terms.groupBy("ch").agg(sum("tq").as("sq"))
      .join(exposed, "ch")
      .select(col("ch").as("channel"), col("n_exposed_units"),
        round(col("sq").cast("double") / 1000000000.0, 6).as("shapley"))
  }
}
