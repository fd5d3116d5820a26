package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: isolate where q124_correlation's time goes — decimal-sum
  * aggregation vs double-sum vs scan.
  */
object DevCorrProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for { i <- cols.indices; j <- i + 1 until cols.size }
      yield (cols(i), cols(j))
    def time(label: String)(f: => Unit): Unit = {
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime(); f
        println(f"$label rep=$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("scan-count") { li.agg(count(lit(1))).head() }
    val dblAggs = Seq(count(lit(1)).cast("double").as("n")) ++
      cols.flatMap { c => Seq(sum(col(c)).as(s"s_$c"),
        sum(col(c) * col(c)).as(s"ss_$c")) } ++
      pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"sp_${a}_$b") }
    time("double-sums") { li.agg(dblAggs.head, dblAggs.tail: _*).head() }
    def decAggs(scale: Int) = Seq(count(lit(1)).cast("double").as("n")) ++
      cols.flatMap { c => Seq(
        sum(col(c).cast(s"decimal(30,$scale)")).as(s"s_$c"),
        sum((col(c) * col(c)).cast(s"decimal(30,$scale)")).as(s"ss_$c")) } ++
      pairs.map { case (a, b) =>
        sum((col(a) * col(b)).cast(s"decimal(30,$scale)")).as(s"sp_${a}_$b") }
    for (sc <- Seq(8, 4, 2)) {
      val ag = decAggs(sc)
      time(s"decimal(30,$sc)-sums") { li.agg(ag.head, ag.tail: _*).head() }
    }
    // hi/lo split-long exact sums: v = round(x*1e4) as long, summed as
    // (v >> 20) and (v & 0xFFFFF) separately — overflow-free, exact,
    // reconstructed once per moment on the 1-row result.
    def splitAggs = {
      def v(c: org.apache.spark.sql.Column) =
        round(c * lit(10000.0)).cast("long")
      val moments = cols.flatMap { c => Seq(
        (s"s_$c", v(col(c))), (s"ss_$c", v(col(c) * col(c)))) } ++
        pairs.map { case (a, b) => (s"sp_${a}_$b", v(col(a) * col(b))) }
      Seq(count(lit(1)).cast("double").as("n")) ++ moments.flatMap {
        case (nm, vc) => Seq(
          sum(shiftright(vc, 20)).as(s"${nm}__hi"),
          sum(vc.bitwiseAND(lit(1048575L))).as(s"${nm}__lo"))
      }
    }
    val sa = splitAggs
    time("splitlong-sums") { li.agg(sa.head, sa.tail: _*).head() }
    // same but quantized via floor(x*1e4 + 0.5) — pure IEEE arithmetic,
    // no BigDecimal round path; valid (== round-half-up) for x >= 0
    def splitAggsF = {
      def v(c: org.apache.spark.sql.Column) =
        floor(c * lit(10000.0) + lit(0.5)).cast("long")
      val moments = cols.flatMap { c => Seq(
        (s"s_$c", v(col(c))), (s"ss_$c", v(col(c) * col(c)))) } ++
        pairs.map { case (a, b) => (s"sp_${a}_$b", v(col(a) * col(b))) }
      Seq(count(lit(1)).cast("double").as("n")) ++ moments.flatMap {
        case (nm, vc) => Seq(
          sum(shiftright(vc, 20)).as(s"${nm}__hi"),
          sum(vc.bitwiseAND(lit(1048575L))).as(s"${nm}__lo"))
      }
    }
    val sf = splitAggsF
    time("splitlong-floor-sums") { li.agg(sf.head, sf.tail: _*).head() }
    spark.stop()
  }
}
