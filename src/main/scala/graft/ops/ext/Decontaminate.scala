package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Benchmark decontamination (SURVEY §2.12 adjunct): flag training
  * documents that share n-gram shingles with an evaluation/benchmark
  * set — the standard pre-training hygiene pass (an eval question
  * appearing verbatim in the corpus inflates the benchmark).
  *
  * Scale shape: the benchmark side is tiny (thousands of eval docs) and
  * is reduced to its DISTINCT shingle set, then explicitly `broadcast`;
  * the 100 TB corpus side is a narrow explode + broadcast-hash-join +
  * one groupBy on the doc id. The corpus never shuffles on the shingle,
  * and docs sharing nothing with the benchmark produce zero join rows —
  * the common case costs only the scan.
  */
object Decontaminate {

  /** Per-document overlap with the benchmark set: distinct shared
    * n-grams, the doc's distinct n-gram count, and their ratio.
    * Only contaminated docs (n_shared >= 1) appear.
    */
  def ngramOverlap(corpus: DataFrame, benchmark: DataFrame,
                   textCol: String, idCol: String, n: Int = 3): DataFrame = {
    val bench = benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("g")).distinct()
    val exploded = corpus
      .select(col(idCol), Dedup.shingles(col(textCol), n).as("sh"))
      .select(col(idCol), size(col("sh")).cast("long").as("n_shingles"),
        explode(col("sh")).as("g"))
    exploded.join(broadcast(bench), "g")
      .groupBy(col(idCol), col("n_shingles"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col(idCol), col("n_shingles"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_shingles"), 6)
          .as("contamination"))
  }

  /** Bloom-filter variant for when even the benchmark's DISTINCT shingle
    * set is too big to broadcast raw (a 1 B-shingle eval suite is ~8 GB
    * of longs, but ~1 GB of bloom bits at ~1% fp): build a bloom over
    * the benchmark shingles (Spark's own BloomFilterAggregate — the
    * expression behind runtime row-level join filtering, codegen'd, no
    * UDF), ship the bytes as a literal, and probe each corpus shingle
    * with BloomFilterMightContain. Per-doc `bloom_hits` OVERCOUNTS by
    * construction (false positives, never false negatives):
    * bloom_hits >= the true shared count for every doc, and a doc with
    * bloom_hits == 0 is PROVABLY clean. The cheap bloom pass prunes the
    * clean bulk; the exact join (above) re-checks only the flagged few.
    */
  def bloomShingleHits(corpus: DataFrame, benchmark: DataFrame,
                       textCol: String, idCol: String, n: Int = 3,
                       numBits: Long = 1L << 22): DataFrame = {
    val bench = benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("g")).distinct()
    val bloomAgg: Column = GraftExpressionBridge.column(
      new BloomFilterAggregate(
        GraftExpressionBridge.expression(col("g")),
        Literal(numBits / 16), Literal(numBits)).toAggregateExpression())
    // driver-side build artifact (like collecting a broadcast build
    // side): one aggregate, numBits/8 bytes
    val bytes = bench.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val mightContain = (g: Column) => GraftExpressionBridge.column(
      BloomFilterMightContain(Literal(bytes, BinaryType),
        GraftExpressionBridge.expression(g)))
    corpus
      .select(col(idCol), Dedup.shingles(col(textCol), n).as("sh"))
      .select(col(idCol), size(col("sh")).cast("long").as("n_shingles"),
        explode(col("sh")).as("g"))
      .groupBy(col(idCol), col("n_shingles"))
      .agg(sum(when(mightContain(col("g")), 1L).otherwise(0L))
        .as("bloom_hits"))
  }
}
