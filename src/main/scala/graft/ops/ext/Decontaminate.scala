package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
