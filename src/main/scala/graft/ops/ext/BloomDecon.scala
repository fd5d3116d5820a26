package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter n-gram decontamination — the Dolma-style benchmark
  * scrub at corpus scale: hash every n-gram of the EVAL set into k
  * positions of an m-bit filter, broadcast the filter (m/8 bytes,
  * constant — 32 KiB at the 2^18 default), and flag any TRAIN document
  * whose n-gram hit fraction crosses `tauNum/tauDen`.
  *
  * Why a Bloom bitmap and not a semi-join: at 100 TB the train side's
  * n-gram stream is the big object, and a semi-join against the eval
  * position set would shuffle it. The bitmap rides along as a plan
  * literal instead — the train pass is a single map-side scan, zero
  * exchanges beyond the final per-doc aggregation (which is folded
  * into the same gram-array expression here: no explode at all).
  *
  * Determinism contract: positions are md5-derived (engine-portable),
  * and the bitmap is EXACTLY the eval position set (no lossy
  * compaction), so the filter's decisions — including its false
  * positives — are reproducible bit-for-bit by any engine that
  * computes the same hashes. A Bloom false positive is a property of
  * the (hash, m) design, not of this implementation; oracles replay it
  * exactly.
  */
object BloomDecon {

  /** Word-joined n-gram strings over the standard token stream, short
    * docs contributing their single whole-doc gram (the DuckDB
    * `toks[i:i+n-1]` clamp semantics), deduplicated per doc.
    */
  def grams(text: Column, n: Int): Column = {
    val t = TextAnalysis.tokens(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(t) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(t, i, lit(n)))))
  }

  /** The gram's two filter positions (k = 2): independent 32-bit
    * halves of its md5, mod `mBits`.
    */
  private def pos(g: Column, off: Int, mBits: Int): Column =
    conv(substring(md5(g), off, 8), 16, 10).cast("long") % mBits

  /** Build the m-bit filter over the eval set's grams as a driver-held
    * long array. The collect is bounded by CONSTRUCTION at mBits/64
    * rows (4096 at the default m = 2^18) — a constant independent of
    * data size, same class as the repo's other broadcast-sketch
    * collects.
    */
  def buildBits(eval: DataFrame, textCol: String, n: Int = 3,
                mBits: Int = 1 << 18): Array[Long] = {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    val g = eval.select(explode(grams(col(textCol), n)).as("g"))
    val p = g.select(pos(col("g"), 1, mBits).as("p"))
      .union(g.select(pos(col("g"), 9, mBits).as("p")))
      .distinct()
    val words = p.groupBy((col("p") / 64).cast("long").as("w"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        (col("p") % 64).cast("int"))).as("m"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Flag train docs by filter-hit fraction: (id, n_grams, n_hit,
    * hit_frac) for every doc with `tauDen * n_hit >= tauNum * n_grams`
    * (integer threshold — engine-exact). `hit_frac` is 1e-6-quantized
    * in the output only.
    */
  def flag(train: DataFrame, textCol: String, idCol: String,
           bits: Array[Long], mBits: Int, n: Int = 3,
           tauNum: Int = 3, tauDen: Int = 10): DataFrame = {
    val lut = typedLit(bits.toSeq)
    def hit(g: Column): Column = {
      def bitSet(p: Column): Column =
        call_function("shiftrightunsigned",
          element_at(lut, (p / 64).cast("int") + 1),
          (p % 64).cast("int")).bitwiseAND(lit(1L)) === 1L
      bitSet(pos(g, 1, mBits)) && bitSet(pos(g, 9, mBits))
    }
    train
      .select(col(idCol), grams(col(textCol), n).as("__g"))
      .select(col(idCol), size(col("__g")).cast("long").as("n_grams"),
        size(filter(col("__g"), g => hit(g))).cast("long").as("n_hit"))
      .filter(col("n_hit") * tauDen >= col("n_grams") * tauNum)
      .withColumn("hit_frac",
        round(col("n_hit").cast("double") / col("n_grams"), 6))
  }
}
