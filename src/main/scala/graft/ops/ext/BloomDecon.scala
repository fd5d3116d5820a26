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
    *
    * PERF NOTE: pass a MATERIALIZED token column ([[gramsOfTokens]])
    * when the caller scans a corpus — higher-order functions are
    * CodegenFallback (interpreted, no common-subexpression
    * elimination), so a raw-text `t` here re-evaluates the whole
    * split/lower/filter token pipeline once PER SLIDING WINDOW
    * (O(len²) per doc; measured as most of q449's 39.5 s).
    */
  def grams(text: Column, n: Int): Column =
    gramsOfTokens(TextAnalysis.tokens(text), n)

  /** [[grams]] over an already-computed token array column: the lambda
    * then re-evaluates only a bound attribute per window, not the
    * tokenizer.
    */
  def gramsOfTokens(toks: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Build the m-bit filter over the eval set's grams as a driver-held
    * long array. The collect is bounded by CONSTRUCTION at mBits/64
    * rows (4096 at the default m = 2^18) — a constant independent of
    * data size, same class as the repo's other broadcast-sketch
    * collects.
    */
  def buildBits(eval: DataFrame, textCol: String, n: Int = 3,
                mBits: Int = 1 << 18): Array[Long] = {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    // tokens materialized BEFORE the gram lambda (see [[grams]] perf
    // note), one exploded gram pass, ONE md5 per gram with both
    // positions derived from it (the select-union form ran the whole
    // gram pipeline + md5 twice, once per position)
    val h = eval
      .select(TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(explode(gramsOfTokens(col("__t"), n)).as("g"))
      .select(md5(col("g")).as("h"))
    val p = h.select(explode(array(
        conv(substring(col("h"), 1, 8), 16, 10).cast("long") % mBits,
        conv(substring(col("h"), 9, 8), 16, 10).cast("long") % mBits))
        .as("p"))
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
    def bitSet(p: Column): Column =
      call_function("shiftrightunsigned",
        element_at(lut, (p / 64).cast("int") + 1),
        (p % 64).cast("int")).bitwiseAND(lit(1L)) === 1L
    // EXPLODED, codegen'd hit test + per-doc aggregate. The previous
    // higher-order `size(filter(__g, hit))` form was interpreted
    // (HOFs are CodegenFallback): no subexpression elimination, so
    // md5(g) ran up to 8× per gram — and the pushed-down
    // `n_hit*tauDen >= n_grams*tauNum` filter then re-inlined the
    // whole computation a second time below the Project (q449 spent
    // 39.5 s there at sf0.1). Exploding runs the position math in
    // whole-stage codegen (md5 once per gram via subexpression
    // elimination) and the Aggregate is a pushdown BARRIER: the
    // threshold filter stays above it. The one added exchange
    // carries map-side-combined (id, n_grams, n_hit) partials —
    // 24 bytes per doc, nothing like the text.
    val h = md5(col("__gram"))
    val p1 = conv(substring(h, 1, 8), 16, 10).cast("long") % mBits
    val p2 = conv(substring(h, 9, 8), 16, 10).cast("long") % mBits
    train
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col(idCol), explode(gramsOfTokens(col("__t"), n)).as("__gram"))
      .select(col(idCol),
        when(bitSet(p1) && bitSet(p2), 1L).otherwise(0L).as("__hit"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("__hit")).as("n_hit"))
      .filter(col("n_hit") * tauDen >= col("n_grams") * tauNum)
      .withColumn("hit_frac",
        round(col("n_hit").cast("double") / col("n_grams"), 6))
  }
}
