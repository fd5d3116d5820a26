package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composed pre-training hygiene flow
  * (quality gate → exact dedup → near-dup removal → benchmark
  * decontamination → stratified downsampling) as ONE declarative plan.
  * Each stage is an operator this engine already ships; composing them
  * in one DataFrame keeps Catalyst free to pipeline the narrow stages
  * (quality filter, sampling) into adjacent scans and lets the whole
  * flow run as a single job — no intermediate materialization.
  *
  * Stage order is the cost-aware one for 100 TB: the narrow token-count
  * filter runs inside the scan; exact dedup (one hash shuffle) halves
  * crawl corpora before the LSH work; near-dup pairs come from the
  * bucketed MinHash join (never all-pairs); the decontamination and
  * near-dup drop sets are small id sets, so both anti-joins broadcast;
  * the final hash-sample is again a narrow filter.
  *
  * Every decision is deterministic (min-id winners, md5-threshold
  * sampling), so the surviving set is reproducible across runs and
  * engines — the whole pipeline is DuckDB-oracle-checkable.
  */
object Curation {

  /** @param minTokens        quality gate: keep docs with >= this many tokens
    * @param nearDupThreshold jaccard at/above which the larger id of a
    *                         candidate pair is dropped
    * @param contaminationMax drop docs whose shingle overlap ratio with
    *                         the benchmark reaches this value
    * @param rates            per-stratum sampling rates (see Sampling)
    */
  def curate(docs: DataFrame, benchmark: DataFrame, textCol: String,
             idCol: String, strataCol: String,
             minTokens: Int = 10, nearDupThreshold: Double = 0.8,
             contaminationMax: Double = 0.2,
             rates: Map[String, Double] = Map.empty,
             defaultRate: Double = 1.0): DataFrame = {
    val quality = docs.filter(TextAnalysis.tokenCount(col(textCol)) >= minTokens)
    // stage boundaries persist: `exact` feeds the near-dup pass AND the
    // anti-join left side; `deduped` (below) feeds decontamination AND
    // the final anti-join — without caching, the exact-dedup window
    // recomputes once per consumer. In a production-scale run the
    // equivalent move is checkpointing between curation stages.
    val exact = Dedup.exactByHash(quality, textCol, idCol).persist()
    // duplicate CLUSTERS, not pairs: near-dup similarity is not
    // transitive (a~b, b~c with no a~c pair), so pairwise larger-id
    // dropping can keep two docs that belong to one cluster. Connected
    // components over the verified pair graph collapses each cluster to
    // its min-id representative — every non-representative is dropped.
    // The component pass runs on the PAIR set (orders of magnitude
    // smaller than the corpus), so its iteration cost is negligible
    // next to the LSH join that produced the pairs.
    val pairs = Dedup.minhashNearDups(exact, textCol, idCol,
      threshold = nearDupThreshold).select(col("id_a"), col("id_b"))
    // star contraction, not label propagation: same min-id components
    // (q176 passes q53's oracle), O(log² n) rounds vs O(diameter)
    val dupIds = Dedup.connectedComponentsStar(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    val deduped = exact.join(dupIds, Seq(idCol), "left_anti").persist()
    val contaminatedIds = Decontaminate
      .ngramOverlap(deduped, benchmark, textCol, idCol)
      .filter(col("contamination") >= contaminationMax)
      .select(idCol)
    val clean = deduped.join(contaminatedIds, Seq(idCol), "left_anti")
    Sampling.stratifiedSample(clean, idCol, strataCol, rates, defaultRate)
  }
}
