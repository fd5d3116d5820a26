package graft.queries

import graft.ops.ext.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 "wave 8" query set (q176+): the O(log^2 n) star-contraction
  * connected components (the 100 TB-chain-safe twin of q53's label
  * propagation), left-outer stream-stream join, Zipf-law corpus fit,
  * and incremental cross-corpus near-dup — the append-only production
  * shape of MinHash dedup. Same contract as every wave: DuckDB oracle
  * per query, doubles round to 6 dp, integer sums stay integral
  * (BIGINT-cast in the oracle), deterministic tie-breaks.
  */
object Wave8Queries {
  import CoreQueries.T

  // ---------------------------------------------------------------- q176
  /** Connected components via alternating large-star/small-star
    * contraction ([[Dedup.connectedComponentsStar]]) over the same
    * minhash near-dup pair graph as q53 — same oracle (DuckDB
    * recursive-CTE transitive closure), different round complexity:
    * O(log^2 n) rounds vs label propagation's O(diameter), the
    * difference between 3 and 40 edge shuffles on a mirror-chain
    * crawl component.
    */
  def q176(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashNearDups(ExtQueries.nearDupCorpus(s, dir),
      "text", "doc_id", shingleSize = 3, k = 32, bands = 16,
      threshold = 0.8, includeExactDuplicates = true)
      .select("id_a", "id_b")
    Dedup.connectedComponentsStar(pairs)
  }
  val q176Sql: String = ExtQueries.q53Sql

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q176_cc_star" -> (q176 _))

  val oracles: Map[String, String] = Map(
    "q176_cc_star" -> q176Sql)
}
