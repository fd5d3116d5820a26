package graft.queries

import graft.ops.Hypothesis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 "wave 7" query set (q167+): classical inference statistics
  * (ANOVA, effect sizes, agreement), link prediction, changepoint /
  * cross-correlation trend tools, and embedding-truncation evaluation.
  * Same contract as every other wave: each query has a DuckDB oracle,
  * doubles round to 6 dp, order-sensitive sums go through DECIMAL (or
  * stay integral), output orders tie-break deterministically.
  */
object Wave7Queries {
  import CoreQueries.T

  // ---------------------------------------------------------------- q167
  /** One-way ANOVA ([[Hypothesis.anovaF]]): does mean extended price
    * differ across return flags? 3 groups over the full lineitem —
    * the exact-moments machinery of q163 generalized from 2 groups
    * to k.
    */
  def q167(s: SparkSession, dir: String): DataFrame =
    Hypothesis.anovaF(T(s, dir, "lineitem"), "l_returnflag",
      "l_extendedprice")
  val q167Sql: String =
    """WITH src AS (SELECT l_returnflag AS g, l_extendedprice AS x
      |  FROM lineitem),
      |grp AS (SELECT g, count(*) AS n_i,
      |    sum(CAST(floor(x * 100.0e0 + 0.5e0) AS BIGINT)) AS s_i
      |  FROM src GROUP BY g),
      |means AS (SELECT g, n_i,
      |    (CAST(s_i AS DOUBLE) / CAST(n_i AS DOUBLE)) / 100.0e0 AS m_i
      |  FROM grp),
      |tot AS (SELECT count(*) AS k, sum(n_i) AS n,
      |    (CAST(sum(s_i) AS DOUBLE) / CAST(sum(n_i) AS DOUBLE)) / 100.0e0
      |      AS m
      |  FROM grp),
      |ssw AS (SELECT CAST(sum(CAST(floor(
      |      (x - m_i) * (x - m_i) * 100.0e0 + 0.5e0) AS BIGINT))
      |    AS BIGINT) AS ssw_x100
      |  FROM src JOIN means USING (g)),
      |ssb AS (SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
      |    CAST(sum(CAST(floor(CAST(n_i AS DOUBLE) * (m_i - m) * (m_i - m)
      |      * 100.0e0 + 0.5e0) AS BIGINT)) AS BIGINT) AS ssb_x100
      |  FROM means, tot GROUP BY k, n)
      |SELECT k, n, ssb_x100 AS ss_between_x100, ssw_x100 AS ss_within_x100,
      |  round((CAST(ssb_x100 AS DOUBLE) / CAST(k - 1 AS DOUBLE))
      |        / (CAST(ssw_x100 AS DOUBLE) / CAST(n - k AS DOUBLE)), 6) AS f
      |FROM ssb, ssw""".stripMargin

  // ---------------------------------------------------------------- q168
  /** Wilson score intervals ([[Hypothesis.wilson]]): per order
    * priority, the proportion of fully-shipped orders (status 'F')
    * with its 95% interval — the uncertainty-aware version of a naive
    * rate column.
    */
  def q168(s: SparkSession, dir: String): DataFrame =
    Hypothesis.wilson(T(s, dir, "orders"), "o_orderpriority",
      col("o_orderstatus") === "F")
  val q168Sql: String =
    """WITH g AS (SELECT o_orderpriority AS "group", count(*) AS n,
      |    count(*) FILTER (WHERE o_orderstatus = 'F') AS successes
      |  FROM orders GROUP BY 1),
      |e AS (SELECT "group", n, successes,
      |    CAST(n AS DOUBLE) AS nd,
      |    CAST(successes AS DOUBLE) / CAST(n AS DOUBLE) AS p,
      |    1.96e0 * 1.96e0 AS z2
      |  FROM g),
      |w AS (SELECT "group", n, successes, p,
      |    (p + z2 / (2.0e0 * nd)) / (1.0e0 + z2 / nd) AS center,
      |    1.96e0 * sqrt(p * (1.0e0 - p) / nd + z2 / (4.0e0 * nd * nd))
      |      / (1.0e0 + z2 / nd) AS half
      |  FROM e)
      |SELECT "group", n, successes, round(p, 6) AS p_hat,
      |  round(greatest(0.0e0, center - half), 6) AS ci_lo,
      |  round(least(1.0e0, center + half), 6) AS ci_hi
      |FROM w ORDER BY "group"""".stripMargin

  // ---------------------------------------------------------------- q169
  /** Cramér's V ([[Hypothesis.cramersV]]) between order priority and
    * order status — the effect-size companion to q139's Χ²: is the
    * association big, not just significant?
    */
  def q169(s: SparkSession, dir: String): DataFrame =
    Hypothesis.cramersV(T(s, dir, "orders"), "o_orderpriority",
      "o_orderstatus")
  val q169Sql: String =
    """WITH cells AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
      |    count(*) AS o FROM orders GROUP BY 1, 2),
      |rt AS (SELECT a, sum(o) AS ra FROM cells GROUP BY a),
      |ct AS (SELECT b, sum(o) AS cb FROM cells GROUP BY b),
      |tot AS (SELECT sum(o) AS n, count(DISTINCT a) AS na,
      |    count(DISTINCT b) AS nb FROM cells),
      |filled AS (SELECT rt.a, ct.b, rt.ra, ct.cb, coalesce(cells.o, 0) AS o
      |  FROM rt CROSS JOIN ct LEFT JOIN cells USING (a, b)),
      |chi AS (SELECT n, na, nb,
      |    round(CAST(sum(CAST(
      |      (o - CAST(ra AS DOUBLE) * cb / n)
      |      * (o - CAST(ra AS DOUBLE) * cb / n)
      |      / (CAST(ra AS DOUBLE) * cb / n) AS DECIMAL(38,18)))
      |      AS DOUBLE), 6) AS chi2
      |  FROM filled, tot
      |  GROUP BY n, na, nb)
      |SELECT chi2, (na - 1) * (nb - 1) AS dof, CAST(n AS BIGINT) AS n,
      |  round(sqrt(chi2 / CAST(n * (least(na, nb) - 1) AS DOUBLE)), 6) AS v
      |FROM chi""".stripMargin

  // ---------------------------------------------------------------- q170
  /** Mutual information ([[Hypothesis.mutualInfo]]) between document
    * language and source — how much does knowing the crawl source tell
    * you about language? Reported with both marginal entropies and the
    * sqrt-normalized NMI.
    */
  def q170(s: SparkSession, dir: String): DataFrame =
    Hypothesis.mutualInfo(T(s, dir, "documents"), "lang", "source")
  val q170Sql: String =
    """WITH cells AS (SELECT lang AS a, source AS b, count(*) AS o
      |  FROM documents GROUP BY 1, 2),
      |rt AS (SELECT a, sum(o) AS ra FROM cells GROUP BY a),
      |ct AS (SELECT b, sum(o) AS cb FROM cells GROUP BY b),
      |tot AS (SELECT sum(o) AS n FROM cells),
      |mi AS (SELECT n,
      |    CAST(sum(CAST((o / CAST(n AS DOUBLE)) *
      |      ln(o * n / CAST(ra * cb AS DOUBLE)) AS DECIMAL(38,18)))
      |      AS DOUBLE) AS mi
      |  FROM cells JOIN rt USING (a) JOIN ct USING (b), tot GROUP BY n),
      |ha AS (SELECT CAST(sum(CAST((ra / CAST(n AS DOUBLE)) *
      |    ln(CAST(n AS DOUBLE) / ra) AS DECIMAL(38,18))) AS DOUBLE) AS h_a
      |  FROM rt, tot),
      |hb AS (SELECT CAST(sum(CAST((cb / CAST(n AS DOUBLE)) *
      |    ln(CAST(n AS DOUBLE) / cb) AS DECIMAL(38,18))) AS DOUBLE) AS h_b
      |  FROM ct, tot)
      |SELECT CAST(n AS BIGINT) AS n, round(mi, 6) AS mi,
      |  round(h_a, 6) AS h_a, round(h_b, 6) AS h_b,
      |  round(mi / sqrt(h_a * h_b), 6) AS nmi
      |FROM mi, ha, hb""".stripMargin

  // ---------------------------------------------------------------- q171
  /** Cohen's kappa ([[Hypothesis.cohenKappa]]) between two heuristic
    * "raters" labeling orders high/low: priority-based (urgent/high)
    * vs price-based (above 250k) — the standard agreement check for
    * weak-supervision label sources.
    */
  def q171(s: SparkSession, dir: String): DataFrame =
    Hypothesis.cohenKappa(
      T(s, dir, "orders").select(
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
          .otherwise("low").as("rater_a"),
        when(col("o_totalprice") > 250000.0, "high")
          .otherwise("low").as("rater_b")),
      "rater_a", "rater_b")
  val q171Sql: String =
    """WITH lab AS (SELECT
      |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 'high' ELSE 'low' END AS a,
      |    CASE WHEN o_totalprice > 250000.0e0
      |      THEN 'high' ELSE 'low' END AS b
      |  FROM orders),
      |tot AS (SELECT count(*) AS n,
      |    count(*) FILTER (WHERE a = b) AS agree FROM lab),
      |rt AS (SELECT a, count(*) AS ra FROM lab GROUP BY a),
      |ct AS (SELECT b, count(*) AS cb FROM lab GROUP BY b),
      |pe AS (SELECT sum(ra * cb) AS pe_num
      |  FROM rt JOIN ct ON rt.a = ct.b),
      |k AS (SELECT n, agree,
      |    CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
      |    CAST(pe_num AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS ped
      |  FROM tot, pe)
      |SELECT n, agree, round(po, 6) AS p_o, round(ped, 6) AS p_e,
      |  round((po - ped) / (1.0e0 - ped), 6) AS kappa
      |FROM k""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q167_anova" -> (q167 _),
    "q168_wilson" -> (q168 _),
    "q169_cramers_v" -> (q169 _),
    "q170_mutual_info" -> (q170 _),
    "q171_cohen_kappa" -> (q171 _))

  val oracles: Map[String, String] = Map(
    "q167_anova" -> q167Sql,
    "q168_wilson" -> q168Sql,
    "q169_cramers_v" -> q169Sql,
    "q170_mutual_info" -> q170Sql,
    "q171_cohen_kappa" -> q171Sql)
}
