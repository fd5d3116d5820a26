package graft.queries

import graft.ops.NonParam
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 "wave 6" query set (q152+): nonparametric statistics,
  * trend/changepoint analytics, graph structure metrics, and
  * operational data audits. Same contract as every other wave: each
  * query has a DuckDB oracle, doubles round to 6 dp, order-sensitive
  * sums go through DECIMAL (or stay integral), output orders
  * tie-break deterministically.
  */
object Wave6Queries {
  import CoreQueries.T

  // ---------------------------------------------------------------- q152
  /** Spearman rank correlation ([[NonParam.spearman]]) between
    * lineitem quantity and extended price: tie-averaged ranks doubled
    * to stay integral, Pearson on the ranks with DECIMAL-exact sums.
    */
  def q152(s: SparkSession, dir: String): DataFrame =
    NonParam.spearman(T(s, dir, "lineitem"), "l_quantity", "l_extendedprice")
  val q152Sql: String =
    """WITH r AS (SELECT
      |    2 * CAST(rank() OVER (ORDER BY l_quantity) AS BIGINT)
      |      + count(*) OVER (PARTITION BY l_quantity) - 1 AS rx,
      |    2 * CAST(rank() OVER (ORDER BY l_extendedprice) AS BIGINT)
      |      + count(*) OVER (PARTITION BY l_extendedprice) - 1 AS ry
      |  FROM lineitem),
      |a AS (SELECT count(*) AS n,
      |    sum(CAST(rx AS HUGEINT)) AS sx, sum(CAST(ry AS HUGEINT)) AS sy,
      |    sum(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT)) AS sxx,
      |    sum(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT)) AS syy,
      |    sum(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT)) AS sxy
      |  FROM r)
      |SELECT n, round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |  sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
      |       CAST(n * syy - sy * sy AS DOUBLE)), 6) AS rho
      |FROM a""".stripMargin

  // ---------------------------------------------------------------- q153
  /** Two-sample Kolmogorov–Smirnov ([[NonParam.ksTest]]): does the
    * `value` distribution of click events differ from purchases? The
    * max ECDF gap is decided on exact cross-multiplied integers; only
    * the reported `d` divides.
    */
  def q153(s: SparkSession, dir: String): DataFrame =
    NonParam.ksTest(ExtQueries.events(s, dir), "value", "event_type",
      "click", "purchase")
  val q153Sql: String =
    """WITH c AS (SELECT value AS v,
      |    count(*) FILTER (WHERE event_type = 'click') AS ca,
      |    count(*) FILTER (WHERE event_type = 'purchase') AS cb
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY value),
      |cum AS (SELECT
      |    sum(ca) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
      |    sum(cb) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
      |  FROM c),
      |t AS (SELECT sum(ca) AS n_a, sum(cb) AS n_b FROM c)
      |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  CAST(max(abs(cuma * n_b - cumb * n_a)) AS BIGINT) AS d_num,
      |  round(CAST(max(abs(cuma * n_b - cumb * n_a)) AS DOUBLE) /
      |        CAST(n_a * n_b AS DOUBLE), 6) AS d
      |FROM cum, t GROUP BY n_a, n_b""".stripMargin

  // ---------------------------------------------------------------- q154
  /** Block-jackknife standard error ([[NonParam.blockJackknife]]) of
    * mean extended price: 32 deterministic hash blocks, leave-one-out
    * pseudo-value variance — the uncertainty companion to q27's point
    * estimates.
    */
  def q154(s: SparkSession, dir: String): DataFrame =
    NonParam.blockJackknife(
      T(s, dir, "lineitem")
        .select((col("l_orderkey") * 16 + col("l_linenumber")).as("rid"),
          col("l_extendedprice")),
      "l_extendedprice", "rid", nBlocks = 32)
  val q154Sql: String =
    """WITH src AS (SELECT l_orderkey * 16 + l_linenumber AS rid,
      |    l_extendedprice AS v FROM lineitem),
      |blk AS (SELECT ((rid % 1048576) * 2654435761) % 4294967296 % 32 AS b,
      |    count(*) AS c, sum(CAST(v AS DECIMAL(28,6))) AS s
      |  FROM src GROUP BY 1),
      |tot AS (SELECT sum(c) AS n, sum(s) AS st, count(*) AS g,
      |    CAST(sum(s) AS DOUBLE) / sum(c) AS mean FROM blk),
      |pv AS (SELECT n, g, mean,
      |    CAST(st - s AS DOUBLE) / CAST(n - c AS DOUBLE) AS m_i
      |  FROM blk, tot),
      |a AS (SELECT n, g, mean,
      |    CAST(sum(CAST(m_i AS DECIMAL(38,18))) AS DOUBLE) / g AS mbar,
      |    sum(CAST(m_i * m_i AS DECIMAL(38,18))) AS ssq
      |  FROM pv GROUP BY n, g, mean),
      |se AS (SELECT CAST(n AS BIGINT) AS n, round(mean, 6) AS mean,
      |    round(sqrt(CAST(g - 1 AS DOUBLE) / g *
      |      (CAST(ssq AS DOUBLE) - g * mbar * mbar)), 6) AS se_jack
      |  FROM a)
      |SELECT n, mean, se_jack,
      |  round(mean - 1.96e0 * se_jack, 6) AS ci_lo,
      |  round(mean + 1.96e0 * se_jack, 6) AS ci_hi
      |FROM se""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q152_spearman" -> (q152 _),
    "q153_ks_test" -> (q153 _),
    "q154_jackknife" -> (q154 _))

  val oracles: Map[String, String] = Map(
    "q152_spearman" -> q152Sql,
    "q153_ks_test" -> q153Sql,
    "q154_jackknife" -> q154Sql)
}
