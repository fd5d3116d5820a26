package graft.ops.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-crawl pipelines: the dedup key for
  * "same page fetched twice" is the NORMALIZED url, so normalization
  * quality directly bounds crawl-dedup recall.
  *
  * Rules (the conservative, reversible subset every crawler agrees on):
  * lowercase scheme+host, strip a leading `www.`, drop default ports
  * (:80 http / :443 https), drop the fragment, drop tracking params
  * (utm_*, gclid, fbclid, ref), sort surviving query params, strip a
  * trailing `/` from the path.
  *
  * Everything is a narrow per-row expression chain (regexp + array ops,
  * all codegen'd, no UDF, no shuffle), and every pattern lives in the
  * RE2 ∩ java.util.regex subset so the DuckDB oracle runs the SAME
  * normalization — the canonical form is engine-portable.
  */
object WebUrl {

  private val TrackingParam = "^(utm_[a-z]+|gclid|fbclid|ref)="

  /** scheme://host[:port]/path?query#frag -> canonical form. */
  def normalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    val host0 = regexp_replace(hostPort, ":[0-9]+$", "")
    val host = regexp_replace(host0, "^www\\.", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort = when(port === "", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val path0 = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1)
    val path = regexp_replace(path0, "/$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val keptParams = array_sort(filter(split(query, "&"),
      p => !(p.rlike(TrackingParam)) && length(p) > 0))
    val queryNorm = when(size(keptParams) > 0,
      concat(lit("?"), array_join(keptParams, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, keepPort, path, queryNorm)
  }

  /** Registrable domain (last two labels of the canonical host) — the
    * aggregation key for per-site stats and domain blocklists. A real
    * deployment swaps in the public-suffix list; two labels is the
    * deterministic, dependency-free default.
    */
  def domain(normalizedUrl: Column): Column = {
    val host = regexp_extract(normalizedUrl, "^[a-z][a-z0-9+.-]*://([^/:?]*)", 1)
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
  }
}
