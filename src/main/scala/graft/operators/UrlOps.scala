package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + per-canonical-URL dedup — the web-corpus
  * pre-pass that runs BEFORE any text dedup (the CCNet / RefinedWeb
  * pipeline shape: collapse the same page fetched under byte-different
  * URLs, then dedup text). Not a reference capability — part of the
  * LLM-training-data operator family (SURVEY §2.14).
  *
  * The canonicalizer is PURE Column algebra (whole-stage codegen, no
  * UDF), so at 100 TB it is a map fused into the scan, and every step
  * is replayable in the DuckDB oracle: fragment strip, scheme+host
  * lower-casing, default-port drop (http:80 / https:443), duplicate-
  * slash collapse, trailing-slash strip, tracking-parameter removal
  * (`utm_*`, `fbclid`, `gclid`, `ref`), and query-parameter sorting.
  *
  * Contract: absolute `http(s)://host[:port][/path][?query][#frag]`
  * URLs. No percent-decoding and no dot-segment (`/../`) resolution —
  * both change semantics on hostile inputs and real pipelines run them
  * upstream in the fetcher; out of scope here, documented.
  */
object UrlOps {

  /** Tracking parameters dropped during canonicalization (anchored
    * `name=` prefix match on each `&`-separated parameter). */
  private[graft] val TrackingRe = "^(utm_[^=]*|fbclid|gclid|ref)="

  /** Canonical form of an absolute http(s) URL; null-safe (null → null). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    val rest = substring_index(noFrag, "://", -1)
    // The authority ends at the FIRST of "/" or "?" — a query can start
    // directly after the host ("https://ex.com?a=1", path omitted), and
    // splitting on "/" alone would swallow the query into the host.
    val sPos = instr(rest, "/")
    val qPos0 = instr(rest, "?")
    val hostEnd = when(sPos > 0 && (qPos0 === 0 || sPos < qPos0), sPos - 1)
      .when(qPos0 > 0, qPos0 - 1)
      .otherwise(length(rest))
    val hostport = rest.substr(lit(1), hostEnd)
    val pathQuery = rest.substr(hostEnd + 1, length(rest))
    val host = lower(substring_index(hostport, ":", 1))
    val hasPort = instr(hostport, ":") > 0
    val port = substring_index(hostport, ":", -1)
    val defaultPort = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    val hostC = when(hasPort && !defaultPort, concat(host, lit(":"), port))
      .otherwise(host)
    val qPos = instr(pathQuery, "?")
    val path = when(qPos > 0, pathQuery.substr(lit(1), qPos - 1)).otherwise(pathQuery)
    val query = when(qPos > 0, pathQuery.substr(qPos + 1, length(pathQuery)))
      .otherwise(lit(""))
    // Collapse duplicate slashes, then strip ALL trailing slashes — the
    // canonical root path is the empty string ("https://h/" ≡ "https://h").
    val pathC = regexp_replace(regexp_replace(path, "/{2,}", "/"), "/+$", "")
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingRe))
    val queryC = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), hostC, pathC,
      when(queryC =!= "", concat(lit("?"), queryC)).otherwise(lit("")))
  }

  /** Group rows by canonical URL; keep the smallest id per group (the
    * deterministic "first fetch wins" policy) plus the group size. One
    * hash shuffle on the canonical string with map-side partial
    * aggregation — the scale-correct shape for a 100 TB URL ledger. */
  def dedupByCanonicalUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.select(canonicalizeUrl(col(urlCol)).as("canonical_url"),
        col(idCol).cast("long").as("__id"))
      .groupBy("canonical_url")
      .agg(min("__id").as("keep_id"), count(lit(1)).as("n_urls"))
}
