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
  * is replayable in the DuckDB oracle: fragment strip, percent-encoding
  * normalization (RFC 3986 §6.2.2.1-2: decode unreserved escapes,
  * upper-case the hex of the rest), scheme+host lower-casing,
  * default-port drop (http:80 / https:443), dot-segment resolution
  * (`/./` drop, `/../` pop, clamped at the root — RFC 3986 §5.2.4),
  * duplicate-slash collapse, trailing-slash strip, tracking-parameter
  * removal (`utm_*`, `fbclid`, `gclid`, `ref`), and query-parameter
  * sorting.
  *
  * Contract: absolute `http(s)://host[:port][/path][?query][#frag]`
  * URLs. Decoding is limited to UNRESERVED escapes (`%7E` → `~`), which
  * is structure-preserving AT THE ESCAPE SITE — reserved escapes
  * (`%2F`, `%23`) keep their meaning and only their hex case is
  * normalized. One intended composition: a decoded `.` (`%2E`) that
  * forms a `.`/`..` path segment then participates in the LATER
  * dot-segment resolution (`a/%2E%2E/b` → `b`), which is exactly RFC
  * 3986 §6.2.2's order (decode §6.2.2.2 before syntax-based path
  * normalization §6.2.2.3) — UrlSpec pins that case.
  */
object UrlOps {

  /** Tracking parameters dropped during canonicalization (anchored
    * `name=` prefix match on each `&`-separated parameter). */
  private[graft] val TrackingRe = "^(utm_[^=]*|fbclid|gclid|ref)="

  /** RFC 3986 percent-encoding normalization: decode escapes whose
    * octet is UNRESERVED (ALPHA / DIGIT / `-._~`), upper-case the hex
    * digits of every other well-formed escape, and pass malformed `%`
    * sequences through untouched. Split on `%`: every part after the
    * first begins at an escape site, so each is classified by its
    * leading two chars — no regex backtracking, fully codegen'd. */
  private[graft] def percentNormalize(s: Column): Column = {
    val parts = split(s, "%", -1)
    val head = element_at(parts, 1)
    val tail = slice(parts, lit(2), greatest(size(parts) - 1, lit(0)))
    val fixed = transform(tail, p => {
      val rawHex = substring(p, 1, 2)
      val valid = rawHex.rlike("^[0-9A-Fa-f]{2}$")
      val hex = upper(rawHex)
      val code = conv(hex, 16, 10).cast("int")
      val unreserved = (code === 45) || (code === 46) || (code === 95) ||
        (code === 126) || (code >= 48 && code <= 57) ||
        (code >= 65 && code <= 90) || (code >= 97 && code <= 122)
      val restOf = substring(p, 3, 1 << 30)
      when(valid && unreserved, concat(call_function("char", code), restOf))
        .when(valid, concat(lit("%"), hex, restOf))
        .otherwise(concat(lit("%"), p)) // malformed escape: literal '%'
    })
    concat(head, array_join(fixed, ""))
  }

  /** Canonical form of an absolute http(s) URL; null-safe (null → null).
    *
    * NOTE for pipeline authors: this single Column references its input
    * many times (scheme, host, path, query are all derived from it), so
    * an EXPENSIVE input expression would be duplicated into every
    * reference by inlining. [[dedupByCanonicalUrl]] therefore stages
    * [[percentNormalize]] in its own projection and feeds the
    * normalized column here — Catalyst's CollapseProject keeps a
    * non-cheap multi-referenced projection separate, so the escape
    * normalization runs once per row. Use the same split when embedding
    * this in other pipelines; this convenience form is for tests and
    * one-off columns. */
  def canonicalizeUrl(url: Column): Column =
    canonicalizeNormalized(percentNormalize(substring_index(url, "#", 1)))

  /** [[canonicalizeUrl]] minus the fragment strip and escape
    * normalization — `noFrag` must already be percent-normalized. */
  private[graft] def canonicalizeNormalized(noFrag: Column): Column = {
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
    // Segment algebra subsumes three steps at once: splitting on "/"
    // and dropping empty segments collapses duplicate AND trailing
    // slashes; dropping "." and popping the accumulator on ".." is RFC
    // 3986 §5.2.4 dot-segment resolution (the pop regex strips the last
    // "/segment"; at the root the accumulator is "" and the pop is a
    // no-op — root's parent is root). The canonical root path is the
    // empty string ("https://h/" ≡ "https://h").
    val segs = filter(split(path, "/"), s0 => s0 =!= "" && s0 =!= ".")
    val pathC = aggregate(segs, lit(""), (acc, s0) =>
      when(s0 === "..", regexp_replace(acc, "/[^/]*$", ""))
        .otherwise(concat(acc, lit("/"), s0)))
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
    df.select(
        percentNormalize(substring_index(col(urlCol), "#", 1)).as("__norm"),
        col(idCol).cast("long").as("__id"))
      .select(canonicalizeNormalized(col("__norm")).as("canonical_url"), col("__id"))
      .groupBy("canonical_url")
      .agg(min("__id").as("keep_id"), count(lit(1)).as("n_urls"))
}
