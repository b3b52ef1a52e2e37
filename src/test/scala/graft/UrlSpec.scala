package graft

import graft.operators.UrlOps
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Pins every canonicalization step of [[UrlOps.canonicalizeUrl]] on
  * adversarial inputs the t_url_dedup fixture can't plant (non-default
  * ports, params whose VALUES contain '=', tracking-lookalike params,
  * root paths), plus the dedup policy. */
class UrlSpec extends AnyFunSuite with SharedSpark {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u"))).as[String].collect.toSeq
  }

  test("scheme/host case-fold, default-port drop, non-default port kept") {
    assert(canon(
      "HTTPS://WWW.Ex.COM/Path",      // path case preserved
      "https://ex.com:443/a",         // default https port dropped
      "http://ex.com:80/a",           // default http port dropped
      "http://ex.com:443/a",          // 443 is NOT http's default — kept
      "https://ex.com:8443/a")        // non-default kept
      === Seq("https://www.ex.com/Path", "https://ex.com/a", "http://ex.com/a",
        "http://ex.com:443/a", "https://ex.com:8443/a"))
  }

  test("slash collapse, trailing-slash strip, root path, fragment strip") {
    assert(canon(
      "https://ex.com//a///b//",      // collapse + strip
      "https://ex.com/",              // root → empty path
      "https://ex.com",               // no path at all ≡ root
      "https://ex.com/a#frag?x=1")    // '#' before '?': all of it is fragment
      === Seq("https://ex.com/a/b", "https://ex.com", "https://ex.com",
        "https://ex.com/a"))
  }

  test("query directly after the host (no path) still canonicalizes fully") {
    assert(canon(
      "https://ex.com?utm_source=x&b=1",   // tracking stripped, no path
      "https://ex.com:443?b=2&a=1",        // default port dropped + sorted
      "HTTP://EX.COM:8080?z=1#f")          // case-fold + kept port + fragment
      === Seq("https://ex.com?b=1", "https://ex.com?a=1&b=2",
        "http://ex.com:8080?z=1"))
  }

  test("tracking params dropped, rest sorted; '=' inside values survives") {
    assert(canon(
      "https://ex.com/a?utm_source=x&b=2&a=1&gclid=g&ref=r",
      "https://ex.com/a?k=v=w&utm_x=1",   // value contains '='
      "https://ex.com/a?utmx=1&refx=2",   // lookalikes are NOT tracking params
      "https://ex.com/a?utm_source=x")    // all-tracking → no query at all
      === Seq("https://ex.com/a?a=1&b=2", "https://ex.com/a?k=v=w",
        "https://ex.com/a?refx=2&utmx=1", "https://ex.com/a"))
  }

  test("dedupByCanonicalUrl keeps the smallest id and counts the group") {
    import spark.implicits._
    val rows = UrlOps.dedupByCanonicalUrl(
      Seq((10L, "https://ex.com/a/"), (7L, "HTTPS://EX.COM:443//a"),
        (3L, "https://ex.com/a?utm_source=t"), (9L, "https://ex.com/b"))
        .toDF("id", "url"), "url", "id")
      .orderBy(col("canonical_url"))
      .as[(String, Long, Long)].collect.toSeq
    assert(rows === Seq(("https://ex.com/a", 3L, 3L), ("https://ex.com/b", 9L, 1L)))
  }
}
