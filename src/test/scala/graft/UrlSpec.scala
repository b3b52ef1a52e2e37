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

  test("percent-encoding: unreserved escapes decode, reserved upper-case, malformed survive") {
    assert(canon(
      "https://ex.com/%7Efoo",         // %7E = '~' (unreserved) → decode
      "https://ex.com/~foo",           // ≡ the line above
      "https://ex.com/%41%62c",        // %41='A' %62='b' → decode
      "https://ex.com/a%2fb",          // %2F = '/' (reserved) → hex upper-cased only
      "https://ex.com/a%3Fb?x=%3d1",   // reserved ? and = stay escaped, upper-cased
      "https://ex.com/100%",           // trailing bare '%' is malformed → literal
      "https://ex.com/a%4",            // truncated escape → literal
      "https://ex.com/a%zz",           // non-hex escape → literal
      "https://ex.com/%75tm?%75tm_source=x") // decoded THEN tracking-stripped
      === Seq("https://ex.com/~foo", "https://ex.com/~foo",
        "https://ex.com/Abc", "https://ex.com/a%2Fb",
        "https://ex.com/a%3Fb?x=%3D1", "https://ex.com/100%",
        "https://ex.com/a%4", "https://ex.com/a%zz",
        "https://ex.com/utm"))
  }

  test("dot segments: '.' drops, '..' pops, root parent clamps to root") {
    assert(canon(
      "https://ex.com/a/./b",          // '.' dropped
      "https://ex.com/a/x/../b",       // one pop
      "https://ex.com/a/b/c/../../d",  // nested pops
      "https://ex.com/../a",           // parent of root = root
      "https://ex.com/a/../../../b",   // pops clamp at root
      "https://ex.com/a/..",           // trailing '..' pops to root
      "https://ex.com/./.",            // nothing but dots → root
      "https://ex.com/..a/b",          // '..a' is a normal segment
      "https://ex.com/a/%2E%2E/b")     // %2E = '.' decodes FIRST, then resolves
      === Seq("https://ex.com/a/b", "https://ex.com/a/b",
        "https://ex.com/a/d", "https://ex.com/a", "https://ex.com/b",
        "https://ex.com", "https://ex.com", "https://ex.com/..a/b",
        "https://ex.com/b"))
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
