package graft

import org.apache.spark.sql.functions._
import graft.functions.UrlExpr

class UrlExprSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String = {
    val r = Seq(Tuple1(u)).toDF("u")
      .select(UrlExpr.urlNormalize(col("u")).as("n")).head()
    r.getString(0)
  }

  test("scheme and authority lowercase; path and query case preserved") {
    assert(norm("HTTP://WWW.Example.COM/Path/To?Q=Val") ==
      "http://www.example.com/Path/To?Q=Val")
  }

  test("default ports drop per scheme; non-default and cross-scheme ports stay") {
    assert(norm("http://a.com:80/x") == "http://a.com/x")
    assert(norm("https://a.com:443/x") == "https://a.com/x")
    assert(norm("http://a.com:8080/x") == "http://a.com:8080/x")
    assert(norm("https://a.com:80/x") == "https://a.com:80/x")
    assert(norm("ftp://a.com:80/x") == "ftp://a.com:80/x")
  }

  test("fragment drops; bare-root path drops; deeper trailing slash stays") {
    assert(norm("http://a.com/x#frag") == "http://a.com/x")
    assert(norm("http://a.com/#top") == "http://a.com")
    assert(norm("http://a.com/") == "http://a.com")
    assert(norm("http://a.com/x/") == "http://a.com/x/")
  }

  test("tracking params drop (utm_* any case, blocklist names); " +
      "the rest sort; an emptied query drops its '?'") {
    assert(norm("http://a.com/x?utm_source=f&b=2&UTM_Medium=e&a=1") ==
      "http://a.com/x?a=1&b=2")
    assert(norm("http://a.com/x?fbclid=1&gclid=2&ref=tw&a=1") ==
      "http://a.com/x?a=1")
    assert(norm("http://a.com/x?utm_source=f&FBCLID=z") == "http://a.com/x")
    // a non-tracking name that merely CONTAINS a tracked one survives
    assert(norm("http://a.com/x?preference=1") == "http://a.com/x?preference=1")
    // empty segments vanish; a valueless param participates in the sort
    assert(norm("http://a.com/x?b=2&&flag&a=1") == "http://a.com/x?a=1&b=2&flag")
  }

  test("scheme-less strings pass through (trimmed, fragment still dropped)") {
    assert(norm("  example.com/path?utm_source=x  ") ==
      "example.com/path?utm_source=x")
    assert(norm("mailto:a@b.com") == "mailto:a@b.com")
  }

  test("authority-only URLs and query-without-path parse") {
    assert(norm("http://A.com") == "http://a.com")
    assert(norm("http://A.com?b=2&a=1") == "http://a.com?a=1&b=2")
  }

  test("normalization is idempotent and null-safe") {
    for (u <- Seq("HTTP://WWW.E.COM:80/P/?b=2&utm_source=x&a=1#f",
        "site.com/x", "https://s.com:443/", "http://a.com/x?flag")) {
      val once = norm(u)
      assert(norm(once) == once, s"not idempotent on $u -> $once")
    }
    val r = Seq(Tuple1(null: String)).toDF("u")
      .select(UrlExpr.urlNormalize(col("u")).as("n")).head()
    assert(r.isNullAt(0))
  }
}
