package graft

import org.apache.spark.sql.functions._

import graft.operators.Url

/** Hand-computed fixtures for URL canonicalization — each case isolates
  * one normalization axis (the corpus-level oracle is q149, which
  * exercises the axes in combination).
  */
class UrlSpec extends SparkSpec {

  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Url.canonicalize(col("url")).as("c"))
      .as[String].collect().toSeq

  test("scheme, host case and www strip; fragment drops; path case kept") {
    assert(canon(
      "https://www.Example.com/Page/5",
      "HTTP://EXAMPLE.COM/Page/5",
      "https://example.com/Page/5#section-2") ==
      Seq("example.com/Page/5", "example.com/Page/5", "example.com/Page/5"))
  }

  test("tracking params drop, content params survive — including a kept " +
      "param promoted to first position") {
    assert(canon(
      "https://example.com/p?utm_source=feed",
      "https://example.com/p?utm_campaign=x&id=2",
      "https://example.com/p?id=2&utm_medium=mail",
      "https://example.com/p?id=2&fbclid=abc123") ==
      Seq("example.com/p", "example.com/p?id=2",
        "example.com/p?id=2", "example.com/p?id=2"))
  }

  test("trailing slash strips before the query and at the end; a bare " +
      "host and a root path unify") {
    assert(canon(
      "https://example.com/a/",
      "https://example.com/a/?id=1",
      "https://example.com/",
      "https://example.com") ==
      Seq("example.com/a", "example.com/a?id=1", "example.com", "example.com"))
  }

  test("a www-prefixed SUBDOMAIN only loses the www. prefix itself") {
    assert(canon(
      "https://www.blog.example.com/x",
      "https://www2.example.com/x") ==
      Seq("blog.example.com/x", "www2.example.com/x"))
  }

  test("a non-absolute URL passes through unchanged — malformed rows " +
      "must never unify into one empty-key dup cluster") {
    assert(canon("example.com/x", "not a url at all", "") ==
      Seq("example.com/x", "not a url at all", ""))
  }

  test("canonicalize is idempotent (property): a canonical form has no " +
      "scheme, so a second pass takes the pass-through branch") {
    val urls = for {
      scheme <- Seq("https://", "HTTP://"); www <- Seq("www.", "")
      q <- Seq("", "?utm_source=x", "?utm_a=1&id=2", "?id=2&fbclid=z", "/")
      f <- Seq("", "#frag")
    } yield s"$scheme${www}Host$q$f"
    val once = canon(urls: _*)
    assert(canon(once: _*) == once)
  }
}
