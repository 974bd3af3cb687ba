package graft

import org.apache.spark.sql.functions._

import graft.operators.Redact

class RedactSpec extends SparkSpec {

  test("scrub masks email -> intl -> IP -> phone in order; counts are " +
      "independent over the raw text") {
    import spark.implicits._
    val rows = Seq(
      (1L, "write bob.smith+x@sub.example.co.uk or 192.168.0.1 call 555-123-4567 now"),
      (2L, "no pii here at all"),
      // The ordering contract made visible: the IP lives INSIDE the
      // email's domain, so the raw-text counts see both, but the scrub
      // masks the email first and no IP survives to double-mask.
      (3L, "edge user@1.2.3.4.com and 999.999.999.999 and 12-345-6789"),
      (4L, "a@b.io a@b.io")).toDF("doc_id", "text")
    val (ne, ni, np, nx) = Redact.piiCounts(col("text"))
    val got = rows.select(col("doc_id"), ne.as("e"), ni.as("i"), np.as("p"),
        nx.as("x"), Redact.scrub(col("text")).as("red"))
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 1 && got(1L)._3 == 1 && got(1L)._4 == 1 && got(1L)._5 == 0)
    assert(got(1L)._6 == "write <EMAIL> or <IP> call <PHONE> now")
    assert(got(2L) == (2L, 0L, 0L, 0L, 0L, "no pii here at all"))
    // 999.* octets mask too (permissive by design: over-masking a
    // non-address costs nothing); 12-345-6789 is NOT ddd-ddd-dddd.
    assert(got(3L)._2 == 1 && got(3L)._3 == 2 && got(3L)._4 == 0 && got(3L)._5 == 0)
    assert(got(3L)._6 == "edge <EMAIL> and <IP> and 12-345-6789")
    assert(got(4L)._2 == 2)
    assert(got(4L)._6 == "<EMAIL> <EMAIL>")
  }

  test("E.164-style numbers: compact, space/dash/dot separated, and the " +
      "intl-before-IP ordering on dotted forms") {
    import spark.implicits._
    val rows = Seq(
      (1L, "ring +447911123456 today"),            // compact E.164
      (2L, "or +44 20 7946 0958 works"),           // space groups
      (3L, "us desk +1 555-123-4567 anytime"),     // + NANP hybrid
      (4L, "odd +12.345.678.901 dotted"),          // dotted: IP inside
      (5L, "price rose +12 today"),                // short +number: no match
      (6L, "sum 7+1234567 inline"),                // no leading boundary req
      (7L, "x +1 555-123-45678 y"),                // 5-digit tail regroups
      (8L, "ref +4479 11 123456 q")).toDF("doc_id", "text") // mixed groups
    val (_, ni, np, nx) = Redact.piiCounts(col("text"))
    val got = rows.select(col("doc_id"), ni.as("i"), np.as("p"), nx.as("x"),
        Redact.scrub(col("text")).as("red"))
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._4 == 1 && got(1L)._5 == "ring <PHONE> today")
    assert(got(2L)._4 == 1 && got(2L)._5 == "or <PHONE> works")
    // Independent counts see the intl number AND its embedded NANP
    // form; the scrub masks intl first, one clean token remains.
    assert(got(3L)._3 == 1 && got(3L)._4 == 1)
    assert(got(3L)._5 == "us desk <PHONE> anytime")
    // Dotted intl contains a dotted quad: counts see both, the scrub's
    // intl-before-IP order leaves <PHONE>, never "+<IP>".
    assert(got(4L)._2 == 1 && got(4L)._4 == 1)
    assert(got(4L)._5 == "odd <PHONE> dotted")
    // "+12" alone is below the 5-digit floor.
    assert(got(5L)._4 == 0 && got(5L)._5 == "price rose +12 today")
    // Permissive: a 7-digit run after + masks even mid-expression
    // (over-masking a non-phone costs nothing).
    assert(got(6L)._4 == 1 && got(6L)._5 == "sum 7<PHONE> inline")
    // The optional separator lets a bare 2-digit group absorb a tail
    // that a fixed NANP shape would leak (RE2 agrees — verified).
    assert(got(7L)._4 == 1 && got(7L)._5 == "x <PHONE> y")
    assert(got(8L)._4 == 1 && got(8L)._5 == "ref <PHONE> q")
  }

  test("card candidates: 13-19 digit runs with single separators; " +
      "12-digit and 20-digit runs never match") {
    import spark.implicits._
    val rows = Seq(
      (1L, "pay 4111 1111 1111 1111 now"),          // valid, spaced
      (2L, "ref 4012-8888-8888-1881 end"),          // valid, dashed
      (3L, "amex 378282246310005 here"),            // valid, 15 compact
      (4L, "junk 1234 5678 9012 3456 x"),           // candidate, fails Luhn
      (5L, "short 123456789012 y"),                 // 12 digits: no candidate
      (6L, "long 12345678901234567890 z"),          // 20 digits: no candidate
      (7L, "none at all")).toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
        size(Redact.cardCandidates(col("text"))).as("nc"),
        size(Redact.luhnValidCards(col("text"))).as("nv"),
        Redact.scrubCards(col("text")).as("red"))
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 1, 1, "pay <CARD> now")))
    assert(got(2L) == ((2L, 1, 1, "ref <CARD> end")))
    assert(got(3L) == ((3L, 1, 1, "amex <CARD> here")))
    // Luhn failure: candidate counted, nothing masked.
    assert(got(4L) == ((4L, 1, 0, "junk 1234 5678 9012 3456 x")))
    assert(got(5L) == ((5L, 0, 0, "short 123456789012 y")))
    // The trailing \b cannot land inside a digit run, so an overlong
    // run produces NO candidate at any alignment.
    assert(got(6L) == ((6L, 0, 0, "long 12345678901234567890 z")))
    assert(got(7L) == ((7L, 0, 0, "none at all")))
  }

  test("card masking is value-based: every occurrence of a valid " +
      "candidate masks, and repeats count per match") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a 4111 1111 1111 1111 b 4111 1111 1111 1111 c"),
      // Two different valid cards in one doc both mask.
      (2L, "x 378282246310005 y 5500 0000 0000 0004 z"))
      .toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
        size(Redact.cardCandidates(col("text"))).as("nc"),
        size(Redact.luhnValidCards(col("text"))).as("nv"),
        Redact.scrubCards(col("text")).as("red"))
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2, 2, "a <CARD> b <CARD> c")))
    assert(got(2L) == ((2L, 2, 2, "x <CARD> y <CARD> z")))
  }

  test("patterns stay inside the Java-regex/RE2 common subset (no lookaround)") {
    // Guard: someone "improving" a pattern with lookahead would break
    // the DuckDB oracle silently-later; RE2 has no lookaround at all.
    Seq(Redact.EmailPattern, Redact.Ipv4Pattern, Redact.PhonePattern,
        Redact.IntlPhonePattern, Redact.CardCandidatePattern)
      .foreach { p =>
        assert(!p.contains("(?=") && !p.contains("(?!") &&
          !p.contains("(?<"), s"lookaround in portable pattern: $p")
        p.r // compiles as Scala/Java regex
      }
  }
}
