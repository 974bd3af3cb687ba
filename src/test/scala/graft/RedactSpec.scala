package graft

import org.apache.spark.sql.functions._

import graft.operators.Redact

class RedactSpec extends SparkSpec {

  test("scrub masks email -> IP -> phone in order; counts are " +
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
    val (ne, ni, np) = Redact.piiCounts(col("text"))
    val got = rows.select(col("doc_id"), ne.as("e"), ni.as("i"), np.as("p"),
        Redact.scrub(col("text")).as("red"))
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 1 && got(1L)._3 == 1 && got(1L)._4 == 1)
    assert(got(1L)._5 == "write <EMAIL> or <IP> call <PHONE> now")
    assert(got(2L) == (2L, 0L, 0L, 0L, "no pii here at all"))
    // 999.* octets mask too (permissive by design: over-masking a
    // non-address costs nothing); 12-345-6789 is NOT ddd-ddd-dddd.
    assert(got(3L)._2 == 1 && got(3L)._3 == 2 && got(3L)._4 == 0)
    assert(got(3L)._5 == "edge <EMAIL> and <IP> and 12-345-6789")
    assert(got(4L)._2 == 2)
    assert(got(4L)._5 == "<EMAIL> <EMAIL>")
  }

  test("patterns stay inside the Java-regex/RE2 common subset (no lookaround)") {
    // Guard: someone "improving" a pattern with lookahead would break
    // the DuckDB oracle silently-later; RE2 has no lookaround at all.
    Seq(Redact.EmailPattern, Redact.Ipv4Pattern, Redact.PhonePattern)
      .foreach { p =>
        assert(!p.contains("(?=") && !p.contains("(?!") &&
          !p.contains("(?<"), s"lookaround in portable pattern: $p")
        p.r // compiles as Scala/Java regex
      }
  }
}
