package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction — the scrub stage every production training-data
  * pipeline runs before a corpus ships (emails, IPs, phone numbers
  * masked to typed placeholder tokens; CCNet/Dolma-class pipelines run
  * exactly this between heuristic filtering and packaging). The
  * reference has no such stage (its transform is a per-record status
  * map); this operator adds the standard one.
  *
  * Patterns live in the Java-regex ∩ RE2 COMMON SUBSET (character
  * classes, bounded repetition, `\b` word boundaries — NO lookaround,
  * which RE2 lacks), so an external SQL engine replays the exact same
  * matches — the q101 portability discipline applied to regexes. All
  * masking is `regexp_replace` column expressions: narrow, codegen'd,
  * zero shuffle — the scrub rides whatever scan already reads the text.
  *
  * Match-count contract: [[piiCounts]] counts each pattern
  * INDEPENDENTLY on the RAW text (an IPv4 inside an email's domain
  * counts as both), while [[scrub]] masks sequentially
  * email → IP → phone, so an email's digits can never half-match as an
  * IP after masking. Counts answer "what did the corpus contain";
  * the scrub answers "what leaves the pipeline".
  */
object Redact {

  /** Local-part @ domain.tld — the conservative form (no quoted
    * local parts, no IP-literal domains; those are vanishingly rare in
    * crawl text and the pattern must stay lookaround-free).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded. Deliberately permissive on octet
    * range (999 matches): over-masking a non-address costs nothing,
    * under-masking an address leaks PII.
    */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-style ddd-ddd-dddd, word-bounded — the form to extend (not
    * generalize in place) for other locales.
    */
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  val EmailMask = "<EMAIL>"
  val IpMask = "<IP>"
  val PhoneMask = "<PHONE>"

  /** The text with every match masked, email → IP → phone order. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, EmailMask),
        Ipv4Pattern, IpMask),
      PhonePattern, PhoneMask)

  /** Independent per-pattern match counts over the RAW text:
    * (emails, ipv4s, phones), each bigint.
    */
  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(EmailPattern)).cast("bigint"),
      regexp_count(text, lit(Ipv4Pattern)).cast("bigint"),
      regexp_count(text, lit(PhonePattern)).cast("bigint"))
}
