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

  /** NANP-style ddd-ddd-dddd, word-bounded — one of the EXTEND-don't-
    * generalize pattern family (see [[IntlPhonePattern]] for the
    * international form added alongside it).
    */
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** E.164-style international number: `+`, a 1–3 digit country code,
    * then 2–5 groups of 2–4 digits with optional single `-`/`.`/space
    * separators — covers `+447911123456`, `+44 20 7946 0958`,
    * `+1 555-123-4567`, `+12.345.6789`. The trailing `\b` is
    * load-bearing: without it a greedy parse of a compact digit run
    * can stop one digit short (`+447911123456` → `+44791112345` + a
    * leaked `6`); the boundary forces the group split that covers the
    * whole run. Permissive like [[Ipv4Pattern]] (a `+`-prefixed
    * non-phone masked costs nothing; a leaked number is PII), and
    * still in the Java∩RE2 subset: non-capturing groups and bounded
    * repetition only, no lookaround. The minimum match is `+` and 5
    * digits, under E.164's 7-digit floor by design — short leaks are
    * still leaks.
    */
  val IntlPhonePattern = "\\+\\d{1,3}(?:[-. ]?\\d{2,4}){2,5}\\b"

  val EmailMask = "<EMAIL>"
  val IpMask = "<IP>"
  val PhoneMask = "<PHONE>"

  /** The text with every match masked, email → intl phone → IP → NANP
    * phone order. The intl mask runs BEFORE the IP mask because a
    * dot-separated international number (`+12.345.678.901`) contains a
    * dotted quad the IP pattern would claim first, leaving a mixed
    * `+<IP>` residue; masked in this order it leaves one clean
    * `<PHONE>`. No other pair overlaps asymmetrically: IPs and NANP
    * numbers never start with `+`, and the email pattern cannot span
    * either mask's output.
    */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailPattern, EmailMask),
          IntlPhonePattern, PhoneMask),
        Ipv4Pattern, IpMask),
      PhonePattern, PhoneMask)

  /** Candidate payment-card number: 13–19 digits with optional single
    * space/dash separators between digits, word-bounded. The bounds are
    * load-bearing: 12 digits never match (no card is that short — and
    * NANP phone digit runs stay clear), and a 20+ digit compact run
    * matches NOTHING because the trailing `\b` cannot land inside the
    * run (digit–digit positions are not boundaries) — an overlong run
    * is an ID, not a card. Java∩RE2 subset like the siblings.
    */
  val CardCandidatePattern = "\\b\\d(?:[ -]?\\d){12,18}\\b"

  val CardMask = "<CARD>"

  /** Candidate card strings in match order (separators as matched). */
  def cardCandidates(text: Column): Column =
    regexp_extract_all(text, lit(CardCandidatePattern), lit(0))

  /** The candidates whose digit content passes the Luhn checksum — the
    * standard false-positive gate (a random 13–19 digit run passes with
    * p = 1/10; a real PAN always passes). Validation is Spark's
    * codegen'd `luhn_check` builtin over the separator-stripped digits;
    * the external oracle replays the mod-10 double-every-second-digit
    * fold with list expressions.
    */
  def luhnValidCards(text: Column): Column =
    filter(cardCandidates(text),
      c => call_function("luhn_check", regexp_replace(c, "[^0-9]", "")))

  /** Text with every Luhn-valid candidate masked. VALUE-based masking
    * (a left fold of string `replace` over the distinct valid
    * candidates): every occurrence of a valid candidate's exact text is
    * masked, wherever it appears — including inside a longer digit run,
    * the stated (and engine-portable) contract. Candidates that fail
    * Luhn are left in place: masking arbitrary long digit runs would
    * destroy IDs/hashes that are not PII.
    */
  def scrubCards(text: Column): Column =
    aggregate(array_distinct(luhnValidCards(text)), text,
      (acc, c) => call_function("replace", acc, c, lit(CardMask)))

  /** Independent per-pattern match counts over the RAW text:
    * (emails, ipv4s, phones, intl phones), each bigint. Independent
    * means a dot-separated intl number also counts its embedded dotted
    * quad as an IP — counts answer "what did the corpus contain", the
    * scrub resolves the overlap (see [[scrub]]).
    */
  def piiCounts(text: Column): (Column, Column, Column, Column) =
    (regexp_count(text, lit(EmailPattern)).cast("bigint"),
      regexp_count(text, lit(Ipv4Pattern)).cast("bigint"),
      regexp_count(text, lit(PhonePattern)).cast("bigint"),
      regexp_count(text, lit(IntlPhonePattern)).cast("bigint"))
}
