package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the rung a crawl pipeline runs BEFORE any
  * text-level dedup: the same page arrives under scheme-case, `www.`,
  * tracking-parameter, trailing-slash and fragment variants, and
  * unifying those collapses most crawl duplication for the price of a
  * string normalization (no shingles, no signatures). CCNet/C4-class
  * pipelines key their very first dedup on exactly this canonical form.
  *
  * Scale shape: pure narrow regexp/string expressions riding the scan —
  * the subsequent dedup is a hash-groupBy on the canonical string (the
  * q31 discipline: the shuffle carries short canonical keys, not
  * documents). All patterns live in the Java∩RE2 common subset (no
  * lookaround, explicit classes) so an external SQL oracle replays them
  * verbatim.
  *
  * Canonical form (conservative, lossless for ranking duplicates):
  * scheme dropped (http/https unify), host lowercased with a leading
  * `www.` stripped, fragment dropped, `utm_*`/`fbclid` tracking
  * parameters dropped (other query parameters KEPT — they select
  * content), trailing slash stripped. A dangling `?`/`&` left by
  * parameter removal is cleaned up.
  */
object Url {

  /** Extract (host, rest) and normalize per the contract above.
    * A string that is not an absolute URL (no `scheme://host`) passes
    * through UNCHANGED: extracting from it yields empty groups, and an
    * empty canonical would silently unify every malformed row into one
    * giant "duplicate" cluster — the failure mode a dedup key must
    * never have.
    */
  def canonicalize(url: Column): Column = {
    val host = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+).*$", 1))
    val rest = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$", 1)
    val noFragment = regexp_replace(rest, "#.*$", "")
    // Tracking params drop with their separator; a kept param promoted
    // to first position gets its '&' rewritten to '?'.
    val noTracking = regexp_replace(noFragment,
      "[?&](utm_[A-Za-z0-9_]*|fbclid)=[^&#]*", "")
    val fixedQuery = regexp_replace(noTracking, "^([^?]*)&", "$1?")
    val noSlash = regexp_replace(fixedQuery, "/+(\\?|$)", "$1")
    when(host === "", url)
      .otherwise(concat(regexp_replace(host, "^www\\.", ""), noSlash))
  }
}
