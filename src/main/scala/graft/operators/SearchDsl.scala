package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The rest of the search-sink query DSL. The reference delivers into
  * OpenSearch (`kds_example/iac/s2_app.py:841-858`) whose core query
  * surface is match / match_phrase / fuzzy / prefix / bool /
  * more_like_this; the engine already serves match (BM25,
  * [[Retrieval.bm25]]), match_all, term/range filters (plain
  * predicates), count and aggregations. This module adds the missing
  * query types so a user of the reference's search sink can issue
  * every query family engine-side:
  *
  *  - [[positionalPostings]] + [[phraseMatch]] — `match_phrase`
  *    (terms adjacent, in order), served from a positional postings
  *    table instead of a corpus re-scan;
  *  - [[fuzzyExpand]] — `fuzzy` term expansion (Levenshtein ≤ k over
  *    the vocabulary, length-banded);
  *  - [[mltTerms]] — `more_like_this` query-term selection (the
  *    probe's most characteristic terms by tf·idf), feeding the
  *    existing match machinery;
  *  - `bool` queries are composition (must = match-AND via
  *    [[Retrieval.bm25]]'s n_terms, filter/must_not = plain
  *    predicates) — see q104 in the registry for the canonical shape.
  *
  * Scale shapes are per-method; the common theme mirrors
  * [[Retrieval]]: per-query work is bounded by the QUERY TERMS'
  * postings or by the (corpus-distinct, tiny) vocabulary — never a
  * corpus scan at query time.
  */
object SearchDsl {

  /** Positional postings: (term, doc_id, pos) with `pos` the 0-based
    * token position — the positional analogue of
    * [[Retrieval.buildTextIndex]]'s postings, what Lucene stores when
    * positions are enabled. One narrow projection + generate, no
    * shuffle; persist with [[writePositionalIndex]] so phrase queries
    * prune to their terms' buckets.
    */
  def positionalPostings(toks: DataFrame): DataFrame =
    toks.select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "term")))
      .select(col("term"), col("doc_id"), col("pos").cast("long").as("pos"))

  /** Persist positional postings BUCKETED BY term (the
    * [[Retrieval.writeTextIndex]] layout): a phrase query's
    * `term IN (...)` filter reads only the matching buckets, the
    * scan-pruned analogue of a positional postings-list read. Sorted
    * within buckets so footer min/max prune row groups too.
    */
  def writePositionalIndex(positional: DataFrame, name: String, buckets: Int = 64): Unit = {
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    positional.write.mode("overwrite")
      .bucketBy(buckets, "term").sortBy("term")
      .saveAsTable(s"${name}_pos")
  }

  /** Reopen a [[writePositionalIndex]] table by name. */
  def readPositionalIndex(spark: org.apache.spark.sql.SparkSession, name: String): DataFrame =
    spark.table(s"${name}_pos")

  /** `match_phrase`: documents containing the exact token sequence
    * `phrase`, with the number of occurrences — (doc_id, n_hits),
    * matching docs only.
    *
    * One occurrence-sized shuffle regardless of phrase length (the
    * per-doc reduce after it touches only hit rows): each occurrence of
    * phrase term `t` at position `p` proposes, for every slot `i`
    * where `phrase(i) == t`, the candidate phrase start `p − i`; a
    * start is a hit iff all m slots proposed it, i.e. the
    * (doc, start) group has exactly m rows — each slot contributes at
    * most one row to a given start (the token at start+i either is
    * phrase(i) or isn't), so `count(*) == m` is the full adjacency
    * check. The alternative m−1 self-joins on (doc_id, pos+i) shuffle
    * the same rows m−1 times and degrade with phrase length.
    *
    * Work is bounded by the PHRASE TERMS' postings: the `isin` filter
    * reaches the store scan (bucket-pruned under the
    * [[writePositionalIndex]] layout), the slot table is broadcast,
    * and the one exchange carries only matching occurrences. A stop-
    * word-heavy phrase ("the a the") degrades to its terms' postings
    * size — Lucene pays the same; there is no corpus-sized fallback.
    */
  def phraseMatch(positional: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase needs at least one term")
    val spark = positional.sparkSession
    import spark.implicits._
    val m = phrase.length
    val slots = phrase.zipWithIndex.map { case (t, i) => (t, i.toLong) }
      .toDF("term", "slot")
    positional.filter(col("term").isin(phrase.distinct: _*))
      .join(broadcast(slots), "term")
      .select(col("doc_id"), (col("pos") - col("slot")).as("start"))
      .groupBy("doc_id", "start").agg(count(lit(1)).as("covered"))
      .filter(col("covered") === m)
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** `fuzzy` term expansion: vocabulary terms within `maxEdits`
    * Levenshtein edits of `query` — the input frame (expected: a
    * vocabulary table like [[Retrieval.TextIndex]]'s `df`, one row
    * per DISTINCT corpus term) filtered to matches, with a `dist`
    * column appended.
    *
    * The length band |len(term) − len(query)| ≤ maxEdits is a
    * necessary condition for edit distance and is a plain comparison
    * the scan evaluates before the O(len²) levenshtein runs — on a
    * length-sorted vocabulary table it prunes via footer min/max.
    * The vocabulary is corpus-DISTINCT terms (tens of millions of
    * rows at 100 TB, not corpus-sized), so even the banded scan is a
    * small fraction of any corpus pass; OpenSearch bounds the same
    * walk with its term automaton over the term dictionary.
    */
  def fuzzyExpand(vocab: DataFrame, query: String, maxEdits: Int = 2): DataFrame = {
    require(maxEdits >= 0, s"maxEdits must be >= 0, got $maxEdits")
    vocab
      .filter(abs(length(col("term")) - lit(query.length)) <= maxEdits)
      .withColumn("dist", levenshtein(col("term"), lit(query)).cast("long"))
      .filter(col("dist") <= maxEdits)
  }

  /** `more_like_this` query planning: the probe document's
    * `maxQueryTerms` most characteristic terms by tf·idf over the
    * index, ties broken by term — returned driver-side (≤
    * maxQueryTerms strings, the same bounded-metadata class as IVF
    * centroids) to feed [[Retrieval.bm25FromIndex]] as an ordinary
    * match query that excludes the probe itself.
    *
    * idf is q35's ln((N+1)/(df+1)); tf·idf here is ONE product of a
    * long count and one log — no order-sensitive summation, so the
    * selection is bit-deterministic across engines with no rounding
    * guard. Cost: the probe's postings row-group-prune out of the
    * doc-minor-sorted postings table (a one-doc filter), joined to
    * the ≤|probe vocab| df rows — never a corpus pass.
    */
  def mltTerms(index: Retrieval.TextIndex, probeId: Any,
      maxQueryTerms: Int = 3): Seq[String] = {
    require(maxQueryTerms > 0, s"maxQueryTerms must be positive, got $maxQueryTerms")
    val probe = index.postings.filter(col("doc_id") === lit(probeId))
    probe.join(index.df, "term")
      .crossJoin(broadcast(index.stats))
      .select(col("term"),
        (col("tf") * log((col("n") + lit(1.0)) / (col("df") + lit(1.0)))).as("tfidf"))
      .orderBy(col("tfidf").desc, col("term"))
      .limit(maxQueryTerms)
      .collect().map(_.getString(0)).toSeq
  }

  /** Convenience overload building the index in-session from
    * tokenized docs ([[Retrieval.buildTextIndex]]).
    */
  def mltTerms(toks: DataFrame, probeId: Any, maxQueryTerms: Int): Seq[String] =
    mltTerms(Retrieval.buildTextIndex(toks.sparkSession, toks), probeId, maxQueryTerms)

  /** `highlight`: for every document containing `term`, the snippet
    * around its FIRST occurrence — (doc_id, pos, snippet) with `pos`
    * the 0-based token position and `snippet` the tokens from
    * max(0, pos − context) through min(end, pos + context) joined by
    * single spaces, every occurrence of `term` WITHIN the snippet
    * wrapped in `<em>…</em>` (the OpenSearch/Lucene highlighter's
    * default tags and unified-highlighter best-fragment behavior,
    * first-occurrence flavor).
    *
    * Pure narrow expressions over the tokenized corpus — first
    * occurrence via `array_position`, window via `slice`, wrapping via
    * `transform`: no shuffle, no explode; non-matching docs are
    * filtered scan-side. At 100 TB this is a map-only pass over
    * whatever doc set the caller's retrieval stage already bounded —
    * highlighters run on the RESULT page, never the corpus.
    */
  def highlight(toks: DataFrame, term: String, context: Int = 2): DataFrame = {
    require(context >= 0, s"context must be >= 0, got $context")
    toks
      .select(col("doc_id"), col("toks"),
        array_position(col("toks"), term).as("p")) // 1-based; 0 = absent
      .filter(col("p") > 0)
      .select(col("doc_id"), (col("p") - 1).as("pos"),
        concat_ws(" ",
          transform(
            slice(col("toks"),
              greatest(col("p") - context, lit(1)),
              least(col("p") + context,
                size(col("toks")).cast("long")) - greatest(col("p") - context, lit(1)) + 1),
            x => when(x === term, concat(lit("<em>"), x, lit("</em>")))
              .otherwise(x))).as("snippet"))
  }
}
