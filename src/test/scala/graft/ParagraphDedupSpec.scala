package graft

import org.apache.spark.sql.functions._

import graft.operators.ParagraphDedup

/** Hand-computed verdicts for paragraph-level exact dedup — the
  * corpus-level oracle is q138; these pin the semantics the hash gate
  * can't localize: trim-then-compare identity, blank-paragraph
  * exclusion with raw-position provenance, and the canonical-first
  * tie-break.
  */
class ParagraphDedupSpec extends SparkSpec {

  import spark.implicits._

  test("first occurrence keeps, later ones drop; trim unifies; blanks go") {
    val docs = Seq(
      // doc 1: boilerplate at idx 0, unique at idx 1.
      1L -> "cookie banner\nalpha unique text",
      // doc 2: blank para at idx 1 (dropped, but idx 2 keeps its raw
      // position), padded boilerplate at idx 2 — trim makes it equal
      // doc 1's idx 0.
      2L -> "beta unique text\n   \n  cookie banner  ",
      // doc 3: repeats the boilerplate TWICE within one doc — only the
      // corpus-first (doc 1, idx 0) keeps; also repeats ITS OWN first
      // paragraph, dup within a single doc.
      3L -> "gamma own line\ncookie banner\ngamma own line").toDF("doc_id", "text")
    val out = ParagraphDedup.dedup(docs)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("para_idx")) ->
        ((r.getAs[Long]("occ"), r.getAs[Int]("keep")))).toMap

    assert(out((1L, 0L)) == ((3L, 1)), "corpus-first boilerplate keeps")
    assert(out((2L, 2L)) == ((3L, 0)), "trimmed duplicate drops")
    assert(out((3L, 1L)) == ((3L, 0)))
    assert(out((3L, 0L)) == ((2L, 1)), "doc-internal dup: first keeps")
    assert(out((3L, 2L)) == ((2L, 0)))
    assert(out((1L, 1L)) == ((1L, 1)) && out((2L, 0L)) == ((1L, 1)),
      "singletons keep")
    assert(!out.contains((2L, 1L)), "blank paragraph excluded")
    assert(out.size == 7, s"unexpected rows: ${out.keySet}")
  }

  test("keep=1 rows retain exactly one copy of every distinct paragraph") {
    // A hot key (one paragraph on every doc) plus per-doc unique lines.
    val docs = (1L to 100L)
      .map(i => i -> s"shared boilerplate everywhere\nunique line $i")
      .toDF("doc_id", "text")
    val verdicts = ParagraphDedup.dedup(docs)
    val kept = verdicts.filter(col("keep") === 1)
    assert(kept.count() == 101L)
    val paras = ParagraphDedup.paragraphs(docs)
    val keptParas = paras.join(kept, Seq("doc_id", "para_idx"))
      .select("para").distinct().count()
    assert(keptParas == 101L,
      "every distinct paragraph must survive exactly once")
    assert(verdicts.filter(col("occ") === 100L).count() == 100L)
  }
}
