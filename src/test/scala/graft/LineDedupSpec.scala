package graft

import org.apache.spark.sql.functions._

import graft.operators.LineDedup

class LineDedupSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "text")
    val (nl, nu, frac) = LineDedup.lineStats(col("text"))
    df.select(col("doc_id"), nl.as("n"), nu.as("u"), frac.as("f"),
        LineDedup.dedupLines(col("text")).as("clean"))
      .as[(Long, Long, Long, Double, String)].collect()
      .map(r => r._1 -> r).toMap
  }

  test("repeats of an earlier line drop; the FIRST occurrence survives " +
      "in position") {
    val got = run(Seq(
      (1L, "nav\nbody text\npromo\nnav\npromo\nnav"),
      (2L, "a\nb\nc"),
      (3L, "same\nsame\nsame")))
    assert(got(1L) == ((1L, 6L, 3L, 0.42, "nav\nbody text\npromo")))
    assert(got(2L) == ((2L, 3L, 3L, 0.0, "a\nb\nc")))
    assert(got(3L) == ((3L, 3L, 1L, 0.71, "same")))
  }

  test("single-line and empty docs pass through; blank and " +
      "whitespace-only lines are EXEMPT (paragraph breaks survive)") {
    val got = run(Seq(
      (1L, "just one line, no newline"),
      (2L, ""),
      // Paragraph breaks survive in position; the repeated 'a' drops.
      (3L, "a\n\nb\n\na"),
      // Whitespace-only lines are exempt like empty ones.
      (4L, "x\n  \ny\n  \nx")))
    assert(got(1L)._5 == "just one line, no newline" && got(1L)._2 == 1L)
    assert(got(2L) == ((2L, 1L, 1L, 0.0, "")))
    assert(got(3L) == ((3L, 5L, 4L, 0.29, "a\n\nb\n")))
    assert(got(4L) == ((4L, 5L, 4L, 0.18, "x\n  \ny\n  ")))
  }

  test("dedup scope is the document: identical lines in DIFFERENT docs " +
      "both survive (no cross-doc state, no shuffle)") {
    val got = run(Seq((1L, "shared\nx"), (2L, "shared\ny")))
    assert(got(1L)._5 == "shared\nx")
    assert(got(2L)._5 == "shared\ny")
  }
}
