package graft

import org.apache.spark.sql.functions._

import graft.functions.{CountFunctions, CountKernels}

/** The compiled element-count kernels must be VALUE-IDENTICAL to the
  * `size(filter(arr, x -> <pred>))` spellings they replaced — q41/q51/
  * q135 are hash-gated through them. Pins cover the regex subtleties
  * the RLIKE replay must preserve: `$` matching before a FINAL line
  * terminator (a trailing \r or \n on a line — the reason the kernel
  * calls the identical `matcher(...).find(0)` instead of endsWith),
  * multibyte bullet characters, trim-is-spaces-only, empty strings,
  * and the filter's null-element drop.
  */
class CountExprSpec extends SparkSpec {

  import spark.implicits._

  private def linesDf = Seq(
    Seq("- bullet", "• unicode bullet", "* star", " - after space",
      "\t- after tab (ltrim is SPACES only)", "no bullet", "",
      "ends...", "ends… ", "ends...\r", "dots....", "mid...dle",
      null, "…"),
    Seq.empty[String],
    Seq("x" * 40, "- b", "…")
  ).zipWithIndex.map { case (ls, i) => (i.toLong, ls) }.toDF("id", "lines")

  test("countMatching(TrimLeft/TrimRight) equals the trimmed RLIKE " +
      "filter spelling, line-terminator and multibyte edges included") {
    val bulletHof = expr("size(filter(lines, x -> ltrim(x) RLIKE '^[-•*]'))")
    val ellipsisHof = expr("size(filter(lines, x -> rtrim(x) RLIKE '([.]{3}|…)$'))")
    val bad = linesDf.select(col("id"),
        CountFunctions.countMatching(col("lines"), "^[-•*]",
          CountKernels.TrimLeft).as("a1"), bulletHof.as("b1"),
        CountFunctions.countMatching(col("lines"), "([.]{3}|…)$",
          CountKernels.TrimRight).as("a2"), ellipsisHof.as("b2"))
      .filter(not(col("a1") <=> col("b1")) || not(col("a2") <=> col("b2")))
      .collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("countMatching(no trim) and countInSet equal their filter " +
      "spellings on token arrays with nulls") {
    val toks = Seq(
      Seq("the", "Quick", "brown", "FOX", "42", "", null, "in", "the"),
      Seq("ZZ", "9"), Seq.empty[String])
      .zipWithIndex.map { case (ts, i) => (i.toLong, ts) }.toDF("id", "toks")
    val alphaHof = expr("size(filter(toks, x -> x RLIKE '[a-z]'))")
    val stopHof = expr(
      "size(filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in')))")
    val bad = toks.select(col("id"),
        CountFunctions.countMatching(col("toks"), "[a-z]").as("a1"),
        alphaHof.as("b1"),
        CountFunctions.countInSet(col("toks"),
          Seq("the", "a", "of", "and", "to", "in")).as("a2"),
        stopHof.as("b2"))
      .filter(not(col("a1") <=> col("b1")) || not(col("a2") <=> col("b2")))
      .collect()
    assert(bad.isEmpty, bad.mkString("; "))
    intercept[IllegalArgumentException] {
      CountFunctions.countInSet(col("toks"), Seq.empty)
    }
  }

  test("null array in -> null out; interpreted and codegen regimes agree") {
    val df = Seq((1L, Seq("a", "-b")), (2L, null))
      .toDF("id", "lines")
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try df.select(col("id"),
          CountFunctions.countMatching(col("lines"), "^[-•*]",
            CountKernels.TrimLeft).as("c"),
          CountFunctions.countInSet(col("lines"), Seq("a")).as("s"))
        .orderBy("id").collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.wholeStage")
    }
    val rows = run("true")
    assert(rows == run("false"))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }
}
