package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.functions.Ngrams

/** The codegen'd word-n-gram kernels must be VALUE-IDENTICAL to the
  * higher-order-function spellings they replaced — every registry key
  * that swapped onto them is hash-gated, so a single byte of drift in
  * any gram (or one bit in any h64) is a red oracle. This suite pins
  * the equivalence directly, fixture-free, over generated token
  * arrays covering the edges: docs shorter than n, empty docs, null
  * tokens (concat_ws SKIPS them), empty-string tokens (concat_ws keeps
  * them), multi-byte UTF-8, and the Cdc `minOne` clamped lane.
  */
class NgramExprSpec extends SparkSpec with TableDrivenPropertyChecks {

  import spark.implicits._

  /** Deterministic token fixtures — sizes 0..12 around every n used in
    * production (1, 2, 3, 8, 10), plus nulls/empties/multibyte.
    */
  private def fixtures: Seq[Seq[String]] = {
    val words = Seq("alpha", "b", "γράμμα", "", "déjà", "zz", "q",
      "longertoken", "x9", "ému", "k", "west")
    (0 to 12).map(words.take) ++ Seq(
      Seq(null, "a", "b"), Seq("a", null, null, "b"), Seq(null),
      Seq("", "", ""), Seq("solo"))
  }

  private def df = fixtures.zipWithIndex
    .map { case (ts, i) => (i.toLong, ts) }.toDF("id", "toks")

  test("wordNgrams equals the guarded transform(sequence(...)) spelling " +
      "for n in 1..10") {
    for (n <- Seq(1, 2, 3, 8, 10)) {
      val hof = expr(
        s"""IF(size(toks) >= $n,
           |   transform(sequence(1, size(toks) - ${n - 1}),
           |     g -> concat_ws(' ', slice(toks, g, $n))),
           |   array())""".stripMargin)
      val bad = df.select(col("id"), Ngrams.wordNgrams(col("toks"), n).as("a"),
          hof.as("b"))
        .filter(not(col("a") <=> col("b"))).collect()
      assert(bad.isEmpty, s"n=$n mismatches: ${bad.mkString("; ")}")
    }
  }

  test("wordNgramH64s equals h64 over the gram strings, prefix included") {
    import graft.functions.TextFunctions.h64
    for ((n, prefix) <- Seq((1, ""), (2, "dsir|b|"), (3, "sd|"), (8, ""))) {
      val viaStrings = transform(Ngrams.wordNgrams(col("toks"), n),
        g => h64(concat(lit(prefix), g)))
      val bad = df.select(col("id"),
          Ngrams.wordNgramH64s(col("toks"), n, prefix).as("a"),
          viaStrings.as("b"))
        .filter(not(col("a") <=> col("b"))).collect()
      assert(bad.isEmpty, s"n=$n prefix=$prefix mismatches: ${bad.mkString("; ")}")
    }
  }

  test("wordNgramStructs equals the struct transform spelling") {
    for (n <- Seq(2, 3)) {
      val args = (0 until n).map(i => s"toks[i+$i] AS w${i + 1}").mkString(", ")
      val hof = expr(
        s"""IF(size(toks) >= $n,
           |  transform(sequence(0, size(toks) - $n), i -> struct($args)),
           |  array())""".stripMargin)
      // bracket reads on possibly-null elements are fine (in-range);
      // restrict to rows with >= n tokens like every production caller
      val bad = df.filter(size(col("toks")) >= n)
        .select(col("id"), Ngrams.wordNgramStructs(col("toks"), n).as("a"),
          hof.as("b"))
        .filter(not(col("a") <=> col("b"))).collect()
      assert(bad.isEmpty, s"n=$n mismatches: ${bad.mkString("; ")}")
    }
  }

  test("minOne replays the Cdc clamped lane: one gram over whatever " +
      "tokens exist, get()-style absent reads") {
    val k = 3
    val gramArgs = (0 until k).map(i => s"get(toks, g - 1 + $i)").mkString(", ")
    val hof = expr(s"transform(sequence(1, greatest(size(toks) - ${k - 1}, 1)), " +
      s"g -> concat_ws(' ', $gramArgs))")
    val bad = df.filter(size(col("toks")) >= 1)
      .select(col("id"), Ngrams.wordNgrams(col("toks"), k, minOne = true).as("a"),
        hof.as("b"))
      .filter(not(col("a") <=> col("b"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("wordNgramH64Chars equals (h64(gram), length(gram) - (n-1)) over " +
      "the gram strings") {
    import graft.functions.TextFunctions.h64
    for (n <- Seq(2, 5, 10)) {
      val viaStrings = transform(Ngrams.wordNgrams(col("toks"), n),
        g => struct(h64(g).as("gh"),
          (length(g) - (n - 1)).cast("long").as("chars")))
      // No null-row filter: the kernel clamps the separator term at
      // zero, so even an all-null window matches the HOF's
      // `length('') - (n-1)` exactly.
      val bad = df
        .select(col("id"), Ngrams.wordNgramH64Chars(col("toks"), n).as("a"),
          viaStrings.as("b"))
        .filter(not(col("a") <=> col("b"))).collect()
      assert(bad.isEmpty, s"n=$n mismatches: ${bad.mkString("; ")}")
    }
  }

  test("charNgrams kernel equals the regex-lookahead spelling " +
      "(multibyte, newlines, short strings)") {
    import spark.implicits._
    val strs = Seq("hello world", "γράμμα δέλτα", "ab", "a", "",
      "line\nbreak\ttab", "ééé", "日本語のテキスト", "x" * 40)
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    for (n <- Seq(1, 2, 3, 5)) {
      val regex = regexp_extract_all(col("s"),
        lit(s"(?s)(?=(${"." * n}))."), lit(1))
      val bad = strs.select(col("id"), Ngrams.charNgrams(col("s"), n).as("a"),
          regex.as("b"))
        .filter(not(col("a") <=> col("b"))).collect()
      assert(bad.isEmpty, s"n=$n: ${bad.mkString("; ")}")
    }
    intercept[IllegalArgumentException] { Ngrams.charNgrams(col("s"), 0) }
  }

  test("band generators equal the per-band kernels, band-major order") {
    import graft.functions.TextFunctions.h64
    // strings form vs per-band wordNgrams
    val wantStr = flatten(array((2 to 4).map(n =>
      transform(Ngrams.wordNgrams(col("toks"), n),
        g => struct(lit(n).as("n"), g.as("gram")))): _*))
    val badS = df.select(col("id"),
        Ngrams.wordNgramBands(col("toks"), 2, 4).as("a"), wantStr.as("b"))
      .filter(not(col("a") <=> col("b"))).collect()
    assert(badS.isEmpty, badS.mkString("; "))
    // hash form vs per-band h64+chars over gram strings
    val wantH = flatten(array((5 to 10).map(n =>
      transform(Ngrams.wordNgrams(col("toks"), n),
        g => struct(lit(n).as("n"), h64(g).as("gh"),
          (length(g) - (n - 1)).cast("long").as("chars")))): _*))
    val badH = df
      .select(col("id"),
        Ngrams.wordNgramH64CharsBands(col("toks"), 5, 10).as("a"),
        wantH.as("b"))
      .filter(not(col("a") <=> col("b"))).collect()
    assert(badH.isEmpty, badH.mkString("; "))
    intercept[IllegalArgumentException] { Ngrams.wordNgramBands(col("toks"), 3, 2) }
  }

  test("h64p equals the builtin h64(concat(prefix, s)) spelling on " +
      "multibyte strings; null in -> null out") {
    import graft.functions.TextFunctions.h64
    val strs = Seq("hello", "γράμμα δέλτα", "", "日本語", "x" * 100, null)
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    for (prefix <- Seq("", "cm0|", "sd|")) {
      val bad = strs.select(col("id"),
          Ngrams.h64p(col("s"), prefix).as("a"),
          h64(concat(lit(prefix), col("s"))).as("b"))
        .filter(not(col("a") <=> col("b"))).collect()
      assert(bad.isEmpty, s"prefix=$prefix: ${bad.mkString("; ")}")
    }
  }

  test("simhash16 equals the 16-row bit-explode vote spelling, " +
      "null-token lane included") {
    import graft.functions.TextFunctions.h64
    val voters = df.filter(size(col("toks")) > 0)
      .select(col("id"), explode(col("toks")).as("term"))
      .select(col("id"), h64(col("term")).as("h"))
      .select(col("id"), col("h"), explode(sequence(lit(0), lit(15))).as("b"))
      .groupBy("id", "b")
      .agg(when(sum(when(expr("(h >> cast(b as int)) & 1") === 1, 1)
        .otherwise(-1)) > 0, 1).otherwise(0).as("bit"))
      .groupBy("id")
      .agg(sum(expr("bit * shiftleft(1, cast(b as int))")).cast("bigint").as("b"))
    val kernel = df.filter(size(col("toks")) > 0)
      .select(col("id"), Ngrams.simhash16(col("toks")).as("a"))
    val bad = kernel.join(voters, "id")
      .filter(not(col("a") <=> col("b"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("tokenLengthSum equals the aggregate fold, null-element " +
      "propagation included") {
    val hof = expr("aggregate(toks, 0L, (acc, x) -> acc + length(x))")
    val bad = df.select(col("id"),
        Ngrams.tokenLengthSum(col("toks")).as("a"), hof.as("b"))
      .filter(not(col("a") <=> col("b"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("null array in -> null out; empty array in -> empty out") {
    val withNull = Seq((1L, Seq("a", "b")), (2L, null)).toDF("id", "toks")
    val got = withNull
      .select(col("id"), Ngrams.wordNgrams(col("toks"), 2).as("g"),
        Ngrams.wordNgramH64s(col("toks"), 2).as("h"))
      .orderBy("id").collect()
    assert(got(0).getSeq[String](1) == Seq("a b"))
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
    val empty = Seq((1L, Seq.empty[String])).toDF("id", "toks")
      .select(Ngrams.wordNgrams(col("toks"), 2).as("g")).head()
    assert(empty.getSeq[String](0).isEmpty)
  }

  test("rejects non-array-of-string input; requires n >= 1") {
    intercept[Exception] {
      Seq(1L).toDF("x").select(Ngrams.wordNgrams(col("x"), 2)).collect()
    }
    intercept[IllegalArgumentException] { Ngrams.wordNgrams(col("toks"), 0) }
    intercept[IllegalArgumentException] { Ngrams.wordNgramH64s(col("toks"), 0) }
    intercept[IllegalArgumentException] { Ngrams.wordNgramStructs(col("toks"), 0) }
  }

  test("kernel results are identical in interpreted and whole-stage-" +
      "codegen regimes") {
    val rows = df.collect().toSeq
    def run(codegen: String): Seq[Row] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try df.select(col("id"), Ngrams.wordNgrams(col("toks"), 3).as("g"),
          Ngrams.wordNgramH64s(col("toks"), 3, "sd|").as("h"),
          Ngrams.wordNgramStructs(col("toks"), 2).as("s"))
        .orderBy("id").collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.wholeStage")
    }
    assert(rows.nonEmpty)
    assert(run("true") == run("false"))
  }
}
