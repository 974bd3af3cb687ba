package graft

import org.apache.spark.sql.functions._

import graft.operators.TextFix

class TextFixSpec extends SparkSpec {

  private def fixOne(s: String): String = {
    import spark.implicits._
    Seq(Tuple1(s)).toDF("text")
      .select(TextFix.fix(col("text")).as("f")).as[String].head()
  }

  test("NFC composes, controls strip, whitespace squashes, edges trim — in order") {
    // Decomposed e + U+0301 composes to one codepoint U+00E9.
    assert(fixOne("café") == "café")
    assert(fixOne("café").length == 4)
    // BEL/VT vanish outright (no space in their place); tab runs and
    // edge whitespace become single interior spaces.
    assert(fixOne("ab") == "ab")
    assert(fixOne("xy") == "xy")
    assert(fixOne("  a\t\tb \n c  ") == "a b c")
    // Already-clean text is a fixed point (and isClean says so).
    assert(fixOne("plain text here") == "plain text here")
    import spark.implicits._
    val clean = Seq(Tuple1("plain text here"), Tuple1(" dirty "))
      .toDF("text").select(TextFix.isClean(col("text")).as("c"))
      .as[Boolean].collect().toSeq
    assert(clean == Seq(true, false))
    // Idempotence: fix(fix(x)) == fix(x) on a dirty mix.
    val dirty = "  exé \t y  "
    assert(fixOne(fixOne(dirty)) == fixOne(dirty))
    // Null passes through null (expression null contract).
    val n = Seq(Tuple1(null: String)).toDF("text")
      .select(TextFix.fix(col("text")).as("f")).collect()
    assert(n.head.isNullAt(0))
  }

  test("patterns stay lookaround-free and \\s-free (RE2/Java portability)") {
    Seq(TextFix.ControlPattern, TextFix.WhitespacePattern).foreach { p =>
      assert(!p.contains("(?"), s"group syntax in portable pattern: $p")
      assert(!p.contains("\\s"), s"\\s membership differs Java vs RE2: $p")
      p.r
    }
  }
}
