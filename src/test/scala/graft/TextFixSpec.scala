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
    Seq(TextFix.ControlPattern, TextFix.WhitespacePattern,
        TextFix.TagPattern).foreach { p =>
      assert(!p.contains("(?"), s"group syntax in portable pattern: $p")
      assert(!p.contains("\\s"), s"\\s membership differs Java vs RE2: $p")
      p.r
    }
  }

  test("stripMarkup: tags become word boundaries, entities decode once, " +
      "bare '<' in prose survives") {
    import spark.implicits._
    def strip(t: String): String =
      Seq(t).toDF("text").select(TextFix.stripMarkup(col("text")).as("s"))
        .as[String].head()
    // Tag removal keeps the word boundary the markup implied.
    assert(strip("<div><p>a</p><p>b</p></div>") == "a b")
    // Entities: one decode pass, &amp; LAST — double-escape stays escaped.
    assert(strip("a &lt; b &amp; c &#39;d&#39; &quot;e&quot;") ==
      "a < b & c 'd' \"e\"")
    assert(strip("&amp;lt; is a literal entity") == "&lt; is a literal entity")
    // A bare '<' that is not tag-shaped is prose, not markup.
    assert(strip("5 < 7 and x <= y") == "5 < 7 and x <= y")
    // Comments and self-closing tags strip; whitespace re-squashes.
    assert(strip("a<br/>b <!-- hidden --> c") == "a b c")
    // Attributes with '>' -free values vanish with their tag.
    assert(strip("""<a href="u?x=1&amp;y=2">link</a>""") == "link")
  }
}
