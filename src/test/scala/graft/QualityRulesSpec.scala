package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityRules

/** Hand-computed fixtures for the Gopher rule gates — each rule gets a
  * doc engineered to fail exactly that rule while satisfying the rest,
  * so a threshold or numerator regression flips a specific `passes`
  * bit (the corpus-level oracle is q135).
  */
class QualityRulesSpec extends SparkSpec {

  import spark.implicits._

  // 52 words, mix of stops + 4-6 letter words → inside every gate.
  private val goodText = (Seq("the", "and", "with", "that") ++
    Seq.fill(48)("plain words arrive here").flatMap(_.split(" ")).take(48))
    .mkString(" ")

  test("a conforming doc passes; each engineered violation fails its gate") {
    val docs = Seq(
      1L -> goodText,
      // mean word length > 10 (all 12-char words), stops present.
      2L -> (Seq("the", "and") ++ Seq.fill(50)("abcdefghijkl")).mkString(" "),
      // > 90% bullet-started lines.
      3L -> (Seq("the and with that " + "word " * 48) ++
        Seq.fill(20)("- bullet line")).mkString("\n"),
      // > 30% ellipsis-ended lines (half of them).
      4L -> (goodText + "\n" + "trailing thought..."),
      // symbol-to-word ratio > 0.1 ('#' per word).
      5L -> (goodText + " " + "# # # # # # # #"),
      // < 2 distinct Gopher stop words.
      6L -> Seq.fill(52)("word").mkString(" "),
      // < 50 words, everything else fine.
      7L -> "the and with that only a few words here",
      8L -> "")
    val out = QualityRules.gopher(docs.toDF("doc_id", "text"))
      .orderBy("doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("passes"), r.getAs[Long]("n_words"))).toMap

    assert(!out.contains(8L), "empty doc must be excluded (no denominator)")
    assert(out(1L)._1 == 1, s"conforming doc failed: ${out(1L)}")
    Seq(2L, 3L, 4L, 5L, 6L, 7L).foreach(id =>
      assert(out(id)._1 == 0, s"doc $id should fail its engineered gate"))

    // Numerators, spot-checked by hand.
    val m = QualityRules.gopher(docs.toDF("doc_id", "text"))
      .filter(col("doc_id").isin(3L, 4L, 5L))
      .collect().map(r => r.getLong(0) -> r).toMap
    // Doc 3: 21 lines, 20 bullet-started → 0.95.
    assert(m(3L).getAs[Double]("bullet_frac") == 0.95, m(3L).toString)
    // Doc 4: 2 lines, 1 ellipsis-ended → 0.5.
    assert(m(4L).getAs[Double]("ellipsis_frac") == 0.5, m(4L).toString)
    // Doc 5: 8 '#' over 52 words (the '#'s are not analyzer tokens)
    // → 8/52 ≈ 0.15.
    assert(m(5L).getAs[Double]("symbol_ratio") == 0.15, m(5L).toString)
  }

  test("'...' symbols count by occurrence and '…' ellipsis lines match") {
    val docs = Seq(
      1L -> ("the and with that " + Seq.fill(48)("word").mkString(" ")
        + " more... and... again... done\nline ends…"))
    val r = QualityRules.gopher(docs.toDF("doc_id", "text")).head()
    // 3 occurrences of '...' + 1 Unicode '…' over 58 words
    // → floor(4/58*100+.5)/100 = 0.07 (the ellipsis counts as a symbol,
    // Rae 2021 A1.1 — both forms, like the ellipsis-line rule below).
    assert(r.getAs[Double]("symbol_ratio") == 0.07, r.toString)
    // 2 lines: the first ends 'done', the second ends with U+2026.
    assert(r.getAs[Double]("ellipsis_frac") == 0.5, r.toString)
  }

  test("ngramRepetition: each band fails in isolation with hand-computed " +
      "fractions; gramless docs score zero everywhere") {
    // B: 50 distinct 4-char words — no repetition, everything passes.
    val b = (0 until 50).map(i => f"w$i%03d")
    // C: B + a 5-gram repeated twice. tot = 240 token chars; the
    // repeated gram has 20 chars x 2 occurrences = 40 -> dup5 =
    // r2(40/240) = 0.17 > 0.15 (fails); its inner 2/3/4-grams repeat
    // too but stay under their looser top-gram bounds (0.07/0.1/0.13),
    // and no 6-gram repeats — ONLY the 5-band trips.
    val block = Seq("pppp", "qqqq", "rrrr", "ssss", "tttt")
    val c = b ++ block ++ block
    val docs = Seq(
      1L -> "aa bb aa bb aa bb", // top2 = r2(12/12) = 1.0: fails 2..4
      2L -> b.mkString(" "),
      3L -> c.mkString(" "),
      4L -> "xy",                // 1 token: no grams at any n -> all 0
      5L -> "",                  // excluded: no analyzer tokens
      // Overlapping occurrence-sum exceeds 1.0 before the cap (12× the
      // same token: dup5 raw = 8*10/24 = 3.33, top2 raw = 11*4/24 =
      // 1.83) — the reported fraction caps at 1.0 on BOTH branches.
      6L -> Seq.fill(12)("zz").mkString(" "))
    val out = QualityRules.ngramRepetition(docs.toDF("doc_id", "text"))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(5L) && out.size == 5)
    assert(out(6L).getAs[Double]("dup_5gram_char_frac") == 1.0, out(6L).toString)
    assert(out(6L).getAs[Double]("top_2gram_char_frac") == 1.0, out(6L).toString)
    assert(out(6L).getAs[Int]("passes") == 0)
    assert(out(1L).getAs[Double]("top_2gram_char_frac") == 1.0)
    assert(out(1L).getAs[Int]("passes") == 0)
    assert(out(1L).getAs[Double]("dup_5gram_char_frac") == 0.0)
    assert(out(2L).getAs[Int]("passes") == 1)
    val cRow = out(3L)
    assert(cRow.getAs[Double]("top_2gram_char_frac") == 0.07, cRow.toString)
    assert(cRow.getAs[Double]("top_3gram_char_frac") == 0.1, cRow.toString)
    assert(cRow.getAs[Double]("top_4gram_char_frac") == 0.13, cRow.toString)
    assert(cRow.getAs[Double]("dup_5gram_char_frac") == 0.17, cRow.toString)
    assert(cRow.getAs[Double]("dup_6gram_char_frac") == 0.0, cRow.toString)
    assert(cRow.getAs[Int]("passes") == 0, cRow.toString)
    assert(out(4L).getAs[Int]("passes") == 1)
    assert((2 to 10).forall { n =>
      val nm = if (n <= 4) s"top_${n}gram_char_frac" else s"dup_${n}gram_char_frac"
      out(4L).getAs[Double](nm) == 0.0
    })
  }

  test("fused repetition kernel equals the exchange spelling on the real " +
      "corpus, row for row") {
    // The round-15 fusion collapses both band explodes + aggregations
    // + pivot into one per-doc pass; this pins it value-identical to
    // the retained exchange plan over the full sf fixture corpus
    // (every band, tie-breaks, caps, and the h64 collision lane all
    // exercised by real text).
    val docs = queries.Tables.t(spark, sfDir, "documents")
    val a = QualityRules.ngramRepetition(docs)
      .orderBy("doc_id").collect().toSeq
    val b = QualityRules.ngramRepetitionViaExchange(docs)
      .orderBy("doc_id").collect().toSeq
    assert(a.nonEmpty && a == b,
      s"fused kernel diverged: ${a.size} vs ${b.size} rows")
  }

  test("blocklist gate is token-level and case-insensitive — substring " +
      "containment never flags (the scunthorpe property)") {
    import graft.functions.TextFunctions.tokens
    val bl = Seq("casino", "viagra", "lottery")
    val docs = Seq(
      (1L, "visit our casino tonight"),       // exact token
      (2L, "cheap VIAGRA by mail"),           // case-insensitive via analyzer
      (3L, "casinos and lotteryx prizes"),    // superstring tokens: clean
      (4L, "greetings from scunthorpe"),      // substring inside a word: clean
      (5L, "win the Lottery, they said"),     // punctuation-adjacent token
      (6L, "nothing listed here"))
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        QualityRules.blocklistHit(tokens(col("text")), bl).as("hit"))
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false,
      4L -> false, 5L -> true, 6L -> false))
  }

  test("fleschProfile: local replay of counts, buckets, and sum-based score") {
    val docs = Seq(
      // 2 sentences, simple words → high score bucket.
      1L -> "The cat sat. The dog ran!",
      // one long unpunctuated techy sentence → low/negative score.
      2L -> "configuration serialization initialization representation normalization",
      // punctuation runs collapse: '?!' is ONE sentence boundary.
      3L -> "Really?! Yes. Ok.",
      // zero tokens → excluded.
      4L -> "!!! ???")
    def vgroups(s: String): Long =
      "[aeiouy]+".r.findAllIn(s.toLowerCase).length.toLong
    def words(s: String): Long =
      s.toLowerCase.split("\\W+").count(_.nonEmpty).toLong
    def sents(s: String): Long =
      math.max("[.!?]+".r.findAllIn(s).length.toLong, 1L)
    def fl(w: Long, se: Long, sy: Long): Double =
      206.835 - 1.015 * (w.toDouble / se.toDouble) - 84.6 * (sy.toDouble / w.toDouble)
    val perDoc = docs.filter(d => words(d._2) >= 1).map { case (_, t) =>
      (words(t), sents(t), vgroups(t))
    }
    val wantBuckets = perDoc
      .groupBy { case (w, se, sy) => math.floor(fl(w, se, sy) / 10.0).toLong }
      .map { case (b, rows) =>
        val (ws, ss, sys) = (rows.map(_._1).sum, rows.map(_._2).sum, rows.map(_._3).sum)
        b -> ((rows.size.toLong, ws, ss, sys,
          math.floor(fl(ws, ss, sys) * 100 + 0.5) / 100))
      }
    val got = QualityRules.fleschProfile(docs.toDF("doc_id", "text"))
      .select(col("bucket"), col("n_docs"), col("words"), col("sentences"),
        col("syllables"),
        graft.queries.Par.r2(col("bucket_flesch")).as("bf"))
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == wantBuckets)
    assert(sents(docs(2)._2) == 3L) // '?!' collapses to one boundary
  }
}
