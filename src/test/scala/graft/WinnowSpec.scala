package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Winnow

/** [[graft.operators.Winnow]] — winnowing fingerprints (Schleimer 2003,
  * q164). A local sequential replay of the full algorithm (same h64,
  * same rightmost-min selection, same adjacent-window dedup) pins the
  * selected set exactly; a property test asserts the paper's guarantee
  * (any shared run of ≥ w+k−1 tokens produces a shared fingerprint).
  */
class WinnowSpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(4321L + i)))

  private val K = 3
  private val W = 4

  /** The house 60-bit hash, replayed locally. */
  private def h64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Reference winnowing: k-gram hashes, windows of w (one window when
    * n <= w), min with RIGHTMOST tie, distinct (pos, fp).
    */
  private def winnowLocal(toks: Seq[String]): Set[(Int, Long)] = {
    if (toks.length < K) return Set.empty
    val gh = toks.sliding(K).map(g => h64(g.mkString(" "))).toVector
    val n = gh.length
    val starts = if (n <= W) Seq(0) else 0 to (n - W)
    starts.map { j =>
      val win = gh.slice(j, math.min(j + W, n))
      val m = win.min
      val pos = (j until math.min(j + W, n)).filter(gh(_) == m).max
      (pos + 1, m) // 1-based gram index
    }.toSet
  }

  private def toksDf(rows: Seq[(Long, Seq[String])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "toks")
  }

  test("fingerprints match a local replay (incl. short docs and rightmost ties)") {
    import spark.implicits._
    val docs: Seq[(Long, Seq[String])] = Seq(
      1L -> "the quick brown fox jumps over the lazy dog today".split(" ").toSeq,
      2L -> Seq("a", "b", "c"),          // exactly one gram → one window
      3L -> Seq("a", "b"),               // < k tokens → no rows
      4L -> Seq("x", "y", "z", "x", "y", "z", "x", "y", "z"), // repeated grams → ties
      5L -> "one two three four five six".split(" ").toSeq)   // n = 4 grams = w
    val got = Winnow.fingerprints(toksDf(docs), K, W)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    docs.foreach { case (id, toks) =>
      val want = winnowLocal(toks)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id")
    }
    assert(!got.contains(3L))
    // Density sanity on the long doc: selections ≈ 2/(w+1) of grams,
    // and never more than the window count.
    val g1 = got(1L)
    assert(g1.nonEmpty && g1.size <= docs.head._2.length - K + 1 - W + 1)
  }

  test("guarantee: docs sharing a run of >= w+k-1 tokens share a fingerprint") {
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "ii", "jj")
    val genDoc = for {
      n <- Gen.choose(0, 12)
      ws <- Gen.listOfN(n, Gen.oneOf(words))
    } yield ws
    val genCase = for {
      p1 <- genDoc; s1 <- genDoc; p2 <- genDoc; s2 <- genDoc
      m <- Gen.choose(W + K - 1, W + K + 3)
      run <- Gen.listOfN(m, Gen.oneOf(words))
    } yield (p1, s1, p2, s2, run)
    samples(genCase, 40).foreach { case (p1, s1, p2, s2, run) =>
      val a = p1 ++ run ++ s1
      val b = p2 ++ run ++ s2
      val fa = winnowLocal(a).map(_._2)
      val fb = winnowLocal(b).map(_._2)
      assert((fa intersect fb).nonEmpty,
        s"shared ${run.length}-token run undetected: a=$a b=$b")
    }
    // And the Spark side agrees with the local replay on one such pair
    // (the first test already pins equality broadly; this pins the
    // guarantee path through the operator itself).
    val run = Seq("r1", "r2", "r3", "r4", "r5", "r6")
    val docs = Seq(10L -> (Seq("aa", "bb") ++ run),
      11L -> (run ++ Seq("cc")))
    import spark.implicits._
    val fps = Winnow.fingerprints(toksDf(docs), K, W)
      .as[(Long, Int, Long)].collect()
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    assert((byDoc(10L) intersect byDoc(11L)).nonEmpty)
  }

  test("WinnowSelectExpr equals the interpreted fold spelling on random " +
      "hash arrays (deque edges: ties, monotone runs, n <= w, w = 1)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Small value domain FORCES ties (the rightmost-tie pop is the
    // subtle lane); add monotone and constant arrays explicitly.
    val rnd = new scala.util.Random(977)
    val arrays: Seq[Seq[Long]] =
      (1 to 40).map(n => Seq.fill(rnd.nextInt(12) + 1)(rnd.nextInt(5).toLong)) ++
      Seq(Seq(7L), Seq(3L, 3L, 3L, 3L), (1L to 9L).toSeq, (9L to 1L by -1).toSeq)
    for (w <- Seq(1, 2, 4, 7)) {
      val sqlSel = expr(
        s"""array_distinct(transform(
           |  sequence(1, IF(size(gh) <= $w, 1, size(gh) - ${w - 1})),
           |  j -> aggregate(
           |    sequence(j, least(j + ${w - 1}, size(gh))),
           |    named_struct('pos', 0, 'fp', CAST(${Long.MaxValue} AS BIGINT)),
           |    (acc, i) -> IF(element_at(gh, i) <= acc.fp,
           |      named_struct('pos', CAST(i AS INT), 'fp', element_at(gh, i)),
           |      acc))))""".stripMargin)
      val bad = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }
        .toDF("id", "gh")
        .select(col("id"),
          graft.functions.WinnowFunctions.winnowSelect(col("gh"), w).as("a"),
          sqlSel.as("b"))
        .filter(not(col("a") <=> col("b"))).collect()
      assert(bad.isEmpty, s"w=$w: ${bad.mkString("; ")}")
    }
  }

  test("sharedPairs counts distinct shared values; df cap drops boilerplate") {
    import spark.implicits._
    // fp 100 shared by docs 1,2 (df 2 → kept); fp 200 by 1,2,3 (df 3 →
    // kept at maxDf 3, dropped at maxDf 2); fp 300 in every doc (df 4 →
    // dropped at both); fp 400 only doc 4 (df 1 → never pairs).
    val fps = Seq(
      (1L, 1, 100L), (2L, 5, 100L),
      (1L, 2, 200L), (2L, 6, 200L), (3L, 1, 200L),
      (1L, 3, 300L), (2L, 7, 300L), (3L, 2, 300L), (4L, 1, 300L),
      (4L, 2, 400L),
      (1L, 9, 100L) // duplicate value at another pos: counts ONCE
    ).toDF("doc_id", "pos", "fp")
    val strict = Winnow.sharedPairs(fps, maxDf = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(strict == Set((1L, 2L, 1L)))
    val loose = Winnow.sharedPairs(fps, maxDf = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(loose == Set((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
    intercept[IllegalArgumentException] { Winnow.sharedPairs(fps, maxDf = 1) }
    intercept[IllegalArgumentException] {
      Winnow.fingerprints(toksDf(Seq(1L -> Seq("a"))), k = 0, w = 4)
    }
  }
}
