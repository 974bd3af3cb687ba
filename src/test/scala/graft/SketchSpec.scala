package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketch

class SketchSpec extends SparkSpec {

  import spark.implicits._

  private def wordsDf(ws: Seq[String]) = ws.toDF("w")

  test("count-min: estimates are exact with no collisions, always an " +
      "UPPER bound, and cells merge by addition") {
    val stream = Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val cells = Sketch.countMinCells(wordsDf(stream), depth = 3, width = 512)
    val probes = Seq("alpha", "beta", "gamma", "absent").toDF("term")
    val est = Sketch.countMinEstimate(cells, probes, depth = 3, width = 512)
      .as[(String, Long)].collect().toMap
    val truth = Map("alpha" -> 7L, "beta" -> 3L, "gamma" -> 1L, "absent" -> 0L)
    // A 3x512 sketch over 3 distinct terms collides with probability
    // ~(3/512)^3 per probe — the exact values are the contract here.
    assert(est == truth, s"collision-free sketch must be exact: $est")

    // Upper bound under heavy collision pressure: width 2 forces them.
    val tight = Sketch.countMinCells(wordsDf(stream), depth = 2, width = 2)
    val estT = Sketch.countMinEstimate(tight, probes, depth = 2, width = 2)
      .as[(String, Long)].collect().toMap
    truth.foreach { case (t, c) =>
      assert(estT(t) >= c, s"$t: count-min must never undercount") }

    // Mergeability: half-stream sketches sum cell-wise to the whole.
    val (h1, h2) = stream.splitAt(5)
    val merged = Sketch.countMinCells(wordsDf(h1), 3, 512)
      .unionByName(Sketch.countMinCells(wordsDf(h2), 3, 512))
      .groupBy("r", "b").agg(sum("cnt").as("cnt"))
    val whole = Sketch.countMinCells(wordsDf(stream), 3, 512)
    assert(merged.as[(Int, Long, Long)].collect().toSet ==
      whole.as[(Int, Long, Long)].collect().toSet)
  }

  test("hll: registers merge by max; large domains estimate within the " +
      "m=64 error bound; tiny domains take the small-range correction") {
    val big = (1 to 2000).map(i => s"tok$i")
    val regs = Sketch.hllRegisters(wordsDf(big), 6)
    // Merge = elementwise max of the halves' registers.
    val (h1, h2) = big.splitAt(900)
    val merged = Sketch.hllRegisters(wordsDf(h1), 6)
      .unionByName(Sketch.hllRegisters(wordsDf(h2), 6))
      .groupBy("bucket").agg(max("reg").as("reg"))
    assert(merged.as[(Long, Long)].collect().toSet ==
      regs.as[(Long, Long)].collect().toSet)

    val est = Sketch.hllEstimate(regs, 6)
      .select("zeros", "est").as[(Long, Double)].head()
    // Standard error at m=64 is 1.04/8 = 13%; 2000 distinct should
    // land well within 3 sigma.
    assert(math.abs(est._2 - 2000.0) / 2000.0 < 0.4,
      s"HLL estimate ${est._2} too far from 2000")

    // Small domain: zeros > 0, correction branch, still in range.
    val small = (1 to 15).map(i => s"s$i")
    val estS = Sketch.hllEstimate(Sketch.hllRegisters(wordsDf(small), 6), 6)
      .select("zeros", "est").as[(Long, Double)].head()
    assert(estS._1 > 0, "15 values cannot fill 64 buckets")
    assert(estS._2 > 5 && estS._2 < 30,
      s"small-range estimate ${estS._2} out of range for 15 distincts")
  }

  test("histogram quantiles: estimate is the qualifying bin's lower " +
      "edge, within one bin width of the true quantile; degenerate " +
      "all-equal streams collapse to bin 0") {
    val xs = (1 to 1000).map(_.toDouble).toDF("x")
    val hist = Sketch.histogram(xs, 10)
    // 1..1000 over 10 bins: width 99.9, uniform ~100 per bin.
    assert(hist.count() == 10)
    val est = Sketch.histQuantile(hist, Seq(0.5, 0.9))
      .as[(Double, Double)].collect().toMap
    // True p50 = 500, p90 = 900; the lower-edge estimate sits within
    // one bin width below the truth.
    assert(est(0.5) <= 500.0 && est(0.5) > 500.0 - 2 * 99.9, est.toString)
    assert(est(0.9) <= 900.0 && est(0.9) > 900.0 - 2 * 99.9, est.toString)

    val flat = Seq.fill(50)(7.5).toDF("x")
    val h2 = Sketch.histogram(flat, 10)
    assert(h2.count() == 1 &&
      h2.select("bin").as[Long].head() == 0L)
    val e2 = Sketch.histQuantile(h2, Seq(0.99)).as[(Double, Double)].head()
    assert(e2._2 == 7.5, s"degenerate stream must estimate exactly: $e2")
  }

  test("histogramWeighted over value counts equals histogram over the " +
      "raw stream — skewed duplicates, degenerate all-equal, and empty") {
    import org.apache.spark.sql.functions._
    // Skewed duplicated stream: values repeat with different counts so
    // the weighted fold actually exercises sum(c) != count rows.
    val raw = ((1 to 400).map(i => (i % 37).toDouble * 1.25) ++
      Seq.fill(90)(3.75) ++ Seq.fill(3)(44.0)).toDF("x")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("bin", "mn", "width", "n", "cnt")
        .as[(Long, Double, Double, Long, Long)].collect().toSet
    val vc = raw.groupBy("x").agg(count(lit(1)).as("c"))
    assert(canon(Sketch.histogramWeighted(vc, 16)) ==
      canon(Sketch.histogram(raw, 16)))

    val flat = Seq.fill(50)(7.5).toDF("x")
    val flatVc = flat.groupBy("x").agg(count(lit(1)).as("c"))
    assert(canon(Sketch.histogramWeighted(flatVc, 10)) ==
      canon(Sketch.histogram(flat, 10)))

    val empty = Seq.empty[Double].toDF("x")
    val emptyVc = empty.groupBy("x").agg(count(lit(1)).as("c"))
    assert(Sketch.histogramWeighted(emptyVc, 8).count() == 0 &&
      Sketch.histogram(empty, 8).count() == 0)
  }

  test("hll registers are duplicate-insensitive (cardinality, not " +
      "frequency): repeating the stream changes nothing") {
    val ws = (1 to 100).map(i => s"w$i")
    val once = Sketch.hllRegisters(wordsDf(ws), 6)
      .as[(Long, Long)].collect().toSet
    val thrice = Sketch.hllRegisters(wordsDf(ws ++ ws ++ ws), 6)
      .as[(Long, Long)].collect().toSet
    assert(once == thrice)
  }

  test("bloom: no false negatives ever, definite negatives when bits " +
      "miss, bitmaps merge by OR, top-bit word boundary exact") {
    val members = (1 to 200).map(i => s"member$i")
    val bits = Sketch.bloomBits(wordsDf(members), k = 3, mBits = 4096)
    // Every member reads present — the hard half of the contract.
    val memberHits = Sketch.bloomContains(bits,
        members.toDF("term"), k = 3, mBits = 4096)
      .as[(String, Boolean)].collect()
    assert(memberHits.length == 200 && memberHits.forall(_._2))
    // A local replay of the bit positions proves the packing exactly —
    // including positions whose pos%64 = 63 land on the SIGN bit.
    def h64(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def positions(w: String): Seq[Long] =
      (0 until 3).map(j => h64(s"bf$j|$w") % 4096)
    val wantWords = members.flatMap(positions)
      .groupBy(_ >> 6).view.mapValues(_.map(p => 1L << (p & 63).toInt)
        .foldLeft(0L)(_ | _)).toMap
    val gotWords = bits.as[(Long, Long)].collect().toMap
    assert(gotWords == wantWords)
    assert(members.flatMap(positions).exists(p => (p & 63) == 63),
      "fixture must exercise the sign-bit lane") // 600 positions: ~1/64 each
    // Probes whose positions are all unset read DEFINITELY absent.
    val absent = (1 to 50).map(i => s"absent$i")
    val got = Sketch.bloomContains(bits, absent.toDF("term"), 3, 4096)
      .as[(String, Boolean)].collect().toMap
    absent.foreach { t =>
      val want = positions(t).forall(p =>
        (wantWords.getOrElse(p >> 6, 0L) & (1L << (p & 63).toInt)) != 0L)
      assert(got(t) == want, s"$t: got ${got(t)}, replay says $want")
    }
    // Merge = bitwise OR: building over a split stream equals the
    // union build (the partial aggregate IS the shard merge).
    val (a, b) = members.splitAt(80)
    val merged = Sketch.bloomBits(wordsDf(a), 3, 4096)
      .union(Sketch.bloomBits(wordsDf(b), 3, 4096))
      .groupBy("wd").agg(bit_or(col("bits")).as("bits"))
      .as[(Long, Long)].collect().toMap
    assert(merged == wantWords)
    intercept[IllegalArgumentException] {
      Sketch.bloomBits(wordsDf(members), k = 0, mBits = 4096)
    }
    intercept[IllegalArgumentException] {
      Sketch.bloomBits(wordsDf(members), k = 3, mBits = 100)
    }
  }
}
