package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunker

class ChunkerSpec extends SparkSpec {

  private def toksDf(rows: Seq[(Long, Seq[String])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "toks")
  }

  private def hashOf(toks: Seq[String]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(("ck|" + toks.mkString(" ")).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def run(rows: Seq[(Long, Seq[String])], size: Int, stride: Int) = {
    import spark.implicits._
    Chunker.chunks(toksDf(rows), size, stride)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
  }

  test("chunks cover the doc at the stride with a short tail, hashes exact") {
    val ts = (0 until 10).map(i => s"w$i")
    // size 4, stride 3 over 10 tokens: starts 0,3,6,9; lengths 4,4,4,1.
    val got = run(Seq(1L -> ts), size = 4, stride = 3)
    val want = Seq(0, 3, 6, 9).zipWithIndex.map { case (s, i) =>
      (1L, i.toLong, s.toLong, math.min(4, 10 - s).toLong,
        hashOf(ts.slice(s, s + 4)))
    }
    assert(got == want)
  }

  test("non-overlapping chunks partition the tokens exactly") {
    val ts = (0 until 9).map(i => s"t$i")
    val got = run(Seq(1L -> ts), size = 3, stride = 3)
    assert(got.map(_._4).sum == 9) // every token in exactly one chunk
    assert(got.map(_._3) == Seq(0L, 3L, 6L))
  }

  test("empty docs emit nothing; a short doc yields one whole-doc chunk") {
    val got = run(Seq(1L -> Seq.empty[String], 2L -> Seq("a", "b")), 32, 24)
    assert(got == Seq((2L, 0L, 0L, 2L, hashOf(Seq("a", "b")))))
  }

  test("interior tokens appear in exactly ceil(size/stride) chunks") {
    val ts = (0 until 100).map(i => s"x$i")
    import spark.implicits._
    val spans = Chunker.chunks(toksDf(Seq(1L -> ts)), size = 32, stride = 24)
      .select("start_tok", "n_tok").as[(Long, Long)].collect()
    // token 50 is interior: covered by chunks starting at 24 and 48.
    assert(spans.count { case (s, n) => s <= 50 && 50 < s + n } == 2)
  }

  test("bad size or stride fails loud") {
    intercept[IllegalArgumentException] { Chunker.chunks(toksDf(Seq()), 0, 1) }
    intercept[IllegalArgumentException] { Chunker.chunks(toksDf(Seq()), 4, 0) }
    intercept[IllegalArgumentException] { Chunker.chunks(toksDf(Seq()), 4, 5) }
  }
}
