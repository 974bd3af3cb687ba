package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Local sequential replay of the content-defined chunking (same h64,
  * same boundary rule) — the corpus-level oracle is q174.
  */
class CdcSpec extends SparkSpec {

  import spark.implicits._

  private def h64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Reference chunker: k-gram hashes, boundary after token g+k-1 where
    * hash % mod == 0, final chunk closes at the doc end.
    */
  private def refChunks(toks: Vector[String], k: Int, mod: Int): Vector[(Long, Long)] = {
    if (toks.isEmpty) Vector.empty
    else if (toks.length < k) Vector((h64(toks.mkString(" ")), toks.length.toLong))
    else {
      val gh = toks.sliding(k).map(g => h64(g.mkString(" "))).toVector
      val ends0 = gh.zipWithIndex.collect {
        case (h, i) if h % mod == 0 => i + k // 1-based token end = (i+1) + k - 1
      }
      val ends = if (ends0.nonEmpty && ends0.last == toks.length) ends0
                 else ends0 :+ toks.length
      val starts = 1 +: ends.dropRight(1).map(_ + 1)
      starts.zip(ends).map { case (s, e) =>
        (h64(toks.slice(s - 1, e).mkString(" ")), (e - s + 1).toLong)
      }.toVector
    }
  }

  private def run(corpus: Seq[(Long, Vector[String])], k: Int, mod: Int) =
    Cdc.chunks(corpus.toDF("doc_id", "toks"), k, mod)
      .select("doc_id", "idx", "ch", "n_toks")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toVector)
      .toMap

  test("chunks match the local replay, including short docs and forced boundaries") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val corpus = (1L to 80L).map { id =>
      id -> Vector.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
    } :+ (100L -> Vector("x")) :+ (101L -> Vector("x", "y")) :+ (102L -> Vector.empty[String])
    // mod 2 so boundaries actually fire on a small corpus
    for (mod <- Seq(2, 4); k <- Seq(2, 3)) {
      val got = run(corpus, k, mod)
      val want = corpus.filter(_._2.nonEmpty)
        .map { case (id, t) => id -> refChunks(t, k, mod) }.toMap
      assert(got == want, s"k=$k mod=$mod")
    }
    // chunks tile each doc exactly: token counts telescope
    val got = run(corpus, 3, 2)
    corpus.filter(_._2.nonEmpty).foreach { case (id, t) =>
      assert(got(id).map(_._2).sum == t.length.toLong, s"doc $id")
    }
  }

  test("shifted duplication: a moved block keeps its interior chunk keys") {
    // A 24-token block embedded at different offsets in two docs: CDC
    // boundaries inside the block depend only on the block's content,
    // so interior chunks agree even though offsets differ (the property
    // fixed-size splitting lacks).
    val block = Vector.tabulate(24)(i => s"blk${i % 7}")
    val a = Vector("pre1", "pre2") ++ block ++ Vector("tail")
    val b = Vector("x1", "x2", "x3", "x4", "x5") ++ block
    val got = run(Seq(1L -> a, 2L -> b), k = 3, mod = 4)
    val shared = got(1L).map(_._1).toSet intersect got(2L).map(_._1).toSet
    assert(shared.nonEmpty, "moved block must share interior chunk keys")
  }

  test("dupReport: totals and top cut from a planted duplicate") {
    val t = Vector.fill(9)("z") // all grams equal -> deterministic chunks
    val corpus = Seq(1L -> t, 2L -> t, 3L -> Vector("u", "v", "w"))
    val ch = Cdc.chunks(corpus.toDF("doc_id", "toks"), 3, 64)
    val rep = Cdc.dupReport(ch, topN = 5)
      .select("ch", "n_occ", "n_docs", "n_toks", "n_chunks", "n_distinct",
        "dup_tokens", "total_tokens")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    val local = corpus.flatMap { case (id, toks) =>
      refChunks(toks, 3, 64).map { case (h, n) => (id, h, n) } }
    val byh = local.groupBy(_._2)
    assert(rep.head._5 == local.size.toLong)          // n_chunks
    assert(rep.head._6 == byh.size.toLong)            // n_distinct
    assert(rep.head._7 == byh.values.map(v => (v.size - 1) * v.head._3).sum) // dup_tokens
    assert(rep.head._8 == local.map(_._3).sum)        // total_tokens
    // top row is the planted duplicate (docs 1 and 2 identical)
    val top = rep.minBy(r => (-r._2, r._1))
    assert(top._2 >= 2 && top._3 == 2L)
    intercept[IllegalArgumentException] { Cdc.dupReport(ch, 0) }
    intercept[IllegalArgumentException] { Cdc.chunks(corpus.toDF("doc_id", "toks"), 0) }
    intercept[IllegalArgumentException] { Cdc.chunks(corpus.toDF("doc_id", "toks"), 3, 1) }
  }
}
