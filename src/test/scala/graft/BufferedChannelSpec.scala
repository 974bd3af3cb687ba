package graft

import org.apache.spark.sql.functions._

import graft.streaming.BufferedChannel

class BufferedChannelSpec extends SparkSpec {

  private def lines(n: Int, tag: String) = {
    import spark.implicits._
    (1 to n).map(i => s"""{"i": $i, "tag": "$tag"}""").toDF("value").coalesce(1)
  }

  test("size threshold flushes immediately; small batches stage until full") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-buf").toString
    val ch = new BufferedChannel(tmp, maxBytes = 2000, maxAgeMillis = Long.MaxValue / 2)
    var now = 1000L
    ch.append(lines(10, "a"), epochId = 0, nowMs = () => now) // ~250 B staged
    assert(ch.deliveredObjects.isEmpty && ch.stagedBytes > 0)
    ch.append(lines(100, "b"), epochId = 1, nowMs = () => now) // crosses 2 KB
    assert(ch.deliveredObjects.size == 1)
    assert(ch.stagedBytes == 0)
    // The delivered object carries BOTH staged batches, newline-framed.
    val delivered = spark.read.text(ch.deliveredObjects.head.toString)
    assert(delivered.count() == 110)
  }

  test("age threshold flushes a part-full buffer (time OR size, whichever first)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-buf2").toString
    val ch = new BufferedChannel(tmp, maxBytes = Long.MaxValue / 2, maxAgeMillis = 60000)
    var now = 1000L
    ch.append(lines(5, "x"), epochId = 0, nowMs = () => now)
    assert(ch.deliveredObjects.isEmpty)
    now += 61000 // 61 s later: next event (empty-batch tick) trips the age check
    assert(ch.maybeFlush(now))
    assert(ch.deliveredObjects.size == 1)
    assert(spark.read.text(ch.deliveredObjects.head.toString).count() == 5)
  }

  test("a replayed epoch overwrites its staged bytes (no double count)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-buf4").toString
    val ch = new BufferedChannel(tmp, maxBytes = Long.MaxValue / 2, maxAgeMillis = Long.MaxValue / 2)
    ch.append(lines(20, "x"), epochId = 7)
    val once = ch.stagedBytes
    ch.append(lines(20, "x"), epochId = 7) // foreachBatch retry of epoch 7
    assert(ch.stagedBytes == once, s"replay double-counted: ${ch.stagedBytes} vs $once")
    ch.flush()
    assert(spark.read.text(ch.deliveredObjects.head.toString).count() == 20)
  }

  test("flush conserves records and produces disjoint numbered objects") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-buf3").toString
    val ch = new BufferedChannel(tmp, maxBytes = 1500, maxAgeMillis = Long.MaxValue / 2)
    (0 until 6).foreach(e => ch.append(lines(30, s"e$e"), epochId = e))
    ch.flush() // drain the tail
    val objs = ch.deliveredObjects
    assert(objs.size >= 2, s"expected multiple flush objects, got $objs")
    val total = objs.map(o => spark.read.text(o.toString).count()).sum
    assert(total == 180)
  }
}
