package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.streaming.{IndexSink, MaintenanceLease}

/** Cross-process index-maintenance serialization: the lease file
  * protocol (atomic create, mtime heartbeat, TTL stale-break) and its
  * wiring into compact/heal.
  */
class MaintenanceLeaseSpec extends SparkSpec {

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)

  test("lease: one winner; try-once contention; release frees it") {
    val tmp = Files.createTempDirectory("graft-lease").toString
    val p = hp(s"$tmp/idx.maintenance.lease")
    val a = MaintenanceLease.acquire(fs, p).get
    // Held and fresh: a try-once contender reports held, instantly.
    assert(MaintenanceLease.acquire(fs, p, timeoutMs = 0).isEmpty)
    // A waiting contender times out LOUDLY rather than proceeding.
    intercept[java.io.IOException] {
      MaintenanceLease.acquire(fs, p, timeoutMs = 300)
    }
    a.close()
    val b = MaintenanceLease.acquire(fs, p, timeoutMs = 0)
    assert(b.nonEmpty, "released lease must be acquirable")
    b.get.close()
    assert(!fs.exists(p))
  }

  test("lease: a TTL-stale lease (crashed holder) is broken and re-acquired") {
    val tmp = Files.createTempDirectory("graft-lease-stale").toString
    val p = hp(s"$tmp/idx.maintenance.lease")
    // A crashed holder with a RECORDED 1s TTL, 60s silent: any
    // contender judges it stale by the holder's own bar and wins.
    val out = fs.create(p, false)
    try out.write("token=dead ttl=1000 host=x pid=0 t=0\n".getBytes("UTF-8"))
    finally out.close()
    fs.setTimes(p, System.currentTimeMillis() - 60000, -1)
    val got = MaintenanceLease.acquire(fs, p, ttlMs = 60000, timeoutMs = 0)
    assert(got.nonEmpty, "stale lease must self-heal")
    got.get.close()
  }

  test("lease: a tokenless foreign file only breaks past the CONSERVATIVE bar") {
    val tmp = Files.createTempDirectory("graft-lease-foreign").toString
    val p = hp(s"$tmp/idx.maintenance.lease")
    val out = fs.create(p, false)
    try out.write("dead-holder\n".getBytes("UTF-8")) finally out.close()
    // 60s old: stale by the contender's 1s TTL, but a tokenless body
    // gets max(contender, default) — a transient read fault or torn
    // write must not let a short-TTL contender break a default holder.
    fs.setTimes(p, System.currentTimeMillis() - 60000, -1)
    assert(MaintenanceLease.acquire(fs, p, ttlMs = 1000, timeoutMs = 0).isEmpty,
      "a 60s-old tokenless file must NOT break under the default bar")
    // Past the default TTL it is a genuine orphan and clears.
    fs.setTimes(p,
      System.currentTimeMillis() - MaintenanceLease.DefaultTtlMs - 60000, -1)
    val got = MaintenanceLease.acquire(fs, p, ttlMs = 1000, timeoutMs = 0)
    assert(got.nonEmpty, "an orphan past the default TTL must self-heal")
    got.get.close()
  }

  test("lease: a displaced holder's zombie heartbeat never refreshes the successor") {
    val tmp = Files.createTempDirectory("graft-lease-zombie").toString
    val p = hp(s"$tmp/idx.maintenance.lease")
    // A beats every 200ms. Displace it: remove its file and plant a
    // successor's lease with a known OLD mtime.
    val a = MaintenanceLease.acquire(fs, p, ttlMs = 600).get
    fs.delete(p, false)
    val out = fs.create(p, false)
    try out.write("token=successor ttl=600000 host=x pid=0 t=0\n".getBytes("UTF-8"))
    finally out.close()
    // A beat already mid-flight (token read BEFORE the swap, touch
    // landing after) is the documented no-fencing window, not the bug
    // under test — let one full beat period drain before planting the
    // baseline mtime, so every beat that fires afterwards reads the
    // successor's body.
    Thread.sleep(300)
    val planted = System.currentTimeMillis() - 5000
    fs.setTimes(p, planted, -1)
    try {
      Thread.sleep(1000) // several of A's beat intervals
      val m = fs.getFileStatus(p).getModificationTime
      assert(m == planted,
        s"zombie beat advanced the successor's mtime: $m != $planted")
    } finally {
      a.close() // token-guarded: must not delete the successor's lease
      assert(fs.exists(p), "displaced holder's release deleted the successor")
    }
  }

  test("lease: the heartbeat keeps a long-held lease fresh past its TTL") {
    val tmp = Files.createTempDirectory("graft-lease-beat").toString
    val p = hp(s"$tmp/idx.maintenance.lease")
    // TTL 600ms, beats every 200ms: hold for 3 TTLs worth of wall
    // clock — a contender must still see it fresh the whole time.
    val a = MaintenanceLease.acquire(fs, p, ttlMs = 600).get
    try {
      Thread.sleep(1800)
      assert(MaintenanceLease.acquire(fs, p, ttlMs = 600, timeoutMs = 0).isEmpty,
        "heartbeat failed to renew: a live holder was judged stale")
    } finally a.close()
  }

  test("lease: release after a TTL break must NOT free the successor's lease") {
    val tmp = Files.createTempDirectory("graft-lease-succ").toString
    val p = hp(s"$tmp/idx.maintenance.lease")
    val a = MaintenanceLease.acquire(fs, p, ttlMs = 60000).get
    // Simulate A stalling past its TTL: age the mtime far beyond 60s,
    // and let B break + re-acquire.
    fs.setTimes(p, System.currentTimeMillis() - 120000, -1)
    val b = MaintenanceLease.acquire(fs, p, ttlMs = 60000, timeoutMs = 0)
    assert(b.nonEmpty, "stale lease must break for the successor")
    // A resumes and releases: the file at this path is B's now — an
    // unconditional delete would free it and let a third contender in.
    a.close()
    assert(fs.exists(p), "A's release deleted B's lease")
    assert(MaintenanceLease.acquire(fs, p, timeoutMs = 0).isEmpty,
      "B's lease must still be held after A's release")
    b.get.close()
    assert(!fs.exists(p))
  }

  test("lease: staleness is judged by the HOLDER's recorded TTL, not the contender's") {
    val tmp = Files.createTempDirectory("graft-lease-ttl").toString
    val p = hp(s"$tmp/idx.maintenance.lease")
    // Holder with a long TTL (beats every ~20s — none lands during the
    // test); its mtime is 5s old: stale by a 1s contender's bar, fresh
    // by its own 60s bar.
    val a = MaintenanceLease.acquire(fs, p, ttlMs = 60000).get
    try {
      fs.setTimes(p, System.currentTimeMillis() - 5000, -1)
      val b = MaintenanceLease.acquire(fs, p, ttlMs = 1000, timeoutMs = 0)
      assert(b.isEmpty,
        "a short-TTL contender broke a healthy long-TTL holder's lease")
      assert(fs.exists(p))
    } finally a.close()
  }

  test("compact waits on a foreign lease, throws past timeout, heals stale") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-lease-compact").toString
    val index = s"$tmp/index"
    Seq(("a", 10.0, 0L), ("b", 20.0, 0L)).toDF("recordId", "value", "_epoch")
      .write.parquet(s"$index/epoch=0")
    val lease = hp(s"$index.maintenance.lease")
    // A FRESH foreign lease (another process mid-maintenance): compact
    // must refuse to run unserialized — loud timeout, index untouched.
    val out = fs.create(lease, false)
    try out.write("token=foreign ttl=600000 host=x pid=0 t=0\n".getBytes("UTF-8"))
    finally out.close()
    intercept[java.io.IOException] {
      IndexSink.compact(spark, index, "recordId", shards = 2,
        leaseTimeoutMs = 400)
    }
    assert(Files.exists(Paths.get(s"$index/epoch=0")), "index must be untouched")
    // The foreign holder crashes (lease silent past ITS OWN recorded
    // TTL): the next compact breaks it and proceeds.
    fs.setTimes(lease, System.currentTimeMillis() - 700000, -1)
    assert(IndexSink.compact(spark, index, "recordId", shards = 2,
      leaseTtlMs = 1000, leaseTimeoutMs = 2000) == 2)
    assert(!fs.exists(lease), "compact must release its lease")
  }

  test("registration heal is opportunistic: skipped under a live foreign lease") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-lease-heal").toString
    val index = s"$tmp/index"
    val e0 = Seq(("a", 10.0, 0L), ("b", 20.0, 0L)).toDF("recordId", "value", "_epoch")
    e0.write.parquet(s"$index/epoch=0")
    assert(IndexSink.compact(spark, index, "recordId", shards = 2) == 2)
    // Crash window (snapshot in, deletions pending, manifest present)
    // AND a live foreign maintainer holding the lease.
    e0.write.mode("overwrite").parquet(s"$index/epoch=0")
    Files.write(Paths.get(s"$index.compact.inflight"),
      "epoch=compact-1\nepoch=0\nEND\n".getBytes("UTF-8"))
    val lease = hp(s"$index.maintenance.lease")
    val out = fs.create(lease, false)
    try out.write("foreign\n".getBytes("UTF-8")) finally out.close()
    // Registration must NOT block, fail, or touch the foreign
    // maintainer's manifest — it reads through the duplicates.
    IndexSink.registerView(spark, index, "lease_skip_raw")
    assert(Files.exists(Paths.get(s"$index.compact.inflight")),
      "heal must be skipped while a foreign maintainer holds the lease")
    assert(spark.table("lease_skip_raw").count() == 4)
    // Foreign maintainer releases: the next registration heals.
    fs.delete(lease, false)
    IndexSink.registerView(spark, index, "lease_healed_raw")
    assert(!Files.exists(Paths.get(s"$index.compact.inflight")))
    assert(!Files.exists(Paths.get(s"$index/epoch=0")))
    assert(spark.table("lease_healed_raw").count() == 2)
  }

  test("two sessions compacting the same index concurrently lose nothing") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-lease-race").toString
    val index = s"$tmp/index"
    Seq(("a", 10.0, 0L), ("b", 20.0, 0L)).toDF("recordId", "value", "_epoch")
      .write.parquet(s"$index/epoch=0")
    Seq(("a", 99.0, 1L), ("c", 30.0, 1L)).toDF("recordId", "value", "_epoch")
      .write.parquet(s"$index/epoch=1")
    // Two independent sessions (shared JVM: the lock serializes them;
    // the lease additionally covers true cross-process contenders, as
    // the foreign-lease cases above prove) compact simultaneously.
    val s2 = spark.newSession()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(spark, s2).map { s =>
      new Thread(() =>
        try IndexSink.compact(s, index, "recordId", shards = 2)
        catch { case t: Throwable => errs.add(t) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"concurrent compaction failed: ${errs.peek()}")
    IndexSink.registerLatestView(spark, index, "race_latest", "recordId")
    assert(spark.table("race_latest").select("recordId", "value")
      .as[(String, Double)].collect().toMap ==
      Map("a" -> 99.0, "b" -> 20.0, "c" -> 30.0))
    assert(!fs.exists(hp(s"$index.maintenance.lease")))
    assert(!fs.exists(hp(s"$index.compact.inflight")))
  }
}
