package graft.streaming

import java.io.{FileNotFoundException, IOException}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{Executors, ScheduledFuture, TimeUnit}

import org.apache.hadoop.fs.{FileSystem, Path}

/** Cross-PROCESS serialization for index maintenance (compaction and
  * manifest heal): a lease FILE next to the index root, where
  * [[IndexSink]]'s JVM-local lock cannot reach — the reference's search
  * sink gets this for free from OpenSearch's server-side coordination;
  * a shared-filesystem index has to build it from FS primitives.
  *
  * Protocol (everything through the Hadoop FileSystem API, so it works
  * unchanged on HDFS and local paths):
  *  - ACQUIRE: `create(path, overwrite = false)` — atomic on HDFS and
  *    local filesystems; exactly one contender wins the create. The
  *    file body carries holder diagnostics only (host, pid, epoch
  *    millis); liveness rides on file MTIME, not content.
  *  - RENEW: a daemon heartbeat re-touches the mtime (`setTimes`) every
  *    ttl/3 while held — an atomic metadata op, so readers never see a
  *    torn renewal. Long maintenance (a 100 TB compaction's snapshot
  *    shuffle) therefore holds the lease indefinitely while healthy.
  *  - SELF-HEAL: a lease whose mtime is older than `ttlMs` belongs to a
  *    crashed (or wedged) holder — ≥3 consecutive heartbeats missed. A
  *    contender breaks it by atomically RENAMING it to a unique
  *    tombstone (only one breaker can win the rename, so concurrent
  *    breakers never double-free) and deleting the tombstone, then
  *    retries acquisition.
  *  - RELEASE: delete the file ([[close]]; idempotent).
  *
  * Honest limits (inherent to TTL leases without fencing tokens): a
  * holder PAUSED past the full TTL — a stop-the-world GC spanning three
  * missed heartbeats — can race its breaker. Size `ttlMs` well above
  * worst-case pause, not above maintenance duration (the heartbeat
  * covers duration). And object stores without atomic create-no-
  * overwrite (S3 without conditional writes) weaken acquisition to
  * best-effort; HDFS/local are exact.
  */
final class MaintenanceLease private (fs: FileSystem, val path: Path,
    ttlMs: Long) extends AutoCloseable {

  @volatile private var released = false

  private val beat: ScheduledFuture[_] =
    MaintenanceLease.scheduler.scheduleWithFixedDelay(() => {
      // A missed beat (transient FS fault) is absorbed by the TTL
      // margin: staleness needs ~3 consecutive misses.
      try if (!released) fs.setTimes(path, System.currentTimeMillis(), -1)
      catch { case _: Exception => () }
    }, math.max(1, ttlMs / 3), math.max(1, ttlMs / 3), TimeUnit.MILLISECONDS)

  /** Release: stop renewing, delete the lease file. Idempotent; a
    * failed delete (lease already broken by a TTL breaker after a long
    * pause) is not an error — the breaker already freed it.
    */
  override def close(): Unit = {
    released = true
    beat.cancel(false)
    try fs.delete(path, false)
    catch { case _: Exception => () }
  }
}

object MaintenanceLease {

  /** Default TTL: generous next to any plausible GC pause (the failure
    * mode that matters — see the class scaladoc), irrelevant to
    * maintenance duration (the heartbeat covers that).
    */
  val DefaultTtlMs: Long = 10L * 60 * 1000

  /** Default acquisition patience before giving up loudly. */
  val DefaultAcquireTimeoutMs: Long = 2L * 60 * 1000

  private lazy val scheduler = {
    val s = Executors.newScheduledThreadPool(1, r => {
      val t = new Thread(r, "graft-maintenance-lease-heartbeat")
      t.setDaemon(true)
      t
    })
    s
  }

  /** Acquire the lease at `path`, breaking a stale one if found.
    * `timeoutMs = 0` means try-once: return None immediately when the
    * lease is held and fresh (the opportunistic-heal path). A positive
    * timeout polls until acquired or the deadline passes — then THROWS,
    * because the callers that wait (compact) must not silently proceed
    * unserialized.
    */
  def acquire(fs: FileSystem, path: Path,
      ttlMs: Long = DefaultTtlMs,
      timeoutMs: Long = DefaultAcquireTimeoutMs): Option[MaintenanceLease] = {
    require(ttlMs >= 3, s"ttlMs must cover a heartbeat interval, got $ttlMs")
    val deadline = System.currentTimeMillis() + timeoutMs
    var first = true
    while (first || System.currentTimeMillis() <= deadline) {
      first = false
      if (tryCreate(fs, path)) return Some(new MaintenanceLease(fs, path, ttlMs))
      breakIfStale(fs, path, ttlMs)
      if (timeoutMs == 0) {
        // Try-once: one more create in case the stale-break just freed
        // it; otherwise report "held" without waiting.
        if (tryCreate(fs, path)) return Some(new MaintenanceLease(fs, path, ttlMs))
        return None
      }
      Thread.sleep(100)
    }
    throw new IOException(
      s"maintenance lease $path not acquired within ${timeoutMs}ms — " +
        "another process is (or a wedged one was) maintaining this index")
  }

  private def tryCreate(fs: FileSystem, path: Path): Boolean =
    try {
      val out = fs.create(path, false) // atomic no-overwrite: one winner
      try out.write(
        s"${java.net.InetAddress.getLocalHost.getHostName} pid=${ProcessHandle.current().pid()} t=${System.currentTimeMillis()}\n"
          .getBytes(StandardCharsets.UTF_8))
      finally out.close()
      true
    } catch { case _: IOException => false } // exists (or transient): not ours

  /** Break a lease whose mtime proves ≥ TTL of missed heartbeats. The
    * atomic rename-to-tombstone means exactly one breaker frees it; the
    * check-then-rename window (a live holder's beat landing in between)
    * is the no-fencing limit documented on the class.
    */
  private def breakIfStale(fs: FileSystem, path: Path, ttlMs: Long): Unit = {
    val mtime =
      try Some(fs.getFileStatus(path).getModificationTime)
      catch {
        case _: FileNotFoundException => None // released under us: retry create
        case _: IOException => None
      }
    mtime.foreach { m =>
      if (System.currentTimeMillis() - m > ttlMs) {
        val tomb = new Path(path.getParent,
          path.getName + ".broken-" + java.util.UUID.randomUUID())
        val won = try fs.rename(path, tomb) catch { case _: IOException => false }
        if (won) {
          try fs.delete(tomb, false) catch { case _: Exception => () }
        }
      }
    }
  }
}
