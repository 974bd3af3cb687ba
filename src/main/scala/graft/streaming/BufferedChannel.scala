package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Size-OR-time delivery buffering — the Firehose flush contract the
  * reference declares (5 MB or 60 s, whichever first:
  * iac/s2_app.py:810-815,323-341) and which Spark's time-only triggers
  * can't express (SURVEY §4 flagged this as the one custom piece).
  *
  * Mechanism: micro-batches append NDJSON part-files to a staging area
  * and bump a byte counter; when accumulated bytes reach `maxBytes` OR
  * the oldest staged batch is older than `maxAgeMillis`, all staged parts
  * are atomically promoted into one numbered delivery object directory —
  * reproducing Firehose's object-granularity output (one S3 object per
  * buffer flush), independent of the trigger cadence feeding it.
  *
  * Driver state is only (bytes, firstArrival, object counter) — O(1);
  * the data itself never touches the driver.
  */
final class BufferedChannel(root: String, maxBytes: Long, maxAgeMillis: Long) {

  private val staging = s"$root/.staging"
  private val bytes = new AtomicLong(0L)
  @volatile private var firstArrivalMs: Long = -1L
  private val objectSeq = new AtomicLong(0L)
  // Per-epoch payload bytes: a replayed epoch overwrites its dir, so its
  // previous contribution must be retracted, not double-counted.
  private val epochBytes = scala.collection.mutable.Map.empty[Long, Long]

  Files.createDirectories(Paths.get(staging))

  /** Append one micro-batch worth of lines; flush if a threshold trips.
    * @param nowMs injectable clock for tests
    */
  def append(lines: DataFrame, epochId: Long,
      nowMs: () => Long = () => System.currentTimeMillis()): Unit = {
    val dir = s"$staging/epoch=$epochId"
    lines.select(rtrim(col(lines.columns.head), "\n").as("value"))
      .write.mode("overwrite").text(dir)
    // Only payload part-files count toward the size threshold (not
    // _SUCCESS markers or .crc checksums).
    val added = partFiles(Paths.get(dir)).map(Files.size(_)).sum
    synchronized {
      val prev = epochBytes.getOrElse(epochId, 0L)
      epochBytes(epochId) = added
      bytes.addAndGet(added - prev)
      if (firstArrivalMs < 0) firstArrivalMs = nowMs()
    }
    maybeFlush(nowMs())
  }

  /** Flush when size OR age threshold is met (Firehose: whichever first). */
  def maybeFlush(nowMs: Long): Boolean = synchronized {
    val aged = firstArrivalMs >= 0 && nowMs - firstArrivalMs >= maxAgeMillis
    if (bytes.get() >= maxBytes || (aged && bytes.get() > 0)) { flush(); true }
    else false
  }

  /** Promote all staged parts into one numbered delivery object. */
  def flush(): Unit = synchronized {
    val epochs = listDirs(Paths.get(staging))
    if (epochs.nonEmpty) {
      val objDir = Paths.get(f"$root/object-${objectSeq.getAndIncrement()}%06d")
      Files.createDirectories(objDir)
      epochs.foreach { e =>
        partFiles(e).foreach { f =>
          Files.move(f, objDir.resolve(s"${e.getFileName}-${f.getFileName}"),
            StandardCopyOption.ATOMIC_MOVE)
        }
        deleteRecursively(e)
      }
      bytes.set(0L)
      epochBytes.clear()
      firstArrivalMs = -1L
    }
  }

  def stagedBytes: Long = bytes.get()
  def deliveredObjects: Seq[Path] = listDirs(Paths.get(root))
    .filter(_.getFileName.toString.startsWith("object-")).sortBy(_.toString)

  private def listChildren(p: Path): Seq[Path] =
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala.toSeq finally s.close() // Files.list leaks an fd if unclosed
    }

  private def partFiles(p: Path): Seq[Path] =
    listChildren(p).filter(f =>
      Files.isRegularFile(f) && f.getFileName.toString.startsWith("part-"))

  private def listDirs(p: Path): Seq[Path] =
    listChildren(p).filter(Files.isDirectory(_))

  private def deleteRecursively(p: Path): Unit = {
    listChildren(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
