package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support: payloads are opaque
  * `binary` columns + typed metadata; decode / feature-extract / resize /
  * frame-sample run as partition-local batch functions over the bytes.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic stub — but the Spark-side
  * plumbing (schema, batch iteration shape, partition locality, output
  * schema) is real and tested. Swapping `stubDecode` for a JNI/FFI codec
  * is a one-function change; nothing in the plan shape moves.
  *
  * Scale notes: mapPartitions keeps the codec call amortized per-batch
  * (model/codec init once per partition, not per row) — the same batch
  * shape `mapInPandas` gives PySpark. Binary payloads never shuffle:
  * every op here is a narrow transformation over the scan.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true)))

  final case class MediaMeta(
      media_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, sig: String)

  /** STUB decode: derives deterministic fake dimensions from the payload
    * bytes (first/last byte + length). Replace with a real codec (e.g.
    * libjpeg/ffmpeg via FFI) for production — signature stays identical.
    */
  private[operators] def stubDecode(payload: Array[Byte]): (Int, Int, Int) = {
    if (payload == null || payload.isEmpty) (0, 0, 0)
    else {
      val w = 16 + (payload.head & 0x7f)
      val h = 16 + (payload.last & 0x7f)
      val c = 1 + (payload.length % 3)
      (w, h, c)
    }
  }

  /** Decode + feature-extract: one partition-local pass over the bytes. */
  def extractMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select("media_id", "payload", "media_type").as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // Per-partition init point for a real codec/model handle.
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload, mtype) =>
          val (w, h, c) = stubDecode(payload)
          val bytes = if (payload == null) Array.empty[Byte] else payload
          md.reset()
          val sig = md.digest(bytes).map("%02x".format(_)).mkString
          MediaMeta(id, mtype, bytes.length.toLong, w, h, c, sig)
        }
      }
  }

  /** "Resize": demonstrates a bytes→bytes partition-local transform with
    * bounded output (here: truncate payload to `maxBytes` — stand-in for
    * a real thumbnailer with identical plan shape).
    */
  def resize(media: DataFrame, maxBytes: Int): DataFrame = {
    val resizeExpr = expr(s"substring(payload, 1, $maxBytes)")
    media.withColumn("payload", resizeExpr)
  }

  /** Frame-sample: pick every k-th fixed-size frame out of a binary blob
    * (stand-in for video frame extraction; real shape: one row in, many
    * frame rows out → explode keeps it distributed, no driver loop).
    */
  def frameSample(media: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    // Sampled frames sit at offsets 0, k, 2k, ... of the COMPLETE frames
    // (floor(len/frameBytes) of them): count = floor((complete-1)/k) + 1.
    // The naive floor(len/frameBytes/k) undercounts whenever a trailing
    // sampled frame is complete but the blob ends mid-stride (e.g.
    // len=30, frame=10, k=2 holds frames at 0 and 20 — two, not one).
    // Zero complete frames (short or null payload) must yield zero rows,
    // not one truncated phantom frame — explode of null emits nothing.
    val complete = floor(octet_length(col("payload")) / frameBytes).cast("bigint")
    val nFrames = when(complete >= 1, floor((complete - 1) / everyK) + 1)
    media
      .withColumn("frame_idx",
        explode(when(nFrames >= 1, sequence(lit(0L), nFrames - 1))))
      .withColumn("frame",
        expr(s"substring(payload, cast(frame_idx * $frameBytes * $everyK + 1 as int), $frameBytes)"))
      .drop("payload")
  }
}
