package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support: payloads are opaque
  * `binary` columns + typed metadata; decode / feature-extract / resize /
  * frame-sample run as partition-local batch functions over the bytes.
  *
  * Two decode paths:
  *  - [[decodeImages]] is a REAL image decoder over the JDK's
  *    `javax.imageio` (PNG/JPEG/BMP/GIF/WBMP ship with the JVM — zero
  *    native deps): header-only width/height/bands/format extraction,
  *    never materializing pixel rasters, so cost per row is a few
  *    hundred header bytes regardless of image size.
  *  - [[stubDecode]] (behind [[extractMeta]]/q47) is a clearly-marked
  *    DETERMINISTIC stand-in whose output is replayable by any engine
  *    from the raw bytes — the form the cross-engine correctness oracle
  *    checks, and the shape a JNI/FFI video/audio codec (not available
  *    in this environment) would slot into. Swapping it is a
  *    one-function change; nothing in the plan shape moves.
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

  /** One decoded image header: true pixel dimensions, band count, and
    * container format as the JDK reader names it ("png", "JPEG", ...,
    * lowercased here).
    */
  final case class ImageMeta(width: Int, height: Int, channels: Int,
      format: String)

  /** REAL image decode (JDK `javax.imageio`, no native deps): true
    * width/height/bands/format from the image HEADER only. The reader
    * is asked for dimensions and the image-type palette — never
    * `ImageIO.read` — so a 100-megapixel JPEG costs the same few hundred
    * header bytes as a thumbnail; at 100 TB of media that is the
    * difference between a metadata pass and a full decode of the corpus.
    * None for null/empty/corrupt payloads and formats without an
    * installed reader (a video container, say) — callers route those to
    * a quarantine channel rather than crashing the batch.
    */
  private[graft] def decodeImageMeta(payload: Array[Byte]): Option[ImageMeta] = {
    if (payload == null || payload.isEmpty) return None
    scala.util.Try {
      // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
      // the factory honors ImageIO.getUseCache (default true) and spools
      // the stream to a java.io.tmpdir FILE — a disk round-trip + inode
      // churn per image row, for bytes already in memory.
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            // seekForwardOnly + ignoreMetadata: header fields only.
            r.setInput(iis, true, true)
            val bands = {
              val types = r.getImageTypes(0)
              if (types.hasNext) types.next().getNumComponents else 0
            }
            Some(ImageMeta(r.getWidth(0), r.getHeight(0), bands,
              r.getFormatName.toLowerCase(java.util.Locale.ROOT)))
          } finally r.dispose()
        }
      } finally if (iis != null) iis.close()
    }.toOption.flatten // corrupt header mid-parse → None, not a throw
  }

  /** Deterministic REAL image fixtures: `n` rows of (media_id, payload,
    * media_type) where payload is a genuine encoded image (JDK
    * `ImageIO.write` — the inverse of the [[decodeImages]] reader) with
    * closed-form header values:
    *
    *   width = 8 + id,  height = 12 + (id·3) mod 17,
    *   id mod 3 = 0 → RGB PNG (3 bands) · 1 → grayscale PNG (1 band)
    *             · 2 → RGB BMP (3 bands)
    *
    * The ENCODED BYTES are free to vary across JDK encoders — only the
    * header facts are contracted — which is exactly what lets an
    * external oracle check the real `javax.imageio` decode path: it
    * recomputes the closed-form dimensions independently and compares
    * against what [[decodeImages]] read back out of real headers
    * (q101's gate). Pixel content is deterministic but irrelevant.
    * Generation is a narrow per-row map, distributed like any decode.
    */
  def syntheticImages(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, n).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 8 + id.toInt
          val h = 12 + (id.toInt * 3) % 17
          val (imgType, fmt) = (id % 3) match {
            case 0 => (java.awt.image.BufferedImage.TYPE_3BYTE_BGR, "png")
            case 1 => (java.awt.image.BufferedImage.TYPE_BYTE_GRAY, "png")
            case _ => (java.awt.image.BufferedImage.TYPE_3BYTE_BGR, "bmp")
          }
          val img = new java.awt.image.BufferedImage(w, h, imgType)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, (x * 31 + y * 7 + id.toInt) & 0xffffff)
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, baos)
          (id, baos.toByteArray, "image")
        }
      }
      .toDF("media_id", "payload", "media_type")
  }

  /** [[decodeImageMeta]] over a media frame: (media_id, media_type,
    * n_bytes, width, height, channels, format, decoded). Undecodable
    * rows survive with `decoded = false` and null dims — a curation
    * pipeline filters or quarantines on the flag. Same narrow
    * mapPartitions shape as [[extractMeta]].
    */
  def decodeImages(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "payload", "media_type")
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, payload, mtype) =>
          val n = if (payload == null) 0L else payload.length.toLong
          decodeImageMeta(payload) match {
            case Some(m) =>
              (id, mtype, n, Some(m.width), Some(m.height),
                Some(m.channels), Some(m.format), true)
            case None =>
              (id, mtype, n, None: Option[Int], None: Option[Int],
                None: Option[Int], None: Option[String], false)
          }
        }
      }
      .toDF("media_id", "media_type", "n_bytes", "width", "height",
        "channels", "format", "decoded")
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

  /** One image spec for [[syntheticRgbImages]]: the media row id, the
    * SOURCE id the pixel pattern derives from (two specs sharing a
    * src_id are pixel-identical — the planted duplicate), the container
    * ("png"/"bmp" — both lossless for 24-bit RGB, which is what makes
    * pixel-level contracts oracle-replayable), and an optional
    * single-pixel perturbation at (0,0) (the planted NEAR-duplicate).
    */
  final case class RgbSpec(mediaId: Long, srcId: Long, fmt: String,
      perturbed: Boolean)

  /** Closed-form pixel of source image `srcId` at (x, y): a per-source
    * hash XORed over a spatial gradient, masked to 24-bit RGB — chosen
    * so distinct sources differ in ALL channels (not just low bits) and
    * an external oracle can recompute every pixel with integer ops.
    */
  private[graft] def rgbPixel(srcId: Long, x: Int, y: Int,
      perturbed: Boolean): Int =
    if (perturbed && x == 0 && y == 0) 0x808080
    else (((x * 31 + y * 7).toLong ^ (srcId * 2654435761L)) & 0xffffffL).toInt

  private[graft] def rgbDims(srcId: Long): (Int, Int) =
    (8 + (srcId % 24).toInt, 12 + (srcId * 3 % 17).toInt)

  /** Deterministic RGB-ONLY lossless fixtures for PIXEL-level contracts
    * (the [[syntheticImages]] discipline extended from headers to
    * rasters): PNG and 24-bit BMP round-trip every pixel exactly, so an
    * engine that really decodes the bytes and an oracle that replays
    * [[rgbPixel]] arithmetically must agree bit-for-bit. Grayscale is
    * deliberately absent — the JDK's RGB→gray conversion inside a
    * TYPE_BYTE_GRAY write is not arithmetic an external engine can
    * replay.
    */
  def syntheticRgbImages(spark: SparkSession, specs: Seq[RgbSpec]): DataFrame = {
    import spark.implicits._
    specs.map(s => (s.mediaId, s.srcId, s.fmt, s.perturbed))
      .toDF("media_id", "src_id", "fmt", "perturbed")
      .as[(Long, Long, String, Boolean)]
      .mapPartitions { it =>
        it.map { case (mid, sid, fmt, pert) =>
          val (w, h) = rgbDims(sid)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, rgbPixel(sid, x, y, pert))
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, baos)
          (mid, baos.toByteArray, "image")
        }
      }
      .toDF("media_id", "payload", "media_type")
  }

  /** 64-bit average hash of a decoded raster (the classic aHash — the
    * cheapest perceptual fingerprint, and the one whose arithmetic is
    * exactly replayable): 8×8 area-binned integer grayscale
    * ((299r+587g+114b)/1000, floor), per-cell mean (floor), global mean
    * over the 64 cell values (floor), bit c set iff cell c ≥ the mean.
    * All-integer floors, so ANY engine computes the identical 64 bits
    * from the identical pixels.
    */
  private[graft] def aHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    require(w >= 8 && h >= 8, s"aHash needs >= 8x8 input, got ${w}x$h")
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val gray = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
          114 * (p & 0xff)) / 1000
        val c = cy * 8 + x * 8 / w
        sums(c) += gray
        cnts(c) += 1
        x += 1
      }
      y += 1
    }
    val v = Array.tabulate(64)(c => sums(c) / cnts(c))
    val m = v.sum / 64
    var hash = 0L
    var c = 0
    while (c < 64) {
      if (v(c) >= m) hash |= (1L << c)
      c += 1
    }
    hash
  }

  /** Perceptual hashes over a media frame: (media_id, ahash) for every
    * decodable payload; undecodable rows AND sub-8×8 rasters are
    * DROPPED like any quarantine case (a tracking pixel has no
    * perceptual content, and a thrown executor task over one bad row
    * would be the failure mode — route rows through [[decodeImages]]'
    * flag first if they must be accounted). Full-raster decode (unlike
    * [[decodeImages]]' header-only read) — the genuinely pixel-priced
    * pass, still a narrow partition-local map: the corpus never
    * shuffles a payload byte.
    */
  def aHash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          if (payload == null || payload.isEmpty) None
          else scala.util.Try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
            if (img == null || img.getWidth < 8 || img.getHeight < 8) None
            else Some((id, aHash64(img)))
          }.toOption.flatten
        }
      }
      .toDF("media_id", "ahash")
  }

  /** Near-duplicate image pairs by Hamming distance over [[aHash]],
    * banded: the 64-bit hash splits into 8 one-byte bands; two hashes
    * within distance ≤ 7 differ in at most 7 bit positions, which by
    * pigeonhole leaves at least one band IDENTICAL — so the band-key
    * equi-join is a LOSSLESS candidate filter (the bit-space analogue of
    * q44's MinHash banding), and the exact `bit_count(xor)` verify runs
    * only on collisions. Never all-pairs: cost scales with band-key
    * collision counts, not corpus².
    */
  def hammingPairs(hashes: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 7,
      s"8 one-byte bands are complete only for maxDist <= 7, got $maxDist")
    val bands = hashes.select(col("media_id"), col("ahash"),
        explode(array((0 until 8).map(i => struct(lit(i).as("band"),
          shiftrightunsigned(col("ahash"), 8 * i).bitwiseAND(lit(255L))
            .as("key"))): _*)).as("bk"))
      .select(col("media_id"), col("ahash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id1"), col("b.media_id").as("id2"),
        col("a.ahash").as("h1"), col("b.ahash").as("h2"))
      .distinct()
      .select(col("id1"), col("id2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).cast("bigint")
          .as("hamming"))
      .filter(col("hamming") <= maxDist)
  }
}
