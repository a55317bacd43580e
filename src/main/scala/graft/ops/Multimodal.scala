package graft.ops

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.security.MessageDigest
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column support: media payloads ride
  * through the engine as opaque `binary` columns with typed metadata;
  * decode / feature-extraction runs per partition so a real codec
  * would be initialized once per task, not once per row.
  *
  * Two decode tiers:
  *   - [[decodeImage]] / [[resizeImage]] / [[sampleImageFrames]] are
  *     REAL decodes via pure-JVM `javax.imageio` (PNG/JPEG/GIF/BMP —
  *     no external native libs). Undecodable payloads degrade to
  *     sentinel dimensions instead of failing the task.
  *   - [[decodeStub]] / [[frameSampleStub]] / [[resizeStub]] remain
  *     for formats the JVM can't decode (video/audio): deterministic
  *     fakes with the real plumbing — BinaryType schema, case-class
  *     Encoders, `Dataset.mapPartitions` batch shape (the Scala
  *     analogue of `mapInPandas`), partition-preserving narrow
  *     execution (no shuffle is introduced by decode).
  */
object Multimodal {

  /** Binary payload + metadata as it enters the engine. */
  final case class MediaRecord(id: Long, content: Array[Byte], media_type: String)

  /** Decoded/feature-extracted record (stub decode). */
  final case class DecodedMedia(
      id: Long,
      byte_len: Int,
      content_md5: String,
      format: String,
      width: Int,
      height: Int)

  /** Ingest a UTF-8 text column as the binary payload (the
    * no-media-libs stand-in for reading image bytes). */
  def ingestUtf8(df: DataFrame, idCol: String, textCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      encode(col(textCol), "UTF-8").as("content"),
      lit(mediaType).as("media_type"))

  /** Ingest a base64-encoded payload column. */
  def ingestBase64(df: DataFrame, idCol: String, b64Col: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      unbase64(col(b64Col)).as("content"),
      lit(mediaType).as("media_type"))

  /** Container-format sniff from magic bytes (pure Column expr).
    * Must stay in lock-step with [[sniffBytes]] — the expr-vs-stub
    * agreement spec covers every branch of both. */
  def sniffFormat(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(hex(substring(bin, 1, 3)) === "FFD8FF", "jpeg")
      .when(hex(substring(bin, 1, 4)) === "89504E47", "png")
      .when(hex(substring(bin, 1, 4)) === "52494646", "riff")
      .when(hex(substring(bin, 1, 4)) === "464F524D" &&
        hex(substring(bin, 9, 4)) === "41494646", "aiff") // "FORM"…"AIFF"
      .when(hex(substring(bin, 1, 4)) === "2E736E64", "au") // ".snd"
      .otherwise("bin")

  /** JVM-side twin of [[sniffFormat]] for per-partition decode code. */
  private def sniffBytes(b: Array[Byte]): String =
    if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff) "jpeg"
    else if (b.length >= 4 && (b(0) & 0xff) == 0x89 &&
      b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' &&
      b(2) == 'F' && b(3) == 'F') "riff"
    else if (b.length >= 12 && b(0) == 'F' && b(1) == 'O' &&
      b(2) == 'R' && b(3) == 'M' &&
      b(8) == 'A' && b(9) == 'I' && b(10) == 'F' && b(11) == 'F') "aiff"
    else if (b.length >= 4 && b(0) == '.' && b(1) == 's' &&
      b(2) == 'n' && b(3) == 'd') "au"
    else "bin"

  /** `ImageIO.read` that maps every decode failure to None: no reader
    * registered, corrupt stream, truncated payload. Callers hoist
    * `ImageIO.setUseCache(false)` to once per partition (it mutates
    * JVM-global state; keeping decode on-heap stops executor tasks
    * spilling codec temp files to local disk).
    */
  private def tryReadImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** md5 over the decoded sRGB raster (`getRGB` normalizes the color
    * model, so the fingerprint is stable across palette/band layouts).
    */
  private def pixelMd5(img: BufferedImage, digest: MessageDigest): String = {
    digest.reset()
    val pixels = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
    val buf = java.nio.ByteBuffer.allocate(pixels.length * 4)
    buf.asIntBuffer().put(pixels)
    digest.digest(buf.array()).map("%02x".format(_)).mkString
  }

  /** REAL image decode (pure-JVM `javax.imageio`: PNG/JPEG/GIF/BMP).
    * Width/height come from the actually-decoded raster; payloads the
    * JVM can't decode get the sentinel `(-1, -1)` with the magic-byte
    * format sniff preserved — a 100 TB ingest must quarantine bad
    * media rows, not die on them. Narrow (per-partition), no shuffle.
    */
  def decodeImage(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      ImageIO.setUseCache(false)
      val digest = MessageDigest.getInstance("MD5")
      records.map { r =>
        digest.reset()
        val hexDigest = digest.digest(r.content).map("%02x".format(_)).mkString
        val dims = tryReadImage(r.content)
          .map(img => (img.getWidth, img.getHeight))
          .getOrElse((-1, -1))
        DecodedMedia(r.id, r.content.length, hexDigest, sniffBytes(r.content),
          dims._1, dims._2)
      }
    }
  }

  /** REAL resize: decode → bilinear `Graphics2D` scale to
    * `targetW`×`targetH` → PNG re-encode. Undecodable payloads pass
    * through unchanged (same quarantine stance as [[decodeImage]]).
    */
  def resizeImage(
      media: Dataset[MediaRecord],
      targetW: Int,
      targetH: Int): Dataset[MediaRecord] = {
    require(targetW > 0 && targetH > 0, s"target dims must be positive: ${targetW}x$targetH")
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      ImageIO.setUseCache(false)
      records.map { r =>
        tryReadImage(r.content) match {
          case None => r
          case Some(img) =>
            val scaled = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
            val g = scaled.createGraphics()
            try {
              g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
                RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, targetW, targetH, null)
            } finally g.dispose()
            val out = new ByteArrayOutputStream()
            ImageIO.write(scaled, "png", out)
            r.copy(content = out.toByteArray, media_type = "image/png")
        }
      }
    }
  }

  /** Perceptual image hash row: decoded dims + 64-bit dHash (None for
    * payloads the JVM can't decode — the quarantine path). */
  final case class ImageHash(id: Long, width: Int, height: Int, phash: Option[Long])

  /** 64-bit difference hash (dHash) — the perceptual fingerprint for
    * image near-dup detection: downsample the decoded raster to a
    * `gridW`×`gridH` luma grid, then bit (cy·(gridW−1)+cx) = 1 iff
    * luma(cx+1, cy) > luma(cx, cy). Gradient direction survives
    * rescaling, re-encoding, and brightness shifts, so near-identical
    * images land within a few hamming bits and feed straight into
    * [[Dedup.simhashNearDupPairs]] (8 chunks × 8 bits: any pair within
    * hamming ≤ 7 shares a chunk by pigeonhole — exact recall, no
    * all-pairs scan).
    *
    * Determinism contract (the whole point of this variant): the
    * downsample is NEAREST-NEIGHBOR at cell centers
    * (`ix = (2·cx+1)·W / (2·gridW)`, integer division) and the luma is
    * integer ITU-R BT.601 (`(299R + 587G + 114B) / 1000`) — every step
    * is exact integer arithmetic an external engine replays from the
    * raw raster bytes (the oracle does, from uncompressed BMP
    * fixtures), where the usual area/Lanczos resample is float-order-
    * dependent. Narrow per-partition execution, no shuffle; the same
    * quarantine stance as [[decodeImage]] (undecodable → None, never a
    * task failure).
    */
  def dHash(
      media: Dataset[MediaRecord],
      gridW: Int = 9,
      gridH: Int = 8): Dataset[ImageHash] = {
    require(gridW >= 2 && gridH >= 1, s"grid must be at least 2x1: ${gridW}x$gridH")
    require((gridW - 1) * gridH <= 64, s"dHash bits must fit a long: ${gridW}x$gridH")
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      ImageIO.setUseCache(false)
      records.map { r =>
        tryReadImage(r.content) match {
          case None => ImageHash(r.id, -1, -1, None)
          case Some(img) =>
            val w = img.getWidth
            val h = img.getHeight
            val lum = Array.ofDim[Int](gridH, gridW)
            var cy = 0
            while (cy < gridH) {
              // Long arithmetic: (2·c+1)·dim overflows Int once a
              // (possibly adversarial but still decodable) dimension
              // exceeds ~126M, and a negative index would escape the
              // quarantine path as a raw task failure. The quotient is
              // < dim, so the .toInt is exact.
              val iy = (((2L * cy + 1) * h) / (2L * gridH)).toInt
              var cx = 0
              while (cx < gridW) {
                val ix = (((2L * cx + 1) * w) / (2L * gridW)).toInt
                val p = img.getRGB(ix, iy)
                lum(cy)(cx) =
                  (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
                cx += 1
              }
              cy += 1
            }
            var hash = 0L
            cy = 0
            while (cy < gridH) {
              var cx = 0
              while (cx < gridW - 1) {
                if (lum(cy)(cx + 1) > lum(cy)(cx)) hash |= 1L << (cy * (gridW - 1) + cx)
                cx += 1
              }
              cy += 1
            }
            ImageHash(r.id, w, h, Some(hash))
        }
      }
    }
  }

  /** Really-decoded audio stream metadata (javax.sound.sampled). */
  final case class DecodedAudio(
      id: Long,
      byte_len: Int,
      format: String,
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      n_frames: Long,
      duration_ms: Double)

  /** REAL audio decode (pure-JVM `javax.sound.sampled`: WAV/AIFF/AU).
    * Opens the stream, reads the negotiated `AudioFormat`, and counts
    * frames from the container. Same quarantine stance as
    * [[decodeImage]]: undecodable payloads get `-1` sentinels (and
    * `n_frames = -1`, `duration_ms = -1.0`), never a task failure.
    * Narrow (per-partition), no shuffle.
    */
  def decodeAudio(media: Dataset[MediaRecord]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      records.map { r =>
        val decoded =
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(r.content))
            try {
              val fmt = in.getFormat
              val frames = in.getFrameLength
              val durMs =
                if (frames >= 0 && fmt.getSampleRate > 0)
                  math.round(frames * 1000000.0 / fmt.getSampleRate) / 1000.0
                else -1.0
              Some((fmt.getSampleRate.toInt, fmt.getChannels,
                fmt.getSampleSizeInBits, frames, durMs))
            } finally in.close()
          } catch { case scala.util.control.NonFatal(_) => None }
        val (rate, ch, bits, frames, durMs) =
          decoded.getOrElse((-1, -1, -1, -1L, -1.0))
        DecodedAudio(r.id, r.content.length, sniffBytes(r.content),
          rate, ch, bits, frames, durMs)
      }
    }
  }

  /** Perceptual audio fingerprint row: frames decoded + 64-bit energy
    * hash (None for undecodable/too-short payloads — quarantine). */
  final case class AudioHash(id: Long, n_frames: Long, phash: Option[Long])

  /** 64-bit perceptual audio fingerprint — the audio twin of [[dHash]]
    * (X138): decode the REAL PCM stream via `javax.sound.sampled`,
    * reduce channel 0 to an integer energy grid of `bands` crude
    * frequency bands × `gridT` time cells, then bit (k·(gridT−1)+t) =
    * 1 iff band k's energy RISES from cell t to t+1 — the dHash
    * sign-of-difference recipe on a band/time energy image. Bands are
    * comb-filter magnitudes `Σ|x_i − x_{i−k}|` (band 0 = `Σ|x_i|`,
    * the raw envelope): lag-k differencing nulls period-k content and
    * boosts high frequencies with k, so the 8 lags sample distinct
    * spectral shapes without an FFT — and, decisively for the oracle,
    * stay EXACT integer arithmetic an external engine replays
    * bit-for-bit from the container bytes (a windowed FFT is
    * float-order-dependent).
    *
    * Invariances the near-dup join needs: uniform gain scales every
    * energy equally, so all rise/fall comparisons — hence the hash —
    * survive re-encoding at a different volume or bit depth (8-bit
    * samples canonicalize ×256 to the 16-bit lattice), and container
    * changes (WAV↔AIFF↔AU) are hash-identical since only PCM content
    * is read. Hamming-banded pairing rides the existing
    * [[Dedup.simhashNearDupPairs]] machinery (8 chunks × 8 bits,
    * pigeonhole-exact at hamming ≤ 7). Same quarantine stance as
    * [[decodeImage]]: undecodable, non-PCM, <8/16-bit, or shorter
    * than `gridT` frames → None, never a task failure. Narrow
    * per-partition execution, no shuffle.
    */
  def audioFingerprint(
      media: Dataset[MediaRecord],
      gridT: Int = 9,
      bands: Int = 8): Dataset[AudioHash] = {
    require(gridT >= 2 && bands >= 1, s"grid must be at least 2x1: ${gridT}x$bands")
    require((gridT - 1) * bands <= 64,
      s"fingerprint bits must fit a long: ${gridT}x$bands")
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      records.map { r =>
        val decoded: Option[(Long, Long)] =
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(r.content))
            try {
              val fmt = in.getFormat
              val enc = fmt.getEncoding
              val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
              val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
              val bits = fmt.getSampleSizeInBits
              val frameSize = fmt.getFrameSize
              val nHdr = in.getFrameLength
              if (!(signed || unsigned) || (bits != 8 && bits != 16) ||
                  frameSize <= 0 || nHdr < gridT) None
              else {
                val data = in.readAllBytes()
                val n = math.min(nHdr, data.length / frameSize).toInt
                if (n < gridT) None
                else {
                  // channel-0 samples canonicalized to the signed
                  // 16-bit lattice (8-bit ×256, unsigned re-centered)
                  // so the same signal hashes identically across bit
                  // depths and container conventions
                  val x = new Array[Int](n)
                  val be = fmt.isBigEndian
                  var i = 0
                  while (i < n) {
                    val off = i * frameSize
                    x(i) =
                      if (bits == 16) {
                        val raw =
                          if (be) ((data(off) << 8) | (data(off + 1) & 0xff))
                          else ((data(off + 1) << 8) | (data(off) & 0xff))
                        if (signed) raw.toShort.toInt
                        else (raw & 0xffff) - 32768
                      } else {
                        if (unsigned) ((data(off) & 0xff) - 128) * 256
                        else data(off) * 256
                      }
                    i += 1
                  }
                  val e = Array.ofDim[Long](bands, gridT)
                  i = 0
                  while (i < n) {
                    val cell = ((i.toLong * gridT) / n).toInt
                    var k = 0
                    while (k < bands) {
                      val d =
                        if (k == 0) x(i)
                        else x(i) - (if (i >= k) x(i - k) else 0)
                      e(k)(cell) += math.abs(d)
                      k += 1
                    }
                    i += 1
                  }
                  var hash = 0L
                  var k = 0
                  while (k < bands) {
                    var t = 0
                    while (t < gridT - 1) {
                      if (e(k)(t + 1) > e(k)(t)) hash |= 1L << (k * (gridT - 1) + t)
                      t += 1
                    }
                    k += 1
                  }
                  Some((nHdr, hash))
                }
              }
            } finally in.close()
          } catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some((frames, hash)) => AudioHash(r.id, frames, Some(hash))
          case None => AudioHash(r.id, -1L, None)
        }
      }
    }
  }

  /** One really-decoded frame of a multi-frame container (GIF). */
  final case class DecodedFrame(
      id: Long,
      frame_index: Int,
      width: Int,
      height: Int,
      pixel_md5: String)

  /** REAL frame sampling: opens an `ImageReader` on the container,
    * counts frames (GIF animations have many; still formats have 1),
    * and decodes up to `maxFrames` equal-spaced frames. One input row
    * fans out to ≤`maxFrames` typed rows; reader state is per-row but
    * the digest is per-partition. Undecodable payloads yield no rows.
    */
  def sampleImageFrames(
      media: Dataset[MediaRecord],
      maxFrames: Int = 4): Dataset[DecodedFrame] = {
    require(maxFrames > 0, s"maxFrames must be positive: $maxFrames")
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      ImageIO.setUseCache(false)
      val digest = MessageDigest.getInstance("MD5")
      records.flatMap { r =>
        // Stream creation and reader lookup sit INSIDE the quarantine
        // scope too — an unexpected throw there must yield zero rows,
        // not a task failure — and the finally closes the stream on
        // every path.
        var iis: javax.imageio.stream.ImageInputStream = null
        var reader: javax.imageio.ImageReader = null
        try {
          iis = ImageIO.createImageInputStream(new ByteArrayInputStream(r.content))
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) Seq.empty[DecodedFrame]
          else {
            reader = readers.next()
            reader.setInput(iis)
            val n = math.max(1, reader.getNumImages(true))
            val k = math.min(maxFrames, n)
            (0 until k).map { i =>
              val frameIdx = ((n.toLong * i) / k).toInt
              val img = reader.read(frameIdx)
              DecodedFrame(r.id, frameIdx, img.getWidth, img.getHeight,
                pixelMd5(img, digest))
            }
          }
        } catch {
          case scala.util.control.NonFatal(_) => Seq.empty[DecodedFrame]
        } finally {
          if (reader != null) reader.dispose()
          if (iis != null)
            try iis.close()
            catch { case scala.util.control.NonFatal(_) => () }
        }
      }
    }
  }

  /** STUB decode for non-image media (video/audio codecs aren't in the
    * JVM): derives deterministic fake dimensions from the md5 of the
    * payload (hex chars 1-4 → width, 5-8 → height, each mapped to
    * 16..255). Deterministic ⇒ oracle-checkable. For images, use the
    * real [[decodeImage]].
    */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // Per-partition init — a real decoder (libjpeg/ffmpeg handle)
      // would be constructed once here and reused across the batch.
      val digest = MessageDigest.getInstance("MD5")
      records.map { r =>
        digest.reset()
        val hexDigest = digest.digest(r.content).map("%02x".format(_)).mkString
        DecodedMedia(
          id = r.id,
          byte_len = r.content.length,
          content_md5 = hexDigest,
          format = sniffBytes(r.content),
          width = 16 + Integer.parseInt(hexDigest.substring(0, 4), 16) % 240,
          height = 16 + Integer.parseInt(hexDigest.substring(4, 8), 16) % 240)
      }
    }
  }

  /** One sampled frame of a media payload (stub: a byte-range chunk
    * standing in for a decoded video frame). */
  final case class Frame(
      id: Long,
      frame_index: Int,
      frame_offset: Long,
      frame_bytes: Int,
      frame_md5: String)

  /** STUB frame sampling: where a real pipeline would seek the
    * container and decode every Nth frame, we sample `nFrames`
    * equal-spaced byte ranges of `frameBytes` bytes and fingerprint
    * each. The plumbing is the real shape: one input row fans out to
    * `nFrames` typed rows per media item, per-partition "decoder"
    * state, narrow execution.
    */
  def frameSampleStub(
      media: Dataset[MediaRecord],
      nFrames: Int = 4,
      frameBytes: Int = 64): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      val digest = MessageDigest.getInstance("MD5")
      records.flatMap { r =>
        val n = math.max(1, math.min(nFrames, r.content.length / math.max(1, frameBytes)))
        (0 until n).map { i =>
          val offset = (r.content.length.toLong * i) / n
          val len = math.min(frameBytes, r.content.length - offset.toInt)
          val chunk = java.util.Arrays.copyOfRange(
            r.content, offset.toInt, offset.toInt + len)
          digest.reset()
          Frame(r.id, i, offset, len,
            digest.digest(chunk).map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** STUB resize: a real implementation decodes, scales to
    * `targetW`×`targetH`, and re-encodes; the stub derives the
    * "resized" payload as a deterministic truncation-with-header so
    * schema, sizing behavior, and per-partition execution are real.
    */
  def resizeStub(
      media: Dataset[MediaRecord],
      targetW: Int,
      targetH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      records.map { r =>
        val budget = math.max(16, math.min(r.content.length, targetW * targetH / 8))
        val header = s"RSZ:${targetW}x$targetH:".getBytes("UTF-8")
        r.copy(content = header ++ r.content.take(budget - math.min(budget, header.length)))
      }
    }
  }

  /** Full stub pipeline: ingest text as binary → per-partition decode. */
  def decodeDocuments(spark: SparkSession, df: DataFrame, idCol: String, textCol: String): Dataset[DecodedMedia] = {
    import spark.implicits._
    decodeStub(ingestUtf8(df, idCol, textCol, "text/plain").as[MediaRecord])
  }
}
