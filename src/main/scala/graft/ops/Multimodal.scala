package graft.ops

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column support: media payloads ride
  * through the engine as opaque `binary` columns with typed metadata;
  * decode / feature-extraction runs per partition so a real codec
  * would be initialized once per task, not once per row.
  *
  * The decode step is a clearly-marked deterministic STUB — this
  * container has no image/audio libraries — but the Spark-side
  * plumbing is real: BinaryType schema, case-class Encoders,
  * `Dataset.mapPartitions` batch shape (the Scala analogue of
  * `mapInPandas`), and partition-preserving narrow execution (no
  * shuffle is introduced by decode).
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

  /** Container-format sniff from magic bytes (pure Column expr). */
  def sniffFormat(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(hex(substring(bin, 1, 3)) === "FFD8FF", "jpeg")
      .when(hex(substring(bin, 1, 4)) === "89504E47", "png")
      .when(hex(substring(bin, 1, 4)) === "52494646", "riff")
      .otherwise("bin")

  /** STUB decode: where a real pipeline would decode the image and
    * measure it, we derive deterministic fake dimensions from the md5
    * of the payload (hex chars 1-4 → width, 5-8 → height, each mapped
    * to 16..255). Deterministic ⇒ oracle-checkable; swap the body for
    * a real codec when one is available.
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
        val fmt =
          if (r.content.length >= 3 &&
            (r.content(0) & 0xff) == 0xff && (r.content(1) & 0xff) == 0xd8 &&
            (r.content(2) & 0xff) == 0xff) "jpeg"
          else if (r.content.length >= 4 && (r.content(0) & 0xff) == 0x89 &&
            r.content(1) == 'P' && r.content(2) == 'N' && r.content(3) == 'G') "png"
          else if (r.content.length >= 4 && r.content(0) == 'R' && r.content(1) == 'I' &&
            r.content(2) == 'F' && r.content(3) == 'F') "riff"
          else "bin"
        DecodedMedia(
          id = r.id,
          byte_len = r.content.length,
          content_md5 = hexDigest,
          format = fmt,
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
