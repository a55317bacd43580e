package graft.ops

import graft.SparkSpec
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("ingestUtf8 produces BinaryType content with exact bytes") {
    val df = Seq((1L, "héllo")).toDF("doc_id", "text")
    val media = Multimodal.ingestUtf8(df, "doc_id", "text", "text/plain")
    assert(media.schema("content").dataType.typeName == "binary")
    val bytes = media.head().getAs[Array[Byte]]("content")
    assert(bytes.sameElements("héllo".getBytes(StandardCharsets.UTF_8)))
  }

  test("ingestBase64 round-trips payload bytes") {
    val payload = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0x01)
    val b64 = java.util.Base64.getEncoder.encodeToString(payload)
    val media = Multimodal.ingestBase64(
      Seq((7L, b64)).toDF("id", "data"), "id", "data", "image/jpeg")
    assert(media.head().getAs[Array[Byte]]("content").sameElements(payload))
  }

  test("sniffFormat recognizes magic bytes (expr and stub agree)") {
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d)
    val riff = "RIFFxxxx".getBytes(StandardCharsets.US_ASCII)
    val txt = "plain".getBytes(StandardCharsets.UTF_8)
    val df = Seq((1L, jpeg), (2L, png), (3L, riff), (4L, txt)).toDF("id", "content")
    val viaExpr = df.select(col("id"), Multimodal.sniffFormat(col("content")).as("f"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(viaExpr == Seq((1L, "jpeg"), (2L, "png"), (3L, "riff"), (4L, "bin")))
    val viaStub = Multimodal.decodeStub(
        df.withColumn("media_type", lit("x")).as[Multimodal.MediaRecord])
      .select("id", "format").orderBy("id").as[(Long, String)].collect().toSeq
    assert(viaStub == viaExpr)
  }

  test("decodeStub is deterministic, md5-faithful, and dimension-bounded") {
    val df = Seq((1L, "some content"), (2L, "other content")).toDF("doc_id", "text")
    val decoded = Multimodal.decodeDocuments(spark, df, "doc_id", "text")
      .orderBy("id").collect()
    val md = MessageDigest.getInstance("MD5")
    val expectMd5 = md.digest("some content".getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    assert(decoded(0).content_md5 == expectMd5)
    assert(decoded(0).byte_len == "some content".length)
    decoded.foreach { d =>
      assert(d.width >= 16 && d.width < 256)
      assert(d.height >= 16 && d.height < 256)
    }
    val again = Multimodal.decodeDocuments(spark, df, "doc_id", "text")
      .orderBy("id").collect()
    assert(decoded.toSeq == again.toSeq)
  }

  test("frameSampleStub fans out n deterministic frames per media item") {
    import spark.implicits._
    val media = Multimodal.ingestUtf8(
      Seq((1L, "x" * 600), (2L, "short")).toDF("doc_id", "text"),
      "doc_id", "text", "video/fake").as[Multimodal.MediaRecord]
    val frames = Multimodal.frameSampleStub(media, nFrames = 4, frameBytes = 64)
      .collect().groupBy(_.id)
    assert(frames(1L).length == 4)
    assert(frames(1L).map(_.frame_index).sorted.sameElements(0 until 4))
    assert(frames(1L).forall(_.frame_bytes == 64))
    // offsets are equal-spaced over the payload
    assert(frames(1L).map(_.frame_offset).sorted.sameElements(Seq(0L, 150L, 300L, 450L)))
    // short payloads yield a single whole-content frame
    assert(frames(2L).length == 1 && frames(2L).head.frame_bytes == 5)
    val again = Multimodal.frameSampleStub(media, 4, 64).collect().groupBy(_.id)
    assert(again(1L).map(_.frame_md5).toSet == frames(1L).map(_.frame_md5).toSet)
  }

  test("resizeStub bounds payload size and stamps the target dims") {
    import spark.implicits._
    val media = Multimodal.ingestUtf8(
      Seq((1L, "y" * 5000)).toDF("doc_id", "text"),
      "doc_id", "text", "image/fake").as[Multimodal.MediaRecord]
    val resized = Multimodal.resizeStub(media, 64, 64).head()
    assert(resized.content.length <= 64 * 64 / 8)
    assert(new String(resized.content.take(10), "UTF-8").startsWith("RSZ:64x64:"))
  }

  // ---- real javax.imageio decode ---------------------------------------

  /** Encode a deterministic gradient image via ImageIO. */
  private def makeImage(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 7 + y * 13) % 256) << 16 | ((x * 3) % 256) << 8 | (y % 256))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  private def mediaOf(rows: (Long, Array[Byte])*) = {
    import spark.implicits._
    rows.toSeq.map { case (id, bytes) => Multimodal.MediaRecord(id, bytes, "image") }
      .toDS()
  }

  test("decodeImage really decodes PNG/GIF/BMP dims; non-images quarantine to -1") {
    val decoded = Multimodal.decodeImage(mediaOf(
      1L -> makeImage(37, 21, "png"),
      2L -> makeImage(5, 9, "gif"),
      3L -> makeImage(12, 4, "bmp"),
      4L -> "definitely not an image".getBytes("UTF-8"),
      5L -> (Array[Byte](0x89.toByte, 'P', 'N', 'G') ++ Array.fill[Byte](16)(0))))
      .collect().map(d => d.id -> d).toMap
    assert((decoded(1L).width, decoded(1L).height) == (37, 21))
    assert(decoded(1L).format == "png")
    assert((decoded(2L).width, decoded(2L).height) == (5, 9))
    assert((decoded(3L).width, decoded(3L).height) == (12, 4))
    // non-image and truncated-PNG rows quarantine instead of failing the task
    assert((decoded(4L).width, decoded(4L).height) == (-1, -1))
    assert(decoded(4L).format == "bin")
    assert((decoded(5L).width, decoded(5L).height) == (-1, -1))
    assert(decoded(5L).format == "png") // sniff still sees the magic bytes
  }

  test("resizeImage produces a real PNG at the target dims; non-images pass through") {
    val payload = "not an image".getBytes("UTF-8")
    val resized = Multimodal.resizeImage(
      mediaOf(1L -> makeImage(40, 30, "png"), 2L -> payload), 8, 8)
      .collect().map(r => r.id -> r).toMap
    val redecoded = Multimodal.decodeImage(mediaOf(1L -> resized(1L).content)).head()
    assert((redecoded.width, redecoded.height) == (8, 8))
    assert(redecoded.format == "png")
    assert(resized(2L).content.sameElements(payload))
  }

  /** Animated GIF via ImageIO's sequence writer. */
  private def makeAnimatedGif(w: Int, h: Int, frames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until frames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x + y + f * 40) % 256) << 16)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  test("sampleImageFrames decodes real GIF frames; stills yield one frame") {
    val frames = Multimodal.sampleImageFrames(mediaOf(
      1L -> makeAnimatedGif(6, 4, 3),
      2L -> makeImage(10, 8, "png"),
      3L -> "junk".getBytes("UTF-8")), maxFrames = 4)
      .collect().groupBy(_.id)
    assert(frames(1L).map(_.frame_index).sorted.sameElements(Seq(0, 1, 2)))
    assert(frames(1L).forall(f => f.width == 6 && f.height == 4))
    // frames have different pixel content → different fingerprints
    assert(frames(1L).map(_.pixel_md5).distinct.length == 3)
    assert(frames(2L).length == 1 && frames(2L).head.width == 10)
    assert(!frames.contains(3L)) // undecodable yields no rows
  }

  test("sampleImageFrames equal-spaces when frames exceed maxFrames") {
    val frames = Multimodal.sampleImageFrames(
      mediaOf(1L -> makeAnimatedGif(4, 4, 6)), maxFrames = 3).collect()
    assert(frames.map(_.frame_index).sorted.sameElements(Seq(0, 2, 4)))
  }

  test("decodeImage matches the checked-in fixture oracle expectations") {
    import spark.implicits._
    val media = Multimodal.ingestBase64(
      spark.read.json("/root/repo/fixtures/images.ndjson"), "id", "b64", "image")
      .as[Multimodal.MediaRecord]
    val d = Multimodal.decodeImage(media).collect().map(x => x.id -> x).toMap
    assert((d(1L).width, d(1L).height) == (37, 21))
    assert((d(2L).width, d(2L).height) == (1, 1))
    assert((d(3L).width, d(3L).height) == (128, 3))
    assert((d(4L).width, d(4L).height) == (255, 17))
    assert((d(5L).width, d(5L).height) == (64, 48))
    assert((d(6L).width, d(6L).height, d(6L).format) == (-1, -1, "bin"))
  }

  /** Encode a deterministic PCM WAV via javax.sound itself. */
  private def makeWav(rate: Float, channels: Int, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
    val data = Array.tabulate(frames * channels * 2)(i => (i % 251).toByte)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      in, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeAudio really reads WAV format metadata; non-audio quarantines") {
    val decoded = Multimodal.decodeAudio(mediaOf(
      1L -> makeWav(8000f, 1, 1600),
      2L -> makeWav(44100f, 2, 441),
      3L -> "definitely not audio".getBytes("UTF-8")))
      .collect().map(d => d.id -> d).toMap
    assert(decoded(1L).sample_rate == 8000 && decoded(1L).channels == 1)
    assert(decoded(1L).bits_per_sample == 16 && decoded(1L).n_frames == 1600L)
    assert(decoded(1L).duration_ms == 200.0)
    assert(decoded(2L).sample_rate == 44100 && decoded(2L).channels == 2)
    assert(decoded(2L).n_frames == 441L && decoded(2L).duration_ms == 10.0)
    assert(decoded(1L).format == "riff" && decoded(2L).format == "riff")
    assert((decoded(3L).sample_rate, decoded(3L).n_frames, decoded(3L).duration_ms)
      == (-1, -1L, -1.0))
    assert(decoded(3L).format == "bin")
  }

  test("decodeAudio matches the checked-in fixture oracle expectations") {
    import spark.implicits._
    val media = Multimodal.ingestBase64(
      spark.read.json("/root/repo/fixtures/audio.ndjson"), "id", "b64", "audio")
      .as[Multimodal.MediaRecord]
    val d = Multimodal.decodeAudio(media).collect().map(x => x.id -> x).toMap
    assert((d(1L).sample_rate, d(1L).channels, d(1L).bits_per_sample, d(1L).n_frames)
      == (8000, 1, 16, 1600L))
    assert((d(2L).sample_rate, d(2L).channels, d(2L).bits_per_sample, d(2L).n_frames)
      == (44100, 2, 16, 441L))
    assert((d(3L).sample_rate, d(3L).channels, d(3L).bits_per_sample, d(3L).n_frames)
      == (11025, 1, 8, 500L))
    assert(d(3L).duration_ms == 45.351)
    assert((d(4L).sample_rate, d(4L).channels, d(4L).bits_per_sample, d(4L).n_frames)
      == (22050, 2, 8, 123L))
    assert((d(5L).sample_rate, d(5L).n_frames, d(5L).format) == (-1, -1L, "bin"))
    // AIFF rows: big-endian COMM metadata, sniffed as 'aiff'
    assert((d(6L).sample_rate, d(6L).channels, d(6L).bits_per_sample,
      d(6L).n_frames, d(6L).format) == (8000, 1, 16, 1600L, "aiff"))
    assert((d(7L).sample_rate, d(7L).channels, d(7L).n_frames, d(7L).duration_ms)
      == (22050, 2, 441L, 20.0))
    // AU rows: .snd header, encodings 3 (16-bit) and 2 (8-bit)
    assert((d(8L).sample_rate, d(8L).channels, d(8L).bits_per_sample,
      d(8L).n_frames, d(8L).format) == (16000, 1, 16, 800L, "au"))
    assert((d(9L).sample_rate, d(9L).channels, d(9L).bits_per_sample,
      d(9L).n_frames, d(9L).duration_ms) == (8000, 2, 8, 123L, 15.375))
  }

  test("decode is narrow: partition count is preserved (no shuffle)") {
    val df = Seq.tabulate(8)(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .repartition(3)
    val media = Multimodal.ingestUtf8(df, "doc_id", "text", "text/plain")
    import spark.implicits._
    val decoded = Multimodal.decodeStub(media.as[Multimodal.MediaRecord])
    assert(decoded.rdd.getNumPartitions == 3)
  }
}
