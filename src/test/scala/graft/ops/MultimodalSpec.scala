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

  test("decode is narrow: partition count is preserved (no shuffle)") {
    val df = Seq.tabulate(8)(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .repartition(3)
    val media = Multimodal.ingestUtf8(df, "doc_id", "text", "text/plain")
    import spark.implicits._
    val decoded = Multimodal.decodeStub(media.as[Multimodal.MediaRecord])
    assert(decoded.rdd.getNumPartitions == 3)
  }
}
