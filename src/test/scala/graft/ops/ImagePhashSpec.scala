package graft.ops

import graft.SparkSpec
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** X135 — perceptual image dedup: dHash over the real imageio decode
  * plus hamming banding via [[Dedup.simhashNearDupPairs]]. Images are
  * generated in-test (BufferedImage → PNG bytes), so expectations are
  * structural: a planted near-dup lands within a few hamming bits and
  * the banded join recovers EVERY pair within the pigeonhole bound
  * that brute force finds.
  */
class ImagePhashSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic gradient-ish test image; `f` maps (x, y) → RGB. */
  private def png(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val (r, g, b) = f(x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def base(x: Int, y: Int) = ((x * 7 + y * 13) % 256, (x * 3 + y * 5) % 256, (x * 11 + y * 17) % 256)
  private def media(rows: (Long, Array[Byte])*) =
    rows.toDF("id", "content")
      .selectExpr("id", "content", "'image' AS media_type")
      .as[Multimodal.MediaRecord]

  private def hashes(rows: (Long, Array[Byte])*): Map[Long, Option[Long]] =
    Multimodal.dHash(media(rows: _*)).collect()
      .map(r => r.id -> r.phash).toMap

  test("near-dup lands within a few hamming bits; distinct image is far") {
    // Blacken two of the 72 sampled cells (36x32 → cell centers at
    // (4cx+2, 4cy+2)): luma 0 flips BOTH adjacent comparisons of each
    // touched cell (its neighbors' lumas are nonzero here), so the
    // twin lands at hamming 4 — strictly inside the banding bound.
    def neardup(x: Int, y: Int) =
      if ((x, y) == (14, 10) || (x, y) == (22, 26)) (0, 0, 0) else base(x, y)
    def distinct(x: Int, y: Int) = ((x * x + y * 3) % 256, (x + y * y) % 256, ((x * 5) ^ (y * 9)) % 256)
    val h = hashes(
      1L -> png(36, 32)(base), 2L -> png(36, 32)(neardup),
      3L -> png(36, 32)(distinct), 4L -> png(36, 32)(base))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(h(a).get ^ h(b).get)
    assert(ham(1, 4) == 0, "identical images hash identically")
    assert(ham(1, 2) > 0 && ham(1, 2) <= 4, s"planted near-dup: ${ham(1, 2)}")
    assert(ham(1, 3) > 7, s"distinct image beyond the banding threshold: ${ham(1, 3)}")
  }

  test("hash survives PNG vs BMP re-encode of the same raster") {
    val img = png(36, 32)(base)
    val reread = ImageIO.read(new java.io.ByteArrayInputStream(img))
    val out = new ByteArrayOutputStream()
    ImageIO.write(reread, "bmp", out)
    val h = hashes(1L -> img, 2L -> out.toByteArray)
    assert(h(1L).isDefined && h(1L) == h(2L),
      "container format must not move the perceptual hash")
  }

  test("banded pairs == brute-force pairs at the pigeonhole bound (exact recall)") {
    // 20 images: 10 bases, each with a near-dup twin mutated in one
    // sampled cell (≤ 2 bit flips) — banding must find every twin pair
    // brute force does, and nothing else.
    val rows = (0 until 10).flatMap { i =>
      def b(x: Int, y: Int) = ((x * 7 + y * 13 + i * 29) % 256, (x * 3 + y * 5 + i * 41) % 256, (x * 11 + y * 17 + i * 53) % 256)
      def t(x: Int, y: Int) = if ((x, y) == (18, 14)) (255, 255, 255) else b(x, y)
      Seq((i * 2L) -> png(36, 32)(b), (i * 2L + 1) -> png(36, 32)(t))
    }
    val h = hashes(rows: _*)
    val brute = (for {
      a <- h.keys; b <- h.keys if a < b
      d = java.lang.Long.bitCount(h(a).get ^ h(b).get) if d <= 7
    } yield (a, b, d)).toSet
    val fps = h.toSeq.map { case (id, ph) => (id, ph.get) }.toDF("id", "simhash")
    val banded = Dedup.simhashNearDupPairs(fps, "id", bits = 64, chunks = 8, maxHamming = 7)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2, t._3)).toSet
    assert(banded == brute, s"banded=${banded.size} brute=${brute.size}")
    assert(brute.size >= 10, "every planted twin pair is within the bound")
  }

  test("quarantine and grid validation") {
    val h = Multimodal.dHash(media(9L -> "not an image".getBytes("UTF-8"))).head()
    assert(h.width == -1 && h.height == -1 && h.phash.isEmpty)
    intercept[IllegalArgumentException] {
      Multimodal.dHash(media(1L -> png(9, 8)(base)), gridW = 1)
    }
    intercept[IllegalArgumentException] {
      Multimodal.dHash(media(1L -> png(9, 8)(base)), gridW = 9, gridH = 9)
    }
    // grid-native size: the 9x8 image IS the luma grid (ix = cx, iy = cy)
    val tiny = Multimodal.dHash(media(1L -> png(9, 8)(base))).head()
    assert(tiny.width == 9 && tiny.height == 8 && tiny.phash.isDefined)
  }
}
