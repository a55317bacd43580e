package graft.tools

/** Dev-only fixture generator (run once; the output ndjson is checked
  * in): writes `fixtures/gifs.ndjson` — animated + still GIFs built
  * with ImageIO's sequence writer, plus one non-image quarantine row.
  * JVM-side counterpart of `tools/make_images_fixture.py` (the GIF
  * writer lives in javax.imageio, not in the Python stdlib).
  *
  * Each line: `{"id": N, "b64": "...", "n_frames": K}` where
  * `n_frames` is the frame count the WRITER emitted — generator ground
  * truth that the q_gif_frames oracle uses; the engine must recover
  * the same count independently via `ImageReader.getNumImages`.
  * Logical-screen width/height are NOT recorded: the oracle parses
  * them from the GIF header bytes in the payload itself.
  *
  * Run: `sbt "Test/runMain graft.tools.MakeGifFixture"`.
  */
object MakeGifFixture {

  /** Animated GIF with per-frame-varying pixel content (same writer
    * recipe as MultimodalSpec.makeAnimatedGif). */
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
        img.setRGB(x, y, ((x + y + f * 40) % 256) << 16 | ((x * 5 + f * 11) % 256))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val rows: Seq[(Long, Array[Byte], Int)] = Seq(
      (0L, makeAnimatedGif(5, 4, 6), 6),   // more frames than maxFrames → equal-spacing
      (1L, makeAnimatedGif(9, 7, 3), 3),   // fewer frames than maxFrames → all frames
      (2L, makeAnimatedGif(8, 8, 1), 1),   // still GIF → one frame
      (3L, "definitely not an image".getBytes("UTF-8"), 0)) // quarantine row
    val enc = java.util.Base64.getEncoder
    val lines = rows.map { case (id, bytes, n) =>
      s"""{"id": $id, "b64": "${enc.encodeToString(bytes)}", "n_frames": $n}"""
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("fixtures/gifs.ndjson"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    println(s"wrote ${rows.size} rows to fixtures/gifs.ndjson")
  }
}
