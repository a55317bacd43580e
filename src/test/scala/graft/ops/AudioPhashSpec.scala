package graft.ops

import graft.SparkSpec

/** X138 — perceptual audio dedup: the 8-band × 9-cell energy
  * fingerprint over the real javax.sound PCM decode plus hamming
  * banding via [[Dedup.simhashNearDupPairs]]. The checked-in fixture
  * plants the adversarial cases (same signal re-encoded WAV↔AIFF↔AU,
  * an exact half-gain twin, an unrelated envelope); generated WAVs
  * pin the invariances the fixture can't vary freely.
  */
class AudioPhashSpec extends SparkSpec {
  import spark.implicits._

  /** Canonical 44-byte-header mono PCM WAV (the fixture generator's
    * layout): 16-bit little-endian signed, or 8-bit unsigned. */
  private def wav(samples: Seq[Int], bits: Int = 16, rate: Int = 8000): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(44 + samples.size * (bits / 8))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val blockAlign = bits / 8
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.size * blockAlign)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * blockAlign)
      .putShort(blockAlign.toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(samples.size * blockAlign)
    samples.foreach { s =>
      if (bits == 16) bb.putShort(s.toShort)
      else bb.put(((s / 256) + 128).toByte) // canonical lattice: s is a ×256 multiple
    }
    bb.array()
  }

  private def media(rows: (Long, Array[Byte])*) =
    rows.toDF("id", "content")
      .selectExpr("id", "content", "'audio' AS media_type")
      .as[Multimodal.MediaRecord]

  private def hashes(rows: (Long, Array[Byte])*): Map[Long, Option[Long]] =
    Multimodal.audioFingerprint(media(rows: _*)).collect()
      .map(r => r.id -> r.phash).toMap

  /** The fixture generator's staircase signal (tools/
    * make_audio_fixture.py `melody`): multiples of 4 so half-gain
    * re-encodes stay integral. */
  private def melody(n: Int, amps: Seq[Int], period: Int): Seq[Int] =
    (0 until n).map { i =>
      val b = math.min(i * amps.size / n, amps.size - 1)
      val saw = (i * 7) % period - period / 2
      math.max(-32768, math.min(32767, amps(b) * saw * 4))
    }

  test("fixture plants pair as designed: cross-container + half-gain at hamming 0, unrelated far") {
    val fx = spark.read.json("/root/repo/fixtures/audio.ndjson")
    val fps = Multimodal.audioFingerprint(
      Multimodal.ingestBase64(fx, "id", "b64", "audio")
        .as[Multimodal.MediaRecord]).collect()
      .map(r => r.id -> r).toMap
    def ham(a: Long, b: Long) =
      java.lang.Long.bitCount(fps(a).phash.get ^ fps(b).phash.get)
    assert(ham(1, 6) == 0, "WAV vs AIFF re-encode of the same PCM")
    assert(ham(2, 7) == 0, "stereo WAV vs AIFF (channel 0 only)")
    assert(ham(4, 9) == 0, "8-bit unsigned WAV vs 8-bit signed AU")
    assert(ham(10, 11) == 0, "exact half-gain twin (scale-invariant energies)")
    assert(ham(10, 12) > 7, s"unrelated envelope beyond the band: ${ham(10, 12)}")
    assert(ham(11, 12) > 7)
    assert(fps(5L).phash.isEmpty && fps(5L).n_frames == -1, "non-audio quarantines")
    assert(fps(1L).n_frames == 1600 && fps(10L).n_frames == 900)
  }

  test("bit-depth re-encode on the canonical lattice is hash-identical (16-bit vs 8-bit)") {
    val a = melody(900, Seq(1, 5, 2, 8, 3, 13, 1, 9, 6), 50)
    // ×256-lattice version of the same envelope, exactly representable at 8 bits
    val lat = a.map(s => (s / 256) * 256)
    val only8 = lat.map(identity)
    val h = hashes(1L -> wav(lat, bits = 16), 2L -> wav(only8, bits = 8))
    assert(h(1L).isDefined && h(1L) == h(2L),
      "bit depth must not move the perceptual hash on the shared lattice")
  }

  test("banded pairs == brute-force pairs at the pigeonhole bound (exact recall)") {
    val fx = spark.read.json("/root/repo/fixtures/audio.ndjson")
    val h = Multimodal.audioFingerprint(
      Multimodal.ingestBase64(fx, "id", "b64", "audio")
        .as[Multimodal.MediaRecord]).collect()
      .filter(_.phash.isDefined).map(r => r.id -> r.phash.get).toMap
    val brute = (for {
      a <- h.keys; b <- h.keys if a < b
      d = java.lang.Long.bitCount(h(a) ^ h(b)) if d <= 7
    } yield (a, b, d)).toSet
    val fps = h.toSeq.toDF("id", "simhash")
    val banded = Dedup.simhashNearDupPairs(fps, "id", bits = 64, chunks = 8, maxHamming = 7)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2, t._3)).toSet
    assert(banded == brute, s"banded=$banded brute=$brute")
    assert(brute.map(p => (p._1, p._2)).intersect(
      Set((1L, 6L), (2L, 7L), (4L, 9L), (10L, 11L))).size == 4,
      "every planted re-encode pair is recovered")
  }

  test("quarantine and grid validation") {
    val bad = hashes(9L -> "not audio at all".getBytes("UTF-8"))
    assert(bad(9L).isEmpty)
    // decodable but shorter than the time grid: quarantined, not garbage
    val short = hashes(1L -> wav(Seq(256, -512, 768, 1024, -256)))
    assert(short(1L).isEmpty)
    intercept[IllegalArgumentException] {
      Multimodal.audioFingerprint(media(1L -> wav(melody(100, Seq(1, 2), 10))), gridT = 1)
    }
    intercept[IllegalArgumentException] {
      Multimodal.audioFingerprint(media(1L -> wav(melody(100, Seq(1, 2), 10))), gridT = 10, bands = 8)
    }
  }
}
