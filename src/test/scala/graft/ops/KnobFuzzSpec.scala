package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** VERDICT r19 #6 — differential KNOB fuzzing: the 200 oracle rows pin
  * one knob configuration each, so convention drift (rounding,
  * tie-breaks, boundary clamps) hides in the un-pinned corners —
  * exactly where the r17 t-closeness bugs lived. This spec randomizes
  * operator knobs with FIXED seeds (failures reproduce; no flaky
  * rotation) and cross-checks results against independent plain-Scala
  * reference implementations — the in-JVM stand-in for the DuckDB
  * side, which this offline suite cannot call (the SQL face of each
  * op is already pinned per-knob by its oracle row).
  */
class KnobFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long = 0L): Seq[A] =
    (0 until n * 4).iterator
      .flatMap(i => g.apply(Gen.Parameters.default.withSize(12), Seed(seed + i)))
      .take(n)
      .toSeq

  test("simhash banding: banded pairs == brute force under random (chunks, maxHamming, hashes)") {
    val gen = for {
      chunks <- Gen.oneOf(2, 4, 8)
      // pigeonhole guarantee holds only at maxHamming <= chunks - 1
      maxH <- Gen.choose(0, chunks - 1)
      hashes <- Gen.listOfN(24, Gen.long)
    } yield (chunks, maxH, hashes)
    samples(gen, 8).foreach { case (chunks, maxH, hs0) =>
      // plant near pairs: every 4th hash is a low-bit mutation of its
      // predecessor so some pairs actually land within the bound
      val hs = hs0.zipWithIndex.map { case (h, i) =>
        if (i % 4 == 3) hs0(i - 1) ^ ((1L << (i % 7)) | (1L << ((i * 3) % 11)))
        else h
      }
      val df = hs.zipWithIndex.map { case (h, i) => (i.toLong, h) }
        .toDF("id", "simhash")
      val banded = Dedup.simhashNearDupPairs(df, "id",
          bits = 64, chunks = chunks, maxHamming = maxH)
        .select("a", "b").as[(Long, Long)].collect().toSet
      val brute = (for {
        a <- hs.indices; b <- hs.indices if a < b
        if java.lang.Long.bitCount(hs(a) ^ hs(b)) <= maxH
      } yield (a.toLong, b.toLong)).toSet
      assert(banded == brute, s"chunks=$chunks maxH=$maxH: ${banded -- brute} / ${brute -- banded}")
    }
  }

  test("simhashIncrementPairs: min store distance == brute force under random knobs and kinds") {
    val gen = for {
      chunks <- Gen.oneOf(4, 8)
      maxH <- Gen.choose(0, chunks - 1)
      newH <- Gen.listOfN(12, Gen.zip(Gen.long, Gen.oneOf("image", "audio")))
      oldH <- Gen.listOfN(10, Gen.zip(Gen.long, Gen.oneOf("image", "audio")))
    } yield (chunks, maxH, newH, oldH)
    samples(gen, 8).foreach { case (chunks, maxH, newH0, oldH) =>
      // plant: first new rows mirror store rows with small mutations
      val newH = newH0.zipWithIndex.map { case ((h, k), i) =>
        if (i < oldH.size && i % 3 == 0)
          (oldH(i)._1 ^ (1L << (i % 5)), oldH(i)._2)
        else (h, k)
      }
      val newDf = newH.zipWithIndex
        .map { case ((h, k), i) => (i.toLong, k, h) }.toDF("id", "kind", "simhash")
      val oldDf = oldH.map { case (h, k) => (k, h) }.toDF("kind", "simhash")
      val got = Dedup.simhashIncrementPairs(newDf, oldDf, "id",
          bits = 64, chunks = chunks, maxHamming = maxH, extraKeys = Seq("kind"))
        .as[(Long, Int)].collect().toMap
      val want = newH.zipWithIndex.flatMap { case ((h, k), i) =>
        val ds = oldH.collect { case (oh, ok) if ok == k =>
          java.lang.Long.bitCount(h ^ oh) }
        val within = ds.filter(_ <= maxH)
        if (within.isEmpty) None else Some(i.toLong -> within.min)
      }.toMap
      assert(got == want, s"chunks=$chunks maxH=$maxH: got=$got want=$want")
    }
  }

  test("zOrderKey matches the plain-Scala interleave under random (columns, bits, values)") {
    def refZ(vals: Seq[Long], bits: Int): Long = {
      val n = vals.size
      (for { (v, j) <- vals.zipWithIndex; i <- 0 until bits }
        yield ((v >> i) & 1L) << (i * n + j)).sum
    }
    val gen = for {
      n <- Gen.choose(2, 4)
      bits <- Gen.choose(1, 62 / n)
      rows <- Gen.listOfN(16, Gen.listOfN(n, Gen.choose(0L, (1L << math.min(bits + 3, 40)) - 1)))
    } yield (n, bits, rows)
    samples(gen, 8).foreach { case (n, bits, rows) =>
      val mask = (1L << bits) - 1
      val df = rows.zipWithIndex.map { case (vs, i) => (i.toLong, vs) }
        .toDF("id", "vs")
      val cols = (0 until n).map(j => col("vs").getItem(j))
      val got = df.select(col("id"), Layout.zOrderKey(cols, bits).as("z"))
        .as[(Long, Long)].collect().toMap
      rows.zipWithIndex.foreach { case (vs, i) =>
        assert(got(i.toLong) == refZ(vs.map(_ & mask), bits),
          s"n=$n bits=$bits vs=$vs")
      }
    }
  }

  test("histogram bucket counts match a plain-Scala reference under random grids") {
    val gen = for {
      lo <- Gen.chooseNum(-50.0, 50.0)
      width <- Gen.chooseNum(1.0, 200.0)
      n <- Gen.choose(1, 16)
      vals <- Gen.nonEmptyListOf(Gen.option(Gen.chooseNum(-100.0, 300.0)))
    } yield (lo, lo + width, n, vals)
    samples(gen, 8).foreach { case (lo, hi, n, vals) =>
      val df = vals.map(Tuple1(_)).toDF("v")
      val got = Expectations.histogram(df, col("v"), lo, hi, n)
        .select("bucket", "n").as[(Long, Long)].collect().toMap
      // reference: floor((v-lo)*n/(hi-lo)) clamped into [0, n-1] — the
      // documented edge-conserving assignment, in the same IEEE doubles
      val want = vals.flatten
        .map(v => math.min(n - 1L, math.max(0L,
          math.floor((v - lo) * n / (hi - lo)).toLong)))
        .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
      assert(got.filter(_._2 > 0) == want.filter(_._2 > 0),
        s"grid=[$lo,$hi)x$n vals=$vals: got=$got want=$want")
    }
  }

  test("dedupNear knob sweep: exact copies always collapse, disjoint vocabularies never") {
    val gen = for {
      k <- Gen.oneOf(8, 16)
      bands <- Gen.oneOf(2, 4, 8)
      shingleN <- Gen.choose(2, 4)
      threshold <- Gen.chooseNum(0.3, 0.9)
    } yield (k, bands, shingleN, threshold)
    // two disjoint-vocabulary doc families + an exact copy per family
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "one two three four five six seven eight nine ten"
    val docs = Seq((1L, a), (2L, a), (3L, b), (4L, b)).toDF("doc_id", "text")
    samples(gen, 8).foreach { case (k, bands, shingleN, threshold) =>
      val kept = Dedup.dedupNear(docs, "text", "doc_id",
          k = k, bands = bands, shingleN = shingleN, threshold = threshold)
        .select("doc_id").as[Long].collect().toSet
      graft.CachedFrames.unpersistAll()
      assert(kept == Set(1L, 3L),
        s"k=$k bands=$bands n=$shingleN t=$threshold kept=$kept")
    }
  }

  test("chunkDocuments: stride coverage and knob bounds hold under random (chunk, overlap)") {
    val gen = for {
      chunk <- Gen.choose(2, 12)
      overlap <- Gen.choose(0, 1).flatMap(_ => Gen.choose(0, chunk - 1))
      nTok <- Gen.choose(1, 40)
    } yield (chunk, overlap, nTok)
    samples(gen, 8).foreach { case (chunk, overlap, nTok) =>
      val df = Seq((1L, Seq.fill(nTok)("w").mkString(" "))).toDF("id", "t")
      val chunks = Curation.chunkDocuments(df, "t", "id",
          chunkTokens = chunk, overlapTokens = overlap)
        .select("start_tok", "chunk_tokens").as[(Int, Int)].collect().sortBy(_._1)
      // every token covered; strides advance by chunk - overlap; no
      // chunk exceeds the knob
      val covered = chunks.flatMap { case (s, len) => s until (s + len) }.toSet
      assert(covered == (0 until nTok).toSet, s"chunk=$chunk ov=$overlap n=$nTok")
      assert(chunks.forall(_._2 <= chunk))
      chunks.map(_._1).sliding(2).foreach {
        case Array(s1, s2) => assert(s2 - s1 == chunk - overlap,
          s"stride ${s2 - s1} != ${chunk - overlap}")
        case _ =>
      }
    }
  }
}
