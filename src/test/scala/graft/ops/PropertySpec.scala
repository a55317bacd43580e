package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based pins for the operator invariants that must hold on
  * ANY input, not just the fixtures: the reference's no-new-NULLs
  * casting rule, dedup idempotence, dense-id contract, winnowing's
  * shared-substring guarantee, and stats bounds.
  *
  * Generators are sampled with fixed seeds (no scalatest-scalacheck
  * bridge in the offline cache), so runs are deterministic; each case
  * builds a DataFrame, so counts are kept small.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n * 4).iterator
      .flatMap(i => g.apply(Gen.Parameters.default.withSize(12), Seed(i.toLong)))
      .take(n)
      .toSeq

  private val word = Gen.oneOf(
    "table", "row", "scan", "join", "agg", "null", "True", "False",
    "{'a': True}", "u'free'", "None", "42", "x")
  private val text = Gen.nonEmptyListOf(word).map(_.mkString(" "))

  test("SafeCast never introduces new NULLs (the reference's core invariant)") {
    samples(Gen.nonEmptyListOf(Gen.option(word)), 8).foreach { values =>
      val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v.orNull) }
        .toDF("id", "c")
      val before = df.filter(col("c").isNull).count()
      val converted =
        SafeCast.convertColumns(df, Seq("c"), SafeCast.yelpAttributeCandidates)
      val after = converted.filter(col("c").isNull).count()
      assert(after <= before, s"cast added NULLs: $before -> $after on $values")
    }
  }

  test("dedupExact is idempotent and keeps one row per distinct text") {
    samples(Gen.nonEmptyListOf(text), 8).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val once = Dedup.dedupExact(df, "t", "id")
      assert(once.count() == texts.distinct.size.toLong)
      assert(Dedup.dedupExact(once, "t", "id").count() == once.count())
    }
  }

  test("withSequentialId assigns a dense 0..n-1 id in key order") {
    samples(Gen.nonEmptyListOf(Gen.choose(-1000L, 1000L)), 8).foreach { keys0 =>
      val keys = keys0.distinct
      val df = keys.map(Tuple1(_)).toDF("k").repartition(3)
      val got = Surrogate.withSequentialId(df, "rid", col("k"))
        .select("rid", "k").as[(Long, Long)].collect().sortBy(_._1)
      assert(got.map(_._1).toSeq == (0L until keys.size.toLong))
      assert(got.map(_._2).toSeq == keys.sorted.toSeq)
    }
  }

  test("winnowing: docs sharing a >= k+w-1 substring share a fingerprint") {
    val chunk = Gen.listOfN(14, Gen.alphaLowerChar).map(_.mkString) // >= k+w-1 = 11
    val cases = samples(Gen.zip(chunk, text, text), 8)
    cases.foreach { case (shared, a, b) =>
      val df = Seq((1L, s"$a $shared"), (2L, s"$shared $b")).toDF("id", "t")
      val fps = TextAnalysis.winnowingFingerprints(df, "id", "t", k = 8, w = 4)
        .as[(Long, Long)].collect()
      val f1 = fps.filter(_._1 == 1L).map(_._2).toSet
      val f2 = fps.filter(_._1 == 2L).map(_._2).toSet
      assert((f1 & f2).nonEmpty, s"no shared fingerprint for shared chunk '$shared'")
    }
  }

  test("stats bounds: 0 <= alpha_ratio <= 1 and n_types <= n_tokens") {
    samples(text, 10).foreach { t =>
      val row = Seq(Tuple1(t)).toDF("text")
        .select(TextAnalysis.stats(col("text")).map { case (n, c) => c.as(n) }: _*)
        .head()
      val alpha = row.getAs[Double]("alpha_ratio")
      assert(alpha >= 0.0 && alpha <= 1.0, s"alpha_ratio $alpha for '$t'")
      assert(row.getAs[Long]("n_types") <= row.getAs[Long]("n_tokens"))
    }
  }

  test("minhash signature slots agree exactly on identical texts") {
    samples(text, 6).foreach { t =>
      val df = Seq((1L, t), (2L, t)).toDF("id", "t")
      val sigs = Dedup.signatures(df, "t", "id").orderBy("id")
        .collect().map(_.getSeq[Long](1))
      assert(sigs(0) == sigs(1))
    }
  }

  test("sessionizeBatch partitions events exactly: counts conserved, session count matches a direct gap count") {
    val gapSec = 600L
    val offsets = Gen.listOfN(30, Gen.chooseNum(0L, 86400L))
    samples(offsets, 4).foreach { offs =>
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val events = offs.zipWithIndex.map { case (o, i) =>
        (i.toLong, new java.sql.Timestamp(base + o * 1000), (i % 3).toLong + 1, "e", 1.0)
      }
      val df = events.toDF("event_id", "ts", "user_id", "event_type", "value")
      val sessions = graft.streaming.EventStreams.sessionizeBatch(df, gapSeconds = gapSec)
        .select("user_id", "n_events").as[(Long, Long)].collect()
      // every event lands in exactly one session
      assert(sessions.map(_._2).sum == events.size.toLong)
      // per-user session count == 1 + number of gaps > gapSec in sorted order
      val expected = events.groupBy(_._3).map { case (u, evs) =>
        val ts = evs.map(_._2.getTime).sorted
        u -> (1 + ts.zip(ts.tail).count { case (a, b) => b - a > gapSec * 1000 })
      }
      val got = sessions.groupBy(_._1).map { case (u, ss) => u -> ss.length }
      assert(got == expected, s"sessions $got != $expected")
    }
  }

  private val vec4 = Gen.listOfN(4, Gen.chooseNum(-1.0f, 1.0f))
    .suchThat(v => v.exists(_ != 0f)).map(_.toSeq)

  test("semanticDedupPairs is a subset of the exact all-pairs near-dups on any input") {
    samples(Gen.listOfN(12, vec4), 4).foreach { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val centroids = vecs.take(3)
      val sem = Similarity.semanticDedupPairs(df, "vec_id", "embedding", centroids, 0.8)
        .select("a", "b").as[(Long, Long)].collect().toSet
      val exact = Similarity.exactNearDupPairs(df, "vec_id", "embedding", 0.8)
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(sem.subsetOf(exact), s"phantom pairs ${sem -- exact} on $vecs")
      // keep-set complement: dropped ids are exactly the pair b's
      val kept = Similarity.semanticDedup(df, "vec_id", "embedding", centroids, 0.8)
        .select("vec_id").as[Long].collect().toSet
      assert(kept == vecs.indices.map(_.toLong).toSet -- sem.map(_._2))
    }
  }
}
