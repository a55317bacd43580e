package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** X96 PCA projection/whitening ([[Pca]]): fit invariants
  * (orthonormality, descending variance, sign-canonical determinism),
  * transform correctness against a driver-side replay, whitening's
  * unit-variance contract, and the no-shuffle transform plan.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def prng(parts: Int*): Double =
    MurmurHash3.orderedHash(parts).toDouble / Int.MaxValue.toDouble

  /** 200 vectors in dim 8 with almost all variance in two fixed
    * directions (axes 0 and 1 after a rotation), plus tiny noise.
    */
  private def fixture = {
    val dim = 8
    val d1 = Array.tabulate(dim)(i => if (i % 2 == 0) 0.5 else 0.25)
    val d2 = Array.tabulate(dim)(i => if (i % 2 == 0) 0.25 else -0.5)
    val rows = (0 until 200).map { r =>
      val a = prng(1, r) * 10
      val b = prng(2, r) * 4
      val v = Array.tabulate(dim)(i =>
        (a * d1(i) + b * d2(i) + prng(3, r, i) * 0.01).toFloat)
      (r.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("fit: orthonormal components, descending eigenvalues, concentrated variance") {
    val m = Pca.fit(fixture, "embedding", k = 3)
    assert(m.k == 3 && m.dim == 8)
    for (i <- 0 until 3; j <- 0 until 3) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val expected = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expected) < 1e-9, s"C($i)-C($j) = $dot")
    }
    assert(m.eigenvalues.sliding(2).forall { case Array(a, b) => a >= b - 1e-12 })
    // the two seeded directions carry ~all variance
    assert(m.explainedVariance.take(2).sum > 0.99,
      s"top-2 explained ${m.explainedVariance.toSeq}")
  }

  test("fit is deterministic: bit-exact on refit, ulp-stable across partitionings") {
    val a = Pca.fit(fixture, "embedding", k = 2)
    val b = Pca.fit(fixture, "embedding", k = 2)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq,
      "same input, same partitioning must refit bit-identically")
    // a different partitioning changes the Gramian tree-aggregation
    // order → ulp-level drift is expected, sign convention must hold
    val c = Pca.fit(fixture.repartition(7), "embedding", k = 2)
    a.components.zip(c.components).foreach { case (x, y) =>
      x.zip(y).foreach { case (xi, yi) =>
        assert(math.abs(xi - yi) < 1e-9, s"$xi vs $yi")
      }
    }
  }

  test("transform matches the driver-side replay exactly") {
    val df = fixture
    val m = Pca.fit(df, "embedding", k = 2)
    val got = Pca.transform(df, "embedding", m, "pca")
      .select("vec_id", "embedding", "pca")
      .as[(Long, Seq[Float], Seq[Double])].collect()
    got.take(20).foreach { case (_, vec, proj) =>
      val expected = m.components.map { c =>
        c.zip(vec).map { case (ci, xi) => ci * xi.toDouble }.sum -
          c.zip(m.mean).map { case (ci, mi) => ci * mi }.sum
      }
      proj.zip(expected).foreach { case (p, e) =>
        assert(math.abs(p - e) < 1e-9, s"$p vs $e")
      }
    }
  }

  test("whitened projection has unit variance per component") {
    val df = fixture
    val m = Pca.fit(df, "embedding", k = 2)
    val proj = Pca.transform(df, "embedding", m, "w", whiten = true)
      .select(posexplode(col("w"))).toDF("i", "v")
    val vars = proj.groupBy("i")
      .agg(var_samp(col("v")).as("var"))
      .as[(Int, Double)].collect().toMap
    assert(vars.size == 2)
    vars.values.foreach(v => assert(math.abs(v - 1.0) < 0.05, s"variance $v"))
  }

  test("transform is a pure projection — no shuffle, no UDF") {
    val m = Pca.fit(fixture, "embedding", k = 2)
    val plan = Pca.transform(fixture, "embedding", m, "pca")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"projection must stay in codegen:\n$plan")
  }

  test("whitened projection preserves nearest-neighbor structure for ANN") {
    // the reason X96 exists: brute-force top-k over the 2-dim whitened
    // projection must recover the same neighbors as over the raw
    // 8-dim vectors when the data genuinely lives in 2 directions
    val df = fixture
    val m = Pca.fit(df, "embedding", k = 2)
    val projected = Pca.transform(df, "embedding", m, "w", whiten = false)
      .select(col("vec_id"), col("w").cast("array<float>").as("w"))
    // cosine is NOT centering-invariant, so the fair raw baseline is
    // the centered vectors (the projection is an isometry on their
    // 2-direction span, so neighbors must survive)
    val meanArr = array(m.mean.map(v => lit(v.toFloat)): _*)
    val centered = df.select(
      col("vec_id"),
      zip_with(col("embedding"), meanArr, (a, b) => a - b).as("c"))
    def topIds(frame: org.apache.spark.sql.DataFrame, vecCol: String) =
      Similarity.bruteForceTopK(
          frame, frame.filter(col("vec_id") < 5), "vec_id", vecCol, 10)
        .select("qid", "nid").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val raw = topIds(centered, "c")
    val proj = topIds(projected, "w")
    // .toSeq before mapping: Set.map would dedupe equal recalls
    val recall = raw.keys.toSeq.map(q => (raw(q) & proj(q)).size.toDouble / 10).sum / raw.size
    assert(recall >= 0.9, s"projection recall $recall")
  }

  test("fit and transform accept array<double>; null elements are excluded, not zeroed") {
    val doubles = fixture.select(
      col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val m = Pca.fit(doubles, "embedding", k = 2)
    // the float-typed kernel must not reject a double input column
    assert(Pca.transform(doubles, "embedding", m, "pca").count() == 200)
    // a row with a null ELEMENT must not contribute a phantom 0.0
    val poisoned = doubles.unionByName(
      Seq((999L, Seq[java.lang.Double](1.0, null, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)))
        .toDF("vec_id", "embedding"))
    val m2 = Pca.fit(poisoned, "embedding", k = 2)
    assert(m.mean.toSeq == m2.mean.toSeq, "null-element row must be excluded from fit")
  }

  test("whitening suppresses degenerate directions instead of amplifying noise") {
    // rank-1 data: variance lives in ONE direction; the second
    // eigenvalue is ~0 and must whiten to a zero axis, not 1/sqrt(eps)
    val rank1 = (0 until 100).map { i =>
      val a = prng(9, i) * 5
      (i.toLong, Array.tabulate(8)(d => (a * (d + 1) / 8.0).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val m = Pca.fit(rank1, "embedding", k = 2)
    val w = Pca.transform(rank1, "embedding", m, "w", whiten = true)
      .select(posexplode(col("w"))).toDF("i", "v")
    val second = w.filter(col("i") === 1)
      .agg(max(abs(col("v")))).head().getDouble(0)
    assert(second == 0.0, s"degenerate axis must be suppressed, got |v| up to $second")
  }

  // ---------------------------------------------- replayable variant

  test("fitReplayable: partitioning-invariant bit-exact model (integer moments)") {
    val a = Pca.fitReplayable(fixture, "embedding", dim = 8, k = 3, iters = 24)
    val b = Pca.fitReplayable(fixture.repartition(7), "embedding", dim = 8, k = 3, iters = 24)
    // unlike fit (ulp drift across partitionings), the quantized
    // moments are integer sums — ANY physical shape is bit-identical
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
    assert(a.mean.toSeq == b.mean.toSeq)
  }

  test("fitReplayable agrees with the eigensolver fit on a strong spectrum") {
    val r = Pca.fitReplayable(fixture, "embedding", dim = 8, k = 2, iters = 24)
    val f = Pca.fit(fixture, "embedding", k = 2)
    // unit norm
    r.components.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-12, s"|v| = $n")
    }
    // mutual orthogonality via deflation
    val cross = r.components(0).zip(r.components(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(cross) < 1e-6, s"v0·v1 = $cross")
    // same principal directions as MLlib (up to sign) and same variances
    r.components.zip(f.components).foreach { case (rv, fv) =>
      val dot = rv.zip(fv).map { case (a, b) => a * b }.sum
      assert(math.abs(math.abs(dot) - 1.0) < 1e-6, s"|v_replay·v_fit| = ${math.abs(dot)}")
    }
    r.eigenvalues.zip(f.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) / b < 1e-4, s"λ $a vs $b")
    }
  }

  test("replayableWhitened: unit variance per component") {
    val m = Pca.fitReplayable(fixture, "embedding", dim = 8, k = 2, iters = 24)
    val cols = Pca.replayableWhitened(col("embedding"), m)
    val out = fixture.select(cols: _*)
    for (c <- 1 to 2) {
      val stats = out.agg(avg(col(s"pc$c")), variance(col(s"pc$c")))
        .as[(Double, Double)].head()
      assert(math.abs(stats._1) < 1e-3, s"pc$c mean ${stats._1}")
      assert(math.abs(stats._2 - 1.0) < 0.02, s"pc$c variance ${stats._2}")
    }
  }

  test("fitReplayable validates knobs and excludes null/element-null vectors") {
    intercept[IllegalArgumentException] {
      Pca.fitReplayable(fixture, "embedding", dim = 8, k = 0)
    }
    intercept[IllegalArgumentException] {
      Pca.fitReplayable(fixture, "embedding", dim = 8, k = 9)
    }
    val withNulls = fixture.unionByName(
      Seq((900L, null: Seq[java.lang.Float]),
        (901L, Seq[java.lang.Float](null) ++ Seq.fill(7)(Float.box(1f))))
        .toDF("vec_id", "embedding"))
    val clean = Pca.fitReplayable(fixture, "embedding", dim = 8, k = 2)
    val guarded = Pca.fitReplayable(withNulls, "embedding", dim = 8, k = 2)
    assert(clean.components.map(_.toSeq).toSeq == guarded.components.map(_.toSeq).toSeq)
  }

  test("jlProject: deterministic signs, norm preserved in expectation, knobs validated") {
    val cols = Pca.jlProject(col("embedding"), dim = 8, outDim = 4)
    val out = fixture.select(col("vec_id") +: cols: _*)
    val again = fixture.select(col("vec_id") +: Pca.jlProject(col("embedding"), 8, 4): _*)
    assert(out.collect().map(_.toSeq).toSeq == again.collect().map(_.toSeq).toSeq)
    // JL preserves squared norms in expectation: the corpus-average
    // ratio ||P x||^2 / ||x||^2 concentrates near 1
    val ratio = fixture.select(col("vec_id") +: (cols :+
        aggregate(org.apache.spark.sql.functions.transform(col("embedding"),
          v => v.cast("double") * v.cast("double")),
          lit(0.0), (a, x) => a + x).as("__n2")): _*)
      .withColumn("__p2",
        (0 until 4).map(j => col(s"jl${j + 1}") * col(s"jl${j + 1}")).reduce(_ + _))
      .agg(avg(col("__p2") / col("__n2"))).as[Double].head()
    assert(ratio > 0.5 && ratio < 1.5, s"avg norm ratio $ratio")
    // signs are genuinely mixed (not a constant matrix)
    val signs = for (j <- 0 until 4; i <- 0 until 8) yield Pca.jlSign(j, i)
    assert(signs.toSet == Set(1.0, -1.0))
    intercept[IllegalArgumentException] { Pca.jlProject(col("embedding"), 8, 0) }
    intercept[IllegalArgumentException] { Pca.jlProject(col("embedding"), 8, 9) }
  }

  test("fit validates k") {
    intercept[IllegalArgumentException] { Pca.fit(fixture, "embedding", 0) }
    intercept[IllegalArgumentException] { Pca.fit(fixture, "embedding", 9) }
    intercept[IllegalArgumentException] {
      Pca.transform(fixture.withColumn("pca", lit(1)), "embedding",
        Pca.fit(fixture, "embedding", 1), "pca")
    }
  }
}
