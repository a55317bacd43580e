package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** X103 product quantization ([[Pq]]): codes are valid and
  * deterministic, encoding is the exact subspace argmin, trained
  * codebooks reconstruct better than the stand-in quantizer, ADC
  * recalls brute force on a clustered corpus, and the whole path is
  * shuffle-free where it claims to be.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def prng(parts: Int*): Float =
    MurmurHash3.orderedHash(parts).toFloat / Int.MaxValue.toFloat

  private val dim = 16

  private def clustered(nClusters: Int, perCluster: Int) = {
    val centers = Array.tabulate(nClusters, dim)((c, d) => prng(1, c, d) * 10f)
    val rows = for {
      c <- 0 until nClusters
      m <- 0 until perCluster
    } yield {
      val id = (c * perCluster + m).toLong
      (id, Array.tabulate(dim)(d => centers(c)(d) + prng(2, id.toInt, d) * 0.1f).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def collectVecs(df: org.apache.spark.sql.DataFrame): Map[Long, Array[Double]] =
    df.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  /** Driver replay of the subspace argmin — the authority encode. */
  private def encodeRef(v: Array[Double], model: Pq.PqModel): Array[Int] =
    Array.tabulate(model.m) { s =>
      val sub = v.slice(s * model.dsub, (s + 1) * model.dsub)
      val d2 = model.codebooks(s).map { c =>
        c.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum
      }
      d2.indexOf(d2.min)
    }

  test("encode matches the driver-side subspace argmin exactly; NULL shapes encode NULL") {
    val corpus = clustered(4, 10)
    val model = Pq.train(corpus, "vec_id", "embedding", dim, m = 4, ksub = 4, iters = 2)
    val vecs = collectVecs(corpus)
    val got = Pq.encode(corpus, "embedding", model)
      .select("vec_id", "pq_codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    assert(got.size == 40)
    vecs.foreach { case (id, v) =>
      assert(got(id).sameElements(encodeRef(v, model)), s"vec $id")
    }
    // codes are always in range
    assert(got.values.forall(_.forall(c => c >= 0 && c < model.ksub)))
    // NULL vector and element-NULL vector both encode to NULL
    val bad = Seq(
      (100L, null: Seq[java.lang.Float]),
      (101L, Seq[java.lang.Float](null) ++ Seq.fill(dim - 1)(Float.box(1f))))
      .toDF("vec_id", "embedding")
    val badCodes = Pq.encode(bad, "embedding", model)
      .select("pq_codes").collect()
    assert(badCodes.forall(_.isNullAt(0)))
  }

  test("training is deterministic and reconstructs better than the lowest-id stand-in") {
    val corpus = clustered(6, 20)
    val a = Pq.train(corpus, "vec_id", "embedding", dim, m = 4, ksub = 8, iters = 3)
    val b = Pq.train(corpus, "vec_id", "embedding", dim, m = 4, ksub = 8, iters = 3)
    assert(a.codebooks.flatten.flatten.toSeq == b.codebooks.flatten.flatten.toSeq)

    val standIn = Pq.lowestIdCodebooks(corpus, "vec_id", "embedding", dim, m = 4, ksub = 8)
    val vecs = collectVecs(corpus).values.toSeq
    def mse(model: Pq.PqModel): Double = {
      val errs = vecs.map { v =>
        val codes = encodeRef(v, model)
        (0 until model.m).map { s =>
          val c = model.codebooks(s)(codes(s))
          val sub = v.slice(s * model.dsub, (s + 1) * model.dsub)
          c.zip(sub).map { case (x, y) => (x - y) * (x - y) }.sum
        }.sum
      }
      errs.sum / errs.size
    }
    assert(mse(a) < mse(standIn),
      s"trained MSE ${mse(a)} should beat stand-in ${mse(standIn)}")
  }

  test("ADC approximates the true inner product and preserves the true neighborhood") {
    val corpus = clustered(6, 20)
    val model = Pq.train(corpus, "vec_id", "embedding", dim, m = 8, ksub = 16, iters = 3)
    val codes = Pq.encode(corpus, "embedding", model)
      .select("vec_id", "pq_codes")
    val queries = corpus.filter(col("vec_id") < 5)
    val got = Pq.adcTopK(codes, queries, "vec_id", "embedding", model, k = 3)
      .collect().map(r =>
        (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
          r.getAs[Long]("nid"), r.getAs[Double]("adc")))
    assert(got.length == 15) // 5 queries × k=3, self excluded
    // ADC ≈ true dot: the quantization residual on this tight fixture
    // is small relative to the ~100-scale dots
    val vecs = collectVecs(corpus)
    got.foreach { case (q, _, n, adc) =>
      val truth = vecs(q).zip(vecs(n)).map { case (a, b) => a * b }.sum
      assert(math.abs(adc - truth) / math.abs(truth) < 0.05,
        s"adc $adc vs true $truth for ($q, $n)")
    }
    // The PQ contract is NEIGHBORHOOD preservation, not tie-order
    // preservation: within a tight cluster the true dots are
    // noise-level near-ties that the quantization residual may
    // legitimately reorder. So pin (a) every top-10 neighbor comes
    // from the query's true cluster (perfect coarse recall) and
    // (b) rank 1's true dot is within 5% of the true best.
    val topk = Pq.adcTopK(codes, queries, "vec_id", "embedding", model, k = 10)
      .select("qid", "rank", "nid").as[(Long, Int, Long)].collect()
    topk.foreach { case (q, _, n) =>
      assert(n / 20 == q / 20, s"neighbor $n left query $q's cluster")
    }
    topk.filter(_._2 == 1).foreach { case (q, _, n) =>
      def dot(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => x * y }.sum
      val best = vecs.collect {
        case (id, v) if id != q => dot(vecs(q), v)
      }.max
      assert(dot(vecs(q), vecs(n)) >= best * 0.95,
        s"rank-1 for $q is ${dot(vecs(q), vecs(n))} vs true best $best")
    }
  }

  test("encode and ADC scoring are shuffle-free projections (plan pins)") {
    val corpus = clustered(4, 10)
    val model = Pq.lowestIdCodebooks(corpus, "vec_id", "embedding", dim, m = 4, ksub = 4)
    val encoded = Pq.encode(corpus, "embedding", model)
    val encodePlan = encoded.queryExecution.executedPlan.toString
    assert(!encodePlan.contains("Exchange"), s"encode must not shuffle:\n$encodePlan")
    // ADC joins the code table to a BROADCAST query side — no
    // shuffle on the corpus until the bounded rank window
    val plan = Pq.adcTopK(encoded.select("vec_id", "pq_codes"),
        corpus.filter(col("vec_id") < 2), "vec_id", "embedding", model, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query side must broadcast:\n$plan")
  }

  // ---- IVF-PQ -------------------------------------------------------

  /** One true cluster center per cell — the honest coarse quantizer
    * for this fixture (member 0 of each cluster).
    */
  private def clusterHeads(corpus: org.apache.spark.sql.DataFrame, nClusters: Int, perCluster: Int): Seq[Seq[Float]] =
    corpus.filter(col("vec_id") % perCluster === 0).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0)).toSeq

  test("IVF-PQ: cells track clusters and the residual replays the exact float cast") {
    val corpus = clustered(6, 20)
    val cents = clusterHeads(corpus, 6, 20)
    val cm = cents.map(_.map(_.toDouble).toArray).toArray
    val got = Pq.withCellAndResidual(corpus, "embedding", cents)
      .select("vec_id", "ivf_cell", "__res").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray)).toList
    val vecs = collectVecs(corpus)
    got.foreach { case (id, cell, res) =>
      assert(cell == (id / 20).toInt, s"vec $id assigned to cell $cell")
      // exact replay: float(double(x_i) − c_i)
      val expect = Array.tabulate(dim)(d => (vecs(id)(d) - cm(cell)(d)).toFloat)
      assert(res.sameElements(expect), s"residual mismatch for vec $id")
    }
    // NULL-shape vectors get NULL cell (and therefore NULL codes)
    val bad = Seq((100L, null: Seq[java.lang.Float])).toDF("vec_id", "embedding")
    val model = Pq.lowestIdResidualCodebooks(corpus, "vec_id", "embedding", cents, dim, m = 4, ksub = 4)
    assert(Pq.encodeIvf(bad, "embedding", cents, model).select("pq_codes")
      .collect().forall(_.isNullAt(0)))
  }

  test("IVF-PQ: residual quantization reconstructs strictly better than raw PQ") {
    val corpus = clustered(6, 20)
    val cents = clusterHeads(corpus, 6, 20)
    val cm = cents.map(_.map(_.toDouble).toArray).toArray
    val raw = Pq.train(corpus, "vec_id", "embedding", dim, m = 4, ksub = 4, iters = 2)
    val res = Pq.trainResidual(corpus, "vec_id", "embedding", cents, dim, m = 4, ksub = 4, iters = 2)
    val vecs = collectVecs(corpus)
    def recon(model: Pq.PqModel, v: Array[Double]): Array[Double] = {
      val codes = encodeRef(v, model)
      (0 until model.m).flatMap(s => model.codebooks(s)(codes(s))).toArray
    }
    def err(xs: Seq[(Array[Double], Array[Double])]): Double =
      xs.map { case (a, b) => a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum }.sum / xs.size
    val rawErr = err(vecs.values.toSeq.map(v => (v, recon(raw, v))))
    val resErr = err(vecs.toSeq.map { case (id, v) =>
      val c = cm((id / 20).toInt)
      val residual = Array.tabulate(dim)(d => (v(d) - c(d)).toFloat.toDouble)
      (v, c.zip(recon(res, residual)).map { case (x, y) => x + y })
    })
    assert(resErr < rawErr * 0.5,
      s"residual MSE $resErr should be well under raw MSE $rawErr")
  }

  test("IVF-PQ: ADC over probed cells preserves the true neighborhood") {
    val corpus = clustered(6, 20)
    val cents = clusterHeads(corpus, 6, 20)
    val model = Pq.trainResidual(corpus, "vec_id", "embedding", cents, dim, m = 8, ksub = 16, iters = 3)
    val queries = corpus.filter(col("vec_id") < 5)
    val got = Pq.ivfAdcTopK(corpus, queries, "vec_id", "embedding", cents, model, nProbe = 2, k = 10)
      .collect().map(r =>
        (r.getAs[Long]("qid"), r.getAs[Int]("rank"), r.getAs[Long]("nid"), r.getAs[Double]("adc")))
    assert(got.length == 50)
    val vecs = collectVecs(corpus)
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    got.foreach { case (q, _, n, adc) =>
      // candidates stay in the probed (true) cluster and ADC tracks the true dot
      assert(n / 20 == q / 20, s"neighbor $n left query $q's cluster")
      val truth = dot(vecs(q), vecs(n))
      assert(math.abs(adc - truth) / math.abs(truth) < 0.05, s"adc $adc vs true $truth")
    }
    got.filter(_._2 == 1).foreach { case (q, _, n, _) =>
      val best = vecs.collect { case (id, v) if id != q => dot(vecs(q), v) }.max
      assert(dot(vecs(q), vecs(n)) >= best * 0.95)
    }
  }

  test("IVF-PQ plan pins: encode is shuffle-free, scoring is a broadcast hash join on cell") {
    val corpus = clustered(4, 10)
    val cents = clusterHeads(corpus, 4, 10)
    val model = Pq.lowestIdResidualCodebooks(corpus, "vec_id", "embedding", cents, dim, m = 4, ksub = 4)
    val encodePlan = Pq.encodeIvf(corpus, "embedding", cents, model)
      .queryExecution.executedPlan.toString
    assert(!encodePlan.contains("Exchange"), s"encodeIvf must not shuffle:\n$encodePlan")
    val q = Pq.ivfAdcTopK(corpus, corpus.filter(col("vec_id") < 2),
      "vec_id", "embedding", cents, model, nProbe = 2, k = 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"cell join must broadcast-hash:\n$plan")
    // the corpus side of the scoring join never carries the raw vectors
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"no all-pairs join:\n$plan")
  }

  test("codegen'd ADC sum is bit-identical to the composed fold, NULL on corrupt codes") {
    val corpus = clustered(4, 10)
    val model = Pq.train(corpus, "vec_id", "embedding", dim, m = 4, ksub = 4, iters = 2)
    val codes = Pq.encode(corpus, "embedding", model)
    val luts = array((0 until model.m).map(s =>
      graft.functions.MatVecDotsExpr.matVecDots(
        Pq.subVec(col("embedding"), s, model.dsub), model.codebooks(s))): _*)
    val both = codes
      .withColumn("fast", Pq.adcFold(col("pq_codes"), luts))
      .withColumn("slow", Pq.adcFoldComposed(col("pq_codes"), luts))
      .select("fast", "slow").collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1), s"$r"))
    // corrupted store rows score NULL in both forms — never a silent
    // partial score that could rank in top-k: out-of-range code,
    // TRUNCATED codes array, and a NULL code element
    val corruptions = Seq(
      ("out-of-range", concat(slice(col("pq_codes"), 1, model.m - 1), array(lit(99)))),
      ("truncated", slice(col("pq_codes"), 1, model.m - 1)),
      ("null element", concat(slice(col("pq_codes"), 1, model.m - 1),
        array(lit(null).cast("int")))))
    corruptions.foreach { case (label, corruptCodes) =>
      val c = codes.withColumn("pq_codes", corruptCodes)
        .withColumn("fast", Pq.adcFold(col("pq_codes"), luts))
        .withColumn("slow", Pq.adcFoldComposed(col("pq_codes"), luts))
        .select("fast", "slow").collect()
      c.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1), s"$label: $r"))
    }
  }

  test("lowestIdCodebooks skips NULL/element-NULL vectors among the lowest ids") {
    // ANN-family convention: a degenerate vector in the id prefix is
    // excluded (as in train/lowestIdResidualCodebooks), not NPE'd.
    val corpus = clustered(2, 4)
    val poisoned = Seq(
      (-2L, null: Seq[java.lang.Float]),
      (-1L, Seq[java.lang.Float](null) ++ Seq.fill(dim - 1)(Float.box(1f))))
      .toDF("vec_id", "embedding")
      .unionByName(corpus.select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding")))
    val clean = Pq.lowestIdCodebooks(corpus, "vec_id", "embedding", dim, m = 4, ksub = 4)
    val fromPoisoned =
      Pq.lowestIdCodebooks(poisoned, "vec_id", "embedding", dim, m = 4, ksub = 4)
    assert(fromPoisoned.codebooks.flatten.flatten.toSeq ==
      clean.codebooks.flatten.flatten.toSeq)
  }

  test("knob validation") {
    val corpus = clustered(2, 4)
    intercept[IllegalArgumentException] {
      Pq.lowestIdCodebooks(corpus, "vec_id", "embedding", dim, m = 5, ksub = 4)
    }
    intercept[IllegalArgumentException] {
      Pq.train(corpus, "vec_id", "embedding", dim, m = 4, ksub = 1)
    }
    intercept[IllegalArgumentException] {
      val model = Pq.lowestIdCodebooks(corpus, "vec_id", "embedding", dim, m = 4, ksub = 4)
      Pq.adcTopK(corpus, corpus, "vec_id", "embedding", model, k = 0)
    }
    intercept[IllegalArgumentException] {
      val cents = clusterHeads(corpus, 2, 4)
      val model = Pq.lowestIdResidualCodebooks(corpus, "vec_id", "embedding", cents, dim, m = 4, ksub = 4)
      Pq.ivfAdcTopK(corpus, corpus, "vec_id", "embedding", cents, model, nProbe = 3, k = 1)
    }
  }
}
