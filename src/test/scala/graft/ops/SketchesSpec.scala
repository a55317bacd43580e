package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct is exact below k and within error above k") {
    val small = (1 to 30).map(i => ("g1", s"v$i")).toDF("g", "v")
    val exact = Sketches.kmvDistinct(small, Seq("g"), $"v", k = 64)
      .select($"n_kept", $"est_distinct").as[(Long, Double)].head()
    assert(exact == ((30L, 30.0))) // below k: exact count

    val big = (1 to 5000).map(i => ("g1", s"v$i")).toDF("g", "v")
    val est = Sketches.kmvDistinct(big, Seq("g"), $"v", k = 256)
      .select($"est_distinct").as[Double].head()
    // KMV std error ~ n/sqrt(k-1) = 5000/16 ≈ 313; allow 4 sigma
    assert(math.abs(est - 5000) < 1300, s"estimate $est too far from 5000")
  }

  test("kmvDistinct ignores duplicate values") {
    val dup = ((1 to 100) ++ (1 to 100)).map(i => ("g", s"v${i % 40}")).toDF("g", "v")
    val out = Sketches.kmvDistinct(dup, Seq("g"), $"v", k = 64)
      .select($"n_kept", $"est_distinct").as[(Long, Double)].head()
    assert(out == ((40L, 40.0)))
  }

  test("kmvDistinct plans a WindowGroupLimit partial top-k") {
    val df = (1 to 100).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "v")
    val plan = Sketches.kmvDistinct(df, Seq("g"), $"v", k = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
  }

  test("kmvSketch merges losslessly: partial sketches == whole-corpus sketch") {
    val all = (1 to 3000).map(i => (s"g${i % 2}", s"v$i")).toDF("g", "v")
    val half1 = all.filter(expr("substring(v, 2) % 3 != 0"))
    val half2 = all.filter(expr("substring(v, 2) % 3 = 0"))
    // overlap too: re-add some of half1 into half2 (merge must dedupe)
    val part2 = half2.union(half1.limit(100))
    val whole = Sketches.kmvSketch(all, Seq("g"), $"v", k = 64)
      .as[(String, Seq[Long])].collect().toMap
    val merged = Sketches.kmvMerge(
        Sketches.kmvSketch(half1, Seq("g"), $"v", k = 64),
        Sketches.kmvSketch(part2, Seq("g"), $"v", k = 64),
        Seq("g"), k = 64)
      .as[(String, Seq[Long])].collect().toMap
    assert(merged == whole)
    // and the estimate off the merged sketch equals the direct one
    val estDirect = Sketches.kmvDistinct(all, Seq("g"), $"v", k = 64)
      .select($"g", $"est_distinct").as[(String, Double)].collect().toMap
    val estMerged = Sketches.kmvEstimate(
        Sketches.kmvMerge(
          Sketches.kmvSketch(half1, Seq("g"), $"v", k = 64),
          Sketches.kmvSketch(part2, Seq("g"), $"v", k = 64),
          Seq("g"), k = 64),
        Seq("g"), k = 64)
      .select($"g", $"est_distinct").as[(String, Double)].collect().toMap
    assert(estMerged == estDirect)
  }

  test("countMin estimates are upper bounds and exact without collisions") {
    val items = (Seq.fill(50)("hot") ++ (1 to 20).map(i => s"cold$i")).toDF("x")
    val top = Sketches.countMinTopK(items, $"x", items.select($"x".as("item")),
        k = 5, d = 3, w = 512)
      .as[(String, Long)].collect()
    assert(top.head == (("hot", 50L))) // large w: no collisions, exact
    assert(top.tail.forall(_._2 == 1L))
  }

  test("countMin never underestimates under forced collisions") {
    val items = (1 to 300).map(i => s"item${i % 60}").toDF("x") // 60 items × 5
    val est = Sketches.countMinTopK(items, $"x", items.select($"x".as("item")),
        k = 60, d = 3, w = 16) // heavy collisions
      .as[(String, Long)].collect()
    assert(est.length == 60)
    assert(est.forall(_._2 >= 5L), "CMS must never underestimate")
  }

  test("countMin estimates an absent candidate as 0, not dropped") {
    val items = Seq.fill(10)("present").toDF("x")
    val cands = Seq("present", "absent").toDF("item")
    val est = Sketches.countMinTopK(items, $"x", cands, k = 10, d = 3, w = 512)
      .as[(String, Long)].collect().toMap
    assert(est.keySet == Set("present", "absent"), "absent candidate must survive")
    assert(est("present") == 10L)
    assert(est("absent") == 0L)
  }

  test("kmvOverlap: self is 1, disjoint is 0, half-overlap within tolerance") {
    def sk(lo: Int, hi: Int) = Sketches.kmvSketch(
      (lo to hi).map(i => (1, s"x$i")).toDF("g", "v"), Seq("g"), $"v", k = 64)
    val a = sk(1, 300)
    // identical inputs: every union hash is in both
    val self = Sketches.kmvOverlap(a, sk(1, 300), Seq("g"), 64).head()
    assert(self.getAs[Double]("est_jaccard") == 1.0)
    assert(self.getAs[Long]("n_both") == self.getAs[Long]("n_union_kept"))
    // disjoint inputs
    val dis = Sketches.kmvOverlap(a, sk(1000, 1300), Seq("g"), 64).head()
    assert(dis.getAs[Double]("est_jaccard") == 0.0)
    assert(dis.getAs[Double]("est_intersection") == 0.0)
    // |A∩B| = 150, |A∪B| = 450 → J = 1/3; k=64 keeps the estimator
    // noisy but bounded (binomial ±~3σ)
    assert(self.getAs[Double]("est_containment_left") == 1.0)
    assert(dis.getAs[Double]("est_containment_right") == 0.0)
    val half = Sketches.kmvOverlap(a, sk(151, 450), Seq("g"), 64).head()
    val j = half.getAs[Double]("est_jaccard")
    assert(j > 0.12 && j < 0.55, s"jaccard estimate off: $j vs 1/3")
    val u = half.getAs[Double]("est_union")
    assert(u > 270 && u < 680, s"union estimate off: $u vs 450")
    // |A∩B|/|A| = 150/300 = 0.5 (loose band, independent estimators)
    val cl = half.getAs[Double]("est_containment_left")
    assert(cl > 0.2 && cl <= 1.0, s"containment estimate off: $cl vs 0.5")
  }

  test("segmentByQuantiles: tertiles partition ~equally, boundaries inclusive") {
    val df = (1 to 99).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val seg = Sketches.segmentByQuantiles(
        df, $"v", Seq(1.0 / 3, 2.0 / 3), Seq("low", "mid", "high"))
      .select($"id", $"segment").as[(Long, String)].collect().toMap
    val counts = seg.values.groupBy(identity).view.mapValues(_.size).toMap
    // equi-depth: each tier gets a third (±1 at the interpolated cut)
    assert(counts.values.forall(n => n >= 32 && n <= 34), s"skewed tiers: $counts")
    // order respects value order: every low id < every mid id < every high id
    val maxLow = seg.collect { case (i, "low") => i }.max
    val minMid = seg.collect { case (i, "mid") => i }.min
    val maxMid = seg.collect { case (i, "mid") => i }.max
    val minHigh = seg.collect { case (i, "high") => i }.min
    assert(maxLow < minMid && maxMid < minHigh)
    // cutpoints ride a broadcast — no second shuffle of the data
    val plan = Sketches.segmentByQuantiles(
        df, $"v", Seq(0.5), Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"cutpoints must broadcast:\n$plan")
    // validation
    intercept[IllegalArgumentException] {
      Sketches.segmentByQuantiles(df, $"v", Seq(0.7, 0.3), Seq("a", "b", "c"))
    }
    intercept[IllegalArgumentException] {
      Sketches.segmentByQuantiles(df, $"v", Seq(0.5), Seq("only"))
    }
  }

  test("quantiles: exact path interpolates, approx path stays close") {
    val df = (1 to 101).map(i => ("g", i.toDouble)).toDF("g", "v")
    val ex = Sketches.quantiles(df, Seq("g"), $"v", Seq(0.5, 0.9))
      .select($"q_0", $"q_1").as[(Double, Double)].head()
    assert(ex == ((51.0, 91.0)))
    val ap = Sketches.quantiles(df, Seq("g"), $"v", Seq(0.5, 0.9), exact = false)
      .select($"q_0", $"q_1").as[(Double, Double)].head()
    assert(math.abs(ap._1 - 51.0) <= 2 && math.abs(ap._2 - 91.0) <= 2)
  }

  test("kmvOverlapMatrix: one row per unordered pair, identical to pairwise kmvOverlap") {
    // three sources: s0 and s1 share half their values, s2 is disjoint
    val rows = (1 to 200).map(i => ("s0", s"v$i")) ++
      (101 to 300).map(i => ("s1", s"v$i")) ++
      (1 to 200).map(i => ("s2", s"w$i"))
    val df = rows.toDF("src", "v")
    val m = Sketches.kmvOverlapMatrix(df, "src", $"v", k = 32)
      .orderBy("left_src", "right_src").collect()
    assert(m.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("s0", "s1"), ("s0", "s2"), ("s1", "s2")))
    // pairwise equivalence: the matrix row equals kmvOverlap on the
    // same two sketches
    def sk(s: String) = Sketches.kmvSketch(
      df.filter($"src" === s).withColumn("g", lit(1)), Seq("g"), $"v", 32)
    val pair = Sketches.kmvOverlap(sk("s0"), sk("s1"), Seq("g"), 32)
      .drop("g").head().toSeq
    assert(m.head.toSeq.drop(2) == pair)
    // disjoint pair estimates ~zero overlap; overlapping pair doesn't
    val bySrc = m.map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("est_jaccard")).toMap
    assert(bySrc(("s0", "s2")) == 0.0 && bySrc(("s0", "s1")) > 0.1)
  }

  // -------------------------------------------- robust stats / winsorize

  test("robustStats: hand-computed median/MAD; an injected unit-change bug trips the count") {
    // clean group: values 1..9 → med 5, deviations {0..4} → mad 2
    val clean = (1 to 9).map(i => ("clean", i.toDouble))
    // poisoned group: 19 sane values around 10 + two 1000× rows (the
    // fat-finger/unit-change shape) — robust z catches exactly those 2
    val poisoned = (1 to 19).map(i => ("bad", 10.0 + (i % 5))) ++
      Seq(("bad", 10000.0), ("bad", 12000.0))
    val out = Sketches.robustStats(
        (clean ++ poisoned).toDF("g", "v"), Seq("g"), $"v")
      .orderBy("g")
      .select("g", "n", "med", "mad", "n_outliers")
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(out.head == (("bad", 21L, 12.0, 1.0, 2L)), out.toString)
    assert(out.last == (("clean", 9L, 5.0, 2.0, 0L)), out.toString)
  }

  test("winsorize clips to per-group quantile bounds and preserves row count") {
    val df = ((1 to 99).map(i => ("g", i.toDouble)) :+ (("g", 1e6))).toDF("g", "v")
    val out = Sketches.winsorize(df, Seq("g"), $"v", pLow = 0.1, pHigh = 0.9, outCol = "w")
    assert(out.count() == 100)
    val (mn, mx) = out.agg(min($"w"), max($"w")).as[(Double, Double)].head()
    // bounds are the group's own 10%/90% interpolated quantiles
    assert(mn > 1.0 && mx < 1000.0, s"[$mn, $mx]")
    // interior values pass through untouched
    val mid = out.filter($"v" === 50.0).select($"w").as[Double].head()
    assert(mid == 50.0)
    intercept[IllegalArgumentException] {
      Sketches.winsorize(df.withColumn("w", lit(1)), Seq("g"), $"v", outCol = "w")
    }
    intercept[IllegalArgumentException] {
      Sketches.winsorize(df, Seq("g"), $"v", pLow = 0.9, pHigh = 0.1)
    }
  }

  // ------------------------------------------------------ HyperLogLog

  test("hllDistinct estimates within the published error band; duplicates are free") {
    val big = (1 to 5000).map(i => ("g1", s"v$i")).toDF("g", "v")
    val est = Sketches.hllDistinct(big, Seq("g"), $"v", b = 6)
      .select($"est_distinct").as[Double].head()
    // std error ~ 1.04/sqrt(64) ≈ 13%; allow 4 sigma
    assert(math.abs(est - 5000) < 2600, s"estimate $est too far from 5000")
    // max-of-rho is idempotent: duplicating every value changes nothing
    val dup = Sketches.hllDistinct(big.unionAll(big), Seq("g"), $"v", b = 6)
      .select($"est_distinct").as[Double].head()
    assert(dup == est)
  }

  test("hll small range routes through linear counting and stays near-exact") {
    val small = (1 to 12).map(i => ("g", s"v$i")).toDF("g", "v")
    val out = Sketches.hllDistinct(small, Seq("g"), $"v", b = 6)
      .select($"n_present", $"est_distinct").as[(Int, Double)].head()
    // 12 distinct values into 64 buckets: collisions possible but
    // linear counting over zero registers is accurate to ~±2 here
    assert(out._1 <= 12)
    assert(math.abs(out._2 - 12.0) < 3.0, s"linear-counting estimate ${out._2}")
  }

  test("hllMerge is lossless: per-bucket max of partials == whole-corpus sketch") {
    val all = (1 to 3000).map(i => (s"g${i % 2}", s"v$i")).toDF("g", "v")
    val half1 = all.filter(expr("substring(v, 2) % 3 != 0"))
    // overlapping halves: merge must behave like a set union
    val half2 = all.filter(expr("substring(v, 2) % 3 = 0")).unionAll(half1.limit(100))
    val merged = Sketches.hllMerge(
      Sketches.hllSketch(half1, Seq("g"), $"v", b = 6),
      Sketches.hllSketch(half2, Seq("g"), $"v", b = 6), Seq("g"))
    val whole = Sketches.hllSketch(all, Seq("g"), $"v", b = 6)
    assert(merged.orderBy("g", "bucket").collect().toSeq ==
      whole.orderBy("g", "bucket").collect().toSeq)
  }

  test("hll sketch state is bounded by 2^b and the plan has no distinct or window") {
    val df = (1 to 4000).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "v")
    val sk = Sketches.hllSketch(df, Seq("g"), $"v", b = 4)
    val counts = sk.groupBy("g").count().as[(String, Long)].collect()
    assert(counts.forall(_._2 <= 16), counts.mkString(","))
    val plan = Sketches.hllDistinct(df, Seq("g"), $"v", b = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "HLL must not plan a window")
    // exactly the two hash aggregations (register max, group fold) —
    // each map-side combined: partial+final pairs, nothing else
    assert(!plan.contains("SortAggregate"), s"hash aggs expected:\n$plan")
  }

  test("hll knobs validate") {
    val df = Seq(("g", "v")).toDF("g", "v")
    intercept[IllegalArgumentException] { Sketches.hllSketch(df, Seq("g"), $"v", b = 3) }
    intercept[IllegalArgumentException] { Sketches.hllEstimate(df, Seq("g"), b = 17) }
  }

  test("logHistogram: exact small buckets, HDR binning, counts merge by addition") {
    // subBits=3: values with quantized bit-length ≤ 4 (q ≤ 15 at
    // scale=1) bucket EXACTLY; larger values keep the top 3 bits
    // below the leading one → relative error ≤ 1/8
    val df = Seq(0.0, 13.0, 100.0, 100.0).map(("g", _)).toDF("g", "v")
    val h = Sketches.logHistogram(df, Seq("g"), $"v", subBits = 3, scale = 1.0)
      .orderBy("m", "sub").collect()
    // 0 → (m=1, sub=0, lb=0); 13 → exact (m=4, sub=13, lb=13);
    // 100 = 0b1100100 → m=7, sub=(100>>3)&7=4, lb=64+(4<<3)=96
    assert(h.map(r => (r.getAs[Int]("m"), r.getAs[Long]("sub"),
      r.getAs[Double]("lb"), r.getAs[Long]("n"))).toSeq ==
      Seq((1, 0L, 0.0, 1L), (4, 13L, 13.0, 1L), (7, 4L, 96.0, 2L)))
    // mergeability: histogram of a∪b == per-bucket count sum of the parts
    val a = (1 to 700).map(i => ("g", i * 0.37)).toDF("g", "v")
    val b = (1 to 900).map(i => ("g", i * 1.13)).toDF("g", "v")
    val whole = Sketches.logHistogram(a.unionAll(b), Seq("g"), $"v")
      .orderBy("m", "sub").collect().toSeq
    val merged = Sketches.logHistogram(a, Seq("g"), $"v")
      .unionByName(Sketches.logHistogram(b, Seq("g"), $"v"))
      .groupBy("g", "m", "sub")
      .agg(first($"lb").as("lb"), sum($"n").as("n"))
      .select("g", "m", "sub", "n", "lb") // logHistogram's column order
      .orderBy("m", "sub").collect().toSeq
    assert(merged == whole)
  }

  test("histQuantiles: estimates within the bucket-width bound of exact") {
    val vals = (1 to 5000).map(i => ("g", (i * i).toDouble / 100))
    val df = vals.toDF("g", "v")
    val hist = Sketches.logHistogram(df, Seq("g"), $"v")
    val est = Sketches.histQuantiles(hist, Seq("g"), Seq(0.5, 0.95, 0.99))
      .select($"q", $"est").as[(Double, Double)].collect().toMap
    val sorted = vals.map(_._2).sorted
    for ((q, e) <- est) {
      val exact = sorted((q * sorted.size).toInt.min(sorted.size - 1))
      // lower bound of the containing bucket: within 2^-3 relative
      assert(e <= exact * 1.001 && e >= exact * (1 - 0.13),
        s"q=$q est=$e exact=$exact")
    }
    intercept[IllegalArgumentException] {
      Sketches.histQuantiles(hist, Seq("g"), Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      Sketches.logHistogram(df, Seq("g"), $"v", subBits = 17)
    }
  }

  test("hll register-width disagreement raises instead of returning garbage") {
    def deepMessages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    val df = (1 to 500).map(i => ("g", s"v$i")).toDF("g", "v")
    val sk5 = Sketches.hllSketch(df, Seq("g"), $"v", b = 5)
    val sk6 = Sketches.hllSketch(df, Seq("g"), $"v", b = 6)
    // estimating with the wrong width parameter
    val e1 = intercept[Throwable] {
      Sketches.hllEstimate(sk5, Seq("g"), b = 6).collect()
    }
    assert(deepMessages(e1).contains("asked to decode b=6"), deepMessages(e1))
    // merging sketches built with different widths: caught at the
    // latest by the estimate's per-group min/max-b audit
    val e2 = intercept[Throwable] {
      Sketches.hllEstimate(
        Sketches.hllMerge(sk5, sk6, Seq("g")), Seq("g"), b = 6).collect()
    }
    assert(deepMessages(e2).contains("mismatch") ||
      deepMessages(e2).contains("asked to decode"), deepMessages(e2))
    // and the matching-width path still estimates cleanly
    assert(Sketches.hllEstimate(sk6, Seq("g"), b = 6).collect().nonEmpty)
  }
}
