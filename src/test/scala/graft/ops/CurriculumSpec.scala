package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1 to 4000).map(i => (i.toLong, i.toDouble)).toDF("id", "d")

  test("phases are monotone in difficulty and pacing fractions hold (root)") {
    val out = Curriculum.phaseAssign(corpus, $"d", phases = 4)
      .select($"id", $"d", $"pctl_r", $"phase")
      .as[(Long, Double, Double, Int)].collect().sortBy(_._2)
    // monotone: a harder example never lands in an EARLIER phase
    out.sliding(2).foreach { case Array(a, b) => assert(a._4 <= b._4) }
    assert(out.map(_._4).distinct.sorted.toSeq == Seq(1, 2, 3, 4))
    // root pacing: phase 1 holds ≈ sqrt(1/4) = 50% of the corpus, up
    // to log-bucket granularity (the documented trade)
    val share1 = out.count(_._4 == 1).toDouble / out.length
    assert(math.abs(share1 - 0.5) < 0.15, s"phase-1 share $share1")
    // pctl is the bucket's cumulative share: in (0, 1], monotone in d
    assert(out.last._3 == 1.0)
    out.sliding(2).foreach { case Array(a, b) => assert(a._3 <= b._3) }
  }

  test("linear pacing admits later phases earlier than root pacing") {
    val root = Curriculum.phaseAssign(corpus, $"d", phases = 4)
      .filter($"phase" === 1).count()
    val linear = Curriculum.phaseAssign(corpus, $"d", phases = 4, rootPacing = false)
      .filter($"phase" === 1).count()
    assert(linear < root) // linear phase 1 = 25% vs root 50%
  }

  test("no corpus sort: the percentile join is broadcast, no range exchange") {
    val plan = Curriculum.phaseAssign(corpus, $"d", phases = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      s"global sort crept into phase assignment:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("determinism, NULL/negative difficulties dropped, knob validation") {
    val dirty = corpus.unionByName(Seq((9001L, -5.0), (9002L, Double.NaN)).toDF("id", "d"))
      .unionByName(Seq((9003L, null.asInstanceOf[java.lang.Double])).toDF("id", "d"))
    val out = Curriculum.phaseAssign(dirty.repartition(13), $"d", phases = 4)
    assert(out.filter($"id" >= 9001L).count() == 0)
    val a = Curriculum.phaseAssign(corpus, $"d", phases = 4)
      .select("id", "phase").as[(Long, Int)].collect().toMap
    val b = Curriculum.phaseAssign(corpus.repartition(7), $"d", phases = 4)
      .select("id", "phase").as[(Long, Int)].collect().toMap
    assert(a == b)
    intercept[IllegalArgumentException] {
      Curriculum.phaseAssign(corpus, $"d", phases = 0)
    }
    intercept[IllegalArgumentException] {
      Curriculum.phaseAssign(corpus.withColumnRenamed("d", "phase"), $"phase", 4)
    }
  }

  test("gated assignment equals phaseAssign-over-the-slice, keeps off-gate rows, no id shuffle") {
    // every third row is "train": the gated CDF must be computed over
    // exactly that slice, not the whole frame
    val df = corpus.withColumn("is_train", $"id" % 3 === 0)
    val gated = Curriculum.phaseAssignGated(df, $"d", $"is_train", phases = 4)
    assert(gated.count() == 4000, "off-gate rows must all survive")
    // gate rows: bit-identical to the standalone composition
    val viaJoin = Curriculum.phaseAssign(df.filter($"is_train"), $"d", phases = 4)
      .select($"id", $"pctl_r", $"phase")
      .as[(Long, Double, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val got = gated.filter($"is_train")
      .select($"id", $"pctl_r", $"phase")
      .as[(Long, Double, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == viaJoin)
    // off-gate rows: NULL curriculum columns, even with NULL difficulty
    val offGate = Curriculum.phaseAssignGated(
        df.withColumn("d", when($"is_train", $"d")), $"d", $"is_train", phases = 4)
      .filter(!$"is_train")
    assert(offGate.count() == gated.filter(!$"is_train").count())
    assert(offGate.filter($"phase".isNotNull || $"pctl_r".isNotNull).count() == 0)
    // the point of the variant: no corpus-sized join back on the row
    // id — the only join is the broadcast CDF, and there is no range
    // or hash exchange of the input beyond the histogram aggregation
    val plan = gated.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("rangepartitioning"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("reserved working/cdf columns are rejected up front with a rename message") {
    // m/sub/__q are logBucketed working columns (silently overwritten
    // then dropped before the guard — ADVICE r17); __pctl is cdf-side
    // (survives the join as a duplicate and turns into an opaque
    // ambiguous-reference AnalysisException — ADVICE r18). All must
    // hit the clear require() instead.
    Seq("m", "sub", "__q", "__pctl", "pctl_r").foreach { name =>
      val e = intercept[IllegalArgumentException] {
        Curriculum.phaseAssign(corpus.withColumn(name, lit(1)), $"d", phases = 4)
      }
      assert(e.getMessage.contains(name), s"guard message must name $name: ${e.getMessage}")
    }
  }
}
