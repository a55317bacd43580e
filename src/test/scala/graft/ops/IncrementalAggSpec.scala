package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = Seq(
    ("a", Option(1.0)), ("a", Option(3.0)), ("a", None),
    ("b", Option(-2.0)), ("b", Option(10.0)),
    ("c", None)
  ).toDF("k", "v")

  test("merge of any split equals the full recompute") {
    val full = IncrementalAgg.partials(rows, Seq("k"), "v")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSet
    // three-way split on an arbitrary predicate chain
    val s1 = IncrementalAgg.partials(rows.limit(2), Seq("k"), "v")
    val s2 = IncrementalAgg.partials(rows.limit(4).except(rows.limit(2)), Seq("k"), "v")
    val s3 = IncrementalAgg.partials(rows.except(rows.limit(4)), Seq("k"), "v")
    val merged = IncrementalAgg.merge(s1, s2, s3)
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSet
    assert(merged == full, s"merge must equal recompute:\n$merged\nvs\n$full")
  }

  test("NULL-only groups carry n=0 state and a NULL finalized avg") {
    val st = IncrementalAgg.finalize(
        IncrementalAgg.partials(rows, Seq("k"), "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val c = st("c")
    assert(c.getLong(1) == 0L && c.isNullAt(2) && c.isNullAt(5))
    val a = st("a")
    assert(a.getLong(1) == 2L && a.getDouble(2) == 4.0 && a.getDouble(5) == 2.0)
    val b = st("b")
    assert(b.getDouble(3) == -2.0 && b.getDouble(4) == 10.0)
  }

  test("validation: state-column collisions and malformed frames refused") {
    val clash = rows.withColumnRenamed("k", "sum")
    intercept[IllegalArgumentException] {
      IncrementalAgg.partials(clash, Seq("sum"), "v")
    }
    intercept[IllegalArgumentException] {
      IncrementalAgg.merge(rows) // not a state frame
    }
  }

  test("multi-measure: merge equals recompute, all measures from one pass") {
    val d = Seq(
      ("a", Option(1.0), Option(10.0)), ("a", Option(3.0), None),
      ("b", None: Option[Double], Option(7.0))
    ).toDF("k", "x", "y")
    val full = IncrementalAgg.partialsMulti(d, Seq("k"), Seq("x", "y"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val merged = IncrementalAgg.mergeMulti(Seq("k"), Seq("x", "y"),
        IncrementalAgg.partialsMulti(d.limit(1), Seq("k"), Seq("x", "y")),
        IncrementalAgg.partialsMulti(d.offset(1), Seq("k"), Seq("x", "y")))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(merged == full)
    val fin = IncrementalAgg.finalizeMulti(
        IncrementalAgg.partialsMulti(d, Seq("k"), Seq("x", "y")), Seq("x", "y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(fin("a").getAs[Double]("x_avg") == 2.0)
    assert(fin("b").isNullAt(fin("b").fieldIndex("x_avg")))
    assert(fin("b").getAs[Double]("y_avg") == 7.0)
    // one aggregation pass regardless of measure count
    val plan = IncrementalAgg.partialsMulti(d, Seq("k"), Seq("x", "y"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Scan")) == 1)
  }

  test("partials is one map-side-combined aggregation pass") {
    val plan = IncrementalAgg.partials(rows, Seq("k"), "v")
      .queryExecution.executedPlan.toString
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs == 2, s"expected partial+final HashAggregate, got $aggs:\n$plan")
  }
}
