package graft.ops

import graft.SparkSpec

class ClassifierEvalSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed confusion, per-class P/R/F1, accuracy and kappa") {
    // pairs (pred, gold): (a,a)x4 (b,b)x3 (a,b)x2 (b,a)x1 → N=10
    // agree 7; n_gold a/b = 5/5; n_pred a/b = 6/4
    // pe = .5*.6 + .5*.4 = 0.5 → kappa = (0.7-0.5)/0.5 = 0.4
    val rows = Seq.fill(4)(("a", "a")) ++ Seq.fill(3)(("b", "b")) ++
      Seq.fill(2)(("a", "b")) ++ Seq(("b", "a"))
    val out = ClassifierEval.classificationReport(
        rows.toDF("p", "g"), $"p", $"g")
      .orderBy("class").collect()
    val a = out(0)
    assert(a.getAs[Long]("n_gold") == 5L && a.getAs[Long]("n_pred") == 6L
      && a.getAs[Long]("tp") == 4L)
    assert(a.getAs[Double]("precision_r") == 0.6667)
    assert(a.getAs[Double]("recall_r") == 0.8)
    assert(a.getAs[Double]("f1_r") == 0.7273) // 8/11
    assert(a.getAs[Double]("accuracy_r") == 0.7)
    assert(a.getAs[Double]("kappa_r") == 0.4)
    assert(out.map(_.getAs[Double]("kappa_r")).distinct.length == 1)
  }

  test("classes seen only in gold or only in pred still get a row") {
    val rows = Seq(("a", "a"), ("a", "c"), ("d", "a")) // c never predicted, d never gold
    val out = ClassifierEval.classificationReport(rows.toDF("p", "g"), $"p", $"g")
      .orderBy("class").collect()
    assert(out.map(_.getAs[String]("class")).toSeq == Seq("a", "c", "d"))
    val c = out(1)
    assert(c.getAs[Long]("n_gold") == 1L && c.getAs[Long]("n_pred") == 0L)
    assert(c.isNullAt(c.fieldIndex("precision_r"))) // 0/0 prediction side
    assert(c.getAs[Double]("recall_r") == 0.0)
    val d = out(2)
    assert(d.getAs[Long]("n_pred") == 1L && d.getAs[Long]("n_gold") == 0L)
    assert(d.isNullAt(d.fieldIndex("recall_r")))
  }

  test("perfect agreement scores kappa 1; chance-level scores near 0") {
    val perfect = (1 to 100).map(i => (s"c${i % 3}", s"c${i % 3}")).toDF("p", "g")
    val kp = ClassifierEval.classificationReport(perfect, $"p", $"g")
      .select("kappa_r").head().getDouble(0)
    assert(kp == 1.0)
    // independent pred/gold: kappa ≈ 0 (deterministic fixture)
    val chance = (0 until 900).map(i => (s"c${i % 3}", s"c${(i / 3) % 3}")).toDF("p", "g")
    val kc = ClassifierEval.classificationReport(chance, $"p", $"g")
      .select("kappa_r").head().getDouble(0)
    assert(math.abs(kc) < 0.01, s"chance kappa $kc")
  }
}
