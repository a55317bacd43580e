package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeatureEncodeSpec extends SparkSpec {
  import spark.implicits._

  test("woeIv: hand-computed two-bucket scorecard") {
    // values 1..10, positive iff v >= 9; median cut 5.5 →
    // b01: 5 rows 0 pos; b02: 5 rows 2 pos; tp=2 tn=8, smoothing .5/1
    val df = (1 to 10).map(v => (v.toDouble, v >= 9)).toDF("f", "y")
    val out = FeatureEncode.woeIv(df, $"f", $"y", nBuckets = 2)
      .orderBy("segment").collect()
    val num1 = 0.5 / 3.0; val den1 = 5.5 / 9.0
    val num2 = 2.5 / 3.0; val den2 = 3.5 / 9.0
    val woe1 = math.log(num1 / den1); val woe2 = math.log(num2 / den2)
    val iv = math.round((num1 - den1) * woe1 * 1e9) + math.round((num2 - den2) * woe2 * 1e9)
    val r1 = out(0)
    assert(r1.getAs[String]("segment") == "b01" && r1.getAs[Long]("n") == 5L
      && r1.getAs[Long]("n_pos") == 0L && r1.getAs[Long]("n_neg") == 5L)
    assert(math.abs(r1.getAs[Double]("woe_r") - woe1) < 1e-4)
    val r2 = out(1)
    assert(r2.getAs[Long]("n_pos") == 2L)
    assert(math.abs(r2.getAs[Double]("woe_r") - woe2) < 1e-4)
    // IV total identical on both rows, equals the quantized sum
    assert(out.map(_.getAs[Double]("iv_r")).distinct.length == 1)
    assert(math.abs(r1.getAs[Double]("iv_r") - iv / 1e9) < 1e-4)
    // a signal-free feature scores ≈ 0 IV
    val noise = (1 to 2000).map(v => (v.toDouble, v % 2 == 0)).toDF("f", "y")
    val ivNoise = FeatureEncode.woeIv(noise, $"f", $"y", nBuckets = 4)
      .select("iv_r").head().getDouble(0)
    assert(math.abs(ivNoise) < 0.01, s"noise IV $ivNoise")
  }

  test("woeIv drops NULL/NaN rows and validates knobs") {
    val dirty = Seq((1.0, true), (2.0, false), (Double.NaN, true))
      .toDF("f", "y")
      .unionByName(Seq((null.asInstanceOf[java.lang.Double], true)).toDF("f", "y"))
    assert(FeatureEncode.woeIv(dirty, $"f", $"y", nBuckets = 2)
      .agg(sum("n")).head().getLong(0) == 2L)
    intercept[IllegalArgumentException] {
      FeatureEncode.woeIv(dirty, $"f", $"y", nBuckets = 1)
    }
  }

  test("targetEncode: m-estimate pulls rare categories toward the global mean") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", 10.0))
      .toDF("c", "t")
    val out = FeatureEncode.targetEncode(df, $"c", $"t", m = 20.0)
      .orderBy("category").collect()
    val a = out(0); val b = out(1)
    assert(a.getAs[Double]("mean_r") == 2.5 && b.getAs[Double]("mean_r") == 10.0)
    // global mean 4: te(a) = (10 + 80)/24 = 3.75, te(b) = 90/21
    assert(a.getAs[Double]("te_r") == 3.75)
    assert(math.abs(b.getAs[Double]("te_r") - 90.0 / 21.0) < 1e-4)
    // m = 0 degrades to the raw mean
    val raw = FeatureEncode.targetEncode(df, $"c", $"t", m = 0.0)
      .orderBy("category").collect()
    assert(raw(0).getAs[Double]("te_r") == 2.5 && raw(1).getAs[Double]("te_r") == 10.0)
    intercept[IllegalArgumentException] {
      FeatureEncode.targetEncode(df, $"c", $"t", m = -1.0)
    }
  }
}
