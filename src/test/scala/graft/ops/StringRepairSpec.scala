package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class StringRepairSpec extends SparkSpec {
  import spark.implicits._

  private def repairAll(values: Seq[String]): Seq[String] =
    values.toDF("v").select(StringRepair.repair(col("v")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("whole-value u'…' wrapper stripped") {
    assert(repairAll(Seq("u'free'")) === Seq("free"))
  }

  test("inner u'…' wrappers keep their quotes") {
    assert(repairAll(Seq("{'romantic': False, u'casual': True}")) ===
      Seq("{'romantic': false, 'casual': true}"))
  }

  test("whole-value none (any case, quoted or not) becomes NULL") {
    assert(repairAll(Seq("None", "none", "'none'")) === Seq(null, null, null))
  }

  test("embedded None becomes JSON null, booleans lowercased") {
    assert(repairAll(Seq("{'touristy': None, 'hipster': False, 'classy': True}")) ===
      Seq("{'touristy': null, 'hipster': false, 'classy': true}"))
  }

  test("plain values pass through") {
    assert(repairAll(Seq("free", "2")) === Seq("free", "2"))
  }
}
