package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def prng(parts: Int*): Float =
    MurmurHash3.orderedHash(parts).toFloat / Int.MaxValue.toFloat

  private def clustered(nClusters: Int, perCluster: Int, dim: Int) = {
    val centers = Array.tabulate(nClusters, dim)((c, d) => prng(1, c, d) * 10f)
    val rows = for {
      c <- 0 until nClusters
      m <- 0 until perCluster
    } yield {
      val id = (c * perCluster + m).toLong
      val vec = Array.tabulate(dim)(d => centers(c)(d) + prng(2, id.toInt, d) * 0.1f)
      (id, vec.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("quantize codes stay in [-127,127], hit the extremes, and reconstruct closely") {
    val df = clustered(nClusters = 4, perCluster = 8, dim = 16)
    val q = Quantize.quantizeEmbeddings(df, "embedding")
    val rows = q.select(
        col("vec_id"), col("embedding"), col("q_scale"), col("q8"),
        Similarity.cosine(
          col("embedding"),
          Quantize.dequantizeFloat(col("q8"), col("q_scale"))).as("recon_cos"))
      .as[(Long, Seq[Float], Double, Seq[Byte], Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, vec, scale, q8, cos) =>
      assert(q8.length == vec.length)
      assert(q8.forall(b => b >= -127 && b <= 127), s"id=$id code out of range")
      // the max-|v| dimension quantizes to exactly ±127 by construction
      assert(q8.exists(b => math.abs(b) == 127), s"id=$id never hits the extreme")
      assert(scale > 0)
      // max-abs int8 keeps direction: reconstruction cosine stays high
      assert(cos > 0.999, s"id=$id reconstruction cosine $cos")
    }
  }

  test("all-zero vectors quantize to zero codes and dequantize to exact zeros") {
    val df = Seq((0L, Seq.fill(8)(0f)), (1L, Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val q = Quantize.quantizeEmbeddings(df, "embedding")
      .select(col("vec_id"), col("q_scale"), col("q8"),
        Quantize.dequantize(col("q8"), col("q_scale")).as("deq"))
      .as[(Long, Double, Seq[Byte], Seq[Double])].collect().map(r => r._1 -> r).toMap
    val (_, zScale, zCodes, zDeq) = q(0L)
    assert(zScale == 0.0)
    assert(zCodes.forall(_ == 0) && zDeq.forall(_ == 0.0))
    // the unit vector round-trips exactly: scale 1/127, code 127
    val (_, uScale, uCodes, uDeq) = q(1L)
    assert(uCodes.head == 127 && math.abs(uDeq.head - 1.0) < 1e-12)
    assert(math.abs(uScale - 1.0 / 127.0) < 1e-18)
  }

  test("ANN over dequantized int8 corpus matches float-ANN recall") {
    val df = clustered(nClusters = 8, perCluster = 8, dim = 16).cache()
    val queries = df.filter(col("vec_id") % 8 === 0)
    val k = 4
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // corpus stored quantized; scoring reconstructs on the fly — the
    // storage-side 4x saving must not cost meaningful recall here
    val deq = Quantize.quantizeEmbeddings(df, "embedding")
      .select(col("vec_id"),
        Quantize.dequantizeFloat(col("q8"), col("q_scale")).as("embedding"))
    val approx = Similarity.annTopK(deq, queries, "vec_id", "embedding", k,
        dim = 16, tables = 8, bits = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"quantized ANN recall $recall below float-path bound")
  }

  test("quantized store round-trips through parquet and serves ANN unchanged") {
    // The actual storage claim of X46: a production job writes q8 +
    // q_scale INSTEAD of the float column. Write exactly that store
    // via Sink.parquetWrite (bucketed by vec_id like a real corpus),
    // read it back, and ANN over the reconstructed vectors must return
    // the SAME rows as ANN over the in-memory quantized frame — the
    // tinyint/double round-trip is lossless, so this is equality, not
    // a recall bound.
    val df = clustered(nClusters = 8, perCluster = 8, dim = 16)
    val queries = df.filter(col("vec_id") % 8 === 0)
    val store = Quantize.quantizeEmbeddings(df, "embedding")
      .select("vec_id", "q_scale", "q8") // the float column is GONE
    val dir = java.nio.file.Files.createTempDirectory("q8store").toString
    graft.io.Sink.parquetWrite(store, dir,
      graft.io.Sink.PartitionSpec(bucketColumn = Some("vec_id"), buckets = Some(4)))
    val readBack = spark.read.parquet(dir)
    assert(readBack.schema("q8").dataType.simpleString == "array<tinyint>")
    assert(readBack.schema.fieldNames.toSet == Set("vec_id", "q_scale", "q8"))
    def ann(corpus: org.apache.spark.sql.DataFrame) =
      Similarity.annTopK(
          corpus.select(col("vec_id"),
            Quantize.dequantizeFloat(col("q8"), col("q_scale")).as("embedding")),
          queries, "vec_id", "embedding", k = 4, dim = 16, tables = 8, bits = 4)
        .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(ann(readBack) == ann(store), "parquet store must serve identical ANN results")
  }

  test("quantization is a narrow projection: no exchange in the plan") {
    val df = clustered(nClusters = 2, perCluster = 4, dim = 8)
    val plan = Quantize.quantizeEmbeddings(df, "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quantization must not shuffle:\n$plan")
  }

  test("quantizeEmbeddings refuses frames already carrying output columns") {
    val df = Seq((0L, Seq(1f), 9)).toDF("vec_id", "embedding", "q8")
    val e = intercept[IllegalArgumentException] {
      Quantize.quantizeEmbeddings(df, "embedding")
    }
    assert(e.getMessage.contains("q8"))
  }
}
