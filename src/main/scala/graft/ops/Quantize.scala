package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.roundPinned

/** Symmetric int8 quantization of embedding columns — the standard
  * storage/shuffle lever for ANN corpora at scale: an `array<float>`
  * (4 bytes/dim) becomes `array<tinyint>` (1 byte/dim) plus one
  * per-vector double scale, cutting the dominant column's footprint
  * ~4× everywhere it rests or moves (parquet, shuffle, cache), while
  * candidate re-ranking runs on the dequantized approximation.
  *
  * Scheme (max-abs symmetric, the common inference-quantization
  * recipe): `scale = max(|v_i|) / 127`, `q_i = round(v_i / scale)` ∈
  * [-127, 127]. All-zero vectors get scale 0 and an all-zero code
  * (dequantization maps them back to exact zeros — no NaN leaks).
  * Every step is built-in-function arithmetic in double precision
  * (`transform`/`aggregate`/`round`), so it stays inside whole-stage
  * codegen as a map-side projection — no shuffle, no UDF — and an
  * external engine replays it bit-for-bit (IEEE division and
  * ties-away-from-zero rounding agree across engines), which is what
  * makes `q_quantize_embeddings` oracle-checkable.
  */
object Quantize {

  /** Per-vector symmetric scale: `max(|v_i|) / 127` in double. */
  def embeddingScale(vec: Column): Column =
    array_max(transform(vec, v => abs(v.cast("double")))) / 127.0

  /** int8 codes for `vec` under `scale` (array<tinyint>); all-zero
    * input (scale 0) maps to an all-zero code instead of 0/0 NaN.
    */
  def quantize(vec: Column, scale: Column): Column =
    when(scale === 0.0, transform(vec, _ => lit(0).cast("tinyint")))
      .otherwise(transform(vec, v => roundPinned(v.cast("double") / scale).cast("tinyint")))

  /** Approximate reconstruction: `q_i × scale` as array<double>. */
  def dequantize(q8: Column, scale: Column): Column =
    transform(q8, x => x.cast("double") * scale)

  /** [[dequantize]] narrowed to `array<float>` — the form the fused
    * ANN kernels ([[graft.functions.CosineSimilarityExpr]],
    * [[graft.functions.MatVecDotsExpr]]) consume directly.
    */
  def dequantizeFloat(q8: Column, scale: Column): Column =
    transform(q8, x => (x.cast("double") * scale).cast("float"))

  /** Attach quantization columns to an embedding frame:
    * `q_scale` (double) and `q8` (array<tinyint>). A production job
    * writes these INSTEAD of the float column; [[dequantizeFloat]]
    * reconstructs on read for scoring.
    */
  def quantizeEmbeddings(
      df: DataFrame,
      vecCol: String,
      scaleCol: String = "q_scale",
      codeCol: String = "q8"): DataFrame = {
    val reserved = Seq(scaleCol, codeCol)
    val shadowing = df.columns.filter(reserved.contains)
    require(
      shadowing.isEmpty,
      s"quantizeEmbeddings writes columns ${reserved.mkString("/")}; " +
        s"rename the existing: ${shadowing.mkString(", ")}")
    df.withColumn(scaleCol, embeddingScale(col(vecCol)))
      .withColumn(codeCol, quantize(col(vecCol), col(scaleCol)))
  }
}
