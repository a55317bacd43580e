package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.roundPinned

/** Per-source corpus datasheet — the "dataset card" numbers every
  * training-data release publishes (Gebru et al. 2021's datasheets;
  * the per-source slice is what mixing/curation decisions read):
  * volume (docs, tokens), length shape (mean, exact median), language
  * makeup (distinct count, dominant language and its share), and the
  * exact-duplicate rate. One call = the summary table in front of the
  * drill-down ops (ngramDiversity, quality gates, dedup families).
  *
  * Exactness: token counts are integers; means are one double
  * division of exact integers; the median is the exact grouped
  * percentile (the [[Sketches.robustStats]] contract); every ratio
  * rounds to 4 decimals. All replayable bit-for-bit by the oracle.
  *
  * Scale shape: one corpus scan into TWO grouped aggregations (the
  * per-source rollup and the (source, lang) mode ranking — the
  * latter's window runs over source×lang rows, not the corpus) plus a
  * broadcast join of the tiny per-source frames. The exact-dup rate
  * uses count(DISTINCT text), which shuffles text once; at 100 TB
  * swap in the HLL register store ([[pipeline.HllStore]]) for that
  * column — the datasheet's other columns already stream.
  */
object Datasheet {

  /** One row per source:
    * (source, n_docs, n_tokens, avg_tokens_r, p50_tokens, n_langs,
    *  top_lang, top_lang_share_r, exact_dup_rate_r).
    * NULL languages count toward n_docs but are excluded from the
    * dominant-language ranking (NULL ordering differs across engines).
    */
  def corpusDatasheet(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      langCol: String): DataFrame = {
    val base = df.select(
        col(sourceCol).as("source"),
        col(langCol).as("lang"),
        col(textCol).as("__text"))
      .withColumn("__ntok", size(TextAnalysis.tokens(col("__text"))))
    val rollup = base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("__ntok").cast("long")).as("n_tokens"),
      roundPinned(percentile(col("__ntok").cast("double"), lit(0.5)), 4).as("p50_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("__text")).as("__ndistinct"))
    val mode = Window.partitionBy(col("source"))
      .orderBy(col("__c").desc, col("lang"))
    val top = base.filter(col("lang").isNotNull)
      .groupBy("source", "lang").agg(count(lit(1)).as("__c"))
      .withColumn("__rk", row_number().over(mode))
      .filter(col("__rk") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("__c"))
    // LEFT join: a source whose languages are all NULL still gets its
    // datasheet row (top_lang/share degrade to NULL)
    rollup.join(broadcast(top), Seq("source"), "left")
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        roundPinned(col("n_tokens").cast("double") / col("n_docs").cast("double"), 4)
          .as("avg_tokens_r"),
        col("p50_tokens"), col("n_langs"), col("top_lang"),
        roundPinned(col("__c").cast("double") / col("n_docs").cast("double"), 4)
          .as("top_lang_share_r"),
        roundPinned((col("n_docs") - col("__ndistinct")).cast("double") /
          col("n_docs").cast("double"), 4).as("exact_dup_rate_r"))
  }
}
