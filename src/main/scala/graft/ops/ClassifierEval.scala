package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.roundPinned

/** Multi-class classification report — per-class precision/recall/F1
  * plus overall accuracy and Cohen's κ (agreement beyond chance) for
  * any predicted-vs-gold label pair: grading a heuristic classifier
  * (language ID, quality gate) against gold labels, or two annotation
  * runs against each other (κ IS the inter-annotator-agreement
  * statistic labeling pipelines report).
  *
  * Scale shape: ONE grouped count to the (pred, gold) confusion frame
  * (≤ classes² tiny rows — map-side combined, the corpus streams
  * once); everything else derives from that broadcast-sized frame.
  *
  * Exactness: all counts integer; ratios are single divisions of
  * integers; κ's chance-agreement term Σ (n_gold/N)·(n_pred/N)
  * quantizes each product to integer 1e-12 units so the sum is
  * order-free; κ (which sits near 0 for uninformative classifiers)
  * carries the ± 0 fold.
  *
  * @return one row per class seen in either column:
  *         (class, n_gold, n_pred, tp, precision_r, recall_r, f1_r,
  *          accuracy_r, kappa_r) — accuracy/κ are corpus-level,
  *         repeated per row (the iv_r convention)
  */
object ClassifierEval {

  def classificationReport(
      df: DataFrame,
      pred: Column,
      gold: Column): DataFrame = {
    val base = df.select(pred.cast("string").as("__p"), gold.cast("string").as("__g"))
      .filter(col("__p").isNotNull && col("__g").isNotNull)
    val pairs = graft.CachedFrames.persistOnce(
      base.groupBy(col("__p"), col("__g")).agg(count(lit(1)).as("cnt")))
    val goldN = pairs.groupBy(col("__g").as("class")).agg(sum(col("cnt")).as("n_gold"))
    val predN = pairs.groupBy(col("__p").as("class")).agg(sum(col("cnt")).as("n_pred"))
    val tpN = pairs.filter(col("__p") === col("__g"))
      .groupBy(col("__g").as("class")).agg(sum(col("cnt")).as("tp"))
    val cls = goldN.join(predN, Seq("class"), "full")
      .join(tpN, Seq("class"), "left")
      .na.fill(0L, Seq("n_gold", "n_pred", "tp"))
    val tot = pairs.agg(
      sum(col("cnt")).as("__nn"),
      sum(when(col("__p") === col("__g"), col("cnt")).otherwise(0L)).as("__agree"))
    val nn = col("__nn").cast("double")
    val term = roundPinned((col("n_gold").cast("double") / nn) *
      (col("n_pred").cast("double") / nn) * lit(1e12)).cast("long")
    val po = col("__agree").cast("double") / nn
    // κ's chance-agreement sum as a broadcast grand total (r22): the
    // class frame is small, but this removes the repo's last
    // everything-into-one-task window — same order-free integer sum.
    PrefixSum.withGrandTotals(cls.crossJoin(broadcast(tot)), Seq("__peq" -> term))
      .withColumn("__pe", col("__peq").cast("double") / lit(1e12))
      .select(
        col("class"), col("n_gold"), col("n_pred"), col("tp"),
        roundPinned(try_divide(col("tp").cast("double"), col("n_pred").cast("double")), 4)
          .as("precision_r"),
        roundPinned(try_divide(col("tp").cast("double"), col("n_gold").cast("double")), 4)
          .as("recall_r"),
        roundPinned(try_divide(lit(2.0) * col("tp").cast("double"),
          (col("n_pred") + col("n_gold")).cast("double")), 4).as("f1_r"),
        roundPinned(po, 4).as("accuracy_r"),
        (roundPinned(try_divide(po - col("__pe"), lit(1.0) - col("__pe")), 4))
          .as("kappa_r"))
  }
}
