package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.roundPinned

/** Data-quality expectations — the declarative constraint-audit
  * surface a production pipeline runs beside every write (the
  * deequ / Delta-Live-Tables-expectations capability) as plain
  * aggregates:
  *
  *   - [[check]]: N row-level rules → one `(rule, violations, total)`
  *     report in a SINGLE aggregation pass over the data (every rule
  *     is a conditional count inside one map-side-combined global
  *     agg — adding rules adds zero scans).
  *   - [[uniquenessViolations]]: candidate-key audit — key groups
  *     appearing more than once, with multiplicity.
  *   - [[orphans]]: referential-integrity audit — child rows whose
  *     key has no parent (one anti-join on the key).
  *
  * SQL three-valued logic makes NULL predicates silently pass a
  * naive `count(when(!p, 1))`; [[check]] counts NULL as a violation
  * (an expectation you cannot evaluate is not met), which is also
  * what makes `col.isNotNull` rules come out right.
  */
object Expectations {

  final case class Rule(name: String, holds: Column)

  /** Evaluate all rules in one pass: `(rule, violations, total)`,
    * one row per rule in input order.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = count(lit(1)).as("__total") +:
      rules.zipWithIndex.map { case (r, i) =>
        count(when(!coalesce(r.holds, lit(false)), 1)).as(s"__v$i")
      }
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.select(explode(array(rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"), col(s"__v$i").as("violations"),
          col("__total").as("total"))
      }: _*)).as("x"))
      .select("x.rule", "x.violations", "x.total")
  }

  /** Key groups occurring more than once: `(keyCols..., n)`. Empty
    * result = the columns form a candidate key.
    */
  def uniquenessViolations(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** One-pass numeric column profile: for each named column a row
    * `(column, n, n_null, min, max, mean, stddev)` — the summary a
    * data-quality dashboard renders per table per run. All columns
    * profile inside ONE map-side-combined global aggregate (the same
    * zero-extra-scans shape as [[check]]): profiling 40 columns of a
    * 100 TB table costs exactly one scan. Columns are cast to double
    * up front — call it on numeric columns; `stddev` is the sample
    * standard deviation (`stddev_samp`, the SQL-standard default in
    * both Spark and DuckDB), NULL for n < 2.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = count(lit(1)).as("__total") +: cols.zipWithIndex.flatMap {
      case (c, i) =>
        val d = col(c).cast("double")
        Seq(
          count(d).as(s"__n$i"),
          min(d).as(s"__min$i"),
          max(d).as(s"__max$i"),
          avg(d).as(s"__mean$i"),
          stddev_samp(d).as(s"__sd$i"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.zipWithIndex.map { case (c, i) =>
          struct(
            lit(c).as("column"),
            col(s"__n$i").as("n"),
            (col("__total") - col(s"__n$i")).as("n_null"),
            col(s"__min$i").as("min"),
            col(s"__max$i").as("max"),
            col(s"__mean$i").as("mean"),
            col(s"__sd$i").as("stddev"))
        }: _*)).as("x"))
      .select("x.column", "x.n", "x.n_null", "x.min", "x.max", "x.mean", "x.stddev")
  }

  /** Equi-width histogram of a numeric column over `[lo, hi)` in
    * `nBuckets` buckets: `(bucket, bucket_lo, bucket_hi, n)`, one row
    * per non-empty bucket. Out-of-range values clamp into the edge
    * buckets (so the counts always sum to the non-NULL row count);
    * NULLs are excluded. One map-side-combined aggregation whose
    * output is nBuckets-sized — profiling cost at any table size is
    * one scan, the distribution-shape complement to [[profile]]'s
    * moments.
    *
    * The bucket index is computed as `floor((v - lo) * n / (hi - lo))`
    * — literal-for-literal the same IEEE double expression an external
    * engine evaluates, so bucket assignment is reproducible
    * cross-engine (no pre-divided width constant whose decimal
    * rendering could drift).
    */
  def histogram(
      df: DataFrame,
      valueCol: Column,
      lo: Double,
      hi: Double,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    require(lo < hi, s"need lo < hi: [$lo, $hi)")
    val v = valueCol.cast("double")
    val idx = least(
      greatest(floor((v - lo) * nBuckets / (hi - lo)).cast("long"), lit(0L)),
      lit(nBuckets - 1L))
    df.filter(v.isNotNull)
      .groupBy(idx.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_lo",
        roundPinned(lit(lo) + col("bucket") * (hi - lo) / nBuckets, 6))
      .withColumn("bucket_hi",
        roundPinned(lit(lo) + (col("bucket") + 1) * (hi - lo) / nBuckets, 6))
      .select(col("bucket"), col("bucket_lo"), col("bucket_hi"), col("n"))
  }

  /** Population-stability-index drift report between two datasets'
    * distributions of the same numeric column — the "has this week's
    * crawl drifted from last week's" gate a production pipeline runs
    * before retraining. Both sides histogram over the SAME fixed
    * `[lo, hi)` × `nBuckets` grid (fixed, not data-derived — a
    * data-derived grid would move with the drift it's measuring);
    * per-bucket proportions are add-1 (Laplace) smoothed:
    * `p_i = (c_i + 1) / (N + nBuckets)`, so empty buckets stay
    * finite and the PSI is exact, engine-replayable arithmetic rather
    * than an epsilon-clamp convention. Output: one row per bucket
    * (all `nBuckets`, present or not), `(bucket, n_expected,
    * n_actual, psi_contrib)`; `sum(psi_contrib)` is the PSI
    * (rule-of-thumb: <0.1 stable, >0.25 drifted).
    *
    * Scale shape: two X65 histograms (one scan each, nBuckets-sized
    * results) left-joined onto a generated bucket spine, scalar
    * totals riding broadcast 1-row frames — drift over 100 TB costs
    * two scans and nothing wider than nBuckets rows thereafter.
    */
  def psiReport(
      expected: DataFrame,
      actual: DataFrame,
      valueCol: Column,
      lo: Double,
      hi: Double,
      nBuckets: Int): DataFrame = {
    val spark = expected.sparkSession
    // Each histogram caches: it feeds the bucket join AND its total
    // below, and clamping conserves the non-NULL row count, so
    // `sum(n)` over buckets IS `count(valueCol)` — totals cost a
    // bucket-sized aggregate instead of a second scan per side.
    // (alias AFTER the persist: the registry keys on canonicalized
    // plans, where an alias-only difference is no difference — two
    // histograms of the same input deliberately share one cache entry)
    val heRaw = graft.CachedFrames.persistOnce(
      histogram(expected, valueCol, lo, hi, nBuckets))
    val haRaw = graft.CachedFrames.persistOnce(
      histogram(actual, valueCol, lo, hi, nBuckets))
    val he = heRaw.select(col("bucket"), col("n").as("__ne"))
    val ha = haRaw.select(col("bucket"), col("n").as("__na"))
    val spine = spark.range(nBuckets).select(col("id").as("bucket"))
    val totals =
      he.agg(coalesce(sum("__ne"), lit(0L)).as("__te"))
        .crossJoin(ha.agg(coalesce(sum("__na"), lit(0L)).as("__ta")))
    val p = (coalesce(col("__ne"), lit(0L)).cast("double") + 1) /
      (col("__te") + nBuckets)
    val q = (coalesce(col("__na"), lit(0L)).cast("double") + 1) /
      (col("__ta") + nBuckets)
    spine
      .join(he, Seq("bucket"), "left")
      .join(ha, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(
        col("bucket"),
        coalesce(col("__ne"), lit(0L)).as("n_expected"),
        coalesce(col("__na"), lit(0L)).as("n_actual"),
        roundPinned((p - q) * log(p / q), 6).as("psi_contrib"))
  }

  /** PSI drift TIMELINE — the monitoring view of [[psiReport]]: one
    * PSI figure per calendar `period` of the data against the FIRST
    * period as baseline, answering "when did the distribution start
    * moving" in one query instead of N pairwise gate runs. Same fixed
    * grid and add-1-Laplace smoothing as [[psiReport]] (a data-derived
    * grid would move with the drift it measures); buckets absent from
    * a period still contribute through the full (period × bucket)
    * spine — skipping them would underestimate drift exactly when it
    * is largest.
    *
    * One corpus pass builds the (period, bucket) histogram (map-side
    * combined, cached — baseline, totals, and spine all derive from
    * it); everything downstream is bucket×period-scale. Output:
    * (period, n, psi), psi rounded to 6.
    */
  def psiTimeline(
      df: DataFrame,
      tsCol: String,
      valueCol: Column,
      lo: Double,
      hi: Double,
      nBuckets: Int,
      period: String = "week"): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    require(lo < hi, s"need lo < hi: [$lo, $hi)")
    require(tsCol != "period" && tsCol != "bucket",
      s"psiTimeline reserves period/bucket; rename column $tsCol")
    val spark = df.sparkSession
    val v = valueCol.cast("double")
    val idx = least(
      greatest(floor((v - lo) * nBuckets / (hi - lo)).cast("long"), lit(0L)),
      lit(nBuckets - 1L))
    val hist = graft.CachedFrames.persistOnce(
      df.filter(v.isNotNull)
        .groupBy(date_trunc(period, col(tsCol)).as("period"), idx.as("bucket"))
        .agg(count(lit(1)).as("n")))
    val firstPeriod = hist.agg(min("period").as("period"))
    val baseline = hist.join(firstPeriod, Seq("period"))
      .select(col("bucket"), col("n").as("__nb"))
    val totals = hist.groupBy("period").agg(sum("n").as("__tp"))
    val baseTotal = baseline.agg(coalesce(sum("__nb"), lit(0L)).as("__tb"))
    val spine = hist.select("period").distinct()
      .crossJoin(spark.range(nBuckets).select(col("id").as("bucket")))
    val p = (coalesce(col("__nb"), lit(0L)).cast("double") + 1) /
      (col("__tb") + nBuckets)
    val q = (coalesce(col("n"), lit(0L)).cast("double") + 1) /
      (col("__tp") + nBuckets)
    spine
      .join(hist, Seq("period", "bucket"), "left")
      .join(broadcast(baseline), Seq("bucket"), "left")
      .join(broadcast(totals), Seq("period"))
      .crossJoin(broadcast(baseTotal))
      .groupBy("period")
      .agg(
        coalesce(sum("n"), lit(0L)).as("n"),
        roundPinned(sum((p - q) * log(p / q)), 6).as("psi"))
  }

  /** Benford first-significant-digit audit — the forensic
    * data-quality check for "organic" numeric columns (amounts,
    * populations, counts spanning magnitudes): naturally-arising
    * values lead with 1 ~30% of the time (`log10(1 + 1/d)`), while
    * fabricated or truncated data flattens the curve. One
    * map-side-combined pass; rows with `floor(|v|) < 1` (and NULLs)
    * are excluded — they have no leading integer digit.
    *
    * Digit extraction deliberately avoids `log10` ON THE DATA (an
    * ulp-level libm difference at an exact power of ten would flip
    * the digit between engines): `floor(|v|)` renders to a decimal
    * string identically everywhere, and the first character IS the
    * digit. Output: `(digit 1–9, n, actual_frac, expected_frac,
    * deviation)` — large deviations on a column that should be
    * organic are the audit signal.
    */
  def benfordReport(df: DataFrame, valueCol: Column): DataFrame = {
    val vi = floor(abs(valueCol.cast("double"))).cast("long")
    val digit = substring(vi.cast("string"), 1, 1).cast("int")
    val counts = df
      .filter(vi >= 1)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(coalesce(sum("n"), lit(0L)).as("__t"))
    counts
      .crossJoin(broadcast(total))
      .withColumn("actual_frac", roundPinned(col("n").cast("double") / col("__t"), 4))
      .withColumn("expected_frac",
        roundPinned(log10(lit(1.0) + lit(1.0) / col("digit")), 4))
      .withColumn("deviation",
        roundPinned(abs(col("actual_frac") - col("expected_frac")), 4))
      .select(col("digit"), col("n"), col("actual_frac"),
        col("expected_frac"), col("deviation"))
  }

  /** Child rows whose `childKey` value has no match in
    * `parent.parentKey` (NULL child keys are orphans too — they
    * reference nothing). One left-anti join on the key.
    */
  def orphans(
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String): DataFrame =
    child.join(
      parent.select(col(parentKey).as("__pk")).distinct(),
      child(childKey) === col("__pk"),
      "left_anti")
}
