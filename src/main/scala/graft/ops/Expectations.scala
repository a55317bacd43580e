package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
