package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, MapType, StructType}

/** Data-dependent column typing (the reference's `safe_convert_string`,
  * `/root/reference/yelp_etl/pipeline/clean.py:182-210`) — redesigned
  * for scale.
  *
  * Semantics preserved exactly: for each column, try an *ordered* list
  * of candidate types; a candidate is accepted iff converting
  * introduces no new NULLs (`null_count(converted) <=
  * null_count(original)`); first accepted candidate wins; if none
  * passes, the column keeps its original (string) type. Map/Struct
  * candidates convert via `from_json` (malformed → NULL), scalar
  * candidates via `try_cast` (the Spark-3.5 non-ANSI `cast` semantics
  * the reference relied on: bad input → NULL, never an error).
  *
  * Redesign: the reference runs ONE Spark job per (column, candidate)
  * — an eager `collect()` inside plan construction, O(cols × types)
  * full scans of a growing regex-repair plan. Here all null-counts for
  * all columns × all candidates are computed in a single aggregation
  * job (partial+final hash agg, one scan), then one `select` applies
  * each column's winning conversion. At 100 TB this is the difference
  * between 1 pass and dozens.
  */
object SafeCast {

  /** The candidate list the reference uses for Yelp attribute columns
    * (`clean.py:100-105`).
    */
  def yelpAttributeCandidates: Seq[DataType] = Seq(
    MapType(org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.BooleanType),
    MapType(org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.BooleanType)

  /** `from_json` on non-JSON text is NULL either way, but the direct
    * call pays a per-row parse-exception path (~9µs/row measured at
    * sf0.1). Values that don't start with `{` can't parse as an object,
    * so gate the parse behind a cheap prefix test — identical null
    * counts, none of the exception cost.
    */
  private def jsonObjectGate(c: Column): Column = c.rlike("^\\s*\\{")

  private def convert(c: Column, t: DataType): Column = t match {
    case m: MapType =>
      when(jsonObjectGate(c), from_json(c, m)).otherwise(lit(null).cast(m))
    case s: StructType =>
      when(jsonObjectGate(c), from_json(c, s)).otherwise(lit(null).cast(s))
    case other => c.try_cast(other)
  }

  /** The one-job null-count frame behind [[chooseTypes]]: for every
    * column its base null count and the null count under every
    * candidate conversion, as ONE wide aggregation (plan-pinned in
    * PlanAuditSpec: two HashAggregates — partial then final — and a
    * single single-partition exchange, nothing else).
    */
  private[graft] def nullCountAgg(
      df: DataFrame,
      columns: Seq[String],
      candidates: Seq[DataType]): DataFrame = {
    val aggs = columns.flatMap { name =>
      val base = count(when(col(name).isNull, 1)).as(s"${name}__base")
      val tried = candidates.zipWithIndex.map { case (t, i) =>
        count(when(convert(col(name), t).isNull, 1)).as(s"${name}__c$i")
      }
      base +: tried
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Chosen type per column (None = stays string), decided by one
    * aggregation job over all columns × candidates.
    */
  def chooseTypes(
      df: DataFrame,
      columns: Seq[String],
      candidates: Seq[DataType]): Map[String, Option[DataType]] = {
    if (columns.isEmpty) return Map.empty
    val row = nullCountAgg(df, columns, candidates).head()
    columns.map { name =>
      val base = row.getAs[Long](s"${name}__base")
      val winner = candidates.zipWithIndex.find { case (_, i) =>
        row.getAs[Long](s"${name}__c$i") <= base
      }.map(_._1)
      name -> winner
    }.toMap
  }

  /** Apply `chooseTypes` decisions: one projection converting every
    * winning column, leaving the rest untouched.
    */
  def convertColumns(
      df: DataFrame,
      columns: Seq[String],
      candidates: Seq[DataType]): DataFrame = {
    val chosen = chooseTypes(df, columns, candidates)
    val projection = df.columns.toSeq.map { name =>
      chosen.get(name).flatten match {
        case Some(t) => convert(col(name), t).as(name)
        case None => col(name)
      }
    }
    df.select(projection: _*)
  }
}
