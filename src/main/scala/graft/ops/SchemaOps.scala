package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}

/** Struct-flattening projection (P5).
  *
  * Semantics of the reference's `flatten_stuct_schema`
  * (`/root/reference/yelp_etl/pipeline/clean.py:161-179`): recursively
  * expand struct fields into `parent_child`-named, lower-cased
  * top-level columns; non-struct fields (and structs not listed in
  * `only`) pass through unchanged. This is driver-side plan
  * construction over `df.schema` — zero extra jobs, and the resulting
  * projection is a plain `select` Catalyst prunes columns through.
  */
object SchemaOps {

  /** Column list that flattens `only` (or every, when None) struct
    * column of `schema`; nested structs flatten recursively.
    */
  def flattenStruct(
      schema: StructType,
      prefix: Option[String] = None,
      only: Option[Seq[String]] = None): Seq[Column] =
    schema.fields.toSeq.flatMap { f: StructField =>
      val path = prefix.map(p => s"$p.${f.name}").getOrElse(f.name)
      f.dataType match {
        case st: StructType if only.forall(_.contains(f.name)) || prefix.isDefined =>
          // Top-level structs honor the `only` filter; once inside a
          // selected struct, all nested levels flatten (the reference
          // passes struct_columns=None on recursion).
          flattenStruct(st, Some(path), None)
        case _ =>
          Seq(col(path).as(path.replace(".", "_").toLowerCase))
      }
    }

  /** Apply the flattening projection to a frame. */
  def flatten(df: DataFrame, only: Seq[String]): DataFrame =
    df.select(flattenStruct(df.schema, None, Some(only)): _*)

  /** New column names introduced by flattening `only` — the set the
    * clean stage then repairs/types (`clean.py:65`, `109-111`). The
    * reference uses a Python `set` difference (nondeterministic
    * order); we sort for reproducibility (SURVEY.md §7.4 item 2).
    */
  def flattenedColumnNames(df: DataFrame, only: Seq[String]): Seq[String] = {
    val before = df.columns.toSet
    flatten(df, only).columns.filterNot(before).sorted.toSeq
  }
}
