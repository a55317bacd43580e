package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Date-feature bundle (F11–F14) — the reference's most reused
  * compound operator (`/root/reference/yelp_etl/pipeline/clean.py:213-233`):
  * one timestamp-ish column → 8 derived calendar columns, after which
  * the caller drops the source column (`clean.py:140-146`).
  *
  * All 8 are stock Catalyst expressions, so the whole bundle stays in
  * one WholeStageCodegen project — no shuffle, no UDF, scale-free.
  */
object DateFeatures {

  /** The 8 derived columns for `c`.
    *
    * @param c   source column name (string or timestamp typed)
    * @param fmt `to_timestamp` format when the source is a string; None
    *            when the source is already a timestamp. The reference
    *            always parses strings under the LEGACY time parser
    *            (`clean.py:49`) — for its two formats (`yyyy-MM-dd`,
    *            `yyyy-MM-dd HH:mm:ss`) LEGACY and the Spark 4 default
    *            CORRECTED parse valid inputs identically. Spark 4 runs
    *            ANSI mode by default, where `to_timestamp` *throws* on
    *            malformed text — `try_to_timestamp` restores the
    *            reference's Spark-3.5 malformed→NULL semantics.
    */
  def dateFeatures(c: String, fmt: Option[String] = None): Seq[Column] = {
    val ts = fmt.map(f => try_to_timestamp(col(c), lit(f)))
      .getOrElse(try_to_timestamp(col(c)))
    Seq(
      ts.as(s"${c}_ts"),
      to_date(ts).as(s"${c}_date"),
      to_date(date_trunc("week", ts)).as(s"${c}_week_start_date"),
      weekofyear(ts).as(s"${c}_week"),
      quarter(ts).as(s"${c}_quarter"),
      dayofweek(ts).as(s"${c}_dayofweek"),
      month(ts).as(s"${c}_month"),
      year(ts).as(s"${c}_year")
    )
  }

  /** `select *, <features>` then drop the source column — exactly the
    * shape of the reference's clean stage (`clean.py:140-146`).
    */
  def withDateFeatures(df: DataFrame, c: String, fmt: Option[String] = None): DataFrame =
    df.select((col("*") +: dateFeatures(c, fmt)): _*).drop(c)
}
