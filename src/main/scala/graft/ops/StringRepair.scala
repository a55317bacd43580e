package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Python-literal → JSON string repair (F5–F7).
  *
  * Reproduces the reference's per-attribute-column cleaning chain
  * (`/root/reference/yelp_etl/pipeline/clean.py:66-94`) — Yelp
  * attribute values arrive as Python literals (`u'free'`,
  * `"{'romantic': False, u'casual': True, 'touristy': None}"`) and
  * must become valid JSON / NULL before `from_json`/cast typing.
  *
  * Order matters and is exactly the reference's:
  *   1. strip a whole-value `u'…'` wrapper
  *   2. strip inner `u'…'` wrappers (keep the quotes)
  *   3. unquote `'none'` → none
  *   4. whole-value none (case-insensitive) → NULL
  *   5. `None`/`none` → null   (JSON null inside object literals)
  *   6. `False` → false, `True` → true
  *
  * All six are stock `regexp_replace`/`when` expressions — one
  * codegen'd projection, no shuffle, scale-free.
  */
object StringRepair {

  /** Steps 1–3: unicode-literal and quoted-none cleanup. */
  def stripPythonWrappers(c: Column): Column = {
    val c1 = regexp_replace(c, "^u'(.*)'$", "$1")
    val c2 = regexp_replace(c1, "u('.*?')", "$1")
    regexp_replace(c2, "'none'", "none")
  }

  /** Step 4: a value that *is* (case-insensitively) "none" → NULL. */
  def noneToNull(c: Column): Column =
    when(lower(c) === "none", lit(null)).otherwise(c)

  /** Steps 5–6: Python keywords → JSON keywords. */
  def pythonKeywordsToJson(c: Column): Column = {
    val c1 = regexp_replace(c, "[Nn]one", "null")
    val c2 = regexp_replace(c1, "False", "false")
    regexp_replace(c2, "True", "true")
  }

  /** The full 6-step repair chain. */
  def repair(c: Column): Column =
    pythonKeywordsToJson(noneToNull(stripPythonWrappers(c)))
}
