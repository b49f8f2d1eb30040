package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Service-name normalization.
  *
  * Reproduces the semantics of the reference's `normalize_service_name`
  * (`/root/reference/src/agol_pandas.py:121-157`): strip surrounding
  * whitespace; prefix `_` if the first character is a digit; replace every
  * non-word character with `_`; collapse runs of `_`; lowercase; truncate to
  * 128 characters. Order of operations matters and matches the reference
  * (digit check happens on the *stripped, pre-substitution* name; lowering
  * happens *after* substitution; truncation last).
  *
  * Note: `\w` here is ASCII `[A-Za-z0-9_]` (Java/RE2 default), which is also
  * what the DuckDB oracle computes. Python's `re` is unicode-aware by
  * default; for ASCII service titles the two agree.
  */
object ServiceName {
  val MaxLength = 128

  /** Pure-Scala normalization — used driver-side when creating tables. */
  def normalize(raw: String): Either[String, String] =
    if (raw == null) Left("service name is null")
    else {
      val stripped = raw.trim
      if (stripped.isEmpty) Left("service name is empty")
      else {
        val prefixed =
          if (stripped.head.isDigit) "_" + stripped else stripped
        val normalized = prefixed
          .replaceAll("[^\\w]", "_")
          .replaceAll("_+", "_")
          .toLowerCase
          .take(MaxLength)
        Right(normalized)
      }
    }

  /** Column form — pure built-in functions (codegen'd, no UDF), so it can
    * run over billions of names without leaving whole-stage codegen.
    */
  def normalizeCol(c: Column): Column = {
    val t = trim(c)
    val prefixed =
      when(substring(t, 1, 1).rlike("^[0-9]$"), concat(lit("_"), t))
        .otherwise(t)
    substring(
      lower(regexp_replace(regexp_replace(prefixed, "[^\\w]", "_"), "_+", "_")),
      1,
      MaxLength)
  }
}
