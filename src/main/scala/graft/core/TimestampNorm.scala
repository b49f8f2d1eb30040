package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** UTC normalization of timestamp columns.
  *
  * Reproduces the semantics of the reference's `convert_dts_utc`
  * (`/root/reference/src/agol_pandas.py:86-119`): every naive datetime
  * column is *localized* to UTC (i.e. its wall-clock values are interpreted
  * as UTC), every tz-aware column is *converted* to UTC.
  *
  * In Spark this is nearly free: `TimestampType` is stored as micros since
  * the UTC epoch (already "converted"); `TimestampNTZType` is naive, and a
  * cast to `TimestampType` under a UTC session timezone interprets the naive
  * wall-clock as UTC — exactly the reference's `tz_localize('UTC')`. The
  * whole operation is a projection (no shuffle, stays in whole-stage
  * codegen), so it scales to arbitrary data sizes.
  *
  * Requires `spark.sql.session.timeZone=UTC` (pinned in build.sbt and in
  * every session builder in this repo).
  */
object TimestampNorm {
  def toUtc(df: DataFrame): DataFrame = {
    val needsCast = df.schema.fields.exists(_.dataType == TimestampNTZType)
    if (!needsCast) df
    else {
      val cols = df.schema.fields.map { f =>
        f.dataType match {
          case TimestampNTZType => col(f.name).cast(TimestampType).as(f.name)
          case _                => col(f.name)
        }
      }
      df.select(cols.toIndexedSeq: _*)
    }
  }

  /** True iff every timestamp column in the frame is tz-aware (UTC-stored). */
  def isUtcNormalized(df: DataFrame): Boolean =
    !df.schema.fields.exists(_.dataType == TimestampNTZType)
}
