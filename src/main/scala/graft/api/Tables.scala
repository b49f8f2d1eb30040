package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TimestampNorm

/** Fixture-table loading with canonical typing.
  *
  * Two fixture quirks are normalized here once, so every operator sees
  * clean types:
  *  - `events.ts` is parquet TIMESTAMP(NANOS), which Spark refuses by
  *    default; with `spark.sql.legacy.parquet.nanosAsLong=true` it reads
  *    as a nanos `bigint`, converted here to `TimestampType` (micros,
  *    floor-truncated — the same truncation DuckDB applies).
  *  - date-ish columns are TIMESTAMP_NTZ (naive); `TimestampNorm.toUtc`
  *    localizes them to UTC, the reference's `convert_dts_utc` semantics
  *    (`/root/reference/src/agol_pandas.py:86-119`).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    // the nanos-BIGINT/NTZ decision lives in TimestampNorm, shared with
    // every streaming reader — batch and stream must never drift
    val tsFixed =
      if (name == "events") TimestampNorm.normalizeEventTime(raw) else raw
    TimestampNorm.toUtc(tsFixed)
  }
}
