package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch time-series utilities over event tables. */
object TimeSeries {

  /** Densify hourly aggregates: the full hour grid from the corpus' first
    * to last event, per key, with gap hours ZERO-FILLED — downstream
    * models (and window features) need explicit zeros, not missing rows.
    * Output: (hour_ms, key, n).
    *
    * Scale shape: the observed aggregate is one hash aggregation on
    * (hour, key); the grid is |keys| × |hours| built by exploding an
    * hour `sequence` against the (small, broadcast) bounds row — the
    * event table itself is never crossed with anything. The gap join
    * runs on compact (hour, key) pairs.
    */
  def densifyHourly(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col(tsCol)).as("hour"), col(keyCol))
      .agg(count(lit(1)).as("n"))
    val bounds = events.agg(
      date_trunc("hour", min(col(tsCol))).as("lo"),
      date_trunc("hour", max(col(tsCol))).as("hi"))
    val keys = events.select(col(keyCol)).distinct()
    val grid = keys.crossJoin(broadcast(bounds))
      .select(col(keyCol),
        explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
    grid.join(hourly, Seq("hour", keyCol), "left")
      .select(unix_millis(col("hour")).as("hour_ms"), col(keyCol),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}
