package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.streaming.OutputMode.Append

/** Event sessionization — gap-based session windows over the events table,
  * in both batch and streaming forms, plus a custom-state example.
  *
  * `session_window` is the built-in, Catalyst-planned path (merging
  * windows, watermark-evictable state in streaming) and is preferred;
  * `userRunningStats` shows the `mapGroupsWithState` escape hatch for
  * state machines the built-ins can't express.
  */
object Sessionize {

  /** Gap-based sessions per user. Works identically over a batch frame or
    * a watermarked stream (same plan family; streaming keeps only open
    * sessions in state). Output: user_id, session_start_ms, session_end_ms,
    * n_events, total_value_cents (decimal-exact per-row cast, emitted as
    * BIGINT integer cents so the value renders identically cross-engine).
    */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("value").cast("decimal(18,2)")) * 100)
          .cast("long").as("total_value_cents"))
      .select(
        unix_millis(col("session_window.start")).as("session_start_ms"),
        unix_millis(col("session_window.end")).as("session_end_ms"),
        col("user_id"), col("n_events"), col("total_value_cents"))

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserStats(user_id: Long, n_events: Long, total_value: Double,
                             last_seen_ms: Long)

  final case class Anomaly(user_id: Long, ts: java.sql.Timestamp,
                           value: Double, running_mean: Double)

  /** Custom keyed state via flatMapGroupsWithState: emit an anomaly row
    * for each event whose value exceeds `factor` × the user's running
    * mean — zero-to-many outputs per input, which mapGroupsWithState
    * can't express. State per key is two numbers; emission is append-mode.
    */
  def anomalies(events: Dataset[UserEvent], factor: Double = 3.0): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), Anomaly](
        Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[(Long, Double)]) =>
          var (n, sum) = state.getOption.getOrElse((0L, 0.0))
          val out = scala.collection.mutable.ArrayBuffer.empty[Anomaly]
          // flatMapGroupsWithState gives no within-batch ordering; sort by
          // event time so the running mean is deterministic for any
          // shuffle/arrival order. (Cross-batch late events still fold in
          // arrival order — the usual streaming trade; add a watermark +
          // buffer state for full event-time ordering.)
          batch.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
            val mean = if (n == 0) e.value else sum / n
            if (n > 0 && e.value > factor * mean)
              out += Anomaly(user, e.ts, e.value, mean)
            n += 1; sum += e.value
          }
          state.update((n, sum))
          out.iterator
      }
  }

  final case class CentsEvent(user_id: Long, tms: Long, value_cents: Long)
  final case class ExactAnomaly(user_id: Long, tms: Long, value_cents: Long,
                                n_prev: Long, sum_prev_cents: Long)

  /** [[anomalies]] with EXACT integer arithmetic — the oracle-hashable
    * variant: values are pre-converted to decimal cents in DataFrame
    * land (one projection, same cast chain as every *_cents column in
    * the catalog), and the flag test avoids the float mean entirely:
    * `value > factor · mean(prev)` ⟺
    * `value_cents · n_prev · factorDen > factorNum · sum_prev_cents ·
    * factorDen_den…` — all BIGINT, no rounding anywhere, so a DuckDB
    * window replay hashes identically. Output carries the exact state
    * (`n_prev`, `sum_prev_cents`) instead of a derived float mean.
    *
    * Same state machine as [[anomalies]] (flatMapGroupsWithState,
    * zero-to-many emissions per input, two-number state per key); the
    * within-batch (tms, value_cents) sort makes batch-mode output a
    * pure function of the input.
    */
  def anomaliesExact(events: Dataset[CentsEvent], factorNum: Long = 3L,
                     factorDen: Long = 1L): Dataset[ExactAnomaly] = {
    import events.sparkSession.implicits._
    require(factorNum > 0 && factorDen > 0, "anomaliesExact: factor > 0")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long), ExactAnomaly](
        Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[CentsEvent], state: GroupState[(Long, Long)]) =>
          var (n, sum) = state.getOption.getOrElse((0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[ExactAnomaly]
          batch.toSeq.sortBy(e => (e.tms, e.value_cents)).foreach { e =>
            // value > factor·mean(prev) ⟺ value·n·den > num·sum (n > 0).
            // Exact at ANY magnitude: the Long fast path detects overflow
            // (multiplyExact) and falls back to BigInt — a hot key with
            // huge cents or a long-running stream can no longer silently
            // wrap and flip the verdict vs the 128-bit oracle.
            val flagged = n > 0 && {
              try Math.multiplyExact(Math.multiplyExact(e.value_cents, n),
                    factorDen) > Math.multiplyExact(factorNum, sum)
              catch { case _: ArithmeticException =>
                BigInt(e.value_cents) * n * factorDen > BigInt(factorNum) * sum
              }
            }
            if (flagged)
              out += ExactAnomaly(user, e.tms, e.value_cents, n, sum)
            // state sum overflows loudly instead of corrupting every
            // later verdict (sum of cents past 2⁶³ means the caller's
            // unit choice is wrong, not a condition to paper over)
            n += 1; sum = Math.addExact(sum, e.value_cents)
          }
          state.update((n, sum))
          out.iterator
      }
  }

  /** Custom keyed state via mapGroupsWithState: a per-user running
    * activity profile (event count, value sum, last-seen). The built-in
    * aggregations cover this in batch; the point is the streaming state
    * machine — updates survive across micro-batches, keyed state is
    * sharded by user across executors.
    */
  def userRunningStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(user, 0L, 0.0, 0L))
          val next = batch.foldLeft(prev) { (acc, e) =>
            UserStats(user, acc.n_events + 1, acc.total_value + e.value,
              math.max(acc.last_seen_ms, e.ts.getTime))
          }
          state.update(next)
          next
      }
  }
}
