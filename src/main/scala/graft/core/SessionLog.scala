package graft.core

import scala.collection.mutable.ArrayBuffer

/** Session-scoped audit log — the reference's module-global `AP_LOG`
  * bookkeeping (`/root/reference/src/agol_pandas.py:8-43`, `33-43`):
  * `logging_info` accumulates every notable message across calls,
  * `fail_log`/`failures` accumulate the failure history, and both survive
  * individual call boundaries so a load's full history is inspectable at
  * the end of the session.
  *
  * Driver-side only (the reference's global lives in one Python process;
  * here one JVM driver). Executor-side retry state stays in
  * [[RetryPolicy]] — a cross-executor mutable global would serialize the
  * cluster; what belongs at session scope is the *record*, not the
  * backoff coordination.
  */
object SessionLog {

  private val info = ArrayBuffer.empty[String]
  private val fails = ArrayBuffer.empty[String]

  def recordInfo(message: String): Unit = synchronized { info += message }

  def recordFailure(message: String): Unit = synchronized { fails += message }

  /** All recorded messages, oldest first (`AP_LOG.logging_info`). */
  def loggingInfo: Seq[String] = synchronized { info.toVector }

  /** All recorded failures, oldest first (`AP_LOG.fail_log`). */
  def failLog: Seq[String] = synchronized { fails.toVector }

  /** `AP_LOG.failures` — the failure count backing the reference's rising
    * backoff floor.
    */
  def failures: Int = synchronized { fails.size }

  def clear(): Unit = synchronized { info.clear(); fails.clear() }
}
