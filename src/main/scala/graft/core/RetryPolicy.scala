package graft.core

import scala.annotation.tailrec
import scala.util.{Failure, Success, Try}

/** Retry with randomized backoff, the reference's `LoggingObject`
  * (`/root/reference/src/agol_pandas.py:8-43`): up to `maxAttempts=5`
  * attempts, backoff drawn from `[floor, maxBackoff]` where the floor rises
  * by `backoffInterval=0.1s` per recorded failure — adaptive rate limiting
  * shared across a load (`src/agol_pandas.py:616`).
  *
  * Unlike the reference's module-global mutable `AP_LOG`, this is an
  * immutable policy + a per-use mutable counter, safe to instantiate
  * per-task inside executors (no cross-JVM global state to coordinate).
  */
final case class RetryPolicy(
    maxAttempts: Int = 5,
    minBackoffSec: Double = 0.0,
    maxBackoffSec: Double = 30.0,
    backoffIntervalSec: Double = 0.1,
    randomize: Boolean = true,
    seed: Option[Long] = None,
    sleeper: Long => Unit = Thread.sleep) {

  /** Backoff (seconds) after `failures` recorded failures. */
  def backoffAfter(failures: Int, rng: scala.util.Random): Double = {
    val floor = math.min(minBackoffSec + backoffIntervalSec * failures, maxBackoffSec)
    if (randomize) floor + rng.nextDouble() * (maxBackoffSec - floor)
    else floor
  }

  /** Run `op`, retrying on exception with backoff. Returns the result or
    * the final failure after `maxAttempts` attempts. `retryOn` limits
    * which failures are worth retrying — a non-retryable exception (e.g.
    * a 4xx contract violation that will never heal) surfaces immediately.
    */
  def retry[A](op: => A,
               retryOn: Throwable => Boolean = _ => true): Either[Throwable, A] = {
    val rng = seed.map(new scala.util.Random(_)).getOrElse(new scala.util.Random())
    @tailrec def go(attempt: Int): Either[Throwable, A] =
      Try(op) match {
        case Success(a) => Right(a)
        case Failure(e) if attempt >= maxAttempts || !retryOn(e) => Left(e)
        case Failure(_) =>
          sleeper((backoffAfter(attempt, rng) * 1000).toLong)
          go(attempt + 1)
      }
    go(1)
  }
}
// The per-chunk write audit record (the reference's chunk-result dicts,
// src/agol_pandas.py:344-353,621-634) is graft.sources.GraftCommitMessage,
// produced per write partition and assembled on the driver at commit.
