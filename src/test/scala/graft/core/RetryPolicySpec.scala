package graft.core

import org.scalatest.funsuite.AnyFunSuite

class RetryPolicySpec extends AnyFunSuite {

  def policy(maxAttempts: Int = 5): (RetryPolicy, () => Seq[Long]) = {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    (RetryPolicy(maxAttempts = maxAttempts, seed = Some(7),
      sleeper = ms => sleeps += ms), () => sleeps.toSeq)
  }

  test("succeeds without sleeping") {
    val (p, sleeps) = policy()
    assert(p.retry(42) == Right(42))
    assert(sleeps().isEmpty)
  }

  test("retries up to maxAttempts then returns the failure") {
    val (p, sleeps) = policy(maxAttempts = 5)
    var calls = 0
    val r = p.retry { calls += 1; sys.error(s"boom $calls") }
    assert(r.isLeft)
    assert(calls == 5) // max_reattempts=5 (src/agol_pandas.py:11)
    assert(sleeps().size == 4)
    assert(sleeps().forall(ms => ms >= 0 && ms <= 30000)) // [0,30]s window
  }

  test("recovers when a later attempt succeeds") {
    val (p, _) = policy()
    var calls = 0
    val r = p.retry { calls += 1; if (calls < 3) sys.error("flaky") else "ok" }
    assert(r == Right("ok"))
    assert(calls == 3)
  }

  test("backoff floor rises with failure count, capped at max") {
    val p = RetryPolicy(randomize = false)
    val rng = new scala.util.Random(1)
    assert(p.backoffAfter(0, rng) == 0.0)
    assert(math.abs(p.backoffAfter(3, rng) - 0.3) < 1e-9)
    assert(p.backoffAfter(1000, rng) == 30.0)
  }
}
