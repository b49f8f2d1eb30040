package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The shuffle-bytes BUDGET GATE (SCALE.md r13): re-measures the ten
  * budgeted headline heavies in the test environment (shared local[4]
  * session, sf0.01 — bytes are environment-dependent, so the pinned
  * numbers below were measured HERE, while the committed
  * SHUFFLE_BUDGET.json carries the bench environment's sf0.1 numbers
  * from the same `ShuffleBudget.measure` helper) and fails when any
  * query's exchange volume grows past 2× its pinned budget — the
  * structural signature of a lost broadcast, a dropped map-side
  * combine, or a join that started shuffling its big side. The lower
  * gate (< 1/8×) catches the opposite silent failure: an entry whose
  * work stopped executing (count-only pruning, a dropped stage) would
  * "improve" to ~zero bytes and sail through a one-sided gate.
  *
  * Queries budgeted at ZERO are shuffle-free by design (plan-literal
  * broadcasts, projection-only pipelines); for those the gate is that
  * they STAY shuffle-free — 64 KiB of slack covers listener noise.
  */
class ShuffleBudgetSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  val dir = "/root/testdata/sf0.01"

  /** Pinned test-env budgets (bytes), measured by this spec's own
    * `ShuffleBudget.measure` run in this environment. Regenerate by
    * running the spec and copying the `info` line when a deliberate
    * plan change moves a budget.
    */
  val pinned: Map[String, Long] = Map(
    // r15: re-pinned 69154 -> 19644 when the d²-explode second-moment
    // pass fused into SecondMomentAgg (one ~9 KB buffer per partition
    // instead of d²+d+1 partial-agg rows)
    "x_emb_pca" -> 19644L,
    "x_dedup_incremental" -> 2083963L,
    "x_knn_components" -> 1436993L,
    "x_split_leakfree" -> 2143702L,
    "x_dedup_clusters" -> 2139824L,
    "q_stream_hourly" -> 196056L,
    "x_ann_autotune_ivfpq" -> 242901L,
    "x_dedup_best" -> 2140008L,
    "x_eval_dedup_sampled" -> 1402887L,
    "x_dedup_cross" -> 2502116L,
    "x_spatial_dbscan" -> 277535L,
    "x_spatial_join" -> 12086L)

  test("headline heavies stay within 2x of their shuffle-byte budgets") {
    val measured = ShuffleBudget.measure(spark,
      ShuffleBudget.budgetedQueries, dir)
    info("measured budgets: " + measured.map { case (n, b) =>
      s""""$n" -> ${b}L""" }.mkString(", "))
    val slack = 64L * 1024L
    val breaches = measured.flatMap { case (n, b) =>
      val budget = pinned(n)
      if (budget <= 0L) {
        if (b > slack)
          Some(s"$n: shuffle-free budget breached ($b bytes)") else None
      } else if (b > budget * 2)
        Some(s"$n: $b bytes > 2x budget $budget")
      else if (b < budget / 8)
        Some(s"$n: $b bytes < budget/8 of $budget — work stopped executing")
      else None
    }
    assert(breaches.isEmpty, breaches.mkString("; "))
  }
}
