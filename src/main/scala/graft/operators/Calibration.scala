package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Score calibration for corpus quality classifiers.
  *
  * A margin score (e.g. [[TextAnalysis.nbQualityScore]]) ranks documents,
  * but thresholding and mixing decisions need a PROBABILITY — "keep docs
  * with ≥ 60% curated-likelihood", "weight domains by expected quality".
  * Isotonic regression (Zadrozny & Elkan, KDD 2002) is the standard
  * nonparametric mapping: the monotone step function minimizing squared
  * error against observed outcomes, classically fit with the
  * pool-adjacent-violators algorithm (Barlow et al. 1972).
  */
object Calibration {

  /** Isotonic (PAVA) calibration of a score column against a binary
    * outcome column, on equal-width score buckets.
    *
    * Shape: ONE distributed pass buckets the corpus and aggregates
    * per-bucket `(n, positives)` — a partial-aggregable hash
    * aggregation, the only stage that touches data volume. The fit
    * itself runs on the model-sized bucket table (≤ `buckets` rows)
    * via the max-min characterization of isotonic regression
    * (`fit(i) = max_{j≤i} min_{k≥i} mean(j..k)`, Robertson–Wright–
    * Dykstra) — O(B³) interval work expressed declaratively, which at
    * B ≤ 64 is thousands of rows, not a driver-side loop. Equivalent
    * to sequential PAVA pooling, but every comparison is a plain
    * double comparison of identical correctly-rounded quotients, so
    * the fit replays bit-for-bit cross-engine.
    *
    * Output, one row per non-empty bucket, score-ascending:
    * `(bucket, lo, hi, n, pos, rate_permille, fitted_permille)` —
    * `lo`/`hi` the observed score bounds, `rate_permille` the raw
    * bucket rate (integer `1000·pos div n`), `fitted_permille` the
    * isotonic fit (`floor(1000·fit)`, non-decreasing in score).
    *
    * Contracts: `labelCol` must be 0/1; `scoreCol` integral (the
    * engine's margin scores are exact integers); `(max−min+1)·buckets`
    * must fit in a long (margin scores are ≤ ~2³⁰, so any sane bucket
    * count does).
    */
  def isotonicCalibrate(scored: DataFrame, scoreCol: String,
                        labelCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, s"isotonicCalibrate: buckets must be >= 1, got $buckets")
    val probe = scored.agg(min(col(scoreCol)).cast("long"),
      max(col(scoreCol)).cast("long")).first()
    require(!probe.isNullAt(0), "isotonicCalibrate: empty input")
    val minS = probe.getLong(0)
    val span = probe.getLong(1) - minS + 1
    val agg = scored.select(
        expr(s"CAST((($scoreCol - ${minS}L) * ${buckets}L) DIV ${span}L AS BIGINT)")
          .as("bucket"),
        col(scoreCol).cast("long").as("s"),
        col(labelCol).cast("long").as("y"))
      .groupBy("bucket")
      .agg(min("s").as("lo"), max("s").as("hi"),
        count(lit(1)).as("n"), sum("y").as("pos"))
    // everything below is model-sized (≤ buckets rows): the unpartitioned
    // windows and inequality joins are deliberate, not a scale hazard
    val w = Window.orderBy("bucket")
    val idx = agg
      .withColumn("i", row_number().over(w))
      .withColumn("cn", sum("n").over(w))
      .withColumn("cy", sum("pos").over(w))
    val jside = idx.select(col("i").as("ji"),
      (col("cn") - col("n")).as("pn"), (col("cy") - col("pos")).as("py"))
    val kside = idx.select(col("i").as("ki"),
      col("cn").as("kn"), col("cy").as("ky"))
    val intervals = jside.join(kside, col("ki") >= col("ji"))
      .select(col("ji"), col("ki"),
        ((col("ky") - col("py")).cast("double") /
         (col("kn") - col("pn")).cast("double")).as("rate"))
    val fitted = idx.select(col("i"))
      .join(intervals, col("ji") <= col("i") && col("ki") >= col("i"))
      .groupBy("i", "ji").agg(min("rate").as("minr"))
      .groupBy("i").agg(max("minr").as("fit"))
    idx.join(fitted, "i")
      .select(col("bucket"), col("lo"), col("hi"), col("n"), col("pos"),
        expr("CAST(1000 * pos DIV n AS BIGINT)").as("rate_permille"),
        floor(col("fit") * lit(1000.0)).cast("long").as("fitted_permille"))
  }

  /** Serve a persisted calibration table: map each row's score to the
    * fitted rate of the bucket with the greatest `lo ≤ score` (the
    * step-function serve of isotonic regression); scores below the
    * trained range clamp to the first bucket's fit, above it the last
    * bucket's `lo` matches. The calibration table is model-sized, so
    * the inequality join is a broadcast fan-out of ≤ `buckets` rows per
    * document — bounded, never a data×data product.
    *
    * Output: (idCol, score, calibrated_permille). [[stepColumn]] is the
    * plan-constant (zero-join, streaming-safe) form of the same step
    * function; the two agree row-for-row.
    */
  def applyCalibration(scored: DataFrame, idCol: String, scoreCol: String,
                       calib: DataFrame): DataFrame = {
    val first = calib.orderBy("lo").select("fitted_permille").limit(1).collect()
    require(first.nonEmpty, "applyCalibration: empty calibration table")
    val firstFit = first(0).getLong(0)
    val steps = broadcast(calib.select(col("lo"), col("fitted_permille").as("__fit")))
    scored.select(col(idCol), col(scoreCol).cast("long").as("score"))
      .join(steps, col("score") >= col("lo"), "left")
      .groupBy(idCol, "score")
      // lexicographic max over (lo, fit): lo is unique per bucket, so
      // this is exactly "fit of the greatest matching lo"; an unmatched
      // (below-range) row aggregates a single null struct → coalesce
      .agg(max(struct(col("lo"), col("__fit"))).as("__m"))
      .select(col(idCol), col("score"),
        coalesce(col("__m").getField("__fit"), lit(firstFit))
          .as("calibrated_permille"))
  }

  /** Calibration-quality evaluation: the Brier score of the calibrated
    * probabilities against the observed 0/1 outcomes, and the SKILL
    * relative to the climatological baseline (the constant base-rate
    * predictor) — `skill = 1 − Brier_cal/Brier_base`, the standard
    * "did calibrating actually buy predictive value" number (Brier
    * 1950; skill-score form per Murphy 1973).
    *
    * Exact in ONE aggregation pass: squared errors live on the permille
    * lattice (`(p − 1000·y)²`), and the baseline sum needs no second
    * pass — with `p₀ = ⌊1000·pos/n⌋`,
    * `Brier_base_sum = n·p₀² − 2000·p₀·pos + 10⁶·pos` algebraically.
    * The skill quotient is DECIMAL(38,0) with the exact-divisible
    * truncation identity (sign-safe: a calibrator can be WORSE than
    * the base rate and the negative skill must replay too).
    *
    * Input: one row per example with `pCol` (calibrated permille) and
    * `yCol` (0/1). Output, one row: (n, pos, base_rate_permille,
    * brier_cal_sum, brier_base_sum, skill_permille).
    */
  def calibrationEval(df: DataFrame, pCol: String, yCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def d(c: Column) = c.cast(dec)
    val agg = df.agg(
      count(lit(1)).as("n"),
      sum(col(yCol).cast("long")).as("pos"),
      sum(d(col(pCol) - lit(1000L) * col(yCol)) *
          d(col(pCol) - lit(1000L) * col(yCol))).as("brier_cal_sum"))
      .withColumn("base_rate_permille",
        expr("CAST(1000 * pos DIV n AS BIGINT)"))
    val p0 = d(col("base_rate_permille"))
    val base = d(col("n")) * p0 * p0 -
      d(lit(2000L)) * p0 * d(col("pos")) + d(lit(1000000L)) * d(col("pos"))
    val num = (base - col("__cal")) * d(lit(1000L))
    agg
      .withColumn("__cal", col("brier_cal_sum").cast(dec))
      .withColumn("__base", base)
      .select(col("n"), col("pos"), col("base_rate_permille"),
        col("__cal").cast("long").as("brier_cal_sum"),
        col("__base").cast("long").as("brier_base_sum"),
        when(col("__base") > 0,
          ((num - num % col("__base")) / col("__base")).cast("long"))
          .as("skill_permille"))
  }

  /** Exact ROC AUC of an integer score against 0/1 outcomes — the
    * discrimination companion to [[calibrationEval]]'s Brier
    * (calibration and discrimination are independent failure modes; a
    * gate needs both numbers). Computed as the Mann–Whitney U
    * statistic on the score-VALUE lattice with midrank tie handling:
    * group by distinct score → (n_pos, n_neg) per value, one ordered
    * cumulative pass, `U₂ = Σ_s n_pos(s)·(2·cum_neg_below(s) + n_neg(s))`
    * (the ×2 lattice keeps half-ranks integral), and
    * `auc_e6 = ⌊10⁶·U₂ / (2·pos·neg)⌋` in DECIMAL(38,0).
    *
    * Scale shape: the corpus compacts to its DISTINCT score values in
    * one partial-aggregated pass (the [[Profiling.exactQuantiles]]
    * argument — bounded-domain metrics compact orders of magnitude
    * below row count); the single unpartitioned cumulative window runs
    * over that compact table only.
    *
    * Output, one row: (n, pos, neg, u2, auc_e6) — auc_e6 null when
    * either class is empty (AUC undefined).
    *
    * The cumulative window's single partition is bounded by DISTINCT
    * score cardinality, which for the quantized integer scores this
    * pipeline produces (permille/e6 scales) is model-sized — but the
    * API is public, and a caller passing raw 64-bit scores would get a
    * silent single-partition sort of ~corpus-distinct rows. An eager
    * cardinality probe (the [[Profiling.distributionDrift]] pattern —
    * it probes min/max eagerly for the same reason) fails LOUDLY past
    * `maxDistinctScores` with the fix in the message: bucketize first.
    */
  def aucEval(df: DataFrame, scoreCol: String, yCol: String,
              maxDistinctScores: Long = 1L << 22): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def d(c: Column) = c.cast(dec)
    // EXACT distinct count: an approximate (HLL) probe against a hard
    // require would spuriously fail legitimate inputs near the bound
    // (and silently pass ones just over it)
    val nDistinct = df.agg(
      countDistinct(col(scoreCol))).first().getLong(0)
    require(nDistinct <= maxDistinctScores,
      s"aucEval: $nDistinct distinct scores exceeds the " +
        s"$maxDistinctScores bound of the single-partition rank window — " +
        "bucketize/quantize the score first (distributionDrift's bucket " +
        "projection), or raise maxDistinctScores deliberately")
    val byScore = df.select(col(scoreCol).cast("long").as("s"),
        col(yCol).cast("long").as("y"))
      .groupBy("s")
      .agg(sum("y").as("np"), (count(lit(1)) - sum("y")).as("nn"))
    val w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    val agg = byScore
      .withColumn("cnb", coalesce(sum("nn").over(w), lit(0L)))
      .agg(sum(d(col("np")) * (d(lit(2L)) * d(col("cnb")) + d(col("nn"))))
          .as("u2"),
        sum("np").as("pos"), sum("nn").as("neg"))
    val den = d(lit(2L)) * d(col("pos")) * d(col("neg"))
    val num = col("u2") * d(lit(1000000L))
    agg.select(
      (col("pos") + col("neg")).as("n"), col("pos"), col("neg"),
      col("u2").cast("long").as("u2"),
      when(col("pos") > 0 && col("neg") > 0,
        ((num - num % den) / den).cast("long")).as("auc_e6"))
  }

  /** The calibration step function as a plan-constant Column: a
    * when-chain over the sorted (lo → fitted_permille) steps — an O(B)
    * projection with no join and no state, the form a streaming serve
    * path folds into each arriving row. Agrees with [[applyCalibration]]
    * on every score, including below-range clamping.
    */
  def stepColumn(score: Column, steps: Seq[(Long, Long)]): Column = {
    require(steps.nonEmpty, "stepColumn: empty calibration steps")
    val sorted = steps.sortBy(_._1)
    sorted.foldLeft(lit(sorted.head._2): Column) { case (acc, (lo, fit)) =>
      when(score >= lit(lo), lit(fit)).otherwise(acc)
    }
  }
}
