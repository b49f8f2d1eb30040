package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus profiling: exact order statistics and per-column summaries —
  * the "know your data before you train on it" surface (length
  * distributions per language, null/distinct audits on ingested batches).
  *
  * Both operators are EXACT (integer/lexicographic arithmetic only) so
  * the DuckDB oracle replays them hash-identically, and both are shaped
  * for the 100 TB corpus, not the 100 MB sample:
  *
  *  - [[exactQuantiles]] never sorts or windows the raw rows. It compacts
  *    the corpus to (group, value, count) — one partial-aggregated
  *    shuffle — and takes order statistics on the compact distinct-value
  *    table. `q_percentiles`' window-over-rows form puts a whole group's
  *    ROWS in one task; this puts a group's distinct VALUES there, which
  *    for bounded-domain metrics (token counts, char lengths, scores in
  *    fixed units) is orders of magnitude smaller and independent of
  *    corpus row count.
  *  - [[columnProfile]] is one aggregation pass over the input (the
  *    multi-column exact distinct expands rows k-fold map-side — the
  *    standard cost of exact multi-distinct; swap `exact = false` for
  *    HLL-sketched distincts at the largest scales).
  */
object Profiling {

  /** Exact discrete quantiles per group: for each (label, num, den) spec
    * the smallest value whose cumulative row count reaches
    * `ceil(n · num/den)` — the order-statistic ("quantile_disc")
    * definition, so every result IS a data value and both engines emit
    * identical bits.
    *
    * `valueCol` must be integral (cast upstream); null values are
    * rejected loudly (their sort placement is engine-specific).
    *
    * Scale shape: `groupBy(group, value).count()` compacts the corpus
    * with map-side partial aggregation; the window cumsum then runs over
    * DISTINCT VALUES per group — for a token-length profile that is
    * ≤ ~10⁵ rows per group regardless of corpus size. The quantile specs
    * explode against the compact table only.
    */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     quantiles: Seq[(String, Int, Int)]): DataFrame = {
    require(quantiles.nonEmpty, "exactQuantiles: need at least one quantile")
    quantiles.foreach { case (label, num, den) =>
      require(num >= 1 && den >= 1 && num <= den,
        s"exactQuantiles: quantile $label = $num/$den not in (0, 1]")
    }
    val vt = df.schema(valueCol).dataType
    require(vt == org.apache.spark.sql.types.LongType ||
        vt == org.apache.spark.sql.types.IntegerType,
      s"exactQuantiles: valueCol must be integral, got ${vt.simpleString}")
    val counts = df
      .select(col(groupCol).as("grp"), col(valueCol).cast("long").as("v"))
      .withColumn("v", assertNotNullLong(col("v"),
        "exactQuantiles: null value (valueCol must be non-null)"))
      .groupBy("grp", "v").agg(count(lit(1)).as("cnt"))
    val byValue = Window.partitionBy("grp").orderBy("v")
    val cum = counts
      .withColumn("cum", sum("cnt").over(byValue))
      .withColumn("n", sum("cnt").over(Window.partitionBy("grp")))
    val specs = array(quantiles.map { case (label, num, den) =>
      struct(lit(label).as("label"), lit(num.toLong).as("num"),
        lit(den.toLong).as("den"))
    }: _*)
    cum.select(col("grp"), col("v"), col("cum"), col("n"),
        explode(specs).as("q"))
      // ceil(n·num/den) in pure long arithmetic — `div`, not `/` (which
      // is double division in Spark and goes inexact past 2^53)
      .withColumn("target", expr("(q.num * n + q.den - 1L) div q.den"))
      .filter(col("cum") >= col("target"))
      .groupBy(col("grp"), col("q.label").as("q_label"))
      .agg(min("v").as("q_value"), max("n").as("n_rows"))
  }

  private def assertNotNullLong(c: Column, msg: String): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    toColumn(org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(
      toExpression(c), Seq(msg)))
  }

  /** Per-column profile of a frame: row count, null count, exact distinct
    * count, lexicographic min/max of the string rendering — the batch
    * audit run before a corpus lands in the training mix.
    *
    * min/max compare the CAST-TO-STRING values (binary collation in both
    * engines) so one output type serves every column type; numeric
    * renderings are engine-identical for integral and string columns
    * (profile doubles with a scaled-integer projection upstream).
    *
    * One aggregation pass: Spark plans the k exact distincts as a k-way
    * Expand (each input row contributes one copy per distinct-clause) —
    * linear in k·rows with map-side partial aggregation, no join. Set
    * `exact = false` to use HLL `approx_count_distinct` instead, which
    * drops the Expand entirely — the 100 TB default when ±2% is fine.
    */
  def columnProfile(df: DataFrame, cols: Seq[String],
                    exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "columnProfile: need at least one column")
    cols.foreach(c => require(df.columns.contains(c),
      s"columnProfile: no such column $c"))
    val aggs = cols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(s).as(s"__min_$c"),
        max(s).as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = array(cols.map { c =>
      struct(lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").cast("long").as("n_distinct"),
        col(s"__min_$c").as("min_repr"),
        col(s"__max_$c").as("max_repr"))
    }: _*)
    wide.select(explode(rows).as("p")).select("p.*")
  }

  /** Distribution-drift monitor between two slices of an integer metric
    * (classifier scores week-over-week, quality margins per ingest
    * source): per-bucket mass gap and TOTAL VARIATION distance on shared
    * equal-width buckets — the alarm a scoring pipeline wires before
    * thresholds silently rot. TV = ½ Σ_b |n_a/N_A − n_b/N_B|, computed
    * as the exact common-denominator integers
    * `gap_b = |n_a·N_B − n_b·N_A|` in DECIMAL(38,0) (no float, no
    * overflow at any corpus size), quantized per bucket and in total as
    * ppm: `⌊10⁶·gap / (2·N_A·N_B)⌋`.
    *
    * One union + ONE hash aggregation over both slices (map-side
    * partial); the B-row tail (window total) is model-sized. Output,
    * bucket-ascending: (bucket, n_a, n_b, gap_ppm, tv_ppm) — tv_ppm is
    * the corpus-level reading repeated per row (0 = identical
    * distributions, 10⁶ = disjoint).
    */
  def distributionDrift(a: DataFrame, b: DataFrame, valueCol: String,
                        buckets: Int): DataFrame = {
    require(buckets >= 1, s"distributionDrift: buckets must be >= 1, got $buckets")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val u = a.select(col(valueCol).cast("long").as("v"), lit(1L).as("__sa"))
      .unionByName(
        b.select(col(valueCol).cast("long").as("v"), lit(0L).as("__sa")))
    val probe = u.agg(min("v"), max("v"), sum("__sa"), count(lit(1))).first()
    require(!probe.isNullAt(0), "distributionDrift: empty input")
    val minV = probe.getLong(0)
    val span = probe.getLong(1) - minV + 1
    val na = probe.getLong(2)
    val nb = probe.getLong(3) - na
    require(na > 0 && nb > 0, "distributionDrift: both slices must be non-empty")
    val agg = u.select(
        expr(s"CAST(((v - ${minV}L) * ${buckets}L) DIV ${span}L AS BIGINT)")
          .as("bucket"),
        col("__sa"))
      .groupBy("bucket")
      .agg(sum("__sa").as("n_a"), (count(lit(1)) - sum("__sa")).as("n_b"))
    // exact-divisible floor: all quantities non-negative
    def ppm(gap: Column): Column = {
      val n = gap * lit(1000000L).cast(dec)
      val d = (lit(na).cast(dec) * lit(nb).cast(dec)) * lit(2).cast(dec)
      ((n - n % d) / d).cast("long")
    }
    val gap = abs(col("n_a").cast(dec) * lit(nb).cast(dec) -
      col("n_b").cast(dec) * lit(na).cast(dec))
    agg.withColumn("__gap", gap)
      .withColumn("gap_ppm", ppm(col("__gap")))
      .withColumn("tv_ppm", ppm(sum(col("__gap")).over(Window.partitionBy())))
      .select("bucket", "n_a", "n_b", "gap_ppm", "tv_ppm")
  }
}
