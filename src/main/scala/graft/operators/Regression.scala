package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Closed-form regression fits over corpus features.
  *
  * The 100 TB shape for "fit a model on the whole corpus" is NOT
  * iterative SGD — it is the normal equations: one partial-aggregable
  * pass accumulates the sufficient statistics (a handful of product
  * sums), and the solve happens on the aggregate, per group, in exact
  * integer arithmetic (Cramer's rule). No driver-side data, no epochs,
  * no convergence knobs; adding data only grows the one aggregation.
  */
object Regression {

  private val dec = DecimalType(38, 0)
  private def d(c: Column): Column = c.cast(dec)

  /** Exact truncated integer quotient on DECIMAL(38,0): `n % den` makes
    * the division exact-integer (a bare decimal division rounds at
    * result scale). Truncated-remainder semantics match DuckDB's
    * `%` + exactly-divisible `//` replay for either sign.
    */
  private def truncDiv(n: Column, den: Column): Column =
    ((n - n % den) / den).cast("long")

  /** Per-group simple linear regression `y ~ a + b·x` by the normal
    * equations, ppm/permille-quantized and integer-exact.
    *
    * One hash aggregation computes the per-group sufficient statistics
    * `(n, Σx, Σy, Σx², Σxy, Σy²)`; Cramer's rule then yields
    *
    *   slope_ppm     = ⌊10⁶ · (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)⌋
    *   intercept_ppm = ⌊10⁶ · (Σx²Σy − ΣxΣxy) / (nΣx² − (Σx)²)⌋
    *   r2_permille   = ⌊10³ · (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))⌋
    *
    * (⌊·⌋ = truncation toward zero), all evaluated in DECIMAL(38,0) —
    * no float touches the fit. Groups with zero x-variance get null
    * fit columns (nothing to regress on); zero y-variance nulls only
    * r². Contracts: x and y integral with |x·y|, x², y² < 2⁶³ per row
    * (sums are decimal-exact beyond that), and per-group
    * `10⁶·|cross-moment products|` < 10³⁸ — satisfied by corpus
    * features (tokens, chars, margin scores) at any realistic scale.
    *
    * Output: (groupCol, n, slope_ppm, intercept_ppm, r2_permille).
    */
  def groupedLinearFit(df: DataFrame, groupCol: String, xCol: String,
                       yCol: String): DataFrame = {
    val rows = df.select(col(groupCol).as("__g"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val sums = rows.groupBy("__g").agg(
      count(lit(1)).as("n"),
      sum(d(col("x"))).as("sx"), sum(d(col("y"))).as("sy"),
      sum(d(col("x")) * d(col("x"))).as("sxx"),
      sum(d(col("x")) * d(col("y"))).as("sxy"),
      sum(d(col("y")) * d(col("y"))).as("syy"))
    val det = d(col("n")) * col("sxx") - col("sx") * col("sx")
    val covn = d(col("n")) * col("sxy") - col("sx") * col("sy")
    val vary = d(col("n")) * col("syy") - col("sy") * col("sy")
    val icn = col("sxx") * col("sy") - col("sx") * col("sxy")
    val m = d(lit(1000000L))
    sums.select(col("__g").as(groupCol), col("n"),
      when(det > 0, truncDiv(m * covn, det)).as("slope_ppm"),
      when(det > 0, truncDiv(m * icn, det)).as("intercept_ppm"),
      when(det > 0 && vary > 0,
        truncDiv(d(lit(1000L)) * covn * covn, det * vary))
        .as("r2_permille"))
  }
}
