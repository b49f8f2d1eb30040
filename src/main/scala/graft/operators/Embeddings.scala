package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column aggregation: group-level mean pooling (class
  * centroids, user/topic profiles, cluster seeds for IVF training).
  *
  * Shape: `posexplode` the vector, aggregate per (group, position), then
  * reassemble the ordered array. The shuffle carries (group, pos) partial
  * sums — dims × groups rows — never whole vectors; partial aggregation
  * collapses the exploded rows map-side, so this holds at any corpus
  * size. The alternative (aggregate whole arrays with `zip_with` in a
  * reduce) cannot partial-aggregate and ships every vector to one task
  * per group.
  */
object Embeddings {

  /** Per-group elementwise mean: (group, n_vecs, centroid: Array[Double]).
    * Assembly sorts the (pos, mean) pairs per group — `array_sort` on a
    * struct array orders by the leading `pos` field, so the rebuilt array
    * is position-correct regardless of row arrival order.
    */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(groupCol), col("pos"))
      .agg(count(lit(1)).as("n"), avg(col("x").cast("double")).as("m"))
      .groupBy(col(groupCol))
      .agg(max("n").as("n_vecs"),
        transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))

  /** Exact integer-space pooling projection — the cross-engine-verifiable
    * form: each element maps to `floor(x · scale)` (floor is unambiguous
    * in every engine, unlike round-half ties), summed as longs per
    * (group, position). Float mean values themselves are NOT reproducible
    * across engines (summation order changes the double), which is why
    * the oracle checks this projection and [[meanPool]] is spec-pinned
    * against it instead.
    */
  def poolSums(df: DataFrame, groupCol: String, vecCol: String,
               scale: Long = 1000000L): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(groupCol), col("pos"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(floor(col("x").cast("double") * scale).cast("long")).as("sum_scaled"))

  /** Symmetric int8 quantization per vector: `q_i = round(x_i / s · 127)`
    * with `s = max|x_i|` over the FINITE elements, emitted as (`qvec`
    * tinyint array, `qscale`) — a 4× memory cut for ANN candidate storage
    * (dequantize `q·s/127`, or score int8 directly and rescale). Pure
    * codegen'd Column HOFs (arbitrary column names welcome): one
    * `aggregate` for the max-abs, one `transform` to quantize; no
    * shuffle. All-zero vectors get `qscale = 0` and an all-zero `qvec`;
    * NaN/±Inf elements are excluded from the scale and quantize to 0
    * (under ANSI mode a cast of a non-finite would otherwise kill the
    * job; under non-ANSI it would silently zero the whole vector).
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    import org.apache.spark.sql.Column
    def xd(c: Column): Column = c.cast("double")
    // abs(x) < Inf is false for both NaN (sorts above Inf in Spark SQL
    // comparisons) and ±Inf — one finiteness predicate for both cases
    def finite(c: Column): Column = abs(xd(c)) < lit(Double.PositiveInfinity)
    val s = aggregate(col(vecCol), lit(0.0),
      (a, x) => when(finite(x), greatest(a, abs(xd(x)))).otherwise(a))
    df.withColumn("qscale", s)
      .withColumn("qvec", transform(col(vecCol), x =>
        round(when(col("qscale") === 0 || not(finite(x)), lit(0.0))
          .otherwise(xd(x) / col("qscale") * 127.0)).cast("tinyint")))
  }
}
