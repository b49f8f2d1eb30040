package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: each left row picks up the latest right row
  * with `right.ts <= left.ts` on the same key — the standard
  * feature-at-time-of-event join for training data (no future leakage).
  *
  * Spark has no native as-of join; the scalable formulation is
  * union-merge: tag both sides, union, then one window pass per key in
  * time order carrying the last-seen right payload forward
  * (`last(..., ignoreNulls)` over unbounded-preceding). Cost: ONE shuffle
  * on the key + a per-partition sort — no range-join row explosion, no
  * broadcast requirement, so it survives 100 TB where an inequality join
  * condition would degenerate to nested loops.
  *
  * Ties at equal timestamps: right rows order before left rows (inclusive
  * `>=` semantics, like DuckDB ASOF); duplicate right rows at the same
  * (key, ts) should be pre-deduplicated by the caller for determinism.
  */
object AsOfJoin {

  /** Left rows + `rightCols` from the as-of matched right row (null when
    * no right row precedes). Output columns: all of `left`, then
    * `rightCols` prefixed with `asof_`.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val keyCols = keys.map(col)
    val lPayload = struct(left.columns.map(col).toIndexedSeq: _*).as("__l")
    val rPayload = struct((rightTs +: rightCols).map(col).toIndexedSeq: _*).as("__r")

    val lTagged = left.select(keyCols ++ Seq(col(leftTs).as("__ts"),
      lit(1).as("__is_left"), lPayload): _*)
      .withColumn("__r", lit(null).cast(
        right.select((rightTs +: rightCols).map(col): _*).schema
          .fields.foldLeft(new org.apache.spark.sql.types.StructType()) {
            (s, f) => s.add(f)
          }))
    val rTagged = right.select(keyCols ++ Seq(col(rightTs).as("__ts"),
      lit(0).as("__is_left"), rPayload): _*)
      .withColumn("__l", lit(null).cast(left.schema))
      .select(keyCols ++ Seq(col("__ts"), col("__is_left"), col("__l"), col("__r")): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)

    lTagged.select(keyCols ++ Seq(col("__ts"), col("__is_left"), col("__l"), col("__r")): _*)
      .unionByName(rTagged)
      .withColumn("__rmatch", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(left.columns.map(c => col(s"__l.$c").as(c)).toIndexedSeq ++
        rightCols.map(c => col(s"__rmatch.$c").as(s"asof_$c")) :+
        col(s"__rmatch.$rightTs").as(s"asof_$rightTs"): _*)
  }

  /** Deterministic hash-bucket train/test split: bucket =
    * `(key * knuth) mod 100`, split = "train" iff bucket < trainPct.
    * Pure integer arithmetic — reproducible across runs, engines, and
    * re-partitioning, and stable under appends (a row's split never
    * changes), which random sampling cannot guarantee.
    */
  def trainTestSplit(df: DataFrame, key: String, trainPct: Int): DataFrame = {
    require(trainPct > 0 && trainPct < 100)
    val bucket = pmod(col(key).cast("long") * lit(2654435761L), lit(100L))
    df.withColumn("split",
      when(bucket < trainPct, "train").otherwise("test"))
  }
}
