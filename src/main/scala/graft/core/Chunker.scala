package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort-then-chunk, the reference's `df_to_pandas_chunks`
  * (`/root/reference/src/agol_pandas.py:159-216`): globally sort by the key
  * columns, then split into contiguous chunks of ~`chunkSize` rows.
  *
  * The reference's Spark branch re-collects the entire DataFrame to the
  * driver once per chunk (`src/agol_pandas.py:203-205`, O(n·chunks) — its
  * central scalability flaw). Here chunking is *partitioning*:
  * `repartitionByRange` gives disjoint, ordered key ranges (one per write
  * task) with zero driver materialization — the form that survives 100 TB.
  * Exact row-count slicing (when byte-identical chunk membership matters,
  * e.g. the oracle tests) uses a global `row_number`, which costs a global
  * sort — fine at audit/test scale, documented as the non-scalable variant.
  */
object Chunker {

  /** Scalable chunking: disjoint ordered key ranges, ~targetRows each.
    * Partition count is derived from a cheap count; each partition is
    * internally sorted so downstream per-partition writers see key order
    * (the property the reference's audit fields rely on,
    * `src/agol_pandas.py:625-626`).
    */
  def byKeyRange(df: DataFrame, keys: Seq[String], targetRows: Long): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    require(targetRows > 0, "targetRows must be positive")
    val n = df.count()
    if (n == 0) throw new IllegalArgumentException("The DataFrame is empty")
    val parts = math.max(1, math.ceil(n.toDouble / targetRows).toInt)
    val keyCols = keys.map(col).toIndexedSeq
    df.repartitionByRange(parts, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
  }

  /** Exact chunk ids: `floor((row_number - 1) / chunkSize)` over the global
    * key order. Deterministic (full tiebreak on the key), but plans a
    * single-partition window — use only where exactness is required at
    * bounded scale (audit reports, oracle tests).
    */
  def withChunkIds(df: DataFrame, keys: Seq[String], chunkSize: Long): DataFrame = {
    require(keys.nonEmpty && chunkSize > 0)
    val w = Window.orderBy(keys.map(col).toIndexedSeq: _*)
    df.withColumn("chunk_id",
      floor((row_number().over(w) - 1) / chunkSize).cast("long"))
  }
}
