package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** Exact chunk ids: `floor(global_rank / chunkSize)` over the global key
    * order, computed WITHOUT a single-partition window: range-partition +
    * sort gives the global order across partitions, then `zipWithIndex`
    * assigns contiguous indexes via the classic two-pass partition-offset
    * scheme (job 1 counts rows per partition, job 2 adds the broadcast
    * prefix-sum offset). Both passes read the already-materialized range
    * shuffle, so the data moves once and no task ever holds more than its
    * partition. Deterministic when `keys` form a total order (unique key),
    * same as any rank-based chunking.
    */
  def withChunkIds(df: DataFrame, keys: Seq[String], chunkSize: Long,
                   partitions: Option[Int] = None): DataFrame = {
    require(keys.nonEmpty && chunkSize > 0)
    val keyCols = keys.map(col).toIndexedSeq
    val spark = df.sparkSession
    val parts = partitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(parts, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
    val outSchema = sorted.schema.add("chunk_id", LongType, nullable = false)
    val withIdx = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i / chunkSize))
    }
    spark.createDataFrame(withIdx, outSchema)
  }
}
