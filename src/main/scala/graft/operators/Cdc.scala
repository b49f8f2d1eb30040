package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application: turn an append-only change log
  * (insert / update / delete rows stamped with a monotone sequence) into
  * the current snapshot, or into SCD2-style validity history.
  *
  * This is the merge-on-read half of the lakehouse story the engine
  * already tells on the write side ([[graft.core.Merge]] upserts,
  * [[Scale.compactParquet]], `x_snapshot_diff`): at 100 TB the change
  * log is what actually arrives (Debezium/binlog-shaped), and the
  * snapshot is DERIVED, never stored row-by-row.
  *
  * Scale posture: [[applyLog]] is ONE hash-aggregate — `max_by(struct)`
  * partial-aggregates map-side, so the shuffle carries at most one row
  * per (partition, key), not the log. The window variant (row_number
  * over key) would full-sort every key group; `max_by` is the plan that
  * survives a log with billions of superseded rows. [[history]] does
  * need the per-key sort (it emits every version), but the window is
  * keyed — no global sort, no single-partition stage.
  */
object Cdc {

  /** Current snapshot of `log`: for every key keep the row with the
    * highest `seqCol`, then drop keys whose last operation is
    * `deleteOp`. Payload columns = everything except key/seq/op.
    *
    * Ties on (key, seq) are undefined — a CDC log's sequence is unique
    * per key by construction (binlog offset, commit LSN); callers with
    * a coarser stamp must refine it first.
    */
  def applyLog(log: DataFrame, keyCol: String, seqCol: String,
               opCol: String, deleteOp: String = "D"): DataFrame = {
    val payload = log.columns.toSeq.filterNot(c =>
      c == keyCol || c == seqCol || c == opCol)
    require(payload.nonEmpty, "applyLog: log has no payload columns")
    val last = struct((opCol +: payload).map(col): _*)
    log.groupBy(col(keyCol))
      .agg(max_by(last, col(seqCol)).as("__last"))
      // coalesce-into-raise: a NULL op is a corrupt record, and under a
      // bare =!= it would silently act as a tombstone (the filter's
      // NULL drops the key) — fail loudly instead
      .filter(coalesce(col(s"__last.$opCol"),
        raise_error(concat(lit("applyLog: null op for key "),
          col(keyCol).cast("string")))) =!= lit(deleteOp))
      .select(col(keyCol) +: payload.map(c => col(s"__last.$c").as(c)): _*)
  }

  /** The keys whose LAST operation is a tombstone (deleted, never
    * revived) — the delete set a downstream serving artifact (ANN
    * index, feature store) must purge. Shares [[applyLog]]'s
    * fail-loud null-op contract: a corrupt record must never mean
    * "delete nothing", the worst failure mode a compliance path has.
    */
  def tombstones(log: DataFrame, keyCol: String, seqCol: String,
                 opCol: String, deleteOp: String = "D"): DataFrame =
    log.groupBy(col(keyCol))
      .agg(max_by(col(opCol), col(seqCol)).as("__op"))
      .filter(coalesce(col("__op"),
        raise_error(concat(lit("tombstones: null op for key "),
          col(keyCol).cast("string")))) === lit(deleteOp))
      .select(col(keyCol))

  /** Point-in-time snapshot (time travel): the table as it stood after
    * applying every change with `seq ≤ asOfSeq` — the log IS the
    * history, so "AS OF" is just a pushed-down sequence filter in front
    * of the same one-aggregate apply (and the filter prunes at the
    * scan, so old snapshots get cheaper, not costlier).
    */
  def snapshotAsOf(log: DataFrame, keyCol: String, seqCol: String,
                   opCol: String, asOfSeq: Long,
                   deleteOp: String = "D"): DataFrame =
    applyLog(log.filter(col(seqCol) <= asOfSeq), keyCol, seqCol, opCol,
      deleteOp)

  /** Compact the change log at a checkpoint sequence — the maintenance
    * op that keeps an append-only log from growing forever (the CDC
    * twin of [[Scale.compactParquet]] / [[AnnIndex.ivfCompact]]): every
    * key's pre-checkpoint run of versions collapses to ONE insert row
    * (its live payload, stamped with its last pre-checkpoint sequence),
    * keys DEAD at the checkpoint vanish entirely (their tombstones and
    * every superseded version with them), and the tail
    * (`seq > asOfSeq`) is kept verbatim.
    *
    * Invariants (spec- and oracle-gated): `applyLog(compacted)` ≡
    * `applyLog(original)`, and `snapshotAsOf(compacted, s)` ≡
    * `snapshotAsOf(original, s)` for every `s ≥ asOfSeq`. Time travel
    * BELOW the checkpoint is deliberately truncated — the same
    * retention contract as folding a deletion sidecar or vacuuming old
    * table versions. [[history]] over the compacted log shows one
    * synthetic `insertOp` version per checkpointed key.
    *
    * Scale posture: the checkpoint is [[applyLog]]'s one partial-
    * aggregable hash-aggregate over the head; the tail is a pushed-down
    * scan filter. Writing `checkpoint ∪ tail` to a new directory and
    * pointer-flipping it over the old one (the [[Scale.compactParquet]]
    * publish discipline) is what keeps `snapshotAsOf` scans cheap as
    * the log ages.
    */
  def compactLog(log: DataFrame, keyCol: String, seqCol: String,
                 opCol: String, asOfSeq: Long, deleteOp: String = "D",
                 insertOp: String = "I"): DataFrame = {
    val payload = log.columns.toSeq.filterNot(c =>
      c == keyCol || c == seqCol || c == opCol)
    require(payload.nonEmpty, "compactLog: log has no payload columns")
    val last = struct((seqCol +: opCol +: payload).map(col): _*)
    val checkpoint = log.filter(col(seqCol) <= asOfSeq)
      .groupBy(col(keyCol))
      .agg(max_by(last, col(seqCol)).as("__last"))
      // same fail-loud null-op contract as applyLog: a corrupt record
      // must never silently drop a key from the checkpoint
      .filter(coalesce(col(s"__last.$opCol"),
        raise_error(concat(lit("compactLog: null op for key "),
          col(keyCol).cast("string")))) =!= lit(deleteOp))
      .select(log.columns.toSeq.map {
        case c if c == keyCol => col(keyCol)
        case c if c == seqCol => col(s"__last.$seqCol").as(seqCol)
        case c if c == opCol  => lit(insertOp).as(opCol)
        case c                => col(s"__last.$c").as(c)
      }: _*)
    checkpoint.unionByName(log.filter(col(seqCol) > asOfSeq))
  }

  /** SCD2 validity intervals: one row per log version with
    * `seq_from` = its own sequence and `seq_to` = the next version's
    * sequence for the same key (null while current). Delete rows are
    * kept — they close the preceding interval and carry `op = D`, which
    * is how a consumer distinguishes "current" from "tombstoned".
    */
  def history(log: DataFrame, keyCol: String, seqCol: String,
              opCol: String, deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    // Same coalesce-into-raise contract as applyLog/tombstones: guard
    // the op column itself (every row), not just the is_current leg —
    // And short-circuits in codegen, so a guard only on the conjunction
    // would skip rows whose seq_to is non-null.
    log.withColumn(opCol, coalesce(col(opCol),
        raise_error(concat(lit("history: null op for key "),
          col(keyCol).cast("string")))))
      .withColumn("seq_from", col(seqCol).cast("long"))
      .withColumn("seq_to", lead(col(seqCol), 1).over(w).cast("long"))
      .withColumn("is_current",
        col("seq_to").isNull && col(opCol) =!= lit(deleteOp))
      .drop(seqCol)
  }
}
