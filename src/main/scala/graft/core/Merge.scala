package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational MERGE semantics for the five write modes, expressed as
  * Catalyst-planned joins (no driver materialization, no UDFs).
  *
  * The reference delegates matching to the remote service's unique index +
  * `append(upsert=True, upsert_matching_field=key, ...)`
  * (`/root/reference/src/agol_pandas.py:402-455`). In-engine, the same
  * semantics are join-based set algebra, which Catalyst plans as
  * broadcast-hash / shuffle-hash / sort-merge joins depending on size — so
  * the semantics hold from 6k rows to 100 TB:
  *
  *  - upsert(t, s)  = s ∪ (t ⟕anti s)          — source wins on key match
  *  - update(t, s)  = (s ⋉ t) ∪ (t ⟕anti s)    — no inserts
  *  - insert(t, s)  = t ∪ (s ⟕anti t)          — no updates
  *  - append(t, s)  = t ∪ s
  *  - overwrite(t,s)= s
  *
  * Anti/semi joins shuffle only the key columns of the probe side and never
  * expand rows, which makes them preferable to the full_outer+coalesce
  * formulation (which shuffles both full row sets and needs a wide
  * projection).
  */
object Merge {

  /** One row per key, deterministic winner (greatest row by the remaining
    * columns' struct order). The reference requires unique keys via the
    * remote index (`src/agol_pandas.py:253-312`); when the *source* batch
    * itself carries duplicate keys, the service's upsert applies them in
    * arrival order — non-reproducible. We pin a deterministic winner
    * instead so results are stable across partitionings and retries.
    */
  def dedupByKey(df: DataFrame, key: String): DataFrame = {
    val others = df.columns.filterNot(_ == key).map(col).toIndexedSeq
    if (others.isEmpty) df.distinct()
    else {
      val w = Window.partitionBy(col(key)).orderBy(struct(others: _*).desc)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }
  }

  def upsert(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val s = dedupByKey(source, key)
    s.unionByName(target.join(s.select(key), Seq(key), "left_anti"))
  }

  def update(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val s = dedupByKey(source, key)
    s.join(target.select(key), Seq(key), "left_semi")
      .unionByName(target.join(s.select(key), Seq(key), "left_anti"))
  }

  def insert(target: DataFrame, source: DataFrame, key: String): DataFrame =
    target.unionByName(
      dedupByKey(source, key).join(target.select(key), Seq(key), "left_anti"))

  def append(target: DataFrame, source: DataFrame): DataFrame =
    target.unionByName(source)

  def overwrite(target: DataFrame, source: DataFrame): DataFrame = source

  def apply(mode: WriteMode, target: DataFrame, source: DataFrame,
            key: Option[String]): DataFrame = mode match {
    case WriteMode.Append    => append(target, source)
    case WriteMode.Overwrite => overwrite(target, source)
    case WriteMode.Upsert    => upsert(target, source, key.get)
    case WriteMode.Update    => update(target, source, key.get)
    case WriteMode.Insert    => insert(target, source, key.get)
  }
}
