package graft.sinks

import org.apache.spark.sql.Row
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

import graft.core.{RetryPolicy, WriteMode}

/** The six service verbs the reference issues against the remote portal
  * (SURVEY §7.2) — the seam between the engine and any hosted-table
  * backend:
  *
  *  - `resolveByTitle`  ≙ `gis.content.search(title:…)` (`/root/reference/src/agol_pandas.py:592-596`)
  *  - `create`          ≙ `content.add` + `item.publish` (`src/agol_pandas.py:519-523`)
  *  - `truncate`        ≙ `manager.truncate()` (`src/agol_pandas.py:395-396`)
  *  - `ensureUniqueIndex` ≙ `add_to_definition(indexes)` + poll (`src/agol_pandas.py:286-307`)
  *  - `queryPage`/`queryCount` ≙ `table.query(resultOffset, resultRecordCount,
  *    where, outFields, returnCountOnly)` (`src/agol_pandas.py:246`, paged
  *    where the reference is serial)
  *  - `appendBatch`     ≙ `table.append(upsert, skip_inserts, skip_updates,
  *    upsert_matching_field, rollback=True)` (`src/agol_pandas.py:445-455`)
  *
  * [[HostedStore]] is the in-process implementation (tests, local engine);
  * [[RestHostedService]] is the skeleton of the HTTP implementation. The
  * DSv2 connector only ever talks through this seam, so swapping backends
  * never touches the Spark plumbing.
  */
trait HostedTableSink {
  def resolveByTitle(title: String): Option[String]
  def create(title: String, schema: StructType): String
  def truncate(itemId: String): Unit
  def ensureUniqueIndex(itemId: String, field: String): Boolean
  def queryCount(itemId: String, filters: Array[Filter]): Long
  def queryPage(itemId: String, offset: Long, count: Long,
                requiredCols: Array[String], filters: Array[Filter]): Iterator[Row]
  def appendBatch(itemId: String, batch: Seq[Row], mode: WriteMode,
                  key: Option[String]): Long
  // service-side statistics (≙ the remote `outStatistics` query)
  def queryMinMax(itemId: String, filters: Array[Filter], field: String,
                  isMin: Boolean): Any
  def queryGroupedStats(itemId: String, filters: Array[Filter],
                        groupFields: Seq[String],
                        specs: Seq[(String, Option[String])]): Seq[Row]
  // item metadata (≙ portal item/service description endpoints)
  def exists(itemId: String): Boolean
  def schemaOf(itemId: String): StructType
  def titles: Seq[String]
  def drop(itemId: String): Boolean
}

/** The backend the connector, catalog, and high-level API talk to.
  * Defaults to the in-process store; a live deployment swaps in
  * [[RestHostedService]] here and nothing else changes. (JVM-global:
  * in local mode driver and executors share it; a cluster deployment
  * would construct the service from connector options inside tasks.)
  */
object HostedSinks {
  @volatile var active: HostedTableSink = InProcessHostedSink
}

/** Skeleton HTTP implementation of the sink seam — the production
  * counterpart of [[HostedStore]], NOT exercised in this offline
  * environment (no egress). Documents exactly how each verb maps to the
  * remote REST surface and where the retry policy wraps the calls; the
  * `???` bodies are the only thing a live deployment fills in.
  *
  * Executor-side usage: `queryPage` and `appendBatch` are called from
  * read/write tasks — each task issues its own HTTP call (the paged-read
  * and batched-write parallelism the reference lacked), with `retry`
  * providing the reference's jittered backoff (`src/agol_pandas.py:8-43`)
  * locally per task, not via global mutable state.
  */
class RestHostedService(portalUrl: String, token: String,
                        retry: RetryPolicy = RetryPolicy()) extends HostedTableSink {
  // GET  {portalUrl}/search?q=title:"{title}" AND type:"Feature Service"
  override def resolveByTitle(title: String): Option[String] = ???
  // POST {portalUrl}/content/users/{me}/addItem + /publish
  override def create(title: String, schema: StructType): String = ???
  // POST {serviceUrl}/FeatureServer/0/truncate
  override def truncate(itemId: String): Unit = ???
  // POST {serviceUrl}/FeatureServer/0/addToDefinition {"indexes":[…]} then
  // poll every 5s up to 12x for visibility (src/agol_pandas.py:302-307)
  override def ensureUniqueIndex(itemId: String, field: String): Boolean = ???
  // GET  {serviceUrl}/0/query?returnCountOnly=true&where={filters→SQL}
  override def queryCount(itemId: String, filters: Array[Filter]): Long = ???
  // GET  {serviceUrl}/0/query?resultOffset={offset}&resultRecordCount={count}
  //      &outFields={cols}&where={filters→SQL}
  override def queryPage(itemId: String, offset: Long, count: Long,
                         requiredCols: Array[String],
                         filters: Array[Filter]): Iterator[Row] = ???
  // POST {serviceUrl}/0/append {upsert, skipInserts, skipUpdates,
  //      upsertMatchingField, rollbackOnFailure:true}
  override def appendBatch(itemId: String, batch: Seq[Row], mode: WriteMode,
                           key: Option[String]): Long = ???
  // GET  {serviceUrl}/0/query?outStatistics=[{statisticType:min|max,...}]
  override def queryMinMax(itemId: String, filters: Array[Filter],
                           field: String, isMin: Boolean): Any = ???
  // GET  {serviceUrl}/0/query?outStatistics=[…]&groupByFieldsForStatistics={fields}
  override def queryGroupedStats(itemId: String, filters: Array[Filter],
                                 groupFields: Seq[String],
                                 specs: Seq[(String, Option[String])]): Seq[Row] = ???
  // GET  {portalUrl}/content/items/{itemId}
  override def exists(itemId: String): Boolean = ???
  // GET  {serviceUrl}/FeatureServer/0?f=json → fields → StructType
  override def schemaOf(itemId: String): StructType = ???
  // GET  {portalUrl}/search?q=owner:{me} AND type:"Feature Service"
  override def titles: Seq[String] = ???
  // POST {portalUrl}/content/users/{me}/items/{itemId}/delete
  override def drop(itemId: String): Boolean = ???
}

/** [[HostedStore]] exposed through the sink seam. */
object InProcessHostedSink extends HostedTableSink {
  override def resolveByTitle(title: String): Option[String] = HostedStore.resolveByTitle(title)
  override def create(title: String, schema: StructType): String = HostedStore.create(title, schema)
  override def truncate(itemId: String): Unit = HostedStore.truncate(itemId)
  override def ensureUniqueIndex(itemId: String, field: String): Boolean =
    HostedStore.ensureUniqueIndex(itemId, field)
  override def queryCount(itemId: String, filters: Array[Filter]): Long =
    HostedStore.queryCount(itemId, filters)
  override def queryPage(itemId: String, offset: Long, count: Long,
                         requiredCols: Array[String], filters: Array[Filter]): Iterator[Row] =
    HostedStore.queryPage(itemId, offset, count, requiredCols, filters)
  override def appendBatch(itemId: String, batch: Seq[Row], mode: WriteMode,
                           key: Option[String]): Long =
    HostedStore.appendBatch(itemId, batch, mode, key)
  override def queryMinMax(itemId: String, filters: Array[Filter],
                           field: String, isMin: Boolean): Any =
    HostedStore.queryMinMax(itemId, filters, field, isMin)
  override def queryGroupedStats(itemId: String, filters: Array[Filter],
                                 groupFields: Seq[String],
                                 specs: Seq[(String, Option[String])]): Seq[Row] =
    HostedStore.queryGroupedStats(itemId, filters, groupFields, specs)
  override def exists(itemId: String): Boolean = HostedStore.exists(itemId)
  override def schemaOf(itemId: String): StructType = HostedStore.get(itemId).schema
  override def titles: Seq[String] = HostedStore.titles
  override def drop(itemId: String): Boolean = {
    val existed = HostedStore.exists(itemId)
    HostedStore.drop(itemId)
    existed
  }
}
