package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.Row
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{HostedTables, Tables}
import graft.core.WriteMode
import graft.sinks.{HostedSinks, HostedStore, HostedTableSink}

/** Exactly-once writes under Spark task retry (the production failure
  * mode the reference's per-chunk `rollback=True` cannot cover: a task
  * dies AFTER some of its chunks were applied, and Spark replays the
  * whole task).
  *
  * The injected fault is the worst case — the batch IS applied
  * service-side, then the call reports failure — so without idempotent
  * batch ids the retry would double-apply. The session runs
  * `local[4, 3]` (maxTaskFailures=3), so Spark genuinely reschedules the
  * failed task.
  */
class WriteRetrySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark

  /** Delegating sink that injects worst-case faults on the write data
    * plane: the armed call DELEGATES FIRST (the service did the work),
    * then throws (the client never learns). `failStages`/`failCommits`
    * arm the Nth stageBatch / commitStaged call respectively.
    */
  private class FlakySink(delegate: HostedTableSink,
                          failStages: Set[Int] = Set.empty,
                          failCommits: Set[Int] = Set.empty)
      extends HostedTableSink {
    val stageCalls = new AtomicInteger(0)
    val commitCalls = new AtomicInteger(0)
    override def stageBatch(itemId: String, partKey: String, attemptId: Long,
                            chunkId: Int, batch: Seq[Row]): Unit = {
      val n = stageCalls.incrementAndGet()
      delegate.stageBatch(itemId, partKey, attemptId, chunkId, batch)
      if (failStages.contains(n))
        throw new java.io.IOException(s"injected fault on stageBatch call $n")
    }
    override def commitStaged(itemId: String, partKey: String, attemptId: Long,
                              mode: WriteMode, key: Option[String]): Long = {
      val n = commitCalls.incrementAndGet()
      val affected = delegate.commitStaged(itemId, partKey, attemptId, mode, key)
      if (failCommits.contains(n))
        throw new java.io.IOException(s"injected fault on commitStaged call $n")
      affected
    }
    override def discardStaged(itemId: String, partKey: String, attemptId: Long): Unit =
      delegate.discardStaged(itemId, partKey, attemptId)
    override def appendBatch(itemId: String, batch: Seq[Row], mode: WriteMode,
                             key: Option[String], batchId: Option[String]): Long =
      delegate.appendBatch(itemId, batch, mode, key, batchId)
    override def deleteByKey(itemId: String, keyField: String, keys: Seq[Any],
                             batchId: Option[String]): Long =
      delegate.deleteByKey(itemId, keyField, keys, batchId)
    override def resolveByTitle(title: String) = delegate.resolveByTitle(title)
    override def create(title: String, schema: StructType, properties: Map[String, String]) =
      delegate.create(title, schema, properties)
    override def truncate(itemId: String) = delegate.truncate(itemId)
    override def addUniqueIndex(itemId: String, field: String) =
      delegate.addUniqueIndex(itemId, field)
    override def fieldHasUniqueIndex(itemId: String, field: String) =
      delegate.fieldHasUniqueIndex(itemId, field)
    override def setProperties(itemId: String, props: Map[String, String]) =
      delegate.setProperties(itemId, props)
    override def propertiesOf(itemId: String) = delegate.propertiesOf(itemId)
    override def queryCount(itemId: String, filters: Array[Filter]) =
      delegate.queryCount(itemId, filters)
    override def queryPage(itemId: String, offset: Long, count: Long,
                           requiredCols: Array[String], filters: Array[Filter]) =
      delegate.queryPage(itemId, offset, count, requiredCols, filters)
    override def queryMinMax(itemId: String, filters: Array[Filter], field: String,
                             isMin: Boolean) =
      delegate.queryMinMax(itemId, filters, field, isMin)
    override def queryGroupedStats(itemId: String, filters: Array[Filter],
                                   groupFields: Seq[String],
                                   specs: Seq[(String, Option[String])]) =
      delegate.queryGroupedStats(itemId, filters, groupFields, specs)
    override def exists(itemId: String) = delegate.exists(itemId)
    override def schemaOf(itemId: String) = delegate.schemaOf(itemId)
    override def titles = delegate.titles
    override def drop(itemId: String) = delegate.drop(itemId)
  }

  private def withFlaky[A](failStages: Set[Int] = Set.empty,
                           failCommits: Set[Int] = Set.empty)(f: FlakySink => A): A = {
    val prev = HostedSinks.active
    val flaky = new FlakySink(prev, failStages, failCommits)
    HostedSinks.active = flaky
    try f(flaky) finally HostedSinks.active = prev
  }

  test("append: task killed after a staged chunk leaves no duplicate rows") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val total = orders.count()
    HostedStore.dropByTitle("retry_append")
    val id = HostedTables.createTable(orders, "retry_append")
      .fold(e => fail(e), identity)
    // chunkSize 200 over 1500 rows / 4 partitions → ~2 stage calls per
    // task; failing call 2 kills one task after its first chunk staged.
    withFlaky(failStages = Set(2)) { _ =>
      HostedTables.write(orders, id, WriteMode.Append, chunkSize = 200)
        .fold(e => fail(s"write should heal under task retry: $e"), identity)
    }
    val back = HostedTables.read(spark, id)
    assert(back.count() == total, "no lost and no duplicated rows")
    assert(back.select("o_orderkey").distinct().count() == total)
  }

  test("append: commit applied but ack lost — retry must not double-publish") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val total = orders.count()
    HostedStore.dropByTitle("retry_acklost")
    val id = HostedTables.createTable(orders, "retry_acklost")
      .fold(e => fail(e), identity)
    // the exactly-once window: commitStaged PUBLISHED the partition, then
    // the task dies before reporting success; the retried attempt
    // re-stages and re-commits — which must be a service-side no-op
    withFlaky(failCommits = Set(1)) { _ =>
      HostedTables.write(orders, id, WriteMode.Append, chunkSize = 200)
        .fold(e => fail(s"write should heal under task retry: $e"), identity)
    }
    val back = HostedTables.read(spark, id)
    assert(back.count() == total, "no lost and no duplicated rows")
    assert(back.select("o_orderkey").distinct().count() == total)
  }

  test("upsert: staged retries converge to the same row set") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders").limit(600)
    HostedStore.dropByTitle("retry_upsert")
    val id = HostedTables.createTable(orders, "retry_upsert", Some("o_orderkey"))
      .fold(e => fail(e), identity)
    // 2 faults total: one task can absorb at most 2 of its 3 attempt
    // budget (local[4,3]) even if global interleaving lands both on it
    withFlaky(failStages = Set(1), failCommits = Set(2)) { _ =>
      HostedTables.write(orders, id, WriteMode.Upsert, Some("o_orderkey"),
          chunkSize = 100)
        .fold(e => fail(s"write should heal under task retry: $e"), identity)
    }
    assert(HostedStore.rowCount(id) == 600)
  }

  test("staging is idempotent per chunk and survives a failed publish") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders").limit(50)
    val rows = orders.collect().toSeq
    HostedStore.dropByTitle("retry_stage")
    val id = HostedStore.create("retry_stage", orders.schema)
    // lost-ack transport retry: the same chunk posted twice under the
    // same (attempt, ordinal) must not duplicate
    HostedStore.stageBatch(id, "w:p0", attemptId = 1L, chunkId = 0, rows)
    HostedStore.stageBatch(id, "w:p0", attemptId = 1L, chunkId = 0, rows)
    // a publish that FAILS (upsert without a visible unique index) must
    // leave the staging intact for a retried commit
    assertThrows[IllegalArgumentException] {
      HostedStore.commitStaged(id, "w:p0", 1L, WriteMode.Upsert, Some("o_orderkey"))
    }
    HostedStore.addUniqueIndex(id, "o_orderkey")
    assert(HostedStore.commitStaged(id, "w:p0", 1L, WriteMode.Upsert,
      Some("o_orderkey")) == 50)
    assert(HostedStore.rowCount(id) == 50)
    // a dead attempt's leftover staging for the same partition was purged
    // by the successful publish; a replayed commit is a no-op
    assert(HostedStore.commitStaged(id, "w:p0", 2L, WriteMode.Upsert,
      Some("o_orderkey")) == 0)
    assert(HostedStore.rowCount(id) == 50)
  }

  test("a zombie stage landing AFTER the winning commit self-purges") {
    // spark.speculation can run two attempts of one partition: the loser's
    // in-flight stageBatch may land after the winner's commit already ran
    // its one-shot purge for the partKey. Without the committed-partKey
    // guard that buffer would leak to job end and read as a false
    // staging-leak in the fault drill's stagedBufferCount==0 invariant.
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders").limit(20)
    val rows = orders.collect().toSeq
    HostedStore.dropByTitle("retry_zombie")
    val id = HostedStore.create("retry_zombie", orders.schema)
    HostedStore.stageBatch(id, "w:p0", attemptId = 1L, chunkId = 0, rows)
    assert(HostedStore.commitStaged(id, "w:p0", 1L, WriteMode.Append, None) == 20)
    // the speculative loser arrives late, for the already-committed part
    HostedStore.stageBatch(id, "w:p0", attemptId = 2L, chunkId = 0, rows)
    assert(HostedStore.stagedBufferCount(id) == 0,
      "late speculative stage for a committed partition must not leak")
    // and its replayed commit stays a no-op (exactly-once holds)
    assert(HostedStore.commitStaged(id, "w:p0", 2L, WriteMode.Append, None) == 0)
    assert(HostedStore.rowCount(id) == 20)
  }

  test("purgeAllStaged clears a dead run's orphans without touching visible data") {
    // a DRIVER that dies mid-write leaves staging under partKeys no
    // future run publishes (the partKey embeds the dead writeId) — the
    // admin verb is the recovery path the driver-loss drill exercises
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders").limit(30)
    val rows = orders.collect().toSeq
    HostedStore.dropByTitle("retry_purgeall")
    val id = HostedStore.create("retry_purgeall", orders.schema)
    HostedStore.stageBatch(id, "deadWrite:p0", 1L, 0, rows)
    HostedStore.stageBatch(id, "deadWrite:p1", 1L, 0, rows)
    HostedStore.stageBatch(id, "liveWrite:p0", 1L, 0, rows)
    assert(HostedStore.commitStaged(id, "liveWrite:p0", 1L,
      WriteMode.Append, None) == 30)
    assert(HostedStore.stagedBufferCount(id) == 2) // the dead run's two
    assert(HostedStore.purgeAllStaged(id) == 2)
    assert(HostedStore.stagedBufferCount(id) == 0)
    assert(HostedStore.rowCount(id) == 30, "purge touched visible data")
  }

  test("a fault on every attempt exhausts maxTaskFailures and fails the write") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders").limit(100)
    HostedStore.dropByTitle("retry_fatal")
    val id = HostedTables.createTable(orders, "retry_fatal")
      .fold(e => fail(e), identity)
    // fail far more calls than maxTaskFailures(3) x chunks can absorb
    withFlaky(failStages = (1 to 1000).toSet) { _ =>
      assert(HostedTables.write(orders, id, WriteMode.Append, chunkSize = 50).isLeft)
    }
  }
}
