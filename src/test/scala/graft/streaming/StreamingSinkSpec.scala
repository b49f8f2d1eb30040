package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{HostedTables, Tables}
import graft.core.WriteMode
import graft.sinks.{HostedSinks, HostedStore}
import graft.sources.GraftStreamingWriterFactory

/** The native DSv2 streaming sink (`writeStream.format("graft")`):
  * update-mode micro-batches land as key-addressed upserts, and
  * epoch-tagged batch ids make replayed epochs idempotent — the
  * streaming-side counterpart of WriteRetrySpec.
  */
class StreamingSinkSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark

  val dir = "/root/testdata/sf0.001"

  test("writeStream.format(graft) update-mode upsert equals the batch aggregation") {
    HostedStore.dropByTitle("dsv2_stream_1")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val streamed = EventStreams.runUpsertWindowedOnce(spark, dir, "events.parquet",
        schema, "dsv2_stream_1")
      .orderBy("window_start_ms", "event_type")
      .collect().toSeq
    val batch = Tables.load(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
          .as("total_value_cents"))
      .select(unix_millis(col("h")).as("window_start_ms"), col("event_type"),
        col("n"), col("total_value_cents"))
      .orderBy("window_start_ms", "event_type")
      .collect().toSeq
    assert(streamed == batch)
  }

  test("replayed epoch is idempotent: same epoch ids dedup service-side") {
    val orders = Tables.load(spark, dir, "orders").limit(100)
    HostedStore.dropByTitle("dsv2_replay")
    val id = HostedTables.createTable(orders, "dsv2_replay", Some("o_orderkey"))
      .fold(e => fail(e), identity)
    val rows = orders.collect().toSeq
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(orders.schema)
    def runEpoch(epochId: Long): Unit = {
      val factory = GraftStreamingWriterFactory(id, orders.schema,
        WriteMode.Upsert, Some("o_orderkey"), chunkSize = 30, "query-abc")
      val w = factory.createWriter(partitionId = 0, taskId = 1L, epochId = epochId)
      rows.foreach(r => w.write(
        toCatalyst(r).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]))
      w.commit()
      ()
    }
    runEpoch(7L)
    assert(HostedStore.rowCount(id) == 100)
    assert(HostedStore.get(id).committedParts == Set("query-abc:e7:p0"))
    // the replay: same query, same epoch, same partition → the partition
    // key is already committed → service-side no-op
    runEpoch(7L)
    assert(HostedStore.rowCount(id) == 100)
    assert(HostedStore.get(id).committedParts == Set("query-abc:e7:p0"))
    // a NEW epoch with the same data is a fresh application (upsert by key
    // keeps the row set converged)
    runEpoch(8L)
    assert(HostedStore.rowCount(id) == 100)
    assert(HostedStore.get(id).committedParts ==
      Set("query-abc:e7:p0", "query-abc:e8:p0"))
  }

  test("append-mode streaming write lands rows through the DSv2 sink") {
    HostedStore.dropByTitle("dsv2_append")
    val events = Tables.load(spark, dir, "events").limit(200)
    val id = HostedSinks.active.create("dsv2_append", events.schema)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dsv2_append").toString
    // re-write the fixture as a one-file stream source
    val srcDir = java.nio.file.Files.createTempDirectory("graft_dsv2_src").toString
    events.coalesce(1).write.mode("overwrite").parquet(srcDir)
    val q = spark.readStream.schema(events.schema).parquet(srcDir)
      .writeStream.format("graft")
      .option("itemId", id)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    assert(HostedStore.rowCount(id) == 200)
    assert(HostedTables.read(spark, id).schema == events.schema)
  }
}
