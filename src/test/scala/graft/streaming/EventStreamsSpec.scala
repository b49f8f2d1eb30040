package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{HostedTables, Tables}
import graft.core.WriteMode
import graft.sinks.HostedStore

class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  test("streaming windowed agg (DSv2 graft sink upsert) equals the batch computation") {
    HostedStore.dropByTitle("spec_stream_1")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val streamed = EventStreams.runUpsertWindowedOnce(spark, dir, "events.parquet",
        schema, "spec_stream_1")
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

  test("watermark drops events later than the lateness bound") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val agg = EventStreams.windowedCounts(events, "1 hour", "2 hours")
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("spec_wm").start()
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
    input.addData((ts(1), "a", 1.0), (ts(2), "a", 1.0))
    q.processAllAvailable()
    // advance watermark far past hour 1's window
    input.addData((ts(10), "a", 1.0))
    q.processAllAvailable()
    // hour-1 window is now finalized+emitted; a straggler for hour 1 must be dropped
    input.addData((ts(1), "a", 99.0), (ts(11), "a", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("spec_wm")
      .select(col("ws").cast("string"), col("event_type"), col("n"))
      .as[(String, String, Long)].collect().toMap2
    assert(rows(("2024-01-01 01:00:00", "a")) == 1L) // straggler NOT double-counted
  }

  implicit class Tup3Ops[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = rows.map(r => (r._1, r._2) -> r._3).toMap
  }

  test("streaming session windows match the batch sessionization") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")
    val q = Sessionize.sessions(events.withWatermark("ts", "10 minutes"))
      .writeStream.outputMode("append")
      .format("memory").queryName("spec_sessions").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 1: two sessions (gap > 30min); user 2: one session
    input.addData((ts(1, 0), 1L, 1.0), (ts(1, 10), 1L, 2.0),
      (ts(2, 0), 1L, 4.0), (ts(1, 5), 2L, 8.0))
    q.processAllAvailable()
    // sentinel far in the future: pushes the watermark so open sessions close
    input.addData((ts(9, 0), 99L, 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("spec_sessions")
      .filter(col("user_id") =!= 99L)
      .orderBy("user_id", "session_start_ms")
      .collect().toSeq
    val batchDf = Seq((ts(1, 0), 1L, 1.0), (ts(1, 10), 1L, 2.0),
      (ts(2, 0), 1L, 4.0), (ts(1, 5), 2L, 8.0)).toDF("ts", "user_id", "value")
    val batch = Sessionize.sessions(batchDf)
      .orderBy("user_id", "session_start_ms").collect().toSeq
    assert(streamed == batch)
    assert(batch.length == 3) // 2 sessions for user 1, 1 for user 2
  }

  test("session windows run on the RocksDB state store (off-heap streaming state)") {
    // At corpus scale streaming session state cannot live on the executor
    // heap (the HDFSBacked provider's failure mode); RocksDB is the
    // production posture. Isolated session so the provider setting doesn't
    // leak into concurrently-running streaming specs.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = s2.sqlContext
    import s2.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")
    val q = Sessionize.sessions(events.withWatermark("ts", "10 minutes"))
      .writeStream.outputMode("append")
      .format("memory").queryName("spec_sessions_rocks").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData((ts(1, 0), 1L, 1.0), (ts(1, 10), 1L, 2.0),
      (ts(2, 0), 1L, 4.0), (ts(1, 5), 2L, 8.0))
    q.processAllAvailable()
    input.addData((ts(9, 0), 99L, 0.0)) // sentinel: close open sessions
    q.processAllAvailable()
    q.stop()
    val streamed = s2.table("spec_sessions_rocks")
      .filter(col("user_id") =!= 99L)
      .orderBy("user_id", "session_start_ms")
      .collect().toSeq
    val batch = Sessionize.sessions(
        Seq((ts(1, 0), 1L, 1.0), (ts(1, 10), 1L, 2.0),
          (ts(2, 0), 1L, 4.0), (ts(1, 5), 2L, 8.0)).toDF("ts", "user_id", "value"))
      .orderBy("user_id", "session_start_ms").collect().toSeq
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState emits anomalies against the running mean") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.UserEvent]
    val q = Sessionize.anomalies(input.toDS(), factor = 3.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("spec_anomalies").start()
    def ev(u: Long, m: Int, v: Double) =
      Sessionize.UserEvent(u, java.sql.Timestamp.valueOf(f"2024-01-01 06:$m%02d:00"), v)
    input.addData(ev(1, 1, 10.0), ev(1, 2, 12.0), ev(1, 3, 11.0))
    q.processAllAvailable()
    input.addData(ev(1, 4, 100.0), ev(1, 5, 12.0)) // spike then normal
    q.processAllAvailable()
    q.stop()
    val got = spark.table("spec_anomalies")
      .as[Sessionize.Anomaly].collect().toSeq
    assert(got.map(_.value) == Seq(100.0)) // only the spike, state carried over
    assert(math.abs(got.head.running_mean - 11.0) < 1e-9)
  }

  test("anomaliesExact: integer gate matches the float gate and carries state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.CentsEvent]
    val q = Sessionize.anomaliesExact(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("spec_anomalies_exact").start()
    input.addData(Sessionize.CentsEvent(1L, 1000L, 1000L),
      Sessionize.CentsEvent(1L, 2000L, 1200L),
      Sessionize.CentsEvent(1L, 3000L, 1100L))
    q.processAllAvailable()
    // spike: 10000 > 3·mean(1000,1200,1100) = 3300 — state from batch 1;
    // boundary: exactly 3·mean of the first four must NOT flag (strict >)
    input.addData(Sessionize.CentsEvent(1L, 4000L, 10000L))
    q.processAllAvailable()
    val mean4x3 = 3L * (1000L + 1200L + 1100L + 10000L) / 4L // = 9975
    input.addData(Sessionize.CentsEvent(1L, 5000L, mean4x3))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("spec_anomalies_exact")
      .as[Sessionize.ExactAnomaly].collect().toSeq
    assert(got.map(_.value_cents) == Seq(10000L), s"got $got")
    assert(got.head.n_prev == 3L && got.head.sum_prev_cents == 3300L)
  }

  test("mapGroupsWithState keeps running per-user stats across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.UserEvent]
    val q = Sessionize.userRunningStats(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("spec_userstats").start()
    def ev(u: Long, m: Int, v: Double) =
      Sessionize.UserEvent(u, java.sql.Timestamp.valueOf(f"2024-01-01 04:$m%02d:00"), v)
    input.addData(ev(1, 1, 10.0), ev(1, 2, 5.0), ev(2, 3, 1.0))
    q.processAllAvailable()
    input.addData(ev(1, 4, 2.5)) // state must carry the earlier 15.0
    q.processAllAvailable()
    q.stop()
    val last = spark.table("spec_userstats")
      .filter(col("user_id") === 1L)
      .orderBy(col("n_events").desc)
      .as[Sessionize.UserStats].head()
    assert(last.n_events == 3L)
    assert(math.abs(last.total_value - 17.5) < 1e-9)
  }

  test("stream-stream interval join matches the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, Long, String)]
    val buys = MemoryStream[(java.sql.Timestamp, Long, String)]
    def df(m: MemoryStream[(java.sql.Timestamp, Long, String)]) =
      m.toDF().toDF("ts", "user_id", "event_type")
    val q = EventStreams.intervalJoin(df(clicks), df(buys), within = "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("spec_ssjoin").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // u1: buy 20min after click (match); u1 second buy 50min after (no);
    // u2: buy before the click (no — the interval is one-directional)
    clicks.addData((ts(1, 0), 1L, "click"), (ts(1, 0), 2L, "click"))
    buys.addData((ts(1, 20), 1L, "buy"), (ts(1, 50), 1L, "buy"),
      (ts(0, 50), 2L, "buy"))
    q.processAllAvailable()
    clicks.addData((ts(9, 0), 99L, "click")) // watermark push
    buys.addData((ts(9, 0), 99L, "buy"))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("spec_ssjoin").filter(col("user_id") =!= 99L)
      .select("user_id", "r_type").as[(Long, String)].collect().toSeq
    assert(streamed == Seq((1L, "buy")))
    // batch equivalence on the same rows
    val cb = Seq((ts(1, 0), 1L, "click"), (ts(1, 0), 2L, "click"))
      .toDF("ts", "user_id", "event_type")
    val bb = Seq((ts(1, 20), 1L, "buy"), (ts(1, 50), 1L, "buy"),
      (ts(0, 50), 2L, "buy")).toDF("ts", "user_id", "event_type")
    val batch = EventStreams.intervalJoin(cb, bb, within = "30 minutes")
      .select("user_id", "r_type").as[(Long, String)].collect().toSeq
    assert(batch == streamed)
  }

  test("streaming dedup drops duplicate ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "event_id", "value")
    val q = EventStreams.dedupStream(events, "event_id", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("spec_dedup").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 03:$m%02d:00")
    input.addData((ts(0), 1L, 1.0), (ts(1), 2L, 2.0), (ts(2), 1L, 99.0))
    q.processAllAvailable()
    input.addData((ts(3), 1L, 98.0), (ts(4), 3L, 3.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("spec_dedup").select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L)) // each id exactly once
  }

  test("hosted table is a streaming source: new appends arrive as micro-batches") {
    HostedStore.dropByTitle("stream_src_tbl")
    val batch1 = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val id = HostedTables.createTable(batch1, "stream_src_tbl", None)
      .fold(e => fail(e), identity)
    HostedTables.write(batch1, id, WriteMode.Append).fold(e => fail(e), identity)

    val q = spark.readStream.format("graft").option("itemId", id).load()
      .writeStream.outputMode("append")
      .format("memory").queryName("spec_graft_stream").start()
    q.processAllAvailable()
    assert(spark.table("spec_graft_stream").count() == 2)

    // rows appended after the stream started arrive in the next batch
    val batch2 = Seq((3L, "c")).toDF("k", "name")
    HostedTables.write(batch2, id, WriteMode.Append).fold(e => fail(e), identity)
    q.processAllAvailable()
    q.stop()
    assert(spark.table("spec_graft_stream").orderBy("k")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("streaming source fails loudly when the table shrinks mid-stream") {
    HostedStore.dropByTitle("stream_shrink_tbl")
    val batch1 = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val id = HostedTables.createTable(batch1, "stream_shrink_tbl", None)
      .fold(e => fail(e), identity)
    HostedTables.write(batch1, id, WriteMode.Append).fold(e => fail(e), identity)
    val q = spark.readStream.format("graft").option("itemId", id).load()
      .writeStream.outputMode("append")
      .format("memory").queryName("spec_shrink_stream").start()
    q.processAllAvailable()
    // shrink the table under the running stream
    HostedTables.write(batch1.limit(1), id, WriteMode.Overwrite).fold(e => fail(e), identity)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    assert(e.getMessage.contains("offset regressed") ||
      String.valueOf(e.getCause).contains("offset regressed"), e.getMessage)
  }

  test("stream upserts into a hosted table via foreachBatch") {
    HostedStore.dropByTitle("stream_sink_tbl")
    // column order must match the streaming batch projection
    val schemaDf = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "t", 1L,
      1.0, "k"))
      .toDF("window_start", "event_type", "n", "total_value", "merge_key")
    val id = HostedTables.createTable(schemaDf, "stream_sink_tbl", Some("merge_key"))
      .fold(e => fail(e), identity)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.upsertToHostedTable(
      events.withColumn("value", col("value")), id, "merge_key")
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 05:$m%02d:00")
    input.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0))
    q.processAllAvailable()
    input.addData((ts(3), "click", 4.0)) // same window: upsert must replace
    q.processAllAvailable()
    q.stop()
    val back = HostedTables.read(spark, id)
    assert(back.count() == 1) // one window/type key, updated in place
    assert(back.select("n").as[Long].head() == 3L)
  }
}
