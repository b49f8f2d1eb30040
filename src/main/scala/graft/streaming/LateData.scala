package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Late-data ACCOUNTING: how many rows the watermark dropped, per query
  * — the monitoring surface a production stream alerts on (a sudden
  * spike in `numRowsDroppedByWatermark` means an upstream producer fell
  * behind the horizon and data is silently vanishing from every
  * windowed aggregate).
  *
  * The engine exposes this through `StreamingQueryProgress`
  * (`stateOperators.numRowsDroppedByWatermark`) — no custom state, no
  * second pass; the replay harness stages the corpus as two files and
  * runs one-file-per-micro-batch, so the second batch's replayed early
  * events genuinely arrive behind the advanced watermark and are
  * genuinely dropped, exactly as a late producer's would be.
  */
object LateData {

  /** Hourly event counts with late-arrival accounting over a staged
    * three-batch replay (see the staging comment below for why three).
    *
    * Returns ONE row: (n_batches, rows_dropped_late, n_windows,
    * n_rows_counted) — rows_dropped_late = the replayed row count is
    * the accounting working; n_windows/n_rows_counted equal the batch
    * truth (late replays never corrupt the emitted aggregates).
    */
  def runOnce(spark: SparkSession, dir: String,
              stageDir: String = "/tmp/graft_latedata",
              lateFraction: Int = 10): DataFrame = {
    val ev = graft.api.Tables.load(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    def stageOne(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = s"$stageDir/__tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val target = java.nio.file.Paths.get(s"$stageDir/$name.parquet")
      java.nio.file.Files.deleteIfExists(target)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, target)
      // explicit mtimes force the file-source processing order:
      // full corpus first, late replay second
      target.toFile.setLastModified(mtime)
      def rm(p: java.nio.file.Path): Unit = {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(p)
        try walk.iterator().asScala.toSeq.reverse
          .foreach(q => java.nio.file.Files.deleteIfExists(q))
        finally walk.close()
      }
      rm(java.nio.file.Paths.get(tmp))
    }
    // clean slate: stale files from a previous run would join the stream
    val root = new java.io.File(stageDir)
    if (root.exists()) root.listFiles().foreach(_.delete())
    // Three micro-batches, because the data-late filter applies the
    // watermark the engine had OBSERVED before the batch — one batch
    // after it is computed (verified empirically: a replay arriving in
    // the very next batch slips the filter and re-emits its windows).
    //  1. the full corpus — the watermark advances to max event time;
    //  2. a heartbeat (the max-ts rows only) — carries no new
    //     information (its rows land in the final never-emitted-in-
    //     append window) but lets the engine observe the watermark;
    //  3. the late replay — now genuinely behind the observed watermark
    //     and dropped row-for-row, exactly as a late producer's would be.
    val mx = ev.agg(max(col("ts"))).head().getTimestamp(0)
    stageOne(ev, "ontime", 1000000L)
    stageOne(ev.filter(col("ts") === lit(mx)), "heartbeat", 2000000L)
    stageOne(ev.filter(col("event_id") % lateFraction === 0 &&
        col("ts") < lit(mx)),
      "late_replay", 3000000L)

    val schema = spark.read.parquet(s"$stageDir/ontime.parquet").schema
    val raw = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir)
    val events = graft.core.TimestampNorm.normalizeEventTime(raw)
    val name = s"latedata_${System.nanoTime()}"
    val q = events
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("n_events"))
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q.awaitTermination()
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    val dropped = progress
      .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    val emitted = spark.table(name)
    val nWindows = emitted.count()
    val nCounted = emitted.agg(sum(col("n_events"))).head().getLong(0)
    import spark.implicits._
    Seq((progress.length.toLong, dropped, nWindows, nCounted))
      .toDF("n_batches", "rows_dropped_late", "n_windows", "n_rows_counted")
  }
}
