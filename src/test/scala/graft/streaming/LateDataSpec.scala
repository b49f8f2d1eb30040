package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the late-data accounting surface: the two-batch replay really
  * drops the late rows (the telemetry works), and the late replay never
  * corrupts the on-time windowed aggregates (the semantic guarantee the
  * accounting exists to monitor).
  */
class LateDataSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark

  val dir = "/root/testdata/sf0.001"

  test("watermark drops the replayed batch; emitted windows stay exact") {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Exception => () }
    val row = LateData.runOnce(spark, dir,
      stageDir = "/tmp/graft_latedata_spec").head()
    val nBatches = row.getLong(0)
    val dropped = row.getLong(1)
    val nWindows = row.getLong(2)
    val nCounted = row.getLong(3)
    assert(nBatches == 3L, s"expected 3 micro-batches, got $nBatches")
    assert(dropped > 0L, "watermark dropped nothing — accounting is dead")
    // batch truth: hourly counts over windows strictly before max ts —
    // the late replay must not have inflated any emitted window
    val ev = graft.api.Tables.load(spark, dir, "events")
    val mx = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val batch = ev
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .filter(col("window.end") <= lit(mx))
    val batchWindows = batch.count()
    val batchRows = batch.agg(sum(col("n"))).head().getLong(0)
    assert(nWindows == batchWindows,
      s"emitted $nWindows windows vs batch truth $batchWindows")
    assert(nCounted == batchRows,
      s"emitted row mass $nCounted vs batch truth $batchRows " +
        "(late replay leaked into an emitted window)")
    // The counter counts state-store INPUT PARTIALS dropped, not raw
    // rows: the late batch's rows pre-aggregate map-side, so the exact
    // expectation is the number of DISTINCT closed windows the replay
    // touched (== rows only when every late row lands in its own
    // window — true at sf0.001's ~1.4 events/hour, which is why a naive
    // rows==drops assertion would pass here and lie at every denser
    // scale).
    val lateWindows = graft.core.TimestampNorm.normalizeEventTime(
        ev.filter(col("event_id") % 10 === 0 && col("ts") < lit(mx)))
      .select(date_trunc("hour", col("ts"))).distinct().count()
    assert(dropped == lateWindows,
      s"dropped $dropped partials vs distinct late windows $lateWindows")
    val lateRows = ev
      .filter(col("event_id") % 10 === 0 && col("ts") < lit(mx)).count()
    assert(dropped <= lateRows, "partials can never exceed raw late rows")
  }
}
