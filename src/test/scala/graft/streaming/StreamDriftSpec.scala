package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming χ² drift monitor: append-mode emission (one verdict per
  * window, emitted when the watermark passes its end), stream ≡ batch
  * statistic equality, and the zero-drift fixed point.
  */
class StreamDriftSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val ref = Map("a" -> 1L, "b" -> 1L)
  private val H = 3600L

  test("windows emit once the watermark passes; stream chi2 equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val events = input.toDF().toDF("sec", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val q = StreamDrift.windowedChiSquare(events, ref)
      .writeStream.outputMode("append")
      .format("memory").queryName("spec_drift").start()
    // window 0: balanced (chi2 = 0); window 1 opens, so w0 can emit
    input.addData((600L, "a"), (1200L, "b"), (H + 300L, "a"))
    q.processAllAvailable()
    val afterW0 = spark.table("spec_drift")
      .as[(Long, Long, Double)].collect().toSet
    assert(afterW0 == Set((0L, 2L, 0.0)),
      s"w0 should emit balanced and w1 stay open, got $afterW0")
    // window 2 opens → w1 (all-'a', skewed) emits exactly once
    input.addData((2 * H + 1800L, "b"))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("spec_drift")
      .as[(Long, Long, Double)].collect().toSeq
    assert(all.size == 2, s"exactly w0 and w1 must have emitted: $all")
    val batch = StreamDrift.windowedChiSquare(
        Seq((600L, "a"), (1200L, "b"), (H + 300L, "a"), (2 * H + 1800L, "b"))
          .toDF("sec", "event_type")
          .withColumn("ts", timestamp_seconds(col("sec"))), ref)
      .as[(Long, Long, Double)].collect()
      .filter(_._1 < 2 * H * 1000).toSet
    assert(all.toSet == batch, s"stream $all != batch $batch")
    // w1: o_a=1, e_a=0.5 → (0.5² / 0.5) · 2 = 1.0
    assert(all.find(_._1 == H * 1000).map(_._3).contains(1.0))
  }

  test("absent categories contribute their expected mass") {
    val out = StreamDrift.windowedChiSquare(
        Seq((10L, "a")).toDF("sec", "event_type")
          .withColumn("ts", timestamp_seconds(col("sec"))),
        Map("a" -> 1L, "b" -> 1L, "c" -> 2L))
      .as[(Long, Long, Double)].collect().head
    // n=1, e = (0.25, 0.25, 0.5): (0.75²/0.25) + (0.25²/0.25) + (0.5²/0.5)
    assert(math.abs(out._3 - (2.25 + 0.25 + 0.5)) < 1e-12, s"got $out")
  }

  test("reference categories must have positive counts") {
    intercept[IllegalArgumentException] {
      StreamDrift.windowedChiSquare(
        Seq((1L, "a")).toDF("sec", "event_type")
          .withColumn("ts", timestamp_seconds(col("sec"))),
        Map("a" -> 0L))
    }
  }
}
