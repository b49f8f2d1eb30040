package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribute q_stream_hourly's seconds: micro-batch engine + stateful
  * agg + hosted upsert + read-back, and A/B the state-partition count
  * (spark.sql.shuffle.partitions at stream start = state store
  * partition count for the lifetime of the checkpoint).
  * `runMain graft.tools.ProfileStreamHourly [sfDir]`.
  */
object ProfileStreamHourly {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[streamh] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // bypass the operator's own derived-partition scoping: without this
    // every arm below clamps to the same derived count and the A/B
    // measures one configuration five times (r16 ADVICE)
    spark.conf.set("spark.graft.stream.derivePartitions", "false")
    for (parts <- Seq(cpus, "8", "8", cpus, cpus)) {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      t(s"runUpsertWindowedOnce end-to-end (parts=$parts)") {
        graft.sinks.HostedStore.dropByTitle("stream_hourly_check")
        graft.streaming.EventStreams.runUpsertWindowedOnce(spark, sfDir,
          "events.parquet", schema, "stream_hourly_check").count()
      }
    }
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    // the batch-equivalent aggregation, for the engine-overhead floor
    (1 to 2).foreach { i =>
      t(s"batch twin of the aggregation run$i") {
        val ev = graft.core.TimestampNorm.normalizeEventTime(
          spark.read.parquet(s"$sfDir/events.parquet"))
        ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            (sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
              .as("total_value_cents"))
          .count()
      }
    }
    spark.stop()
  }
}
