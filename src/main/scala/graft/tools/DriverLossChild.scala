package graft.tools

import org.apache.spark.sql.SparkSession

/** The DYING DRIVER of the fault drill's driver-loss scenario: a complete
  * Spark application (its own JVM, launched by [[FaultDrill]]) that runs
  * a DSv2 batch write against the parent process's portal and — when
  * `armed` — `Runtime.halt`s ITSELF once the write stage has staged most
  * of one partition's chunks, with other partitions already committed.
  * No shutdown hooks, no job-level abort, no `spark.stop()`: the staged
  * protocol's driver-side coordinator simply vanishes, which is the one
  * failure mode the executor-kill drills (same protocol, surviving
  * driver) cannot produce.
  *
  * The kill is CONTENT-armed, not partition-id-armed: rows of group
  * `k % 16 == 12` count down to the halt row inside whichever task holds
  * them (hash partitioning need not map group 12 to partition 12), and a
  * per-row sleep in that group lets every other partition reach its
  * commit first — deterministic partial-job state: ≥1 partition
  * committed, the armed one staged-but-uncommitted.
  *
  * args: portalUrl token itemId n mode(armed-append|upsert) valuePrefix
  */
object DriverLossChild {
  def main(args: Array[String]): Unit = {
    val Array(portalUrl, token, itemId, nStr, mode, valuePrefix) = args
    val n = nStr.toLong
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-driver-loss-child")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val data = spark.range(n)
      .select($"id".as("k"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit(valuePrefix),
          $"id".cast("string")).as("v"))
      .repartition(16, $"k" % 16)

    val src =
      if (mode == "armed-append") {
        data.as[(Long, String)].mapPartitions { it =>
          var seen = 0
          it.map { r =>
            if (r._1 % 16 == 12) {
              seen += 1
              // slow lane: every other partition commits while group 12
              // crawls toward the halt row
              Thread.sleep(2)
              if (seen == 800) Runtime.getRuntime.halt(137)
            }
            r
          }
        }.toDF("k", "v")
      } else data

    val w = src.write.format("graft")
      .option("portal_url", portalUrl).option("token", token)
      .option("itemId", itemId)
      .option("chunkSize", "64")
    (if (mode == "upsert")
       w.option("writeMode", "upsert").option("key", "k")
     else w.option("writeMode", "append"))
      .mode("append").save()

    spark.stop()
    // the armed run must never get here — reaching it means the halt row
    // was never hit and the drill's partial-state premise is void
    if (mode == "armed-append") sys.exit(3)
  }
}
