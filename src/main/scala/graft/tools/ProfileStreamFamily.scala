package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** A/B drill for the one-shot streaming family (optimization r17,
  * VERDICT item 1): times each x_stream_* catalog query with the
  * session's `spark.sql.shuffle.partitions` scoped to each candidate
  * count. Streaming plans have no AQE coalescing, so the session conf
  * at stream start IS the state-store shard count — the q_stream_hourly
  * precedent (r16, 4.3 s @ 32 shards vs 2.2 s @ 8) may or may not
  * generalize per operator (the CDC applier measured 2× WORSE under the
  * same treatment), hence: measure each stream FIRST, land
  * `StreamTuning.withDerivedPartitions` only where the drill shows a
  * win, keep a rejection note where it doesn't.
  *
  * Usage: runMain graft.tools.ProfileStreamFamily [sfDir] [runs] [q1,q2,...]
  * Scoping the WHOLE catalog fn (not just the stream) is the drill's
  * approximation — batch sub-plans inside also see the reduced conf, but
  * AQE coalesces those anyway; the landed per-operator change scopes
  * only the stream.
  */
object ProfileStreamFamily {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val names: Seq[String] =
      if (args.length > 2) args(2).split(",").toSeq
      else Seq("x_stream_latedata", "x_stream_distinct", "x_stream_quantiles",
        "x_stream_drift", "x_stream_heavyhitters", "x_stream_exactdedup",
        "x_stream_neardup", "x_stream_incremental", "x_stream_anomaly",
        "x_stream_imagehash", "x_stream_sigdedup", "x_stream_linededup")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    def release(): Unit = {
      spark.catalog.clearCache()
      sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // bypass the operators' own derived-partition scoping so the arms
    // actually vary the state-shard count (same rationale as
    // ProfileStreamHourly); the derived policy itself is the "1" arm at
    // sf0.1 (2 MB events -> 1 partition)
    spark.conf.set("spark.graft.stream.derivePartitions", "false")
    val arms = Seq(cpus.toInt, 8, 1)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown $name"))
      // warm-up once at the default conf (codegen/JIT)
      try { fn(spark, sfDir).count(); () } catch { case e: Throwable =>
        println(s"[psf] $name WARMUP FAILED: ${e.getMessage}") }
      release()
      arms.foreach { parts =>
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val n = graft.streaming.StreamTuning
            .withShufflePartitions(spark, parts) { fn(spark, sfDir).count() }
          val dt = (System.nanoTime() - t0) / 1e9
          release()
          (dt, n)
        }
        println(f"[psf] $name parts=$parts%2d min=${times.map(_._1).min}%.2f s " +
          f"all=${times.map(t => f"${t._1}%.2f").mkString(",")} rows=${times.head._2}")
      }
    }
    spark.stop()
  }
}
