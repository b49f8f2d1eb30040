package graft
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every catalog query at SPARK_GRAFT_SF_DIR, then
  * emits ONE machine-readable JSON metric line. The JSON is written to
  * BENCH.json (stdout can be interleaved with executor WARNs on a busy
  * machine) AND printed as the final line after the SparkSession is fully
  * stopped, so nothing logs after it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Count codegen compile failures (janino 64 KB blowups etc.): Spark
    // falls back to interpreted execution WITHOUT failing the query, so a
    // codegen regression would otherwise only show up as silent slowdown
    // (round 4 ran the kNN graph's hottest stage interpreted all round).
    graft.tools.CodegenErrors.install()
    // Warm-up (JIT + codegen + catalog init) on the smallest SF so the
    // first timed query doesn't absorb one-time JVM costs.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Steady-state timing: each query runs twice, min reported — one
    // pass is dominated by first-use codegen compilation and scheduler
    // noise on a shared machine. A query that throws is recorded in
    // `failures`, not silently timed as if it ran.
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    val sc = spark.sparkContext
    // Session hygiene between timed queries: dedup/decontam pipelines
    // localCheckpoint intermediates (persisted blocks with no lineage) that
    // outlive their query. 67 queries sharing one session accumulated
    // gigabytes of dead blocks by mid-run, and later queries measured
    // block-manager/GC pressure instead of their own plan (x_sim_ivf: 9.2 s
    // polluted vs 1.15 s isolated). Dropping caches + persistent RDDs after
    // each query keeps every measurement cold-cache and independent.
    def releaseSessionState(): Unit = {
      spark.catalog.clearCache()
      sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      // Stderr marker BEFORE each query: any ERROR stack a later reader
      // finds in the captured log now sits between two markers, so it
      // attributes to one named query instead of "somewhere in the run"
      // (round 7's accumulator-error tail was unattributable without this).
      System.err.println(s"[bench] >>> $name")
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case e: Throwable =>
                   System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
                   false
                 }
        if (!ok) failed += name
        val dt = (System.nanoTime() - t0) / 1e9
        releaseSessionState()
        dt
      }
      name -> times.min
    }
    val succeeded = results.filter { case (k, _) => !failed.contains(k) }
    val qs = succeeded.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fails = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (succeeded.nonEmpty) succeeded.values.sum else 0.0
    // Pricing split: these queries run ORACLE-REPLAY configurations (md5
    // hashes, exact re-verification joins — chosen so DuckDB can replay
    // them, never what a production run would ship); each has a `_fast`
    // catalog twin in the production config (xx64 + estimator verify).
    // Report both totals so the headline number prices the engine, not the
    // oracle harness.
    val replayNames = Set(
      "x_dedup_cross", "x_dedup_minhash_pairs", "x_dedup_incremental")
      .filter(succeeded.contains)
    val oracleReplayS = replayNames.toSeq.map(succeeded).sum
    val productionS = total - oracleReplayS
    // Full per-query detail goes ONLY to BENCH.json: with 67 queries the
    // one-line JSON is >2000 chars and the driver's tail capture truncates
    // it mid-number (three straight rounds of "parsed": null). The stdout
    // metric line carries totals/failures/count only — a few hundred chars,
    // parseable no matter how short the capture window is.
    val cgErrs = graft.tools.CodegenErrors.total
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","oracle_replay_s":$oracleReplayS,"production_s":$productionS,"queries":$qs,"failures":$fails,"codegen_errors":$cgErrs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("BENCH.json"), full + "\n")
    // Committed per-query artifact (r8 verdict item 5): the driver only
    // captures the short stdout line, so round-over-round per-query
    // diffs need a FILE the next judge can read without builder-local
    // runs. Same payload as BENCH.json, stable name, one query per line
    // for reviewable diffs.
    val qLines = succeeded.toSeq.sortBy(_._1)
      .map { case (k, v) => f"""  "$k": $v%.3f""" }
      .mkString("{\n", ",\n", "\n}")
    Files.writeString(Paths.get("BENCH_PERQUERY.json"),
      s"""{"metric":"per_query_seconds","sf":"$sfDir","total":$total,""" +
      s""""oracle_replay_s":$oracleReplayS,"failures":$fails,""" +
      s""""codegen_errors":$cgErrs,"queries":\n$qLines}""" + "\n")
    // Failure NAMES are capped on stdout (the full list is in BENCH.json):
    // a broken shared fixture failing most of 70+ queries would otherwise
    // regrow this line past the tail capture it was shrunk to fit.
    val failsShort = failed.take(8).map("\"" + _ + "\"").mkString("[", ",", "]")
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","oracle_replay_s":$oracleReplayS,"production_s":$productionS,"n_queries":${succeeded.size},"n_failures":${failed.size},"failures":$failsShort,"codegen_errors":$cgErrs,"sf":"$sfDir"}"""
    spark.stop()
    println(summary)
  }
}
