package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorAdded, SparkListenerExecutorRemoved, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.{HostedSinks, HostedStore, LocalPortalServer, RestHostedService}

/** THE FAULT DRILL: real executor death, not simulated task retries.
  *
  * `WriteRetrySpec` injects task-level faults under `local[4, 3]` — one
  * JVM, so a "failed" task's JVM state survives. This tool runs the same
  * surfaces under `local-cluster[2, 8, 4096]`: a real standalone master +
  * worker with TWO SEPARATE EXECUTOR JVMs, and `Runtime.halt`s one of
  * them mid-job (the moral equivalent of an OOM kill / preemption — no
  * shutdown hooks, no abort() call, staged chunks orphaned). What that
  * proves, that the spec could not:
  *
  *  - the staged exactly-once write protocol holds when the writer JVM
  *    disappears AFTER staging chunks but BEFORE commit: the retry on the
  *    surviving executor re-stages under its own attempt id and publishes
  *    once (`committedParts` gate), with speculation enabled;
  *  - executor-side sink resolution works across process boundaries: the
  *    connector's `portal_url`/`token` options construct a
  *    [[RestHostedService]] INSIDE each executor JVM (the
  *    `HostedSinks.active` global of an executor JVM points at an empty
  *    executor-local store — using it would "succeed" and write nothing);
  *  - shuffle-output loss recovers exactly: a shuffle-heavy dedup probe
  *    (banded minhash-LSH mining) killed mid-scan recomputes lost map
  *    outputs and still returns the bit-identical pair set;
  *  - no staging leak: attempts that died without abort() are purged when
  *    their partition publishes ([[HostedStore.stagedBufferCount]] == 0).
  *
  * The kill is deterministic, not a sleep race: an armed iterator in the
  * write stage halts the executor when the designated partition reaches
  * the designated row on its FIRST attempt (an atomic create-marker file
  * makes the halt exactly-once across the worker's respawned executors).
  *
  * Prints one JSON line per drill plus a final summary line; exits
  * non-zero if any invariant fails. Run:
  * `SPARK_HOME=/opt/spark sbt "runMain graft.tools.FaultDrill"`.
  */
object FaultDrill {

  private val Token = "drill-token"

  // the executor JVMs are launched by the standalone worker, not by sbt:
  // they need the same JDK17 module opens the driver gets from build.sbt
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  /** Arm a kill: when partition `killPart`'s FIRST attempt reaches row
    * `killRow`, halt the executor JVM — once per marker file (atomic
    * `createNewFile` across the worker's executor processes).
    */
  private def armKill[T](it: Iterator[T], marker: String, killPart: Int,
                         killRow: Int): Iterator[T] = {
    val tc = org.apache.spark.TaskContext.get()
    var n = 0
    it.map { r =>
      n += 1
      if (tc.partitionId() == killPart && n == killRow &&
          tc.attemptNumber() == 0 &&
          new java.io.File(marker).createNewFile()) {
        // halt, not exit: no shutdown hooks, no abort() — the hard death
        Runtime.getRuntime.halt(137)
      }
      r
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")

    // the portal lives in the DRIVER process; executors reach it over
    // 127.0.0.1 — the same topology as a remote service, minus latency
    val server = new LocalPortalServer(Token).start()
    HostedSinks.active = new RestHostedService(server.url, Token)

    val spark = SparkSession.builder()
      .master("local-cluster[2,8,4096]")
      .appName("graft-fault-drill")
      .config("spark.executor.memory", "3g")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.default.parallelism", "16")
      // survive the executor loss: the lost tasks retry on the survivor
      .config("spark.task.maxFailures", "8")
      .config("spark.stage.maxConsecutiveAttempts", "8")
      .config("spark.speculation", "true")
      .config("spark.speculation.multiplier", "1.2")
      .config("spark.speculation.quantile", "0.5")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val execsRemoved = new AtomicInteger
    val execsAdded = new AtomicInteger
    val tasksFailed = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
        execsRemoved.incrementAndGet(); ()
      }
      override def onExecutorAdded(e: SparkListenerExecutorAdded): Unit = {
        execsAdded.incrementAndGet(); ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.reason != org.apache.spark.Success) { tasksFailed.incrementAndGet(); () }
    })

    var failures = List.empty[String]
    def check(cond: Boolean, what: String): Unit =
      if (!cond) failures ::= what

    def jline(drill: String, fields: (String, Any)*): Unit =
      println(fields.map { case (k, v) => v match {
        case s: String => s""""$k":"$s""""
        case x         => s""""$k":$x"""
      }}.mkString(s"""{"drill":"$drill",""", ",", "}"))

    import spark.implicits._

    def portalOpts(w: org.apache.spark.sql.DataFrameWriter[_]) =
      w.format("graft").option("portal_url", server.url).option("token", Token)

    def readBack(itemId: String): DataFrame =
      spark.read.format("graft")
        .option("itemId", itemId)
        .option("portal_url", server.url).option("token", Token)
        .option("pageSize", "1000")
        .load()

    // ------------------------------------------------ drill A: append
    // No merge key ⇒ no exchange between the armed iterator and the
    // writer: the executor dies INSIDE the write stage with ~18 chunks
    // of partition 3 already staged, uncommitted.
    locally {
      val n = 20000L
      val itemId = HostedSinks.active.create("drill_append",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.StringType, nullable = true))))
      val marker = s"/tmp/graft_drill_kill_append_${System.nanoTime()}"
      val removedBefore = execsRemoved.get()
      val t0 = System.nanoTime()
      spark.range(n).select($"id".as("k"), md5($"id".cast("string")).as("v"))
        .repartition(8)
        .as[(Long, String)]
        .mapPartitions(armKill(_, marker, killPart = 3, killRow = 1200))
        .toDF("k", "v")
        .write.pipe(portalOpts)
        .option("itemId", itemId)
        .option("writeMode", "append")
        .option("chunkSize", "64")
        .mode("append").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val killed = execsRemoved.get() - removedBefore
      val back = readBack(itemId)
        .agg(count(lit(1)).as("rows"), countDistinct($"k").as("distinct_k"),
          sum(crc32($"v")).as("vsum"))
        .head()
      val expectedVsum = spark.range(n)
        .agg(sum(crc32(md5($"id".cast("string"))))).head().getLong(0)
      check(new java.io.File(marker).exists(), "append: kill never armed")
      check(killed >= 1, "append: no executor was removed")
      check(back.getAs[Long]("rows") == n,
        s"append: rows ${back.getAs[Long]("rows")} != $n (duplicate or lost publish)")
      check(back.getAs[Long]("distinct_k") == n, "append: duplicate keys")
      check(back.getAs[Long]("vsum") == expectedVsum, "append: content checksum drift")
      check(HostedStore.stagedBufferCount(itemId) == 0,
        "append: orphaned staging buffers leaked")
      jline("append_kill_in_write_stage", "rows" -> back.getAs[Long]("rows"),
        "executors_killed" -> killed, "tasks_failed" -> tasksFailed.get(),
        "staged_leaks" -> HostedStore.stagedBufferCount(itemId),
        "wall_s" -> JsonNum.num(secs, 1))
    }

    // ------------------------------------------------ drill B: upsert
    // Merge key ⇒ RequiresDistributionAndOrdering plans a range shuffle
    // between the armed iterator and the writers: the kill lands in the
    // MAP stage, taking that executor's shuffle outputs with it; the
    // write stage then publishes each key-range exactly once on retry.
    locally {
      val n = 10000L
      val itemId = HostedSinks.active.create("drill_upsert",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.StringType, nullable = true))))
      // clean base load: keys 0..n-1 with v0
      spark.range(n).select($"id".as("k"), concat(lit("v0_"), $"id").as("v"))
        .write.pipe(portalOpts)
        .option("itemId", itemId).option("writeMode", "append")
        .option("chunkSize", "256")
        .mode("append").save()
      // armed upsert: update the even keys, insert n new keys above
      val marker = s"/tmp/graft_drill_kill_upsert_${System.nanoTime()}"
      val removedBefore = execsRemoved.get()
      val t0 = System.nanoTime()
      spark.range(n).select(
          when($"id" % 2 === 0, $"id").otherwise($"id" + n).as("k"))
        .select($"k", concat(lit("v1_"), $"k").as("v"))
        .repartition(8)
        .as[(Long, String)]
        .mapPartitions(armKill(_, marker, killPart = 5, killRow = 600))
        .toDF("k", "v")
        .write.pipe(portalOpts)
        .option("itemId", itemId)
        .option("writeMode", "upsert").option("key", "k")
        .option("chunkSize", "64")
        .mode("append").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val killed = execsRemoved.get() - removedBefore
      val back = readBack(itemId).as[(Long, String)].collect().toMap
      val expected = (0L until n).map { id =>
        val k = id
        if (k % 2 == 0) k -> s"v1_$k" else k -> s"v0_$k"
      }.toMap ++ (0L until n).filter(_ % 2 == 1).map(id => (id + n) -> s"v1_${id + n}")
      check(new java.io.File(marker).exists(), "upsert: kill never armed")
      check(killed >= 1, "upsert: no executor was removed")
      check(back.size == expected.size,
        s"upsert: ${back.size} rows != ${expected.size} expected")
      check(back == expected, "upsert: merged state diverged from expected")
      check(HostedStore.stagedBufferCount(itemId) == 0,
        "upsert: orphaned staging buffers leaked")
      jline("upsert_kill_in_map_stage", "rows" -> back.size,
        "executors_killed" -> killed, "tasks_failed" -> tasksFailed.get(),
        "staged_leaks" -> HostedStore.stagedBufferCount(itemId),
        "wall_s" -> JsonNum.num(secs, 1))
    }

    // --------------------------------- drill C: shuffle-heavy dedup probe
    // Banded minhash-LSH pair mining (multi-shuffle: shingle explode →
    // signature agg → band bucket join → verify) with the executor killed
    // mid-scan: the lost shuffle map outputs recompute, and the faulted
    // run must return the BIT-IDENTICAL pair set the clean run does.
    locally {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select($"doc_id", $"text")
      def mine(armedMarker: Option[String]): Set[(Long, Long)] = {
        // repartition first: the sf0.01 parquet scan is a single split,
        // and the armed partition must exist; the exchange also puts the
        // kill DOWNSTREAM of shuffle outputs, so the death loses real
        // map-output state, not just an input split
        val spread = docs.repartition(8)
        val src = armedMarker match {
          case None => spread
          case Some(m) =>
            // sf0.01 documents = 500 rows → ~62/partition: arm early so
            // the designated partition actually reaches the kill row
            spread.as[(Long, String)]
              .mapPartitions(armKill(_, m, killPart = 3, killRow = 10))
              .toDF("doc_id", "text")
        }
        graft.operators.Dedup
          .minhashLshPairs(src, "doc_id", "text", 0.7, verifyExact = false)
          .select($"a".cast("long"), $"b".cast("long"))
          .as[(Long, Long)].collect().toSet
      }
      val clean = mine(None)
      val marker = s"/tmp/graft_drill_kill_lsh_${System.nanoTime()}"
      val removedBefore = execsRemoved.get()
      val t0 = System.nanoTime()
      val faulted = mine(Some(marker))
      val secs = (System.nanoTime() - t0) / 1e9
      val killed = execsRemoved.get() - removedBefore
      check(new java.io.File(marker).exists(), "lsh: kill never armed")
      check(killed >= 1, "lsh: no executor was removed")
      check(clean.nonEmpty, "lsh: clean run found no pairs (fixture too small)")
      check(faulted == clean,
        s"lsh: faulted pair set diverged (clean ${clean.size}, faulted ${faulted.size})")
      jline("shuffle_dedup_kill_in_scan", "pairs" -> faulted.size,
        "executors_killed" -> killed, "tasks_failed" -> tasksFailed.get(),
        "wall_s" -> JsonNum.num(secs, 1))
    }

    // --------------------------- drill D: streaming write, killed mid-epoch
    // The epoch-keyed exactly-once contract under REAL process death: a
    // 4-micro-batch append stream (one file per trigger) through the DSv2
    // sink, with the executor halted inside the first epoch's write task
    // (staged chunks orphaned, no abort). The epoch's task retries on the
    // survivor; replayed stage/commit calls dedup service-side.
    locally {
      val n = 8000L
      val perFile = 2000L
      val itemId = HostedSinks.active.create("drill_stream",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.StringType, nullable = true))))
      val srcDir = java.nio.file.Files
        .createTempDirectory("graft_drill_stream_src").toString
      val data = spark.range(n)
        .select($"id".as("k"), md5($"id".cast("string")).as("v"))
      (0L until n by perFile).zipWithIndex.foreach { case (lo, i) =>
        data.filter($"k" >= lo && $"k" < lo + perFile).coalesce(1)
          .write.mode("overwrite").parquet(s"$srcDir/f$i")
      }
      val schema = data.schema
      val marker = s"/tmp/graft_drill_kill_stream_${System.nanoTime()}"
      val removedBefore = execsRemoved.get()
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_drill_stream_ckpt").toString
      val t0 = System.nanoTime()
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$srcDir/*")
        .as[(Long, String)]
        .mapPartitions(armKill(_, marker, killPart = 0, killRow = 500))
        .toDF("k", "v")
        .writeStream.format("graft")
        .option("itemId", itemId)
        .option("portal_url", server.url).option("token", Token)
        .option("chunkSize", "64")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val killed = execsRemoved.get() - removedBefore
      val back = readBack(itemId)
        .agg(count(lit(1)).as("rows"), countDistinct($"k").as("distinct_k"))
        .head()
      check(new java.io.File(marker).exists(), "stream: kill never armed")
      check(killed >= 1, "stream: no executor was removed")
      check(back.getAs[Long]("rows") == n,
        s"stream: rows ${back.getAs[Long]("rows")} != $n (epoch replay duplicated or lost)")
      check(back.getAs[Long]("distinct_k") == n, "stream: duplicate keys")
      check(HostedStore.stagedBufferCount(itemId) == 0,
        "stream: orphaned staging buffers leaked")
      jline("stream_kill_in_epoch", "rows" -> back.getAs[Long]("rows"),
        "executors_killed" -> killed, "tasks_failed" -> tasksFailed.get(),
        "staged_leaks" -> HostedStore.stagedBufferCount(itemId),
        "wall_s" -> JsonNum.num(secs, 1))
    }

    // ------------------------- drill E: DRIVER loss mid-batch-write
    // Drills A–D kill EXECUTORS under a surviving driver. Here the whole
    // Spark application — driver included — is a CHILD JVM writing
    // against this process's portal, and it halts ITSELF mid-write
    // (content-armed: group k%16==12 staged ~12 chunks, slowed so every
    // other partition commits first). The portal state then proves, from
    // this fresh process:
    //   (a) NO PARTIAL PARTITION PUBLISH: every k%16 group is either
    //       fully present or fully absent (staging is invisible until
    //       the per-partition commit, and the armed group's commit never
    //       ran);
    //   (b) the dead run's uncommitted staging is ORPHANED (its partKeys
    //       embed a writeId no future run publishes) — quantified, then
    //       cleared by the admin purge verb;
    //   (c) a RERUN converges: upsert(key=k) over the partial base lands
    //       exactly one row per key with the rerun's values — documented
    //       at-least-once for append, exactly-once for keyed upsert.
    locally {
      val n = 20000L
      val groups = 16L
      val perGroup = n / groups
      val itemId = HostedSinks.active.create("drill_driverloss",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.StringType, nullable = true))))
      def runChild(mode: String, prefix: String): Int = {
        val javaBin = s"${sys.props("java.home")}/bin/java"
        val log = java.nio.file.Files
          .createTempFile("graft_drill_driverloss", ".log").toFile
        val cmd: java.util.List[String] = java.util.Arrays.asList(
          (Seq(javaBin) ++ addOpens.split(" ") ++ Seq(
            "-Xmx2g", "-cp", sys.props("java.class.path"),
            "graft.tools.DriverLossChild",
            server.url, Token, itemId, n.toString, mode, prefix)): _*)
        val p = new ProcessBuilder(cmd)
          .redirectOutput(log).redirectErrorStream(true).start()
        val exit = p.waitFor()
        if (exit != 0 && mode != "armed-append") {
          scala.io.Source.fromFile(log).getLines().toSeq.takeRight(30)
            .foreach(l => System.err.println(s"[driverloss child] $l"))
        }
        exit
      }
      val t0 = System.nanoTime()
      val exit1 = runChild("armed-append", "v0_")
      check(exit1 == 137, s"driver child exited $exit1, expected halt(137)")
      // (a) per-group atomicity of the partial state
      val partial = readBack(itemId)
        .groupBy(($"k" % groups).as("g"))
        .agg(count(lit(1)).as("c"), countDistinct($"k").as("d"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      partial.foreach { case (g, c, d) =>
        check(c == perGroup && d == perGroup,
          s"driverloss: group $g partially published ($c of $perGroup rows)")
      }
      val committedGroups = partial.length
      check(committedGroups >= 1,
        "driverloss: no partition committed before the halt")
      check(committedGroups < groups,
        "driverloss: every partition committed — the halt landed too late")
      // (b) the dead run's staging is orphaned, then cleared explicitly
      val orphans = HostedStore.stagedBufferCount(itemId)
      check(orphans >= 1,
        "driverloss: expected orphaned staging from the dead driver")
      val purged = HostedStore.purgeAllStaged(itemId)
      check(purged == orphans && HostedStore.stagedBufferCount(itemId) == 0,
        "driverloss: admin purge did not clear the orphans")
      // (c) rerun converges to exactly-once under the merge key
      val exit2 = runChild("upsert", "v1_")
      check(exit2 == 0, s"driverloss: rerun exited $exit2")
      val back = readBack(itemId)
        .agg(count(lit(1)).as("rows"), countDistinct($"k").as("distinct_k"),
          sum(when($"v".startsWith("v1_"), 1L).otherwise(0L)).as("fresh"))
        .head()
      val secs = (System.nanoTime() - t0) / 1e9
      check(back.getAs[Long]("rows") == n,
        s"driverloss: rerun rows ${back.getAs[Long]("rows")} != $n")
      check(back.getAs[Long]("distinct_k") == n, "driverloss: duplicate keys")
      check(back.getAs[Long]("fresh") == n,
        "driverloss: stale values survived the keyed rerun")
      check(HostedStore.stagedBufferCount(itemId) == 0,
        "driverloss: staging leaked after the rerun")
      jline("driver_loss_mid_batch_write",
        "committed_groups_at_death" -> committedGroups,
        "orphaned_buffers" -> orphans, "purged" -> purged,
        "rows_after_rerun" -> back.getAs[Long]("rows"),
        "wall_s" -> JsonNum.num(secs, 1))
    }

    val ok = failures.isEmpty
    jline("summary", "ok" -> ok, "executors_killed_total" -> execsRemoved.get(),
      "executors_respawned" -> (execsAdded.get() - 2),
      "tasks_failed_total" -> tasksFailed.get(),
      "failures" -> failures.mkString("; "))
    spark.stop()
    server.stop()
    if (!ok) {
      failures.reverse.foreach(f => System.err.println(s"DRILL FAILURE: $f"))
      sys.exit(1)
    }
  }

  /** Tiny pipe so the portal options read as one builder chain. */
  private implicit class Pipe[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }
}
