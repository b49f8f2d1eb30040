package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale tactics that become necessary past local data sizes: salted
  * aggregation for skewed keys and bucketed co-located joins.
  *
  * AQE handles moderate skew at runtime (split oversized partitions); the
  * salt is the explicit-plan variant for pathological keys (one key =
  * double-digit % of all rows), and bucketing removes the shuffle from
  * repeated large-fact joins entirely — both standard levers on a
  * 1000-executor cluster, here with correctness pinned by specs.
  */
object Scale {

  /** Two-phase salted sum/count for a skewed grouping key: phase 1
    * aggregates on (key, salt) — spreading each hot key over `saltBuckets`
    * reducers — phase 2 merges the partials per key. Result is identical
    * to a direct groupBy (sums of longs/decimals are associative; for
    * doubles the usual reordering caveat applies — pass decimals).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltBuckets)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n_rows"))
  }

  /** Exact heavy-hitter profile of a (join/grouping) key: the top `k` keys
    * by row count, with an integer parts-per-million share — the skew
    * diagnostic run BEFORE deciding whether a join needs [[saltedSum]]-style
    * salting, AQE skew handling, or a broadcast. One hash aggregation on
    * the key (map-side partial combine), a scalar total folded back in via
    * a broadcast of one row, and the top-k planned as TakeOrdered — no
    * global sort, no second pass over the data. Keys render as strings so
    * the profile has one schema for any key type.
    */
  def keyProfile(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    val counts = df
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("n * 1000000 div __total"))
      .orderBy(col("n").desc, col("key"))
      .limit(k)
      .select("key", "n", "share_ppm")
  }

  /** Write both sides bucketed by the join key into the session catalog,
    * so subsequent equi-joins on that key are co-located: no shuffle
    * exchange on either side at join time. The write cost amortizes over
    * every downstream join — the standard pattern for fact tables joined
    * repeatedly on the same key.
    */
  def bucketJoinTables(spark: SparkSession, left: DataFrame, right: DataFrame,
                       key: String, buckets: Int,
                       leftName: String, rightName: String): (DataFrame, DataFrame) = {
    Seq(leftName -> left, rightName -> right).foreach { case (name, df) =>
      spark.sql(s"DROP TABLE IF EXISTS $name")
      // The in-memory catalog forgets tables across JVMs but the warehouse
      // files persist; clear the stale location so re-creation succeeds.
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val loc = new java.io.File(new java.net.URI(
        if (wh.contains(":/")) wh else s"file:${new java.io.File(wh).getAbsolutePath}"
      ).getPath, name)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
      df.write.bucketBy(buckets, key).sortBy(key)
        .mode("overwrite").saveAsTable(name)
    }
    (spark.table(leftName), spark.table(rightName))
  }

  /** Z-order (Morton) value over two non-negative integer dimensions:
    * interleaves the low `bits` bits of `x` and `y` (x on even positions),
    * so rows close in BOTH dimensions get close z-values. Sorting or
    * range-partitioning the write by `z` clusters multi-dimensional
    * locality into files, and min/max footer stats then prune scans
    * filtered on EITHER dimension — the standard lakehouse layout for
    * two-column selective filters, where a single-column sort only ever
    * prunes its own column.
    *
    * Pure bit arithmetic (shifts/masks), codegen'd, replayable in any
    * engine. Caller maps each dimension into [0, 2^bits) first (e.g.
    * `pmod(col, lit(1 << bits))` for ids, or a bucketized range).
    */
  def zValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
             bits: Int = 16): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_.bitwiseOR(_))
  }

  /** Range-partition + sort a frame by the z-order of two bucketized
    * dimensions — the write-side layout step. `partitions` output tasks ⇒
    * `partitions` files, each covering a compact z-range whose min/max
    * stats prune on either dimension.
    */
  def zorderBy(df: DataFrame, xCol: String, yCol: String, bits: Int = 16,
               partitions: Int = 0): DataFrame = {
    val z = zValue(pmod(col(xCol), lit(1L << bits)),
      pmod(col(yCol), lit(1L << bits)), bits)
    val withZ = df.withColumn("__z", z)
    val parts = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    withZ.repartitionByRange(parts, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Compact a fragmented parquet directory to ~`targetBytes` output
    * files — the generic small-files maintenance pass (a long append /
    * streaming / per-trigger write history turns every downstream scan
    * into a listing + task-per-file problem; the 100 TB fix is periodic
    * rewrite, not bigger drivers). Output file count =
    * `ceil(input bytes / targetBytes)` (≥ 1), sized from the actual
    * file footprint via Hadoop's listing (no data pass, no RDD
    * materialization). Round-robin repartition — compaction balances
    * bytes; keep a layout pass ([[zorderBy]], `partitionBy`) separate
    * when ordering matters. Content-neutral by gate: the catalog entry
    * hash-verifies the compacted copy against the original table.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long = 128L << 20): Unit = {
    require(targetBytes >= 1L, s"targetBytes must be >= 1, got $targetBytes")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(path).getLength
    val parts = math.max(1L, (bytes + targetBytes - 1L) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(parts)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Zone-map prune report — MEASURE how much a layout lets file
    * skipping actually skip, instead of trusting that it does: per
    * storage unit, the min/max "footer stats" of each value column plus
    * a `prune_<col>` flag (1 = the unit's [min, max] is disjoint from
    * the predicate's [lo, hi] and a stats-aware scan never opens it).
    * Run it against a [[zorderBy]] layout vs. an unordered one and the
    * difference IS the layout's value — the companion gauge to
    * [[compactParquet]]'s small-files census, for the pruning axis.
    *
    * One aggregation pass over the table (count + min/max per column),
    * grouped by `fileLabel` — `input_file_name()` by default, the unit
    * parquet footer stats attach to. Deterministic-replay configuration:
    * label by a hive-partition bucket column instead (physical file
    * names carry write-time UUIDs; a bucket label makes the report a
    * pure function of the DATA, which is what lets the catalog entry
    * hash-verify the census cross-engine).
    */
  def pruneStats(df: DataFrame, valueCols: Seq[String],
                 predicates: Seq[(String, Long, Long)],
                 fileLabel: org.apache.spark.sql.Column = input_file_name()): DataFrame = {
    require(valueCols.nonEmpty, "pruneStats: valueCols must be non-empty")
    predicates.foreach { case (c, lo, hi) =>
      require(valueCols.contains(c),
        s"pruneStats: predicate column $c not in valueCols")
      require(lo <= hi, s"pruneStats: empty predicate range [$lo, $hi] on $c")
    }
    val aggs = valueCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val base = df.groupBy(fileLabel.as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    predicates.foldLeft(base) { case (acc, (c, lo, hi)) =>
      acc.withColumn(s"prune_$c",
        when(col(s"max_$c") < lo || col(s"min_$c") > hi, 1).otherwise(0))
    }
  }
}
