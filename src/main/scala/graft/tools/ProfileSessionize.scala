package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Attribution for the sessionize sf1 ratio (r8 verdict item 8: 2.78× at
  * 10× users — the largest non-sketch probe ratio): decompose the
  * session_window batch plan into its cost layers and price each at
  * sf0.1 AND the synthesized sf1, so the ratio attributes to scan /
  * shuffle / sort+merge instead of "session state" by assumption.
  *
  * Layers (each a strict subset of the next):
  *  - scan:         events scan + count (no exchange)
  *  - shuffle_agg:  groupBy(user_id) hash agg — prices the exchange the
  *                  session plan pays, WITHOUT any sort
  *  - shuffle_sort: repartition(user_id) + sortWithinPartitions(user_id,
  *                  ts) via noop write — the exchange PLUS the per-
  *                  partition sort that session merging requires
  *  - full:         Sessionize.sessions — exchange + sort + the
  *                  UpdatingSessions merge + final agg
  *
  * Requires /tmp/graft_sf1 (run BenchSf1 first — this tool reuses its
  * synthesized corpus so the numbers price the same bytes).
  */
object ProfileSessionize {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = Seq("sf01" -> "/root/testdata/sf0.1", "sf1" -> "/tmp/graft_sf1")
    def ev(dir: String): DataFrame = graft.api.Tables.load(spark, dir, "events")

    def time(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }

    val layers: Seq[(String, String => Unit)] = Seq(
      "scan" -> (d => { ev(d).count(); () }),
      "shuffle_agg" -> (d => {
        ev(d).groupBy("user_id")
          .agg(count(lit(1)), sum(col("value").cast("decimal(18,2)")))
          .count(); ()
      }),
      "shuffle_sort" -> (d => {
        ev(d).select(col("user_id"), col("ts"), col("value"))
          .repartition(col("user_id"))
          .sortWithinPartitions("user_id", "ts")
          .write.format("noop").mode("overwrite").save(); ()
      }),
      "full" -> (d => {
        graft.streaming.Sessionize.sessions(ev(d), "30 minutes").count(); ()
      }))

    val rows = layers.map { case (name, run) =>
      val t = dirs.map { case (tag, d) => tag -> time(run(d)) }.toMap
      val ratio = t("sf1") / t("sf01")
      println(f"== $name%-13s sf0.1 ${t("sf01")}%7.2f s   sf1 ${t("sf1")}%7.2f s   ratio $ratio%5.2fx")
      (name, t("sf01"), t("sf1"), ratio)
    }
    val json = rows.map { case (n, a, b, r) =>
      f""""$n":{"sf01":$a%.3f,"sf1":$b%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"sessionize_attribution","layers":$json}""")
    spark.stop()
  }
}
