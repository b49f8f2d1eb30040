package graft.tools

import org.apache.spark.sql.SparkSession

/** kNN-graph timing + plan dump at a given dir/nlist: `runMain
  * graft.tools.ProfileKnn [dir] [nlist]`. Two timed runs (run 1 includes
  * codegen/JIT warmup) and the formatted physical plan — the drill-down
  * tool behind the round-5 scale fixes (co-grouped CellTopK kernel,
  * hot-cell salting, parallelism guard; see BENCH_SF1.json).
  */
object ProfileKnn {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val nlist = if (args.length > 1) args(1).toInt else 640
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val real = graft.operators.Similarity.knnGraph(
      graft.api.Tables.load(spark, dir, "embeddings"),
      "vec_id", "embedding", 5, nlist = nlist, nprobe = 8)
    time("knnGraph run1 (warmup)")(real.count())
    time("knnGraph run2 (steady)")(real.count())
    real.explain("formatted")
    spark.stop()
  }
}
