package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the ObjectHashAggregate sort-based fallback threshold on the
  * bounded top-k kernels (rankTopK): with hundreds of distinct qids per
  * map partition the default 128-key guard flips the aggregation to
  * sort-based. `runMain graft.tools.ProfileFallback [sfDir]`.
  */
object ProfileFallback {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fallback] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = graft.api.Tables.load(spark, sfDir, "embeddings")
    // the tune truth-pass shape: ~10% of the corpus as queries
    val qs = emb.filter(
      conv(substring(md5(col("vec_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 10 === 7)
    println(s"[fallback] |corpus|=${emb.count()} |queries|=${qs.count()}")
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    for (thr <- Seq("128", "1000000", "128")) {
      spark.conf.set(key, thr)
      (1 to 2).foreach { i =>
        t(s"bruteForceTopK k=10 thr=$thr run$i") {
          graft.operators.Similarity.bruteForceTopK(emb, qs,
            "vec_id", "embedding", 10).count()
        }
      }
    }
    spark.stop()
  }
}
