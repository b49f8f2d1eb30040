package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-by-stage timing of the MinHash+LSH pipeline on a dup-inflated
  * corpus — separates shingle explode, signature/band computation, bucket
  * candidate expansion, and exact-Jaccard verification so a regression
  * points at its stage.
  */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.api.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val docsN = (0 until copies).map(i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val sh = time("shingles distinct (count)") {
      val s = Dedup.shingles(docsN, "doc_id", "text").cache()
      println(s"   rows: ${s.count()}")
      s
    }
    val bands = time("band keys (count)") {
      val b = Dedup.bandKeysFromShingles(sh, "doc_id", 128, 16,
        Dedup.Hashers.xx64Base).cache()
      println(s"   rows: ${b.count()}")
      b
    }
    val cand = time("bucket candidates (count)") {
      val buckets = bands.groupBy("band", "key")
        .agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")) <= 100 && size(col("ids")) >= 2)
      val c = buckets
        .select(explode(col("ids")).as("a"), col("ids"))
        .select(col("a"), explode(col("ids")).as("b"))
        .filter(col("a") < col("b"))
        .select("a", "b").distinct().cache()
      println(s"   pairs: ${c.count()}")
      c
    }
    time("jaccard verification (count)") {
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val common = cand
        .join(sh.select(col("doc_id").as("a"), col("shingle")), Seq("a"))
        .join(sh.select(col("doc_id").as("b"), col("shingle")), Seq("b", "shingle"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
      val n = common
        .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("n_a")), Seq("a"))
        .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("n_b")), Seq("b"))
        .withColumn("jaccard",
          col("n_common") / (col("n_a") + col("n_b") - col("n_common")))
        .filter(col("jaccard") >= 0.9).count()
      println(s"   pairs >= 0.9: $n")
    }
    // the two end-to-end verification configs, steady-state (2 runs each)
    (1 to 2).foreach { r =>
      time(s"e2e exact verify (run $r)") {
        Dedup.minhashLshPairs(docsN, "doc_id", "text", 0.9).count()
      }
      time(s"e2e estimator verify (run $r)") {
        Dedup.minhashLshPairs(docsN, "doc_id", "text", 0.9,
          verifyExact = false).count()
      }
    }
    spark.stop()
  }
}
