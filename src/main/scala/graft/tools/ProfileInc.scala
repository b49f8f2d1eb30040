package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Tables
import graft.operators.Dedup

/** Stage-level timing for the incremental-dedup pipeline: isolates the
  * batch pre-sign, the corpus-side band-key scan, and the two miners so a
  * bench regression can be attributed to a stage instead of guessed at.
  * `runMain graft.tools.ProfileInc [sfDir] [md5|xx]`.
  */
object ProfileInc {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val base = if (args.length > 1 && args(1) == "xx") Dedup.Hashers.xx64Base
               else Dedup.Hashers.md5Base
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profinc] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    println(s"[profinc] batch=${batch.count()} corpus=${corpus.count()}")
    (1 to 2).foreach { round =>
      println(s"[profinc] --- round $round ---")
      val shB = Dedup.shingles(batch, "doc_id", "text", 3).cache()
      time("batch shingles materialize")(shB.count())
      time("batch bandKeys")(
        Dedup.bandKeysFromShingles(shB, "doc_id", 128, 16, base).count())
      val shC = Dedup.shingles(corpus, "doc_id", "text", 3)
      time("corpus shingles count")(shC.count())
      time("corpus bandKeys")(
        Dedup.bandKeysFromShingles(shC, "doc_id", 128, 16, base).count())
      shB.unpersist()
      time("full incrementalDedup")(
        Dedup.incrementalDedup(batch, corpus, "doc_id", "text", 0.7,
          base = base).count())
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
