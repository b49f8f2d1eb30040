package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Tables
import graft.operators.{Dedup, Similarity}

/** Stage-level drill for the pointer-jumping CC family: separates the
  * pair/edge mining cost from the iterative component resolution so a
  * slow x_dedup_clusters / x_knn_components line attributes to a stage.
  * `runMain graft.tools.ProfileCc [sfDir]`.
  */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profcc] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    (1 to 2).foreach { round =>
      println(s"[profcc] --- round $round ---")
      val pairs = t("jaccardPairs build+pin") {
        val p = Dedup.jaccardPairs(docs, "doc_id", "text", 0.6,
          maxShingleFreq = Some(1000)).localCheckpoint(true)
        println(s"[profcc]   |pairs| = ${p.count()}")
        p
      }
      t("duplicateClusters over pinned pairs") {
        Dedup.duplicateClusters(pairs).count()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // jaccardPairs internals: where do the seconds go?
    println(s"[profcc] --- jaccard internals ---")
    val sh = t("shingles distinct (count)") {
      val s0 = Dedup.shingles(docs, "doc_id", "text", 3).cache()
      println(s"[profcc]   |shingles| = ${s0.count()}")
      s0
    }
    val hot = t("hot shingles (cap 1000)") {
      val h = sh.groupBy("shingle").count().filter(col("count") > 1000)
        .select("shingle")
      println(s"[profcc]   |hot| = ${h.count()}")
      h
    }
    val filtered = sh.join(hot, Seq("shingle"), "left_anti")
    t("inverted self-join candidate count") {
      val a = filtered.select(col("doc_id").as("a"), col("shingle"))
      val b = filtered.select(col("doc_id").as("b"), col("shingle"))
      val n = a.join(b, Seq("shingle")).filter(col("a") < col("b")).count()
      println(s"[profcc]   |candidate pair rows| = $n")
    }
    t("pair counts (groupBy a,b)") {
      val a = filtered.select(col("doc_id").as("a"), col("shingle"))
      val b = filtered.select(col("doc_id").as("b"), col("shingle"))
      val n = a.join(b, Seq("shingle")).filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_common")).count()
      println(s"[profcc]   |distinct pairs| = $n")
    }
    sh.unpersist()
    val emb = Tables.load(spark, sfDir, "embeddings")
    t("mutualKnnComponents end-to-end") {
      Similarity.mutualKnnComponents(emb, "vec_id", "embedding", 5,
        nlist = 64, nprobe = 8).count()
    }
    t("knnGraph alone") {
      Similarity.knnGraph(emb, "vec_id", "embedding", 5, nlist = 64,
        nprobe = 8).count()
    }
    spark.stop()
  }
}
