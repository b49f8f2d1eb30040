package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Stage-by-stage timing of the quantized-hyperplane embedding dedup
  * pipeline (signatures → bucket cap → candidate pairs → exact re-rank),
  * so a regression points at its stage.
  */
object ProfileEmb {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.api.Tables.load(spark, sfDir, "embeddings")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val docs = graft.api.Tables.load(spark, sfDir, "documents")
    (1 to 2).foreach { round =>
      println(s"-- round $round")
      time("stream bandedSignatures @docs") {
        graft.streaming.StreamDedup.corpusBandIndex(docs, "doc_id", "text").count()
      }
      time("corpus count") { emb.count() }
      time("signatures only (count)") {
        println("   rows: " + Similarity.hyperplaneSignatures(
          emb, "vec_id", "embedding", 16, 8).count())
      }
      val stacked = Similarity.hyperplaneSignatures(emb, "vec_id", "embedding", 16, 8)
      time("okKeys (count)") {
        val ok = stacked.groupBy("t", "sig").agg(count(lit(1)).as("n"))
          .filter(col("n") >= 2 && col("n") <= 100).select("t", "sig")
        println("   rows: " + ok.count())
      }
      time("pairs pre-distinct (count)") {
        val ok = stacked.groupBy("t", "sig").agg(count(lit(1)).as("n"))
          .filter(col("n") >= 2 && col("n") <= 100).select("t", "sig")
        val p = stacked.join(ok, Seq("t", "sig"))
          .groupBy("t", "sig").agg(collect_list(col("id")).as("ids"))
          .select(explode(col("ids")).as("a"), col("ids"))
          .select(col("a"), explode(col("ids")).as("b"))
          .filter(col("a") < col("b"))
        println("   rows: " + p.count())
      }
      val cand = time("candidate pairs (count)") {
        val c = Similarity.hyperplaneCandidatePairs(emb, "vec_id", "embedding")
        println(s"   rows: ${c.count()}")
        c
      }
      time("full top-20 (count)") {
        Dedup.embeddingTopPairsLsh(emb, "vec_id", "embedding", 20).count()
      }
      time("semantic dedup (count)") {
        Dedup.semanticDedup(emb, "vec_id", "embedding").count()
      }
    }
    spark.stop()
  }
}
