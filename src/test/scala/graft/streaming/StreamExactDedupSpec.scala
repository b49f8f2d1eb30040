package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact dedup on native watermarked state
  * (`dropDuplicatesWithinWatermark`): the surviving hash set over a
  * drained stream equals the batch DISTINCT set, duplicates are dropped
  * across micro-batch boundaries, and a bounded replay keeps exactly one
  * row per distinct content.
  */
class StreamExactDedupSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("parquet replay with injected dups keeps the batch distinct set") {
    val dir = java.nio.file.Files.createTempDirectory("sed_spec").toString
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    // every doc twice (shifted ids), plus a null text that must drop;
    // staged as ONE file named docs.parquet (pathGlobFilter matches leaf
    // files — the fixture layout is one bare parquet file per table)
    val stage = java.nio.file.Files.createTempDirectory("sed_stage").toString
    base.unionByName(base.withColumn("doc_id", col("doc_id") + 100000L))
      .unionByName(Seq((999999L, null: String)).toDF("doc_id", "text"))
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$dir/docs.parquet"))
    val schema = spark.read.parquet(s"$dir/docs.parquet").schema
    val streamed = StreamExactDedup.runOnce(spark, dir, "docs.parquet",
        schema, "doc_id", "text")
      .as[String].collect().toSeq
    val batch = base.filter(col("text").isNotNull)
      .select(sha2(col("text"), 256)).distinct().as[String].collect().toSet
    assert(streamed.toSet == batch)
    assert(streamed.size == streamed.toSet.size,
      "a bounded replay must keep exactly one row per distinct content")
  }

  test("duplicates are dropped across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
      .withColumn("__ts", timestamp_seconds(col("doc_id")))
    val q = StreamExactDedup.dedupped(docs, "text", "__ts", "1 hour")
      .select("text_hash")
      .writeStream.outputMode("append")
      .format("memory").queryName("spec_sed_batches").start()
    input.addData((1L, "alpha beta"), (2L, "gamma")); q.processAllAvailable()
    // batch 2: dup of batch-1 content under a new id + fresh content
    input.addData((3L, "alpha beta"), (4L, "delta")); q.processAllAvailable()
    q.stop()
    val kept = spark.table("spec_sed_batches").as[String].collect().toSeq
    assert(kept.size == 3, s"dup must be dropped across batches, got $kept")
    assert(kept.toSet ==
      Set("alpha beta", "gamma", "delta").map(org.apache.commons.codec.digest.DigestUtils.sha256Hex))
  }
}
