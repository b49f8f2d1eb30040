package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming retrieval serving: QUERY vectors arrive as a stream and
  * each micro-batch is served against a persisted IVF index
  * ([[graft.operators.AnnIndex.ivfServe]]) via `foreachBatch` — the
  * standard pattern for batch-shaped work per trigger (a per-query rank
  * is not expressible as a pure streaming aggregation: it is neither
  * time-windowed nor monotone). Per-query results are BATCH-INVARIANT:
  * a query's top-k depends only on its own row and the static index, so
  * any micro-batch split yields the same rows — which is what lets the
  * LIVE path share the persisted-index oracle replay.
  *
  * Scale posture: the index is never retrained or re-assigned per
  * trigger (the whole point of persistence); each batch pays probe
  * projection + the probed-cid partition scan. Results collect to the
  * driver k·|queries-in-batch| rows at a time — the serving contract,
  * same budget as a memory sink.
  */
object StreamAnnServe {

  def runOnce(spark: SparkSession, queryDir: String, fileGlob: String,
              schema: StructType, queryPred: org.apache.spark.sql.Column,
              idxPath: String, idCol: String, vecCol: String,
              k: Int, nprobe: Int = 4): DataFrame = {
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", fileGlob).parquet(queryDir)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    // the result schema comes from the SERVE PATH itself (qid/id keep
    // the query table's native id type — a hardcoded copy here would
    // drift the moment an index serves non-long ids)
    val outSchema =
      new java.util.concurrent.atomic.AtomicReference[org.apache.spark.sql.types.StructType]
    val q = raw.filter(queryPred).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val served = graft.operators.AnnIndex.ivfServe(spark, idxPath,
          batch, idCol, vecCol, k, nprobe)
        outSchema.compareAndSet(null, served.schema)
        buf.synchronized { buf ++= served.collect(); () }
      }
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q.awaitTermination()
    // zero-batch stream: derive the schema by serving an empty frame of
    // the input shape (one trivially empty probe job)
    val schemaOut = Option(outSchema.get).getOrElse(
      graft.operators.AnnIndex.ivfServe(spark, idxPath,
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema),
        idCol, vecCol, k, nprobe).schema)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(buf.synchronized(buf.toList).asJava, schemaOut)
  }
}
