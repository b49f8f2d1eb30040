package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming retrieval serving: QUERY vectors arrive as a stream and
  * each micro-batch is served against a static retrieval structure via
  * `foreachBatch` — the standard pattern for batch-shaped work per
  * trigger (a per-query rank is not expressible as a pure streaming
  * aggregation: it is neither time-windowed nor monotone). Per-query
  * results are BATCH-INVARIANT: a query's top-k depends only on its own
  * row and the static index/corpus, so any micro-batch split yields the
  * same rows — which is what lets the LIVE paths share their batch
  * entries' oracle replays verbatim.
  *
  * Two members: [[runOnce]] serves a persisted IVF index
  * ([[graft.operators.AnnIndex.ivfServe]] — never retrained or
  * re-assigned per trigger); [[runOnceMaxsim]] serves late-interaction
  * MaxSim against a static token corpus
  * ([[graft.operators.Similarity.maxsimTopK]] — the batch-side queries
  * broadcast, the corpus streams through one scan per trigger).
  *
  * Scale posture: each batch pays only its own serve cost. Results
  * collect to the driver k·|queries-in-batch| rows at a time — the
  * serving contract, same budget as a memory sink.
  */
object StreamAnnServe {

  def runOnce(spark: SparkSession, queryDir: String, fileGlob: String,
              schema: StructType, queryPred: Column,
              idxPath: String, idCol: String, vecCol: String,
              k: Int, nprobe: Int = 4): DataFrame =
    runForeach(spark, queryDir, fileGlob, schema, queryPred)(batch =>
      graft.operators.AnnIndex.ivfServe(spark, idxPath, batch,
        idCol, vecCol, k, nprobe))

  /** Composed-index twin: each micro-batch of query vectors serves
    * against the persisted IVF-PQ artifact ([[graft.operators.AnnIndex
    * .ivfpqServe]] — probed code partitions + ADC + exact re-rank per
    * trigger). Batch-invariant per query like [[runOnce]], so the live
    * path shares the batch entry's persisted-artifact oracle.
    */
  def runOnceIvfPq(spark: SparkSession, queryDir: String, fileGlob: String,
                   schema: StructType, queryPred: Column,
                   idxPath: String, corpus: DataFrame, idCol: String,
                   vecCol: String, k: Int, nprobe: Int = 4): DataFrame =
    runForeach(spark, queryDir, fileGlob, schema, queryPred)(batch =>
      graft.operators.AnnIndex.ivfpqServe(spark, idxPath, corpus, batch,
        idCol, vecCol, k, nprobe))

  /** Scan-floor twin: each micro-batch of query vectors serves against
    * the persisted BQ codes ([[graft.operators.AnnIndex.bqServe]] —
    * integer Hamming over the packed artifact, exact re-rank per
    * trigger). Batch-invariant per query like [[runOnce]], so the live
    * path shares x_sim_bq_persisted's persisted-artifact oracle
    * verbatim.
    */
  def runOnceBq(spark: SparkSession, queryDir: String, fileGlob: String,
                schema: StructType, queryPred: Column,
                idxPath: String, corpus: DataFrame, idCol: String,
                vecCol: String, k: Int, rerank: Int = 4): DataFrame =
    runForeach(spark, queryDir, fileGlob, schema, queryPred)(batch =>
      graft.operators.AnnIndex.bqServe(spark, idxPath, corpus, batch,
        idCol, vecCol, k, rerank))

  /** Late-interaction twin: each micro-batch of raw query vectors is
    * encoded onto the `floor(x·10⁶)` fixed-point token lattice (the
    * x_retrieval_maxsim synthesis — `tokenDim`-wide row-major tokens)
    * and scored by [[graft.operators.Similarity.maxsimTopK]] against
    * `corpusToks`, the ALREADY-tokenized static corpus. Batch-invariant
    * per query, so the live path shares the batch entry's oracle.
    */
  def runOnceMaxsim(spark: SparkSession, queryDir: String, fileGlob: String,
                    schema: StructType, queryPred: Column,
                    corpusToks: DataFrame, idCol: String, vecCol: String,
                    tokCol: String, k: Int, tokenDim: Int): DataFrame =
    runForeach(spark, queryDir, fileGlob, schema, queryPred)(batch =>
      graft.operators.Similarity.maxsimTopK(corpusToks,
        batch.select(col(idCol),
          graft.operators.Similarity.quantize(col(vecCol)).as(tokCol)),
        idCol, tokCol, k, tokenDim))

  /** The shared drive loop: AvailableNow over the staged query files,
    * `serve` per micro-batch, results buffered driver-side (the serving
    * contract). The result schema comes from the SERVE PATH itself —
    * a hardcoded copy here would drift the moment a serve path changes
    * its id type; a zero-batch stream derives it by serving an empty
    * frame of the input shape (one trivially empty job).
    */
  private[streaming] def runForeach(spark: SparkSession, queryDir: String,
                                    fileGlob: String, schema: StructType,
                                    queryPred: Column)
                                   (serve: DataFrame => DataFrame): DataFrame = {
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", fileGlob).parquet(queryDir)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    val outSchema =
      new java.util.concurrent.atomic.AtomicReference[StructType]
    val q = raw.filter(queryPred).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val served = serve(batch)
        outSchema.compareAndSet(null, served.schema)
        buf.synchronized { buf ++= served.collect(); () }
      }
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q.awaitTermination()
    val schemaOut = Option(outSchema.get).getOrElse(
      serve(spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema))
        .schema)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(buf.synchronized(buf.toList).asJava, schemaOut)
  }
}
