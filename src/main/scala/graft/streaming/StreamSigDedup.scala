package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Streaming ingest-dedup against the persisted minhash signature
  * REGISTRY: arriving documents are signed and flagged per micro-batch
  * with [[graft.operators.Dedup.dedupeAgainstSignatures]] — the corpus
  * text is never touched, only the fixed-width signature artifact. The
  * `foreachBatch` member of the registry lifecycle (build → append →
  * tombstone → serve), sharing [[StreamAnnServe]]'s drive loop.
  *
  * Batch-invariant per document: a doc's flags depend only on its own
  * text and the static registry (no intra-batch mining — that is
  * [[StreamDedup]]'s job), so any micro-batch split yields the same
  * rows and the live path shares the batch entry's oracle verbatim.
  */
object StreamSigDedup {

  def runOnce(spark: SparkSession, docDir: String, fileGlob: String,
              schema: StructType, docPred: Column, registry: DataFrame,
              idCol: String, textCol: String, threshold: Double = 0.7,
              base: graft.operators.Dedup.Hashers.Base =
                graft.operators.Dedup.Hashers.xx64Base): DataFrame =
    StreamAnnServe.runForeach(spark, docDir, fileGlob, schema, docPred)(
      batch => graft.operators.Dedup.dedupeAgainstSignatures(
        batch, registry, idCol, textCol, threshold, base = base))
}
