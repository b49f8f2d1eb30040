package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan dump for operator INTERNALS that the catalog-query dumps cannot
  * show because the operator eagerly pins its result (localCheckpoint →
  * LogicalRDD in the downstream plan). `runMain graft.tools.DumpOpPlans
  * <outDir> <suffix>` writes `<outDir>/<op>__<suffix>.txt` for each
  * hard-wired shape (currently: the jaccardPairs mining plan, lazy form).
  */
object DumpOpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val docs = graft.api.Tables.load(spark, sfDir, "documents")
    val shapes: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "jaccard_mining" -> graft.operators.Dedup.jaccardPairs(
        docs, "doc_id", "text", 0.6, maxShingleFreq = Some(1000),
        materialize = false),
      "lsh_candidates" -> graft.operators.Dedup.lshCandidatePairs(
        docs, "doc_id", "text"))
    shapes.foreach { case (name, df) =>
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}__$suffix.txt"), plan)
      println(s"[dumpop] wrote $outDir/${name}__$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
