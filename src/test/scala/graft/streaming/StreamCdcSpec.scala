package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.HostedTables
import graft.operators.Cdc

/** Pins the streaming CDC applier: multi-batch convergence to the batch
  * operator's snapshot, delete/revive across batch boundaries, and the
  * seq guard blocking stale replays.
  */
class StreamCdcSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def logDf(): DataFrame = Seq(
    (1L, 1L, "I", "a0"), (2L, 1L, "I", "b0"), (3L, 1L, "I", "c0"),
    (1L, 2L, "U", "a1"), (2L, 2L, "D", null.asInstanceOf[String]),
    (3L, 3L, "D", null.asInstanceOf[String]), (3L, 4L, "I", "c1")
  ).toDF("k", "seq", "op", "payload")

  private def stageSlices(df: DataFrame, dir: String,
                          slices: Seq[Seq[Long]]): Unit =
    StreamCdc.stageLogSlices(df, "seq", dir, slices)

  test("stream apply over 3 micro-batches converges to the batch snapshot") {
    val dir = "/tmp/graft_test_streamcdc_1"
    val log = logDf()
    stageSlices(log, dir, Seq(Seq(1L), Seq(2L), Seq(3L, 4L)))
    val got = StreamCdc.runOnce(spark, dir, log.schema, "k", "seq", "op")
      .orderBy("k").as[(Long, String)].collect().toSeq
    val want = Cdc.applyLog(log, "k", "seq", "op")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == want)
    assert(got == Seq((1L, "a1"), (3L, "c1"))) // 2 stays deleted, 3 revived
  }

  test("seq guard: a stale replayed change cannot regress the snapshot") {
    val dir = "/tmp/graft_test_streamcdc_2"
    val log = logDf()
    stageSlices(log, dir, Seq(Seq(1L, 2L, 3L, 4L)))
    val title = "stream cdc guard spec"
    graft.sinks.HostedStore.dropByTitle(
      graft.core.ServiceName.normalize(title).fold(sys.error, identity))
    val id = StreamCdc.apply(spark,
      spark.readStream.schema(log.schema).parquet(dir),
      "k", "seq", "op", title)
    // second stream against the SAME table delivers only stale rows:
    // an old update for key 1 and a re-delivered tombstone for key 3
    // that precedes its revive — both must bounce off the guard
    val staleDir = "/tmp/graft_test_streamcdc_2_stale"
    Seq((1L, 1L, "U", "a0-stale"), (3L, 3L, "D", null.asInstanceOf[String]))
      .toDF("k", "seq", "op", "payload")
      .coalesce(1).write.mode("overwrite").parquet(staleDir)
    StreamCdc.apply(spark,
      spark.readStream.schema(log.schema).parquet(staleDir),
      "k", "seq", "op", title)
    val after = HostedTables.read(spark, id).orderBy("k")
      .select("k", "payload").as[(Long, String)].collect().toSeq
    assert(after == Seq((1L, "a1"), (3L, "c1")),
      s"stale replay regressed the snapshot: $after")
  }
}
