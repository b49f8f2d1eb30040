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

  test("a null op fails the stream loudly instead of vanishing from both legs") {
    val dir = "/tmp/graft_test_streamcdc_nullop"
    Seq((1L, 1L, "I", "a0"), (2L, 2L, null.asInstanceOf[String], "b0"))
      .toDF("k", "seq", "op", "payload")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val schema = logDf().schema
    val e = intercept[Exception] {
      StreamCdc.runOnce(spark, dir, schema, "k", "seq", "op").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("null op")),
      s"expected the null-op raise, got: ${messages(e)}")
  }

  test("purge-heavy batch: 100k tombstones delete through the distributed path") {
    val n = 100000L
    val dir = "/tmp/graft_test_streamcdc_purge"
    val ins = spark.range(n).select(col("id").as("k"), lit(1L).as("seq"),
      lit("I").as("op"), concat(lit("v"), col("id")).as("payload"))
    val dels = spark.range(n).select(col("id").as("k"), lit(2L).as("seq"),
      lit("D").as("op"), lit(null).cast("string").as("payload"))
    val log = ins.unionAll(dels)
    StreamCdc.stageLogSlices(log, "seq", dir, Seq(Seq(1L), Seq(2L)))
    val snap = StreamCdc.runOnce(spark, dir, log.schema, "k", "seq", "op")
    assert(snap.count() == 0L, "every key was tombstoned in the purge batch")
  }

  test("deleteFrame: per-task batches remove rows; a tagged replay short-circuits") {
    val df = spark.range(1000).select(col("id").as("k"),
      concat(lit("p"), col("id")).as("v"))
    val title = "deleteframe spec"
    graft.sinks.HostedStore.dropByTitle(
      graft.core.ServiceName.normalize(title).fold(sys.error, identity))
    val id = HostedTables.createTable(df, title, Some("k"))
      .fold(sys.error, identity)
    HostedTables.write(df, id, graft.core.WriteMode.Upsert, Some("k"))
      .fold(sys.error, identity)
    val keys = spark.range(400).select(col("id").as("k"))
    val n1 = HostedTables.deleteFrame(keys, id, "k",
      batchTag = Some("dfspec_b1")).fold(sys.error, identity)
    assert(n1 == 400L)
    assert(HostedTables.read(spark, id).count() == 600L)
    // replay with the SAME tag: every (partition, chunk) batch id has
    // been applied, so the service short-circuits — still 600 rows
    val n2 = HostedTables.deleteFrame(keys, id, "k",
      batchTag = Some("dfspec_b1")).fold(sys.error, identity)
    assert(n2 == 0L, s"replayed delete re-applied: $n2")
    assert(HostedTables.read(spark, id).count() == 600L)
    // an UNTAGGED delete of already-absent keys idempotently counts 0
    val n3 = HostedTables.deleteFrame(keys, id, "k").fold(sys.error, identity)
    assert(n3 == 0L)
  }

  test("deleteFrame chunks within a partition carry distinct batch ids") {
    val df = spark.range(500).select(col("id").as("k"), lit("x").as("v"))
    val title = "deleteframe chunk spec"
    graft.sinks.HostedStore.dropByTitle(
      graft.core.ServiceName.normalize(title).fold(sys.error, identity))
    val id = HostedTables.createTable(df, title, Some("k"))
      .fold(sys.error, identity)
    HostedTables.write(df, id, graft.core.WriteMode.Upsert, Some("k"))
      .fold(sys.error, identity)
    // chunkSize 7 forces multi-chunk partitions; all 500 must go
    val n = HostedTables.deleteFrame(df.select("k"), id, "k",
      chunkSize = 7, batchTag = Some("dfspec_chunks"))
      .fold(sys.error, identity)
    assert(n == 500L)
    assert(HostedTables.read(spark, id).count() == 0L)
  }

  test("streaming takedown propagation: batch tombstones land in the index sidecar") {
    val emb = graft.api.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = "/tmp/graft_test_streamtd_idx"
    graft.operators.AnnIndex.ivfBuild(emb, "vec_id", "embedding", idx,
      nlist = 16)
    val vt = emb.schema("embedding").dataType
    val log = emb.select(col("vec_id"), col("embedding"))
      .withColumn("seq", lit(1L)).withColumn("op", lit("I"))
      .unionByName(emb.filter(col("vec_id") % 2 =!= 0)
        .select(col("vec_id"), lit(null).cast(vt).as("embedding"))
        .withColumn("seq", lit(2L)).withColumn("op", lit("D")))
    val stage = "/tmp/graft_test_streamtd_log"
    StreamCdc.stageLogSlices(log, "seq", stage, Seq(Seq(1L), Seq(2L)))
    StreamCdc.runOnce(spark, stage, log.schema, "vec_id", "seq", "op",
      takedownIndexPath = Some(idx))
    assert(new java.io.File(s"$idx/tombstones").exists(),
      "stream did not write the deletion sidecar")
    val served = graft.operators.AnnIndex.ivfServe(spark, idx,
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10, nprobe = 4)
      .select("id").collect().map(_.getLong(0))
    assert(served.nonEmpty && served.forall(_ % 2 == 0),
      s"streamed tombstones still serving: ${served.filter(_ % 2 != 0).take(5).toSeq}")
  }
}
