package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Streaming near-dup detection pinned against the batch estimator: the
  * stream's stateless signatures must agree bit-for-bit with the batch
  * aggregation path, so (after per-band dedup) the emitted pair set over
  * a fully-drained stream equals `minhashLshPairs(verifyExact = false)`
  * on the same corpus.
  */
class StreamDedupSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def fixtureDocs: Seq[(Long, String)] = {
    // three families of planted near-dups + unrelated filler
    def doc(seed: Int): String =
      (0 until 40).map(i => s"w${(seed * 31 + i * 7) % 50}").mkString(" ")
    val dups = Seq(
      (0L, doc(1)), (1L, doc(1)), (2L, doc(1) + " tail"),
      (10L, doc(2)), (11L, doc(2)),
      (20L, doc(3)), (21L, doc(3) + " x y"))
    val filler = (100L until 140L).map(i => (i, doc(i.toInt)))
    dups ++ filler
  }

  test("stream signatures are expression-identical to the batch aggregation") {
    val docs = fixtureDocs.toDF("doc_id", "text")
    val streamSigs = StreamDedup.bandedSignatures(docs, "doc_id", "text",
        numHashes = 32, bands = 8, n = 3)
      .select("id", "band", "key")
    val batchSigs = Dedup.bandKeysFromShingles(
        Dedup.shingles(docs, "doc_id", "text", 3), "doc_id",
        numHashes = 32, bands = 8, base = Dedup.Hashers.xx64Base)
      .select(col("doc_id").as("id"), col("band"), col("key"))
    assert(streamSigs.orderBy("id", "band").collect().toSeq ==
      batchSigs.orderBy("id", "band").collect().toSeq)
  }

  test("streamed near-dup pairs match the batch estimator after band dedup") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = StreamDedup.nearDupPairs(input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", 0.9, numHashes = 32, bands = 8)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("spec_stream_dedup").start()
    // arrival split across micro-batches, including a family split so the
    // pair must bridge state from batch 1 to batch 3
    val all = fixtureDocs
    input.addData(all.take(3): _*); q.processAllAvailable()
    input.addData(all.slice(3, 6): _*); q.processAllAvailable()
    input.addData(all.drop(6): _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("spec_stream_dedup")
      .select("a", "b").distinct().as[(Long, Long)].collect().toSet
    val batch = Dedup.minhashLshPairs(all.toDF("doc_id", "text"),
        "doc_id", "text", 0.9, numHashes = 32, bands = 8,
        base = Dedup.Hashers.xx64Base, verifyExact = false)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty, "fixture should contain planted near-dups")
    assert(streamed == batch, s"stream=$streamed batch=$batch")
  }

  test("streamed vs-corpus hits flag exactly the corpus duplicates") {
    implicit val sqlCtx = spark.sqlContext
    def words(tag: String) = (1 to 30).map(i => s"$tag$i").mkString(" ")
    def near(tag: String) = (1 to 29).map(i => s"$tag$i").mkString(" ") + " zzz"
    val corpus = Seq((1L, words("a")), (2L, words("b")), (3L, words("c")))
      .toDF("doc_id", "text")
    val idx = StreamDedup.corpusBandIndex(corpus, "doc_id", "text",
      numHashes = 32, bands = 8).cache()
    val input = MemoryStream[(Long, String)]
    val hits = StreamDedup.vsCorpusHits(input.toDF().toDF("doc_id", "text"),
      idx, "doc_id", "text", 0.5, numHashes = 32, bands = 8)
    val q = hits.writeStream.outputMode("append")
      .format("memory").queryName("spec_stream_incr").start()
    // exact copy and a fresh doc in batch 1; near-copy and fresh in batch 2
    input.addData((10L, words("a")), (12L, words("x"))); q.processAllAvailable()
    input.addData((11L, near("b")), (14L, words("y"))); q.processAllAvailable()
    q.stop()
    val t = spark.table("spec_stream_incr")
    val flagged = t.select("doc_id").distinct().as[Long].collect().toSet
    assert(flagged == Set(10L, 11L), s"got $flagged")
    // an exact corpus copy has an identical signature: estimate 1.0, and
    // the hit attributes to the right corpus doc
    val exact = t.filter(col("doc_id") === 10L)
      .select("corpus_id", "est_jaccard").as[(Long, Double)].collect()
    assert(exact.nonEmpty && exact.forall(_ == ((1L, 1.0))), exact.toSeq.toString)
    idx.unpersist()
  }

  test("vsCorpusHits fails loudly on a signature-width mismatch with the index") {
    // index built at 32 hashes / 8 bands; stream signed at 64 / 16: the
    // rows-per-band match (4), so the stream's first 8 bands produce
    // IDENTICAL band keys and the join collides — exactly the insidious
    // config drift where zip_with would null-pad the shorter signature
    // and silently DEFLATE est_jaccard (under-reporting dups). The guard
    // must raise instead. Batch frames exercise the same path.
    def words(tag: String) = (1 to 30).map(i => s"$tag$i").mkString(" ")
    val corpus = Seq((1L, words("a"))).toDF("doc_id", "text")
    val idx = StreamDedup.corpusBandIndex(corpus, "doc_id", "text",
      numHashes = 32, bands = 8)
    val ex = intercept[Exception] {
      StreamDedup.vsCorpusHits(Seq((10L, words("a"))).toDF("doc_id", "text"),
        idx, "doc_id", "text", 0.1, numHashes = 64, bands = 16).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("signature width mismatch")),
      messages(ex).mkString(" | "))
  }

  test("streaming classifier scores agree with the batch NB classifier") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "clean prose here"), (2L, "spam junk spam"),
      (3L, "clean spam")).toDF("doc_id", "text")
    val good = Seq((10L, "clean prose clean")).toDF("doc_id", "text")
    val bad = Seq((11L, "spam junk")).toDF("doc_id", "text")
    val weights = TextAnalysis.nbTokenWeights(good, bad, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = TextAnalysis.nbQualityScore(docs, good, bad, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    // the fold-based applier on the SAME frame (it is a pure projection,
    // so batch/stream plans are identical) must reproduce every score
    val fold = StreamClassify.score(docs, weights, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    assert(fold.toSeq == batch.toSeq)
    // and through a REAL drained stream
    val stream = MemoryStream[(Long, String)](spark)
    stream.addData(docs.as[(Long, String)].collect().toSeq: _*)
    val name = s"classify_spec_${System.nanoTime()}"
    val q = StreamClassify.score(
        stream.toDF.toDF("doc_id", "text"), weights, "doc_id", "text")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table(name)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    assert(streamed.toSeq == batch.toSeq)
    intercept[IllegalArgumentException] {
      StreamClassify.score(docs, Map.empty, "doc_id", "text")
    }
  }

  test("streaming DSIR scores are bit-identical to the batch operator") {
    import graft.operators.Curation
    val docs = Seq((1L, "law court judge"), (2L, "law banana"),
      (3L, "banana apple apple")).toDF("doc_id", "text")
    val target = Seq((10L, "law court law")).toDF("doc_id", "text")
    val batch = Curation.dsirWeights(docs, target, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // ratio table from the SAME shared builder the catalog uses
    val ratios = Curation.dsirRatioTable(docs, target, "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val fold = StreamDsir.score(docs, ratios, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // EXACT double equality — same sorted fold, same bits
    assert(fold.toSeq == batch.toSeq)
    // through a REAL drained stream, still bit-identical
    val stream = MemoryStream[(Long, String)](spark)
    stream.addData(docs.as[(Long, String)].collect().toSeq: _*)
    val name = s"dsir_spec_${System.nanoTime()}"
    val q = StreamDsir.score(
        stream.toDF.toDF("doc_id", "text"), ratios, "doc_id", "text")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table(name).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.toSeq == batch.toSeq)
    // an out-of-model token scores the smoothed default 1.0
    val oov = StreamDsir.score(Seq((9L, "zzz")).toDF("doc_id", "text"),
      ratios, "doc_id", "text").select("dsir_score").as[Double].head()
    assert(oov == 1.0)
    intercept[IllegalArgumentException] {
      StreamDsir.score(docs, Map.empty, "doc_id", "text")
    }
  }

  test("a saturated bucket stops emitting and stops growing state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // 8 identical docs, bucket cap 3: pairs emitted only among the first 3
    // arrivals per bucket — C(3,2) = 3 distinct pairs, not C(8,2) = 28
    val stream = StreamDedup.nearDupPairs(input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", 0.9, numHashes = 32, bands = 8, maxBucketSize = 3)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("spec_stream_sat").start()
    val text = (0 until 40).map(i => s"t$i").mkString(" ")
    input.addData((0L until 8L).map(i => (i, text)): _*)
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("spec_stream_sat")
      .select("a", "b").distinct().as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L)), pairs.toString)
  }
}
