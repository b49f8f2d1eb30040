package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.HostedTables
import graft.core.WriteMode
import graft.sinks.HostedStore

/** Drive the public API end-to-end against real testdata — the library's
  * "does it actually work" entry point, also used by the verify skill.
  * Usage: sbt "runMain graft.tools.Demo [sfDir]"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    println(s"== input: ${orders.count()} orders from $sfDir")

    // 1. Orchestrator: resolve-or-create + chunked upsert load.
    val (id, report) = HostedTables.save(orders, "Demo Orders (2024)!",
      key = Some("o_orderkey"), chunkSize = 500).fold(sys.error, identity)
    println(s"== created '$id' title='${HostedStore.get(id).title}'")
    report.sortBy(_.partitionId).foreach(m =>
      println(f"   chunk ${m.partitionId}%3d rows=${m.rows}%5d batches=${m.batches} keys=[${m.minKey},${m.maxKey}]"))

    // 2. Paged, pushed-down read back.
    val back = HostedTables.read(spark, id)
    println(s"== read back: ${back.count()} rows, ${back.rdd.getNumPartitions} partitions")
    val q = back.filter($"o_totalprice" > 200000.0).select("o_orderkey", "o_totalprice")
    println("== pushdown plan:")
    println(q.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("graft") || l.contains("Scan")).mkString("\n"))
    println(s"== filtered count: ${q.count()}")

    // 3. The five write modes.
    val updates = orders.filter($"o_orderkey" % 3 === 0)
      .withColumn("o_totalprice", $"o_totalprice" + lit(1.0))
    val inserts = orders.filter($"o_orderkey" % 5 === 0)
      .withColumn("o_orderkey", $"o_orderkey" + lit(10000000L))
    val src = updates.unionByName(inserts)
    val before = HostedTables.read(spark, id).count()
    HostedTables.write(src, id, WriteMode.Upsert, Some("o_orderkey")).fold(sys.error, identity)
    val afterUpsert = HostedTables.read(spark, id).count()
    println(s"== upsert: $before -> $afterUpsert rows (expect +${inserts.count()})")

    HostedTables.write(src, id, WriteMode.Update, Some("o_orderkey")).fold(sys.error, identity)
    println(s"== update: ${HostedTables.read(spark, id).count()} rows (unchanged)")
    HostedTables.write(orders, id, WriteMode.Overwrite).fold(sys.error, identity)
    println(s"== overwrite: ${HostedTables.read(spark, id).count()} rows (back to input)")
    val delKeys = orders.filter($"o_orderkey" % 7 === 0)
      .select("o_orderkey").as[Long].collect().toSeq
    val deleted = HostedTables.deleteRows(id, "o_orderkey", delKeys)
      .fold(sys.error, identity)
    println(s"== delete_features: $deleted rows removed, " +
      s"${HostedTables.read(spark, id).count()} remain; replay removes " +
      s"${HostedTables.deleteRows(id, "o_orderkey", delKeys).fold(sys.error, identity)}")
    HostedTables.write(orders, id, WriteMode.Overwrite).fold(sys.error, identity)

    // 4. Error paths: bad mode config + empty input.
    println(s"== upsert w/o key  -> ${HostedTables.write(orders, id, WriteMode.Upsert, None).left.getOrElse("?!")}")
    println(s"== empty input     -> ${HostedTables.write(orders.filter(lit(false)), id, WriteMode.Append).left.getOrElse("?!")}")
    println(s"== missing itemId  -> ${HostedTables.write(orders, "item_nope", WriteMode.Append).left.getOrElse("?!")}")

    // 5. SQL surface: catalog + custom functions.
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    graft.functions.GraftFunctions.register(spark)
    val title = graft.sinks.HostedStore.get(id).title
    println(s"== SQL count       -> ${spark.sql(s"SELECT count(*) FROM graft.hosted.`$title`").first().getLong(0)}")
    println(s"== SQL service_name-> ${spark.sql("SELECT service_name(' 9My  Svc!! ')").first().getString(0)}")

    // 6. Pipeline operators over the documents/embeddings fixtures.
    import graft.operators.{Dedup, Similarity, TextAnalysis}
    val docs = graft.api.Tables.load(spark, sfDir, "documents")
    val emb = graft.api.Tables.load(spark, sfDir, "embeddings")
    println(s"== near-dup pairs (minhash-LSH, J>=0.9) -> ${Dedup.minhashLshPairs(docs, "doc_id", "text", 0.9).count()}")
    println(s"== top-10 neighbors for 5 queries        -> ${Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10).count()} rows")
    println(s"== lang-id distribution -> ${TextAnalysis.languageId(docs, "doc_id", "text").groupBy("lang_pred").count().orderBy("lang_pred").collect().map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(" ")}")
    // Curation: decontaminate against an "eval set", mix domains to
    // target proportions, fill a token budget, shard for export.
    import graft.operators.Curation
    val evalSet = docs.filter($"doc_id" % 7 === 0)
    println(s"== ngram-decontaminated corpus  -> ${Dedup.decontaminateNgram(docs, evalSet, "doc_id", "text", n = 8).count()} of ${docs.count()} docs survive")
    println(s"== domain mix (en .5/de .2/fr .15/es .1/zh .05 of 100) -> ${Curation.domainMix(docs, "lang", "doc_id", Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.15, "es" -> 0.1, "zh" -> 0.05), 100L).count()} docs")
    val budgeted = Curation.takeByBudget(
      docs.select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"),
        md5($"doc_id".cast("string")).as("__p")),
      Seq("__p", "doc_id"), "n_tokens", 5000L)
    println(s"== 5k-token budget fill         -> ${budgeted.count()} docs")
    println(s"== export shards (8-way)        -> ${Curation.shuffleShards(docs.select("doc_id"), "doc_id", 8).groupBy("shard").count().count()} shards")
    println(s"== top-5 vocab (tf)             -> ${TextAnalysis.vocab(docs, "doc_id", "text", 5).select("tok").as[String].collect().mkString(" ")}")
    println(s"== int8-quantized embeddings    -> ${graft.operators.Embeddings.quantizeInt8(emb, "embedding").filter(col("qscale") > 0).count()} vectors")
    println(s"== PQ ANN top-10 (ADC + re-rank) -> ${Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10).count()} rows")
    // CDC: merge-on-read snapshot + time travel over a synthesized log.
    val cdcLog = docs.select($"doc_id", $"text")
      .withColumn("seq", lit(1L)).withColumn("op", lit("I"))
      .unionByName(docs.filter($"doc_id" % 9 === 0)
        .select($"doc_id", lit(null).cast("string").as("text"))
        .withColumn("seq", lit(2L)).withColumn("op", lit("D")))
    println(s"== CDC snapshot / as-of        -> ${graft.operators.Cdc.applyLog(cdcLog, "doc_id", "seq", "op").count()} rows now, ${graft.operators.Cdc.snapshotAsOf(cdcLog, "doc_id", "seq", "op", 1L).count()} as of seq 1")
    // Web extraction + SFT assembly: the text-pipeline bookends.
    val page = docs.limit(100).select($"doc_id",
      concat(lit("<html><body><p>"), $"text", lit("</p></body></html>")).as("html"))
    println(s"== HTML -> text extraction      -> ${graft.operators.HtmlText.extract(page, "doc_id", "html").agg(sum("text_chars")).first().getLong(0)} chars from 100 pages")
    println(s"== SFT chat assembly            -> ${Curation.sftAssemble(docs, "source", "doc_id", "text").agg(sum("loss_tokens")).first().getLong(0)} loss tokens across ${docs.select("source").distinct().count()} conversations")
    // Multimodal: real codecs — BMP frame decode and WAV audio stats.
    import graft.operators.Multimodal
    val bmp = Multimodal.withBmpPayload(docs.limit(50), "doc_id", "text")
    println(s"== BMP frames decoded           -> ${Multimodal.decodeFrames(bmp, "doc_id").count()} frames from 50 docs")
    val wav = Multimodal.withWavPayload(docs.limit(50), "doc_id", "text")
    println(s"== WAV audio decoded            -> ${Multimodal.decodeAudio(wav, "doc_id").agg(sum("n_samples")).first().getLong(0)} PCM samples from 50 docs")
    // CSV staging: untyped file → hosted palette → hosted table round-trip.
    val csvTmp = java.io.File.createTempFile("demo_stage", ".csv")
    csvTmp.deleteOnExit()
    java.nio.file.Files.writeString(csvTmp.toPath,
      "k,flag,score,seen\n1,true,0.25,2021-06-01 10:00:00\n2,false,1.5,2021-06-02 11:30:00\n")
    val staged = graft.api.HostedTables.stageCsv(spark, csvTmp.getAbsolutePath)
      .fold(sys.error, identity)
    println(s"== CSV staged schema            -> ${staged.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(" ")}")

    // 7. Sessionization + streaming tail of a hosted table.
    val events = graft.api.Tables.load(spark, sfDir, "events")
    println(s"== sessions (30m gap) -> ${graft.streaming.Sessionize.sessions(events).count()}")
    val sq = spark.readStream.format("graft").option("itemId", id).load()
      .writeStream.format("memory").queryName("demo_tail").outputMode("append").start()
    sq.processAllAvailable(); sq.stop()
    println(s"== streamed tail rows -> ${spark.table("demo_tail").count()}")

    // Round-10 surfaces: distributed deletes, CDC log compaction, the
    // deletion-vector index lifecycle, late-interaction retrieval, and
    // water-filled mix budgeting.
    val delFrame = orders.filter($"o_orderkey" % 11 === 0).select($"o_orderkey")
    println(s"== distributed deleteFrame     -> ${HostedTables.deleteFrame(delFrame, id, "o_orderkey").fold(sys.error, identity)} rows removed in per-task batches")
    println(s"== CDC log compaction          -> ${cdcLog.count()} change rows -> ${graft.operators.Cdc.compactLog(cdcLog, "doc_id", "seq", "op", 1L).count()} after checkpoint@1")
    locally {
      val idxDir = "/tmp/graft_demo_ivf"
      graft.operators.AnnIndex.ivfBuild(emb, "vec_id", "embedding", idxDir, nlist = 16)
      graft.operators.AnnIndex.ivfDelete(spark, idxDir,
        emb.filter($"vec_id" % 2 === 1).select("vec_id"), "vec_id")
      val report = graft.operators.AnnIndex.describeIvf(spark, idxDir).first()
      println(s"== deletion-vector takedown    -> ${report.getAs[Long]("n_pending_tombstones")} ids pending, ${report.getAs[Long]("n_serving")} of ${report.getAs[Long]("n_members")} serving (index bytes untouched)")
    }
    // round-11 surface: the composed IVF-PQ index — probed code
    // partitions + ADC + exact re-rank, full lifecycle
    locally {
      val idxDir = "/tmp/graft_demo_ivfpq"
      graft.operators.AnnIndex.ivfpqBuild(emb, "vec_id", "embedding",
        idxDir, nlist = 16)
      val served = graft.operators.AnnIndex.ivfpqServe(spark, idxDir, emb,
        emb.filter($"vec_id" < 3), "vec_id", "embedding", 5, nprobe = 4)
      val rep = graft.operators.AnnIndex.describeIvfPq(spark, idxDir).first()
      println(s"== IVF-PQ composed serve       -> ${served.count()} ranked rows from ${rep.getAs[Long]("nlist")} cells x ${rep.getAs[Long]("m")}x${rep.getAs[Long]("ks")} codebooks over ${rep.getAs[Long]("n_codes")} codes")
    }
    // round-12 surface: residual encoding (IVFADC proper) — codes
    // quantize u(x) − u(centroid), serve adds the coarse term back
    locally {
      val idxDir = "/tmp/graft_demo_ivfpq_res"
      graft.operators.AnnIndex.ivfpqBuild(emb, "vec_id", "embedding",
        idxDir, nlist = 16, residual = true, trainedSeed = Some(42L))
      val served = graft.operators.AnnIndex.ivfpqServe(spark, idxDir, emb,
        emb.filter($"vec_id" < 3), "vec_id", "embedding", 5, nprobe = 4)
      println(s"== IVF-PQ residual (IVFADC)    -> ${served.count()} ranked rows; flavor persisted in meta/ = ${graft.operators.AnnIndex.ivfpqIsResidual(spark, idxDir)}")
    }
    // round-13 surface: the persisted scan floor — packed sign bits as
    // the codes artifact, Hamming serve, auto-compaction policy actor
    locally {
      val idxDir = "/tmp/graft_demo_bq"
      graft.operators.AnnIndex.bqBuild(emb, "vec_id", "embedding", idxDir)
      val served = graft.operators.AnnIndex.bqServe(spark, idxDir, emb,
        emb.filter($"vec_id" < 3), "vec_id", "embedding", 5)
      graft.operators.AnnIndex.bqDelete(spark, idxDir,
        emb.filter($"vec_id" % 3 === 0).select("vec_id"), "vec_id")
      val fired = graft.operators.AnnIndex.bqCompactIfNeeded(spark, idxDir,
        maxFiles = 10000, maxTombstoneFracPct = 20)
      val rep = graft.operators.AnnIndex.describeBq(spark, idxDir).first()
      println(s"== BQ persisted scan floor     -> ${served.count()} ranked rows over ${rep.getAs[Long]("n_codes")} packed codes (${rep.getAs[Long]("sig_words_max")} words/vec); policy compact fired = $fired, ${rep.getAs[Long]("n_pending_tombstones")} tombstones pending after")
    }
    val demoToks = emb.select($"vec_id",
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0) as double))").as("toks"))
    println(s"== MaxSim late interaction     -> ${Similarity.maxsimTopK(demoToks, demoToks.filter($"vec_id" < 3), "vec_id", "toks", 5, tokenDim = 16).count()} ranked rows for 3 query token-matrices")
    println(s"== water-filled 60% mix        -> ${Curation.domainWaterfill(docs, "source", "n_chars", docs.agg(sum($"n_chars").cast("long")).first().getLong(0) * 6 / 10).filter(!col("saturated")).count()} domains capped at the common level")

    // round-10 extension surfaces, driven end to end
    println(s"== bitext margin mining        -> ${Similarity.bitextMine(emb.filter($"vec_id" % 2 === 0), emb.filter($"vec_id" % 2 === 1), "vec_id", "embedding", 8).count()} mutual pairs mined")
    val demoScored = TextAnalysis.nbQualityScore(docs,
        docs.filter($"source" === "src0"), docs.filter($"source" =!= "src0"),
        "doc_id", "text")
      .join(docs.select($"doc_id", ($"source" === "src0").cast("long").as("y")), Seq("doc_id"))
    val demoCalib = graft.operators.Calibration
      .isotonicCalibrate(demoScored, "score", "y", 12)
    println(s"== isotonic calibration        -> ${demoCalib.count()} buckets, fit monotone; AUC = ${graft.operators.Calibration.aucEval(demoScored, "score", "y").select("auc_e6").first().getLong(0)} e-6")
    println(s"== span-corruption pairs       -> ${Curation.spanCorruptionPairs(docs, "doc_id", "text").agg(sum("n_spans")).first().getLong(0)} masked spans across the corpus")
    println(s"== PRF-expanded retrieval      -> ${TextAnalysis.bm25Prf(docs, docs.filter($"doc_id" < 3).select($"doc_id".as("qid"), array_join(slice(split($"text", " "), 1, 5), " ").as("qtext")), "doc_id", "text", "qid", "qtext", 10).count()} ranked rows after feedback")
    val demoReg = Dedup.signaturesFromShingles(
      Dedup.shingles(docs.filter($"doc_id" % 5 =!= 0), "doc_id", "text", 3),
      "doc_id", 128, Dedup.Hashers.xx64Base)
    println(s"== registry dedup-serve        -> ${Dedup.dedupeAgainstSignatures(docs.filter($"doc_id" % 5 === 0), demoReg, "doc_id", "text").count()} near-pairs flagged without re-reading corpus text")
    println(s"== k-center exemplars          -> ${graft.operators.Embeddings.kcenterExemplars(emb, "vec_id", "embedding", 4).count()} diverse seeds selected")

    // 8. The same engine over a REAL HTTP boundary: spin the in-process
    // portal double, swap the REST client in as the active sink, and run
    // a full save/filtered-read cycle whose scan pages and write batches
    // each cross the wire.
    locally {
      import graft.sinks.{HostedSinks, LocalPortalServer, RestHostedService}
      val server = new LocalPortalServer("demo-token").start()
      val prev = HostedSinks.active
      HostedSinks.active = new RestHostedService(server.url, "demo-token")
      try {
        graft.sinks.HostedStore.dropByTitle("demo_rest")
        val (rid, report) = HostedTables.save(orders.limit(500), "demo_rest",
          Some("o_orderkey")).fold(sys.error, identity)
        val back = HostedTables.read(spark, rid)
          .filter(col("o_totalprice") > 100000.0).count()
        println(s"== REST round-trip -> ${report.map(_.rows).sum} rows saved over " +
          s"HTTP, $back read back filtered (server ${server.url})")
      } finally {
        HostedSinks.active = prev
        server.stop()
      }
    }

    spark.stop()
    println("== demo OK")
  }
}
