package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The auto-compaction policy (`*CompactIfNeeded`) is the ACTOR behind
  * the describe* gauges: without it an append-heavy artifact degrades
  * (file listings, sidecar anti-joins) until a human runs compact. These
  * specs pin (a) both TRIGGERS — file census and tombstone fraction —
  * fire exactly when their thresholds trip, and (b) the SOAK property
  * the policy exists for: ~100 append/tombstone cycles with the policy
  * on keep the file count bounded and the serve results exactly equal to
  * a single-shot build over the same live membership, with serve latency
  * flat (bounded file count IS the latency driver; wall time is info'd
  * and loosely gated against catastrophic growth).
  */
class CompactionPolicySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  val dir = "/root/testdata/sf0.001"

  private def emb = graft.api.Tables.load(spark, dir, "embeddings")
  private def docs = graft.api.Tables.load(spark, dir, "documents")

  private def rmRec(path: String): Unit = graft.core.ParquetStage.rmRec(path)

  private def servedRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int)] =
    df.select(col("qid").cast("long"), col("id").cast("long"),
        col("rank").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq.sorted

  test("tombstone-fraction trigger: fires past the threshold, folds, resets") {
    val path = "/tmp/graft_test_policy_frac"
    rmRec(path)
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 8)
    val total = emb.count()
    // below threshold: ~10% tombstoned, frac gate at 20% — must NOT fire
    AnnIndex.ivfDelete(spark, path,
      emb.filter(col("vec_id") % 10 === 0).select("vec_id"), "vec_id")
    assert(!AnnIndex.ivfCompactIfNeeded(spark, path,
      maxFiles = 10000, maxTombstoneFracPct = 20))
    // push past it: ~33% tombstoned — must fire and fold
    AnnIndex.ivfDelete(spark, path,
      emb.filter(col("vec_id") % 3 === 0).select("vec_id"), "vec_id")
    val before = servedRows(AnnIndex.ivfServe(spark, path,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10, nprobe = 8))
    assert(AnnIndex.ivfCompactIfNeeded(spark, path,
      maxFiles = 10000, maxTombstoneFracPct = 20))
    val after = servedRows(AnnIndex.ivfServe(spark, path,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10, nprobe = 8))
    assert(after == before, "compact changed serve results")
    val d = AnnIndex.describeIvf(spark, path).head()
    assert(d.getAs[Long]("n_pending_tombstones") == 0L,
      "policy compact left a pending sidecar")
    assert(d.getAs[Long]("n_members") < total, "fold removed nothing")
    // quiet after the fold: the policy is now a cheap no-op
    assert(!AnnIndex.ivfCompactIfNeeded(spark, path,
      maxFiles = 10000, maxTombstoneFracPct = 20))
  }

  test("IVF soak: 40 append/delete cycles with the policy on — bounded files, exact serve") {
    val path = "/tmp/graft_test_policy_ivf_soak"
    val refPath = "/tmp/graft_test_policy_ivf_ref"
    rmRec(path); rmRec(refPath)
    val maxFiles = 32L
    val cycles = 40
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 8)
    val base = emb.persist()
    // per cycle: append a cycle-unique re-keyed slice, tombstone one id
    // appended in the PREVIOUS cycle (ids are cycle-unique, so a deleted
    // id is never re-inserted), then let the policy decide
    def batchIds(i: Int) = base.filter(col("vec_id") % 16 === i % 16)
      .select((col("vec_id") + lit(i * 100000L)).as("vec_id"),
        col("embedding"))
    val firstIdOfResidue: Map[Int, Long] = (0 until 16).map { r =>
      r -> base.filter(col("vec_id") % 16 === r)
        .agg(min("vec_id")).head().getLong(0)
    }.toMap
    var deleted = Set.empty[Long]
    var compacts = 0
    var t5 = 0.0; var tLast = 0.0
    val queries = base.filter(col("vec_id") < 5)
    for (i <- 1 to cycles) {
      AnnIndex.ivfAppend(batchIds(i), "vec_id", "embedding", path)
      if (i > 1) {
        val victim = firstIdOfResidue((i - 1) % 16) + (i - 1) * 100000L
        import spark.implicits._
        AnnIndex.ivfDelete(spark, path, Seq(victim).toDF("vec_id"), "vec_id")
        deleted += victim
      }
      if (AnnIndex.ivfCompactIfNeeded(spark, path,
          maxFiles = maxFiles, maxTombstoneFracPct = 10)) compacts += 1
      if (i == 5 || i == cycles) {
        val t0 = System.nanoTime()
        AnnIndex.ivfServe(spark, path, queries,
          "vec_id", "embedding", 10, nprobe = 8).count()
        val t = (System.nanoTime() - t0) / 1e9
        if (i == 5) t5 = t else tLast = t
      }
    }
    info(s"soak: $compacts compacts over $cycles cycles; " +
      f"serve at cycle 5 = $t5%.2f s, at cycle $cycles = $tLast%.2f s")
    assert(compacts >= 1, "the policy never fired across the whole soak")
    val census = AnnIndex.parquetFileCount(spark,
      AnnIndex.resolveDir(spark, path, "cells"))
    assert(census <= maxFiles + 16,
      s"file census $census escaped the policy bound $maxFiles")
    // latency stays flat-ish: the bounded census is the structural
    // guarantee; the wall gate only catches catastrophic growth
    assert(tLast <= t5 * 8 + 1.0,
      f"serve latency grew $t5%.2f s -> $tLast%.2f s across the soak")
    // exact serve parity with a single-shot build of the same live
    // membership under the SAME centroids (full probe ⇒ layout-free)
    val cyclesDf = spark.range(1, cycles + 1).select(col("id").as("cyc"))
    val appendedRef = base.crossJoin(cyclesDf)
      .filter(col("vec_id") % 16 === col("cyc") % 16)
      .select((col("vec_id") + col("cyc") * 100000L).as("vec_id"),
        col("embedding"))
    val liveRef = base.select("vec_id", "embedding").unionByName(appendedRef)
      .filter(!col("vec_id").isInCollection(deleted))
    AnnIndex.ivfBuild(liveRef, "vec_id", "embedding", refPath,
      spark.read.parquet(s"$path/centroids"))
    val got = servedRows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", 10, nprobe = 8))
    val want = servedRows(AnnIndex.ivfServe(spark, refPath, queries,
      "vec_id", "embedding", 10, nprobe = 8))
    assert(got.nonEmpty && got == want,
      "soaked index diverged from the single-shot build")
    base.unpersist()
  }

  test("registry soak: 100 append/tombstone cycles with the policy on — bounded files, exact serve") {
    val path = "/tmp/graft_test_policy_sig_soak"
    rmRec(path)
    val maxFiles = 24L
    val cycles = 100
    val sigs = Dedup.signaturesFromShingles(
        Dedup.shingles(docs, "doc_id", "text", 3),
        "doc_id", 64, Dedup.Hashers.xx64Base)
      .persist()
    sigs.count()
    // base registry: one slice, then 100 cycle-unique re-keyed appends
    sigs.filter(col("doc_id") % 5 === 1)
      .write.mode("overwrite").parquet(s"$path/sigs")
    val firstIdOfResidue: Map[Int, Long] = (0 until 10).map { r =>
      r -> sigs.filter(col("doc_id") % 10 === r)
        .agg(min("doc_id")).head().getLong(0)
    }.toMap
    var deleted = Set.empty[Long]
    var compacts = 0
    for (i <- 1 to cycles) {
      // the registry verbs, not direct-path writes: after a versioned
      // compact the plain sigs/ dir is the retained PREVIOUS version,
      // and a direct write there would silently vanish from serves
      Dedup.appendSignatures(
        sigs.filter(col("doc_id") % 10 === i % 10)
          .select((col("doc_id") + lit(i * 1000L)).as("doc_id"),
            col("sig")),
        path)
      if (i > 1) {
        import spark.implicits._
        val victim = firstIdOfResidue((i - 1) % 10) + (i - 1) * 1000L
        Dedup.tombstoneSignatures(Seq(victim).toDF("doc_id"), path)
        deleted += victim
      }
      if (Dedup.sigRegistryCompactIfNeeded(spark, path,
          maxFiles = maxFiles, maxTombstoneFracPct = 10)) compacts += 1
    }
    info(s"registry soak: $compacts compacts over $cycles cycles")
    assert(compacts >= 1, "the policy never fired across the whole soak")
    val census = AnnIndex.parquetFileCount(spark,
      AnnIndex.resolveDir(spark, path, "sigs"))
    assert(census <= maxFiles + 8,
      s"file census $census escaped the policy bound $maxFiles")
    // describe still works after a fold (empty sidecar stays READABLE)
    val d = Dedup.describeSigRegistry(spark, path).head()
    assert(d.getAs[Long]("sig_width_min") == 64L &&
      d.getAs[Long]("sig_width_max") == 64L)
    // exact serve parity: soaked registry (minus its pending sidecar)
    // vs the logically-identical single-shot registry
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val pending = spark.read.parquet(s"$path/tombstones")
    val regSoak = spark.read
      .parquet(AnnIndex.resolveDir(spark, path, "sigs"))
      .join(broadcast(pending.select("doc_id").distinct()),
        Seq("doc_id"), "left_anti")
    val cyclesDf = spark.range(1, cycles + 1).select(col("id").as("cyc"))
    val regRef = sigs.filter(col("doc_id") % 5 === 1)
      .select("doc_id", "sig")
      .unionByName(sigs.crossJoin(cyclesDf)
        .filter(col("doc_id") % 10 === col("cyc") % 10)
        .select((col("doc_id") + col("cyc") * 1000L).as("doc_id"),
          col("sig")))
      .filter(!col("doc_id").isInCollection(deleted))
    def serve(reg: org.apache.spark.sql.DataFrame) =
      Dedup.dedupeAgainstSignatures(batch, reg, "doc_id", "text",
          threshold = 0.5, numHashes = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
    val got = serve(regSoak)
    val want = serve(regRef)
    assert(got == want, "soaked registry serve diverged from single-shot")
    assert(want.nonEmpty, "serve parity was vacuous (no near-dup hits)")
    sigs.unpersist()
  }
}
