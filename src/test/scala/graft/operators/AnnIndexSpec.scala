package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the persisted-ANN-index lifecycle: build → save → load → serve
  * must return BIT-IDENTICAL rows to the in-memory one-shot paths (same
  * centroids/codebooks ⇒ same kernels ⇒ same scores), and the serving
  * plan must be the serve-only shape — no training, no cell
  * re-assignment, a partition-pruned index scan.
  */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  val dir = "/root/testdata/sf0.001"

  private def emb = graft.api.Tables.load(spark, dir, "embeddings")
  private def queries = emb.filter(col("vec_id") < 5)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int)] =
    df.select(col("qid").cast("long"), col("id").cast("long"),
        col("rank").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq.sorted

  test("persisted IVF serves bit-identically to the in-memory path") {
    val path = "/tmp/graft_test_ivf_idx"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 16)
    val served = rows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    val inMem = rows(Similarity.ivfTopK(emb, queries,
      "vec_id", "embedding", k = 10, nlist = 16, nprobe = 4))
    assert(served.nonEmpty && served == inMem)
  }

  test("persisted k-means IVF serves bit-identically to ivfTopKTrained") {
    val path = "/tmp/graft_test_ivf_idx_trained"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 8,
      trainedSeed = Some(42L))
    val served = rows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    val inMem = rows(Similarity.ivfTopKTrained(emb, queries,
      "vec_id", "embedding", k = 10, nlist = 8, nprobe = 4, seed = 42L))
    assert(served.nonEmpty && served == inMem)
  }

  test("persisted PQ serves bit-identically to the in-memory path") {
    val path = "/tmp/graft_test_pq_idx"
    AnnIndex.pqBuild(emb, "vec_id", "embedding", path)
    val served = rows(AnnIndex.pqServe(spark, path, emb, queries,
      "vec_id", "embedding", k = 10))
    val inMem = rows(Similarity.pqTopK(emb, queries,
      "vec_id", "embedding", k = 10))
    assert(served.nonEmpty && served == inMem)
  }

  test("PQ codebooks round-trip the persistence bit-exactly") {
    val path = "/tmp/graft_test_pq_idx_rt"
    AnnIndex.pqBuild(emb, "vec_id", "embedding", path)
    val trained = Similarity.pqTrain(emb, "vec_id", "embedding")
    val loaded = AnnIndex.loadPqCodebooks(spark, path)
    assert(loaded.length == trained.length)
    for (s <- trained.indices; j <- trained(s).indices)
      assert(java.util.Arrays.equals(loaded(s)(j), trained(s)(j)),
        s"codebook ($s, $j) changed across persistence")
  }

  test("ivfAppend: build-on-half + append-half serves identically to a full build under the same centroids") {
    val pathA = "/tmp/graft_test_ivf_idx_app"
    val pathB = "/tmp/graft_test_ivf_idx_appfull"
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 =!= 0)
    // incremental lifecycle: centroids trained on the first batch only,
    // later batches assigned against the PERSISTED centroids
    AnnIndex.ivfBuild(evens, "vec_id", "embedding", pathA, nlist = 16)
    AnnIndex.ivfAppend(odds, "vec_id", "embedding", pathA)
    // reference: one-shot rebuild of the FULL corpus under the SAME
    // persisted centroid table (centroids are the index identity)
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", pathB,
      spark.read.parquet(s"$pathA/centroids"))
    val inc = rows(AnnIndex.ivfServe(spark, pathA, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    val full = rows(AnnIndex.ivfServe(spark, pathB, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(inc.nonEmpty && inc == full)
  }

  test("ivfBuild rebuilds in place under the index's OWN persisted centroids") {
    // the natural rebuild call reads the centroid table from the same
    // path it overwrites — must not throw "Cannot overwrite a path that
    // is also being read from" (the driver-side collect detaches it)
    val path = "/tmp/graft_test_ivf_idx_inplace"
    val evens = emb.filter(col("vec_id") % 2 === 0)
    AnnIndex.ivfBuild(evens, "vec_id", "embedding", path, nlist = 16)
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path,
      spark.read.parquet(s"$path/centroids"))
    val inPlace = rows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    // identical to the cross-path rebuild under the same centroid set
    val pathB = "/tmp/graft_test_ivf_idx_inplace_ref"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", pathB,
      spark.read.parquet(s"$path/centroids"))
    val crossPath = rows(AnnIndex.ivfServe(spark, pathB, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(inPlace.nonEmpty && inPlace == crossPath)
  }

  test("ivfCompact: one file per cid afterwards, serve results untouched") {
    val path = "/tmp/graft_test_ivf_idx_compact"
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 =!= 0)
    AnnIndex.ivfBuild(evens, "vec_id", "embedding", path, nlist = 16)
    AnnIndex.ivfAppend(odds, "vec_id", "embedding", path)
    def partFiles(dir: java.io.File): Seq[java.io.File] =
      dir.listFiles().toSeq.filter(_.getName.startsWith("cid="))
        .flatMap(_.listFiles().toSeq.filter(_.getName.endsWith(".parquet")))
    val cells = new java.io.File(s"$path/cells")
    val before = rows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    // an append history leaves >1 file in at least one partition
    assert(partFiles(cells).size >
      cells.listFiles().count(_.getName.startsWith("cid=")),
      "fixture broke: append produced no extra part files")
    AnnIndex.ivfCompact(spark, path)
    // the compact PUBLISHED a new version: resolve the pointer, don't
    // inspect the retained previous directory
    val compacted = new java.io.File(AnnIndex.resolveDir(spark, path, "cells"))
    assert(compacted.getName != "cells", "compact did not publish a version")
    val dirs = compacted.listFiles().toSeq.filter(_.getName.startsWith("cid="))
    dirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"partition ${d.getName} not compacted to one file")
    }
    val after = rows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(after == before, "compaction changed serve results")
  }

  test("pqAppend: incremental encode serves identically to one-shot over the same codebooks") {
    val path = "/tmp/graft_test_pq_idx_app"
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 =!= 0)
    AnnIndex.pqBuild(evens, "vec_id", "embedding", path)
    AnnIndex.pqAppend(odds, "vec_id", "embedding", path)
    val served = rows(AnnIndex.pqServe(spark, path, emb, queries,
      "vec_id", "embedding", k = 10))
    // in-memory reference under the SAME (evens-trained) codebooks
    val cbs = AnnIndex.loadPqCodebooks(spark, path)
    val inMem = rows(Similarity.pqTopK(emb, queries,
      "vec_id", "embedding", k = 10, codebooksIn = Some(cbs)))
    assert(served.nonEmpty && served == inMem)
  }

  test("PQ serve plan: code-table scan, no re-encode of the corpus") {
    val path = "/tmp/graft_test_pq_idx"
    AnnIndex.pqBuild(emb, "vec_id", "embedding", path)
    val p = AnnIndex.pqServe(spark, path, emb, queries,
      "vec_id", "embedding", k = 10)
      .queryExecution.executedPlan.toString.toLowerCase
    // the encode argmax (VecBlockArgMax) must not appear at serve time —
    // the ADC scan reads persisted codes; the only VecDotMatrix is the
    // per-query LUT projection
    assert(!p.contains("vecblockargmax"), p)
    assert(p.contains("vecdotmatrix"), p)
    val inMemPlan = Similarity.pqTopK(emb, queries,
      "vec_id", "embedding", k = 10)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(inMemPlan.contains("vecblockargmax"), inMemPlan)
  }

  test("ivfDelete: takedown equals a rebuild on the remainder, deleted ids never serve") {
    val path = "/tmp/graft_test_ivf_idx_del"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 16)
    AnnIndex.ivfDelete(spark, path,
      emb.filter(col("vec_id") % 2 =!= 0).select("vec_id"), "vec_id")
    val served = rows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(served.nonEmpty && served.forall(_._2 % 2 == 0),
      s"deleted ids still serving: ${served.filter(_._2 % 2 != 0).take(5)}")
    // identical to rebuilding on the remainder under the SAME centroids
    // (deletion changes membership, never the index identity)
    val ref = "/tmp/graft_test_ivf_idx_del_ref"
    AnnIndex.ivfBuild(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", ref, spark.read.parquet(s"$path/centroids"))
    val rebuilt = rows(AnnIndex.ivfServe(spark, ref, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(served == rebuilt)
  }

  test("FULL takedown leaves a servable empty index; append repopulates it") {
    val path = "/tmp/graft_test_ivf_idx_fulldel"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 16)
    AnnIndex.ivfDelete(spark, path, emb.select("vec_id"), "vec_id")
    // an emptied index must still READ (schema-bearing empty file, not
    // a part-less directory) and serve zero rows, not throw
    val served = rows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(served.isEmpty)
    // maintenance on the empty index keeps working
    AnnIndex.ivfCompact(spark, path)
    // append re-establishes the partitioned layout (an append-mode
    // write next to the unpartitioned empty file would mix layouts)
    AnnIndex.ivfAppend(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", path)
    val again = rows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(again.nonEmpty && again.forall(_._2 % 2 == 0))
  }

  test("pqDelete: takedown equals in-memory search over the remainder") {
    val path = "/tmp/graft_test_pq_idx_del"
    AnnIndex.pqBuild(emb, "vec_id", "embedding", path)
    AnnIndex.pqDelete(spark, path,
      emb.filter(col("vec_id") % 2 =!= 0).select("vec_id"), "vec_id")
    val served = rows(AnnIndex.pqServe(spark, path, emb, queries,
      "vec_id", "embedding", k = 10))
    assert(served.nonEmpty && served.forall(_._2 % 2 == 0))
    val cbs = AnnIndex.loadPqCodebooks(spark, path)
    val inMem = rows(Similarity.pqTopK(emb.filter(col("vec_id") % 2 === 0),
      queries, "vec_id", "embedding", k = 10, codebooksIn = Some(cbs)))
    assert(served == inMem)
  }

  test("takedowns are O(ids): cells untouched by N deletes; compact folds + clears") {
    val path = "/tmp/graft_test_ivf_idx_dv"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 16)
    def cellsListing(): Seq[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$path/cells"))
        .map(f => (f.getPath, f.length(), f.lastModified())).sorted
    }
    val before = cellsListing()
    // N takedown calls: the index data files must not be rewritten —
    // identical paths, sizes, AND mtimes (O(ids) sidecar appends only)
    (1 to 5).foreach { i =>
      AnnIndex.ivfDelete(spark, path,
        emb.filter(col("vec_id") % 10 === i).select("vec_id"), "vec_id")
    }
    assert(cellsListing() == before,
      "a takedown rewrote the cells — deletes must be O(ids), not O(index)")
    assert(new java.io.File(s"$path/tombstones").exists(),
      "no tombstone sidecar written")
    val viaSidecar = rows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(viaSidecar.nonEmpty &&
      viaSidecar.forall(r => r._2 % 10 == 0 || r._2 % 10 > 5),
      "tombstoned members (vec_id % 10 in 1..5) still serving")
    // compact folds the sidecar: rows physically gone, sidecar cleared,
    // serve results identical to the sidecar path
    AnnIndex.ivfCompact(spark, path)
    assert(!new java.io.File(s"$path/tombstones").exists(),
      "compact did not clear the folded sidecar")
    val folded = rows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(folded == viaSidecar, "fold changed serve results")
    val foldedIds = spark.read.parquet(AnnIndex.resolveDir(spark, path, "cells"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(foldedIds.forall(id => (id % 10 == 0) || (id % 10 > 5)),
      "folded cells still contain tombstoned members")
  }

  test("pqCompact folds the sidecar and clears it; serve unchanged") {
    val path = "/tmp/graft_test_pq_idx_dv"
    AnnIndex.pqBuild(emb, "vec_id", "embedding", path)
    def codesListing(): Seq[(String, Long, Long)] =
      new java.io.File(s"$path/codes").listFiles().toSeq
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.length(), f.lastModified())).sorted
    val before = codesListing()
    AnnIndex.pqDelete(spark, path,
      emb.filter(col("vec_id") % 2 =!= 0).select("vec_id"), "vec_id")
    assert(codesListing() == before,
      "pqDelete rewrote the code table — must be O(ids)")
    val viaSidecar = rows(AnnIndex.pqServe(spark, path, emb, queries,
      "vec_id", "embedding", k = 10))
    assert(viaSidecar.nonEmpty && viaSidecar.forall(_._2 % 2 == 0))
    AnnIndex.pqCompact(spark, path)
    assert(!new java.io.File(s"$path/tombstones").exists())
    val folded = rows(AnnIndex.pqServe(spark, path, emb, queries,
      "vec_id", "embedding", k = 10))
    assert(folded == viaSidecar)
    val ids = spark.read.parquet(AnnIndex.resolveDir(spark, path, "codes"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids.forall(_ % 2 == 0), "folded codes keep tombstoned members")
  }

  test("serve listing is O(probed): the cells scan is rooted at probed partition dirs only") {
    val path = "/tmp/graft_test_ivf_idx_listing"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 16)
    val served = AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 2)
    // string-based like the other plan gates (AQE wraps the physical
    // plan, so node-level collect misses the scan)
    val p = served.queryExecution.executedPlan.toString
    val loc = p.linesIterator
      .find(l => l.contains("Location") && l.contains("cells"))
      .getOrElse(fail(s"no cells scan location in the serve plan:\n$p"))
    // rooted at `cid=` PARTITION DIRECTORIES, never the whole table —
    // a generic read would recursively list all nlist partitions before
    // pruning, which at nlist=10^5 makes every serve a full FS sweep
    assert(loc.contains("cells/cid="), loc)
    val nPaths = "\\((\\d+) paths\\)".r.findFirstMatchIn(loc).map(_.group(1).toInt)
    assert(nPaths.exists(n => n >= 1 && n < 16),
      s"scan rooted at $nPaths dirs — looks like the whole index, not the probed subset: $loc")
    assert(rows(served).nonEmpty)
  }

  test("mass takedown fans out: a 10^7-id batch is not a single-task funnel") {
    val path = "/tmp/graft_test_ivf_idx_massdel"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 16)
    // a bulk compliance batch: 10^7 ids in one call (tombstones are
    // policy data — ids that were never indexed are legal and inert)
    AnnIndex.ivfDelete(spark, path,
      spark.range(10000000L).select(col("id").as("vec_id")), "vec_id")
    val files = new java.io.File(s"$path/tombstones").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1,
      s"bulk takedown landed in ${files.length} file(s) — the append " +
        "must fan out with the distinct's shuffle, not coalesce(1)")
    // suppression still holds end-to-end over the multi-file sidecar
    // (every sf0.001 vec_id is < 10^7, so the index is fully suppressed)
    val served = rows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(served.isEmpty, "ids tombstoned by the bulk batch still serve")
    // a trickle takedown after the bulk one still appends O(ids) — the
    // cells are untouched throughout (no rewrite, no re-read)
    AnnIndex.ivfDelete(spark, path,
      emb.limit(1).select("vec_id"), "vec_id")
    assert(new java.io.File(s"$path/tombstones").listFiles()
      .count(_.getName.endsWith(".parquet")) > files.length)
  }

  test("a rebuild clears a stale sidecar: fresh membership = the corpus given") {
    val path = "/tmp/graft_test_ivf_idx_stale"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 16)
    AnnIndex.ivfDelete(spark, path,
      emb.filter(col("vec_id") % 2 =!= 0).select("vec_id"), "vec_id")
    // rebuild over the same path: the pending takedowns must NOT leak
    // into the fresh index
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 16)
    val served = rows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(served.exists(_._2 % 2 != 0),
      "stale sidecar suppressed fresh members after a rebuild")
  }

  test("IVF-PQ with a full probe equals the flat PQ serve (same codebooks)") {
    val pathA = "/tmp/graft_test_ivfpq_idx"
    val pathB = "/tmp/graft_test_ivfpq_ref_pq"
    // pqTrain is deterministic, so both indexes carry identical codebooks;
    // with nprobe = nlist every cell is probed → candidate set, ADC
    // scores, shortlist, and exact re-rank all coincide with flat PQ
    AnnIndex.ivfpqBuild(emb, "vec_id", "embedding", pathA, nlist = 8)
    AnnIndex.pqBuild(emb, "vec_id", "embedding", pathB)
    val composed = rows(AnnIndex.ivfpqServe(spark, pathA, emb, queries,
      "vec_id", "embedding", k = 10, nprobe = 8))
    val flat = rows(AnnIndex.pqServe(spark, pathB, emb, queries,
      "vec_id", "embedding", k = 10))
    assert(composed.nonEmpty && composed == flat)
  }

  test("ivfpqAppend: build-on-half + append-half equals flat PQ under the persisted codebooks") {
    val path = "/tmp/graft_test_ivfpq_app"
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 =!= 0)
    // centroids + codebooks trained on the first batch only; the later
    // batch is assigned + encoded against the PERSISTED models. With a
    // full probe the composed serve must equal flat PQ over the same
    // codebooks — which pins append completeness AND encode identity.
    AnnIndex.ivfpqBuild(evens, "vec_id", "embedding", path, nlist = 8)
    AnnIndex.ivfpqAppend(odds, "vec_id", "embedding", path)
    val composed = rows(AnnIndex.ivfpqServe(spark, path, emb, queries,
      "vec_id", "embedding", k = 10, nprobe = 8))
    val cbs = AnnIndex.loadPqCodebooks(spark, path)
    val flat = rows(Similarity.pqTopK(emb, queries,
      "vec_id", "embedding", k = 10, codebooksIn = Some(cbs)))
    assert(composed.nonEmpty && composed == flat)
  }

  test("IVF-PQ serve scans only probed code partitions; deletes are O(ids); compact folds") {
    val path = "/tmp/graft_test_ivfpq_idx_life"
    AnnIndex.ivfpqBuild(emb, "vec_id", "embedding", path, nlist = 16)
    val served = AnnIndex.ivfpqServe(spark, path, emb, queries,
      "vec_id", "embedding", k = 10, nprobe = 2)
    val p = served.queryExecution.executedPlan.toString
    val loc = p.linesIterator
      .find(l => l.contains("Location") && l.contains("codes"))
      .getOrElse(fail(s"no codes scan location in the serve plan:\n$p"))
    assert(loc.contains("codes/cid="), loc)
    assert(rows(served).nonEmpty)
    // takedown: codes untouched (O(ids) sidecar), suppressed at serve
    def codesListing(): Seq[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$path/codes"))
        .map(f => (f.getPath, f.length(), f.lastModified())).sorted
    }
    val before = codesListing()
    AnnIndex.ivfpqDelete(spark, path,
      emb.filter(col("vec_id") % 2 =!= 0).select("vec_id"), "vec_id")
    assert(codesListing() == before,
      "ivfpqDelete rewrote the code table — must be O(ids)")
    val viaSidecar = rows(AnnIndex.ivfpqServe(spark, path, emb, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(viaSidecar.nonEmpty && viaSidecar.forall(_._2 % 2 == 0),
      "tombstoned members still serving")
    // compact folds the sidecar and clears it; serve results unchanged
    AnnIndex.ivfpqCompact(spark, path)
    assert(!new java.io.File(s"$path/tombstones").exists())
    val folded = rows(AnnIndex.ivfpqServe(spark, path, emb, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(folded == viaSidecar)
    val ids = spark.read.parquet(AnnIndex.resolveDir(spark, path, "codes"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids.forall(_ % 2 == 0), "folded codes keep tombstoned members")
  }

  test("pruned maxsim with a covering shortlist equals the exact kernel") {
    val toks = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0) as double))")
        .as("toks"))
    val qs = toks.filter(col("vec_id") < 5)
    val exact = rows(Similarity.maxsimTopK(toks, qs, "vec_id", "toks", 10,
      tokenDim = 16))
    // rerank wide enough that the pooled shortlist covers the corpus —
    // the two-stage path must then return the exact ranking
    val n = toks.count().toInt
    val covering = rows(Similarity.maxsimTopKPruned(toks, qs, "vec_id",
      "toks", 10, tokenDim = 16, rerank = n / 10 + 1))
    assert(covering == exact, "covering shortlist diverged from exact maxsim")
    // the production rerank returns a full, well-formed top-k per query
    val pruned = rows(Similarity.maxsimTopKPruned(toks, qs, "vec_id",
      "toks", 10, tokenDim = 16, rerank = 4))
    assert(pruned.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._3).sorted == (1 to 10) })
    // pruned recall vs exact (fixture sanity, not a guaranteed bound):
    // the pooled prefilter should keep most of the true top-10
    val hits = pruned.map(t => (t._1, t._2)).toSet
      .intersect(exact.map(t => (t._1, t._2)).toSet).size
    assert(hits >= exact.size / 2,
      s"pooled prefilter recall collapsed: $hits of ${exact.size}")
  }

  test("ivfSyncFromLog: synced index serves identically to a full rebuild") {
    val path = "/tmp/graft_test_ivf_idx_sync"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 16)
    // tail: update every 7th (jittered vector), delete every 11th+3,
    // revive the even deletes with a second new vector — every seam
    val vt = emb.schema("embedding").dataType
    val upd = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x + 0.125 as float))")
          .as("embedding"))
      .withColumn("seq", lit(2L)).withColumn("op", lit("U"))
    val del = emb.filter(col("vec_id") % 11 === 3)
      .select(col("vec_id"), lit(null).cast(vt).as("embedding"))
      .withColumn("seq", lit(3L)).withColumn("op", lit("D"))
    val rev = emb.filter(col("vec_id") % 22 === 3)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x - 0.25 as float))")
          .as("embedding"))
      .withColumn("seq", lit(4L)).withColumn("op", lit("I"))
    val tail = upd.unionByName(del).unionByName(rev)
    AnnIndex.ivfSyncFromLog(spark, path, tail, "vec_id", "seq", "op",
      "embedding")
    val synced = rows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    // reference: rebuild the post-tail snapshot under the SAME centroids
    val full = emb.select(col("vec_id"), col("embedding"))
      .withColumn("seq", lit(1L)).withColumn("op", lit("I"))
      .unionByName(tail)
    val snap = Cdc.applyLog(full, "vec_id", "seq", "op")
    val ref = "/tmp/graft_test_ivf_idx_sync_ref"
    AnnIndex.ivfBuild(snap, "vec_id", "embedding", ref,
      spark.read.parquet(s"$path/centroids"))
    val rebuilt = rows(AnnIndex.ivfServe(spark, ref, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(synced.nonEmpty && synced == rebuilt,
      "incremental sync diverged from the full rebuild")
    // the deleted-never-revived ids are unfindable in the synced index
    val deletedOdd = synced.map(_._2).toSet
      .exists(id => id % 11 == 3 && id % 22 != 3)
    assert(!deletedOdd, "a tombstoned member survived the sync")
  }

  test("trained (k-means) IVF artifact: append + serve + sync run the full lifecycle") {
    // lifecycle parity for the TRAINED coarse quantizer: every
    // maintenance verb reads the PERSISTED centroids, so it must not
    // matter how they were derived — but until r13 the append/sync
    // lifecycle only ever ran on id-sampled cells. Build on half the
    // corpus with k-means centroids, append the rest, then push a CDC
    // tail through: each stage must equal the reference computed under
    // the SAME persisted centroids.
    val path = "/tmp/graft_test_ivf_idx_trained_lc"
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 =!= 0)
    AnnIndex.ivfBuild(evens, "vec_id", "embedding", path, nlist = 8,
      trainedSeed = Some(42L))
    AnnIndex.ivfAppend(odds, "vec_id", "embedding", path)
    val served = rows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    val refFull = "/tmp/graft_test_ivf_idx_trained_lc_full"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", refFull,
      spark.read.parquet(s"$path/centroids"))
    val full = rows(AnnIndex.ivfServe(spark, refFull, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(served.nonEmpty && served == full,
      "trained build+append diverged from the full trained build")
    // CDC tail: update / delete / revive — the sync must keep serving
    // the post-tail snapshot under the unchanged trained centroids
    val vt = emb.schema("embedding").dataType
    val upd = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x + 0.125 as float))")
          .as("embedding"))
      .withColumn("seq", lit(2L)).withColumn("op", lit("U"))
    val del = emb.filter(col("vec_id") % 11 === 3)
      .select(col("vec_id"), lit(null).cast(vt).as("embedding"))
      .withColumn("seq", lit(3L)).withColumn("op", lit("D"))
    val tail = upd.unionByName(del)
    AnnIndex.ivfSyncFromLog(spark, path, tail, "vec_id", "seq", "op",
      "embedding")
    val synced = rows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    val snap = Cdc.applyLog(
      emb.select(col("vec_id"), col("embedding"))
        .withColumn("seq", lit(1L)).withColumn("op", lit("I"))
        .unionByName(tail),
      "vec_id", "seq", "op")
    val refSync = "/tmp/graft_test_ivf_idx_trained_lc_sync"
    AnnIndex.ivfBuild(snap, "vec_id", "embedding", refSync,
      spark.read.parquet(s"$path/centroids"))
    val rebuilt = rows(AnnIndex.ivfServe(spark, refSync, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(synced.nonEmpty && synced == rebuilt,
      "trained-artifact sync diverged from the full rebuild")
    assert(!synced.map(_._2).exists(_ % 11 == 3),
      "a tombstoned member survived the trained-artifact sync")
  }

  test("a reader racing ivfCompact never observes a missing or mixed directory") {
    val path = "/tmp/graft_test_ivf_idx_race"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 8)
    val expect = spark.read
      .parquet(AnnIndex.resolveDir(spark, path, "cells")).count()
    @volatile var failure: Option[Throwable] = None
    @volatile var stop = false
    val reads = new java.util.concurrent.atomic.AtomicLong(0)
    val reader = new Thread(() => {
      try {
        while (!stop) {
          // resolve-then-read, exactly like a serve: under the pointer
          // flip this must never hit a missing dir or a partial rewrite
          val n = spark.read
            .parquet(AnnIndex.resolveDir(spark, path, "cells")).count()
          if (n != expect)
            throw new AssertionError(s"mixed/partial read: $n != $expect")
          reads.incrementAndGet()
        }
      } catch { case t: Throwable => failure = Some(t) }
    })
    reader.start()
    (1 to 5).foreach(_ => AnnIndex.ivfCompact(spark, path))
    stop = true
    reader.join(60000)
    failure.foreach(t => fail(s"racing reader failed: ${t.getMessage}"))
    assert(reads.get() >= 2, "reader never overlapped the compacts")
    // retention: current + one previous version only; the legacy dir and
    // older versions are pruned, manifest entries match
    val names = new java.io.File(path).listFiles().map(_.getName).toSet
    val vdirs = names.filter(_.matches("cells__v\\d+"))
    assert(vdirs.size <= 2, s"version dirs not pruned: $vdirs")
    assert(!names.contains("cells"),
      "legacy v0 dir survived multiple publishes")
    // a REBUILD resets the pointer history back to the legacy layout
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 8)
    val rebuilt = new java.io.File(path).listFiles().map(_.getName).toSet
    assert(rebuilt.contains("cells") &&
      !rebuilt.exists(_.matches("cells__v\\d+")) &&
      !rebuilt.contains("cells__versions"),
      s"rebuild did not reset versions: $rebuilt")
    assert(spark.read.parquet(AnnIndex.resolveDir(spark, path, "cells"))
      .count() == expect)
  }

  test("sync fold is cell-targeted: untouched cid partitions keep their exact files") {
    val path = "/tmp/graft_test_ivf_idx_targeted"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 16)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def census(): Map[String, Seq[(String, Long, Long)]] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/cells")).toSeq
        .filter(_.isDirectory).map { d =>
          d.getPath.getName -> fs.listStatus(d.getPath).toSeq
            .map(f => (f.getPath.getName, f.getLen, f.getModificationTime))
            .sortBy(_._1)
        }.toMap
    // the victim member and the one cell its tombstone touches
    val victim = spark.read.parquet(AnnIndex.resolveDir(spark, path, "cells"))
      .select(col("id").cast("long"), col("cid").cast("long")).head()
    val (vid, vcid) = (victim.getLong(0), victim.getLong(1))
    val before = census()
    val vt = emb.schema("embedding").dataType
    val tail = emb.filter(col("vec_id") === vid)
      .select(col("vec_id"), lit(null).cast(vt).as("embedding"))
      .withColumn("seq", lit(2L)).withColumn("op", lit("D"))
    AnnIndex.ivfSyncFromLog(spark, path, tail, "vec_id", "seq", "op",
      "embedding")
    val after = census()
    // every cell the tombstone does NOT touch is bit-stable on disk:
    // same file names, lengths, and modification times — the O(touched
    // cells) claim as a filesystem fact, not a wall-clock impression
    before.foreach { case (nm, files) =>
      if (nm != s"cid=$vcid")
        assert(after.get(nm).contains(files), s"untouched cell $nm rewritten")
    }
    assert(after(s"cid=$vcid") != before(s"cid=$vcid"),
      "the touched cell was not rewritten")
    // the fold was complete: sidecar cleared, victim unfindable
    assert(AnnIndex.loadTombstones(spark, path).isEmpty)
    val served = AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 16)
    assert(served.filter(col("id") === vid).count() == 0)
  }

  test("flat-PQ sync fold is file-targeted: untouched code files keep name+bytes+mtime") {
    val path = "/tmp/graft_test_pq_idx_targeted"
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 =!= 0)
    AnnIndex.pqBuild(evens, "vec_id", "embedding", path)
    AnnIndex.pqAppend(odds, "vec_id", "embedding", path) // extra files
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def census(): Map[String, (Long, Long)] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/codes")).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(f => f.getPath.getName -> (f.getLen, f.getModificationTime))
        .toMap
    val victim = spark.read.parquet(AnnIndex.resolveDir(spark, path, "codes"))
      .select(col("id").cast("long"),
        expr("reverse(split(input_file_name(), '/'))[0]").as("f")).head()
    val (vid, vfile) = (victim.getLong(0), victim.getString(1))
    val before = census()
    assert(before.size >= 2, s"need a multi-file layout, got ${before.size}")
    val vt = emb.schema("embedding").dataType
    val tail = emb.filter(col("vec_id") === vid)
      .select(col("vec_id"), lit(null).cast(vt).as("embedding"))
      .withColumn("seq", lit(2L)).withColumn("op", lit("D"))
    AnnIndex.pqSyncFromLog(spark, path, tail, "vec_id", "seq", "op",
      "embedding")
    val after = census()
    // file names are stable across the fold (survivors keep the original
    // name); only the touched file's bytes/mtime change
    assert(after.keySet == before.keySet,
      s"file census changed: ${before.keySet} -> ${after.keySet}")
    before.foreach { case (nm, meta) =>
      if (nm != vfile) assert(after(nm) == meta, s"untouched file $nm rewritten")
    }
    assert(after(vfile) != before(vfile), "the touched file was not rewritten")
    assert(AnnIndex.loadTombstones(spark, path).isEmpty)
    val served = AnnIndex.pqServe(spark, path, emb, queries,
      "vec_id", "embedding", k = 10)
    assert(served.filter(col("id") === vid).count() == 0)
  }

  test("tuneIvf: recall is monotone in nprobe, full probe is exact, one knob chosen") {
    val path = "/tmp/graft_test_ivf_idx_tune"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 16)
    val rep = AnnIndex.tuneIvf(spark, path,
        emb.filter(col("vec_id") % 10 === 7), "vec_id", "embedding",
        10, Seq(1, 2, 4, 16))
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).sortBy(_._1)
    assert(rep.map(_._1).toSeq == Seq(1, 2, 4, 16))
    // recall@k can only grow as more cells are probed (candidate sets nest)
    assert(rep.map(_._4).toSeq == rep.map(_._4).toSeq.sorted,
      "recall not monotone in nprobe")
    // probing every cell IS the exact scan: recall must be 100.00%
    val full = rep.last
    assert(full._2 == full._3 && full._4 == 10000L,
      s"full probe missed truth: $full")
    // exactly one chosen row, and it is the smallest meeting the target
    val chosen = rep.filter(_._5 == 1)
    assert(chosen.length == 1, s"expected one chosen knob, got $chosen")
    val meeting = rep.filter(_._4 >= 9500L).map(_._1)
    assert(chosen.head._1 == (if (meeting.nonEmpty) meeting.min else 16))
  }

  test("tuneIvf dedupes duplicate nprobe candidates: one row each, one chosen") {
    // a caller-supplied Seq(1,2,2,4) must not emit duplicate report rows
    // or mark `chosen` twice — the one-chosen-knob contract
    val path = "/tmp/graft_test_ivf_idx_tune_dup"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 16)
    val rep = AnnIndex.tuneIvf(spark, path,
        emb.filter(col("vec_id") % 10 === 3), "vec_id", "embedding",
        10, Seq(2, 1, 2, 4, 4))
      .collect().map(r => (r.getInt(0), r.getInt(5)))
    assert(rep.map(_._1).toSeq.sorted == Seq(1, 2, 4), s"rows: ${rep.toSeq}")
    assert(rep.count(_._2 == 1) == 1, s"expected exactly one chosen: ${rep.toSeq}")
  }

  test("AQE-off trickle takedown still lands a bounded sidecar file count") {
    // callers control the session: with adaptive execution disabled the
    // sidecar write sizes itself from an explicit count instead of AQE
    // post-shuffle coalescing — a 3-id takedown must not land
    // spark.sql.shuffle.partitions near-empty files
    val path = "/tmp/graft_test_ivf_idx_aqeoff"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 8)
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      AnnIndex.ivfDelete(spark, path, Seq(1L, 2L, 3L).toDF("vec_id"), "vec_id")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/tombstones"))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(files == 1, s"trickle takedown wrote $files sidecar files")
    // and the takedown is still effective at serve
    val served = AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 8)
    assert(served.filter(col("id").isin(1L, 2L, 3L)).count() == 0)
  }

  test("sweepShortlistRerank ≡ per-candidate shortlist + rerank " +
      "(r16 one-corpus-join sweep refactor)") {
    // A deterministic ranked frame shaped like the tuners' `scored`:
    // every (query, corpus) pair with a synthetic probe_rank and a
    // synthetic shortlist score — including score TIES (score = id % 5)
    // so the id tiebreak is exercised, and ranks 1..4 so each sweep
    // point sees a different candidate set.
    val qs = emb.filter(col("vec_id") < 5)
    val scored = emb.select(col("vec_id").as("id")).limit(200)
      .crossJoin(qs.select(col("vec_id").as("qid")))
      .filter(col("id") =!= col("qid"))
      .withColumn("probe_rank", (col("id") % 4 + 1).cast("int"))
      .withColumn("score", (col("id") % 5).cast("double"))
    val cand = Seq(1, 2, 4)
    val k = 3
    val rerank = 2
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid").cast("long"), col("id").cast("long"),
          col("rank").cast("int"), col("nprobe").cast("int"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getInt(3))).toSet
    val old = cand.map { p =>
      Similarity.adcShortlistRerank(
          scored.filter(col("probe_rank") <= p).select("qid", "id", "score"),
          emb, qs, "vec_id", "embedding", k, rerank)
        .withColumn("nprobe", lit(p))
    }.reduce(_.unionByName(_))
    val sweep = Similarity.sweepShortlistRerank(
      scored.select("qid", "id", "probe_rank", "score"),
      negate(col("score")), cand, emb, qs, "vec_id", "embedding", k, rerank)
    assert(key(sweep) === key(old),
      "one-join sweep diverged from the per-candidate composition")
  }

  test("tuneIvfPq: recall monotone in nprobe, full probe equals flat-PQ recall, one knob chosen") {
    val path = "/tmp/graft_test_ivfpq_idx_tune"
    AnnIndex.ivfpqBuild(emb, "vec_id", "embedding", path, nlist = 16)
    val sample = emb.filter(col("vec_id") % 10 === 7)
    val rep = AnnIndex.tuneIvfPq(spark, path, emb, sample,
        "vec_id", "embedding", 10, Seq(1, 2, 4, 16))
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).sortBy(_._1)
    assert(rep.map(_._1).toSeq == Seq(1, 2, 4, 16))
    // candidate sets nest as more cells are probed → recall monotone
    assert(rep.map(_._4).toSeq == rep.map(_._4).toSeq.sorted,
      "recall not monotone in nprobe")
    // a FULL probe sees every code — its recall is exactly flat PQ's
    // (quantization + shortlist loss, repaired only within rerank·k),
    // NOT necessarily 100%: compute flat-PQ hits directly and compare
    val cbs = AnnIndex.loadPqCodebooks(spark, path)
    val flat = Similarity.pqTopK(emb, sample, "vec_id", "embedding",
        k = 10, codebooksIn = Some(cbs))
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Similarity.bruteForceTopK(emb, sample,
        "vec_id", "embedding", 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = rep.last
    assert(full._2 == (flat & truth).size.toLong,
      s"full-probe hits ${full._2} != flat-PQ hits ${(flat & truth).size}")
    val chosen = rep.filter(_._5 == 1)
    assert(chosen.length == 1, s"expected one chosen knob, got $chosen")
    val meeting = rep.filter(_._4 >= 9500L).map(_._1)
    assert(chosen.head._1 == (if (meeting.nonEmpty) meeting.min else 16))
  }

  test("ivfpqSyncFromLog: synced composed index equals the post-tail re-encode") {
    val path = "/tmp/graft_test_ivfpq_idx_sync"
    AnnIndex.ivfpqBuild(emb, "vec_id", "embedding", path, nlist = 8)
    val vt = emb.schema("embedding").dataType
    val tail = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x + 0.125 as float))")
          .as("embedding"))
      .withColumn("seq", lit(2L)).withColumn("op", lit("U"))
      .unionByName(emb.filter(col("vec_id") % 11 === 3)
        .select(col("vec_id"), lit(null).cast(vt).as("embedding"))
        .withColumn("seq", lit(3L)).withColumn("op", lit("D")))
      .unionByName(emb.filter(col("vec_id") % 22 === 3)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x - 0.25 as float))")
            .as("embedding"))
        .withColumn("seq", lit(4L)).withColumn("op", lit("I")))
    AnnIndex.ivfpqSyncFromLog(spark, path, tail, "vec_id", "seq", "op",
      "embedding")
    val full = emb.select(col("vec_id"), col("embedding"))
      .withColumn("seq", lit(1L)).withColumn("op", lit("I"))
      .unionByName(tail)
    val snap = Cdc.applyLog(full, "vec_id", "seq", "op")
    // codes AND cell assignments equal a fresh assign+encode of the
    // post-tail snapshot under the PERSISTED models (never retrained)
    val cb = AnnIndex.loadPqCodebooks(spark, path)
    val refCodes = Similarity.pqEncode(snap, "vec_id", "embedding", cb)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toMap
    val onDisk = spark.read.parquet(AnnIndex.resolveDir(spark, path, "codes"))
      .select(col("id"), col("code"), col("cid").cast("long").as("cid"))
      .collect()
    val syncedCodes = onDisk
      .map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toMap
    assert(syncedCodes.nonEmpty && syncedCodes == refCodes,
      "synced code table diverged from the post-tail re-encode")
    val cents = AnnIndex.loadIvfCentroids(spark, path)
    val refCids = Similarity.assignCells(snap, "vec_id", "embedding", cents)
      .select(col("id"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val syncedCids = onDisk.map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(syncedCids == refCids,
      "synced cell assignment diverged from the persisted-centroid assign")
    // full-probe serve over the synced index equals flat PQ over the
    // post-tail snapshot under the same codebooks
    val synced = rows(AnnIndex.ivfpqServe(spark, path, snap, queries,
      "vec_id", "embedding", k = 10, nprobe = 8))
    val flat = rows(Similarity.pqTopK(snap, queries,
      "vec_id", "embedding", k = 10, codebooksIn = Some(cb)))
    assert(synced.nonEmpty && synced == flat)
    val deletedOdd = synced.map(_._2).toSet
      .exists(id => id % 11 == 3 && id % 22 != 3)
    assert(!deletedOdd, "a tombstoned member survived the IVF-PQ sync")
  }

  test("pqSyncFromLog: synced codes equal a re-encode of the post-tail snapshot") {
    val path = "/tmp/graft_test_pq_idx_sync"
    AnnIndex.pqBuild(emb, "vec_id", "embedding", path)
    val vt = emb.schema("embedding").dataType
    val upd = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x + 0.125 as float))")
          .as("embedding"))
      .withColumn("seq", lit(2L)).withColumn("op", lit("U"))
    val del = emb.filter(col("vec_id") % 11 === 3)
      .select(col("vec_id"), lit(null).cast(vt).as("embedding"))
      .withColumn("seq", lit(3L)).withColumn("op", lit("D"))
    val rev = emb.filter(col("vec_id") % 22 === 3)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x - 0.25 as float))")
          .as("embedding"))
      .withColumn("seq", lit(4L)).withColumn("op", lit("I"))
    val tail = upd.unionByName(del).unionByName(rev)
    AnnIndex.pqSyncFromLog(spark, path, tail, "vec_id", "seq", "op",
      "embedding")
    // reference: the post-tail snapshot re-encoded under the SAME
    // persisted codebooks (maintenance never retrains the model)
    val full = emb.select(col("vec_id"), col("embedding"))
      .withColumn("seq", lit(1L)).withColumn("op", lit("I"))
      .unionByName(tail)
    val snap = Cdc.applyLog(full, "vec_id", "seq", "op")
    val cb = AnnIndex.loadPqCodebooks(spark, path)
    val refCodes = Similarity.pqEncode(snap, "vec_id", "embedding", cb)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toMap
    val syncedCodes = spark.read.parquet(AnnIndex.resolveDir(spark, path, "codes"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toMap
    assert(syncedCodes.nonEmpty && syncedCodes == refCodes,
      "synced code table diverged from the post-tail re-encode")
    // serving through the synced index equals serving the re-encode
    val synced = rows(AnnIndex.pqServe(spark, path, snap, queries,
      "vec_id", "embedding", k = 10))
    val rebuilt = rows(Similarity.pqTopKWithCodes(
      Similarity.pqEncode(snap, "vec_id", "embedding", cb),
      snap, queries, "vec_id", "embedding", 10, 4, cb))
    assert(synced.nonEmpty && synced == rebuilt,
      "incremental PQ sync diverged from the full re-encode")
    val deletedOdd = synced.map(_._2).toSet
      .exists(id => id % 11 == 3 && id % 22 != 3)
    assert(!deletedOdd, "a tombstoned member survived the PQ sync")
  }

  test("residual IVF-PQ (IVFADC): lifecycle works and recall@k >= raw at equal knobs") {
    val pathRaw = "/tmp/graft_test_ivfpq_raw_ab"
    val pathRes = "/tmp/graft_test_ivfpq_res_ab"
    // identical knobs and (k-means, seeded) coarse centroids — the A/B
    // isolates the ENCODING: raw u(x) vs residual u(x) − u(centroid).
    // TRAINED cells are the composition residual encoding is for:
    // they make residuals small (id-sampled cells leave them
    // vector-sized, where the empirical A/B showed raw ahead)
    AnnIndex.ivfpqBuild(emb, "vec_id", "embedding", pathRaw, nlist = 16,
      trainedSeed = Some(42L))
    AnnIndex.ivfpqBuild(emb, "vec_id", "embedding", pathRes, nlist = 16,
      residual = true, trainedSeed = Some(42L))
    assert(!AnnIndex.ivfpqIsResidual(spark, pathRaw))
    assert(AnnIndex.ivfpqIsResidual(spark, pathRes))
    val sample = emb.filter(col("vec_id") % 10 === 7)
    def recalls(path: String): Seq[(Int, Long)] =
      AnnIndex.tuneIvfPq(spark, path, emb, sample,
          "vec_id", "embedding", 10, Seq(1, 2, 4, 16))
        .collect().map(r => (r.getInt(0), r.getLong(4))).toSeq.sortBy(_._1)
    val raw = recalls(pathRaw)
    val res = recalls(pathRes)
    info(s"recall_pctx100 by nprobe — raw: $raw residual: $res")
    assert(raw.map(_._1) == res.map(_._1))
    // the PQ paper's claim at this composition: quantizing the residual
    // spends the codebook on within-cell spread, so ADC ranks candidates
    // at least as well — recall@k must not regress at any sweep point
    raw.zip(res).foreach { case ((p, rRaw), (_, rRes)) =>
      assert(rRes >= rRaw,
        s"residual recall regressed at nprobe=$p: $rRes < $rRaw " +
          s"(raw=$raw res=$res)")
    }
    // and must strictly win somewhere unless raw is already perfect
    assert(res.map(_._2).sum >= raw.map(_._2).sum)
    // the lifecycle composes: append + delete + sync on the residual
    // index keep serving (appends re-encode residuals per the meta flag)
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 =!= 0)
    val pathInc = "/tmp/graft_test_ivfpq_res_inc"
    AnnIndex.ivfpqBuild(evens, "vec_id", "embedding", pathInc, nlist = 16,
      residual = true)
    AnnIndex.ivfpqAppend(odds, "vec_id", "embedding", pathInc)
    val served = rows(AnnIndex.ivfpqServe(spark, pathInc, emb, queries,
      "vec_id", "embedding", k = 10, nprobe = 16))
    // full-probe residual serve with exact re-rank over a rerank-k
    // shortlist must at least return k rows per query and never a
    // tombstoned/absent id
    assert(served.nonEmpty && served.groupBy(_._1).forall(_._2.size == 10))
    AnnIndex.ivfpqDelete(spark, pathInc,
      emb.filter(col("vec_id") % 3 === 0).select("vec_id"), "vec_id")
    val afterDel = rows(AnnIndex.ivfpqServe(spark, pathInc, emb, queries,
      "vec_id", "embedding", k = 10, nprobe = 16))
    assert(afterDel.nonEmpty && afterDel.forall(_._2 % 3 != 0))
    AnnIndex.ivfpqCompact(spark, pathInc)
    val afterCompact = rows(AnnIndex.ivfpqServe(spark, pathInc, emb, queries,
      "vec_id", "embedding", k = 10, nprobe = 16))
    assert(afterCompact == afterDel, "compact changed residual serve results")
  }

  test("binary quantization: packing is exact, total shortlist equals brute force") {
    import spark.implicits._
    // hand-computed packing: 64-dim vector with known sign pattern —
    // word 1 packs dims 1..32 (bit b-1 set iff x > 0), word 2 dims 33..64
    val v = (1 to 64).map(i =>
      if (i == 1 || i == 33 || i == 64) 1.0f else -1.0f).toArray
    val packed = Similarity.bqEncode(
        Seq((7L, v)).toDF("vec_id", "embedding"), "vec_id", "embedding")
      .select("sig").head().getSeq[Long](0)
    assert(packed == Seq(1L, 1L | (1L << 31)),
      s"sign packing drifted: $packed")
    // with rerank·k covering the whole corpus the shortlist is total, so
    // bqTopK must equal the exact brute force BIT-FOR-BIT
    val qs = emb.filter(col("vec_id") < 5)
    val n = emb.count().toInt
    val viaBq = rows(Similarity.bqTopK(emb, qs, "vec_id", "embedding",
      k = 10, rerank = n))
    val exact = rows(Similarity.bruteForceTopK(emb, qs,
      "vec_id", "embedding", 10))
    assert(viaBq.nonEmpty && viaBq == exact)
    // at the production rerank the hamming shortlist still recalls most
    // of the truth (sign bits carry real signal, not noise)
    val approx = rows(Similarity.bqTopK(emb, qs, "vec_id", "embedding",
      k = 10, rerank = 4)).map(r => (r._1, r._2)).toSet
    val truthSet = exact.map(r => (r._1, r._2)).toSet
    val recall = (approx & truthSet).size.toDouble / truthSet.size
    assert(recall >= 0.5, f"bq recall@10 collapsed: $recall%.2f")
    // empty query frames compose like every other kernel: empty result,
    // never a misleading dim-probe failure
    assert(Similarity.bqTopK(emb, emb.filter(col("vec_id") < 0),
      "vec_id", "embedding", 5).isEmpty)
    assert(Similarity.ivfbqTopK(emb, emb.filter(col("vec_id") < 0),
      "vec_id", "embedding", 5).isEmpty)
  }

  test("composed IVF-BQ with a full probe equals the flat BQ scan") {
    // probing every cell makes the candidate set total, so the composed
    // kernel must return flat bqTopK's rows bit-for-bit — the same
    // full-probe gate the IVF-PQ composition carries
    val qs = emb.filter(col("vec_id") < 5)
    val composed = rows(Similarity.ivfbqTopK(emb, qs, "vec_id", "embedding",
      k = 10, nlist = 16, nprobe = 16, rerank = 4))
    val flat = rows(Similarity.bqTopK(emb, qs, "vec_id", "embedding",
      k = 10, rerank = 4))
    assert(composed.nonEmpty && composed == flat)
  }

  test("persisted BQ: serve bit-identical to the in-memory scan, full lifecycle") {
    val path = "/tmp/graft_test_bq_idx"
    AnnIndex.bqBuild(emb, "vec_id", "embedding", path)
    val served = rows(AnnIndex.bqServe(spark, path, emb, queries,
      "vec_id", "embedding", k = 10))
    val inMem = rows(Similarity.bqTopK(emb, queries,
      "vec_id", "embedding", k = 10))
    assert(served.nonEmpty && served == inMem)
    // no model artifact ⇒ build-on-half + append-half trivially equals
    // the full build; the append path itself is what's under test
    val pathApp = "/tmp/graft_test_bq_idx_app"
    AnnIndex.bqBuild(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", pathApp)
    AnnIndex.bqAppend(emb.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", pathApp)
    assert(rows(AnnIndex.bqServe(spark, pathApp, emb, queries,
      "vec_id", "embedding", k = 10)) == served)
    // the width guard: a different embedding dimension must be rejected
    // loudly, never silently appended (mixed widths = garbage Hamming)
    val narrower = emb.select(col("vec_id"),
      expr("slice(embedding, 1, 32)").as("embedding"))
    intercept[IllegalArgumentException] {
      AnnIndex.bqAppend(narrower, "vec_id", "embedding", pathApp)
    }
    // O(ids) takedown suppresses at serve; the policy sees the ~33%
    // tombstone fraction, folds, and the fold is serve-neutral
    AnnIndex.bqDelete(spark, path,
      emb.filter(col("vec_id") % 3 === 0).select("vec_id"), "vec_id")
    val afterDel = rows(AnnIndex.bqServe(spark, path, emb, queries,
      "vec_id", "embedding", k = 10))
    assert(afterDel.nonEmpty && afterDel.forall(_._2 % 3 != 0))
    assert(AnnIndex.bqCompactIfNeeded(spark, path,
      maxFiles = 10000, maxTombstoneFracPct = 20))
    assert(rows(AnnIndex.bqServe(spark, path, emb, queries,
      "vec_id", "embedding", k = 10)) == afterDel)
    val d = AnnIndex.describeBq(spark, path).head()
    assert(d.getAs[Long]("n_pending_tombstones") == 0L)
    assert(d.getAs[Long]("sig_words_min") == 2L &&
      d.getAs[Long]("sig_words_max") == 2L)
  }

  test("persisted IVF-BQ: serve bit-identical to the composed scan, full probe equals flat") {
    val path = "/tmp/graft_test_ivfbq_idx"
    AnnIndex.ivfbqBuild(emb, "vec_id", "embedding", path, nlist = 16)
    val served = rows(AnnIndex.ivfbqServe(spark, path, emb, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    val inMem = rows(Similarity.ivfbqTopK(emb, queries,
      "vec_id", "embedding", k = 10, nlist = 16, nprobe = 4))
    assert(served.nonEmpty && served == inMem)
    // full probe ⇒ total candidate set ⇒ flat BQ's rows bit-for-bit
    val full = rows(AnnIndex.ivfbqServe(spark, path, emb, queries,
      "vec_id", "embedding", k = 10, nprobe = 16))
    val flat = rows(Similarity.bqTopK(emb, queries,
      "vec_id", "embedding", k = 10))
    assert(full == flat)
    // lifecycle: append against the persisted centroids, O(ids)
    // takedown, compact folds serve-neutrally
    val pathInc = "/tmp/graft_test_ivfbq_idx_app"
    AnnIndex.ivfbqBuild(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", pathInc, nlist = 8)
    AnnIndex.ivfbqAppend(emb.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", pathInc)
    // full probe over the appended index ⇒ flat equality again
    assert(rows(AnnIndex.ivfbqServe(spark, pathInc, emb, queries,
      "vec_id", "embedding", k = 10, nprobe = 8)) == flat)
    AnnIndex.ivfbqDelete(spark, pathInc,
      emb.filter(col("vec_id") % 3 === 0).select("vec_id"), "vec_id")
    val afterDel = rows(AnnIndex.ivfbqServe(spark, pathInc, emb, queries,
      "vec_id", "embedding", k = 10, nprobe = 8))
    assert(afterDel.nonEmpty && afterDel.forall(_._2 % 3 != 0))
    AnnIndex.ivfbqCompact(spark, pathInc)
    assert(rows(AnnIndex.ivfbqServe(spark, pathInc, emb, queries,
      "vec_id", "embedding", k = 10, nprobe = 8)) == afterDel)
  }

  test("tuneIvfBq: recall monotone in nprobe, full probe equals flat-BQ recall, one knob chosen") {
    val path = "/tmp/graft_test_ivfbq_idx_tune"
    AnnIndex.ivfbqBuild(emb, "vec_id", "embedding", path, nlist = 8)
    val sample = emb.filter(col("vec_id") % 10 === 7)
    val rep = AnnIndex.tuneIvfBq(spark, path, emb, sample,
        "vec_id", "embedding", 10, Seq(1, 2, 4, 8))
      .collect().sortBy(_.getInt(0))
    assert(rep.length == 4, "one report row per candidate")
    assert(rep.map(_.getInt(5)).sum == 1, "exactly one chosen knob")
    val recalls = rep.map(_.getLong(4))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall not monotone in nprobe: ${recalls.toSeq}")
    // nprobe = nlist probes every cell → the candidate set is total, so
    // the sweep's last point must equal the FLAT BQ scan's recall
    // against the same truth (quantization, not probing, is the loss)
    val truth = Similarity.bruteForceTopK(emb, sample,
        "vec_id", "embedding", 10)
      .select(col("qid"), col("id"))
    val possible = truth.count()
    val flatHits = Similarity.bqTopK(emb, sample, "vec_id", "embedding", 10)
      .select(col("qid"), col("id")).intersect(truth).count()
    assert(recalls.last == flatHits * 10000L / possible,
      s"full-probe recall ${recalls.last} != flat-BQ recall " +
        s"${flatHits * 10000L / possible}")
  }

  test("BQ sync: synced flat and composed indexes serve the post-tail snapshot") {
    val vt = emb.schema("embedding").dataType
    val upd = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x + 0.125 as float))")
          .as("embedding"))
      .withColumn("seq", lit(2L)).withColumn("op", lit("U"))
    val del = emb.filter(col("vec_id") % 11 === 3)
      .select(col("vec_id"), lit(null).cast(vt).as("embedding"))
      .withColumn("seq", lit(3L)).withColumn("op", lit("D"))
    val tail = upd.unionByName(del)
    val post = emb.select("vec_id", "embedding")
      .join(tail.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
      .unionByName(Cdc.applyLog(tail, "vec_id", "seq", "op")
        .select("vec_id", "embedding"))
    // flat: synced codes must serve exactly a fresh build of the
    // post-tail snapshot (sign packing has no model identity)
    val pathFlat = "/tmp/graft_test_bq_idx_sync"
    AnnIndex.bqBuild(emb, "vec_id", "embedding", pathFlat)
    AnnIndex.bqSyncFromLog(spark, pathFlat, tail, "vec_id", "seq", "op",
      "embedding")
    val syncedFlat = rows(AnnIndex.bqServe(spark, pathFlat, post, queries,
      "vec_id", "embedding", k = 10))
    val refFlat = "/tmp/graft_test_bq_idx_sync_ref"
    AnnIndex.bqBuild(post, "vec_id", "embedding", refFlat)
    assert(syncedFlat.nonEmpty && syncedFlat ==
      rows(AnnIndex.bqServe(spark, refFlat, post, queries,
        "vec_id", "embedding", k = 10)),
      "flat BQ sync diverged from the post-tail rebuild")
    assert(!syncedFlat.map(_._2).exists(_ % 11 == 3),
      "a tombstoned member survived the flat BQ sync")
    // composed: full probe over the synced artifact equals the flat
    // scan of the post-tail snapshot (layout-free equality)
    val pathC = "/tmp/graft_test_ivfbq_idx_sync"
    AnnIndex.ivfbqBuild(emb, "vec_id", "embedding", pathC, nlist = 8)
    AnnIndex.ivfbqSyncFromLog(spark, pathC, tail, "vec_id", "seq", "op",
      "embedding")
    val syncedC = rows(AnnIndex.ivfbqServe(spark, pathC, post, queries,
      "vec_id", "embedding", k = 10, nprobe = 8))
    val flatPost = rows(Similarity.bqTopK(post, queries,
      "vec_id", "embedding", k = 10))
    assert(syncedC.nonEmpty && syncedC == flatPost,
      "composed BQ sync diverged from the flat post-tail scan")
  }

  test("streaming maxsim serve equals the batch maxsim row for row") {
    val toks = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0) as double))")
        .as("toks"))
    val streamed = rows(graft.streaming.StreamAnnServe.runOnceMaxsim(spark,
      dir, "embeddings.parquet",
      spark.read.parquet(s"$dir/embeddings.parquet").schema,
      col("vec_id") < 5, toks, "vec_id", "embedding", "toks", 10,
      tokenDim = 16))
    val batch = rows(Similarity.maxsimTopK(toks,
      toks.filter(col("vec_id") < 5), "vec_id", "toks", 10, tokenDim = 16))
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming serve (foreachBatch) equals the batch serve row for row") {
    val path = "/tmp/graft_test_ivf_idx_stream"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 16)
    val streamed = rows(graft.streaming.StreamAnnServe.runOnce(spark, dir,
      "embeddings.parquet",
      spark.read.parquet(s"$dir/embeddings.parquet").schema,
      col("vec_id") < 5, path, "vec_id", "embedding", k = 10, nprobe = 4))
    val batch = rows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("IVF serve plan: partition-pruned index scan, no re-assignment") {
    val path = "/tmp/graft_test_ivf_idx"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 16)
    val p = AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4)
      .queryExecution.executedPlan.toString
    val lower = p.toLowerCase
    // the probed-cid literal IN-filter prunes the cells scan at the
    // PARTITION level — only nprobe/nlist of the index is read (the
    // INSET shows in PartitionFilters; Spark layers a dynamic-pruning
    // subquery on top for free)
    assert(lower.contains("partitionfilters: [cid") && lower.contains("inset"), p)
    // NO centroid-matrix work in the serving plan AT ALL (r15): probe
    // selection runs driver-side over the resident centroid cache
    // (serving is the bounded-query regime), so neither the assignment
    // argmax (VecArgMaxId) nor the nlist×dim probe matrix
    // (VecDotMatrix — 16 MB shipped as a task reference per job at
    // production nlist) may appear. Contrast: the in-memory path's
    // plan carries the assignment argmax over the corpus.
    assert(!lower.contains("vecargmaxid"), p)
    assert(!lower.contains("vecdotmatrix"), p)
    val inMemPlan = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 10, nlist = 16, nprobe = 4)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(inMemPlan.contains("vecargmaxid"), inMemPlan)
    // probes broadcast; the rank window never sees vectors (same gates
    // as the in-memory path)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("IVF-BQ serve plan: partition-pruned, no centroid-matrix work (r16)") {
    val path = "/tmp/graft_test_ivfbq_idx_plan"
    AnnIndex.ivfbqBuild(emb, "vec_id", "embedding", path, nlist = 16)
    val p = AnnIndex.ivfbqServe(spark, path, emb, queries,
      "vec_id", "embedding", k = 10, nprobe = 4)
      .queryExecution.executedPlan.toString
    val lower = p.toLowerCase
    // probed-cid literal IN prunes the signature scan at partition level
    assert(lower.contains("partitionfilters: [cid") && lower.contains("inset"), p)
    // the composed-BQ serve sheds the last centroid-matrix shipment:
    // probe selection is driver-side over the resident cache, query
    // signing is a matrix-free sign-pack — neither the nlist×dim probe
    // matrix (VecDotMatrix, 16 MB/task at nlist 64k) nor the assignment
    // argmax may appear anywhere in the serving plan
    assert(!lower.contains("vecdotmatrix"), p)
    assert(!lower.contains("vecargmaxid"), p)
  }

  test("probeCellsLocal: selection equals the distributed probeCells bit-for-bit") {
    val cents = Similarity.collectCents(
      Similarity.idSampledCentroids(emb, "vec_id", "embedding", 16))
    def sel(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select(col("qid").cast("long"), col("cid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val local = sel(Similarity.probeCellsLocal(queries,
      "vec_id", "embedding", cents, 4))
    val dist = sel(Similarity.probeCells(queries,
      "vec_id", "embedding", cents, 4))
    assert(local.nonEmpty && local == dist)
  }

  test("probeCellsLocal: corpus-sized query batch fails loudly at the cap") {
    val cents = Similarity.collectCents(
      Similarity.idSampledCentroids(emb, "vec_id", "embedding", 4))
    val e = intercept[IllegalArgumentException] {
      Similarity.probeCellsLocal(emb, "vec_id", "embedding", cents, 2,
        maxQueries = 3)
    }
    assert(e.getMessage.contains("bounded-query regime"), e.getMessage)
  }

  test("int-id corpus: persisted serve keeps the native qid type, equals in-memory") {
    // qid keeps the id column's NATIVE type through the driver-side
    // probe path — the old cast("long") silently widened an int id
    // column, so the persisted serve's output schema diverged from the
    // in-memory path the docs call bit-identical
    val iemb = emb.select(col("vec_id").cast("int").as("vec_id"),
      col("embedding"))
    val iqueries = iemb.filter(col("vec_id") < 3)
    val path = "/tmp/graft_test_ivf_idx_intid"
    AnnIndex.ivfBuild(iemb, "vec_id", "embedding", path, nlist = 8)
    val served = AnnIndex.ivfServe(spark, path, iqueries,
      "vec_id", "embedding", k = 5, nprobe = 3)
    val inMem = Similarity.ivfTopK(iemb, iqueries,
      "vec_id", "embedding", k = 5, nlist = 8, nprobe = 3)
    assert(served.schema("qid").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(served.schema("qid").dataType == inMem.schema("qid").dataType)
    val s1 = rows(served)
    assert(s1.nonEmpty && s1 == rows(inMem))
  }

  test("autoNlist: √n posture, clamped; sentinel build derives the geometry") {
    // the sizing law: √n rounded, clamped to [min, max]
    assert(Similarity.autoNlist(0) == 16)
    assert(Similarity.autoNlist(5000) == 71)      // √5000 ≈ 70.7
    assert(Similarity.autoNlist(1000000) == 1000)
    assert(Similarity.autoNlist(100, minNlist = 16) == 16)
    assert(Similarity.autoNlist(Long.MaxValue / 4) == (1 << 20))
    intercept[IllegalArgumentException] { Similarity.autoNlist(-1) }
    // a build without an explicit nlist derives it from the corpus —
    // a fixed default either saturates cells (too small) or turns the
    // probe plan into the serve (grown linearly); negative fails loudly
    val path = "/tmp/graft_test_ivf_idx_autonl"
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path)
    val n = emb.count()
    val got = AnnIndex.loadIvfCentroids(spark, path).length
    assert(got == Similarity.autoNlist(n), s"derived nlist $got for n=$n")
    val e = intercept[IllegalArgumentException] {
      AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = -1)
    }
    assert(e.getMessage.contains("auto-size"), e.getMessage)
    // the derived-geometry index serves bit-identically to the
    // in-memory path under the same nlist
    val served = rows(AnnIndex.ivfServe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    val inMem = rows(Similarity.ivfTopK(emb, queries,
      "vec_id", "embedding", k = 10, nlist = got, nprobe = 4))
    assert(served.nonEmpty && served == inMem)
  }

  test("centroid cache: an in-place rebuild rotates the resident entry (nonce)") {
    val path = "/tmp/graft_test_ivf_idx_nonce"
    val half = emb.filter(col("vec_id") % 2 === 0)
    AnnIndex.ivfBuild(half, "vec_id", "embedding", path, nlist = 4)
    val first = AnnIndex.loadIvfCentroids(spark, path)
    // rebuild with DIFFERENT centroids at the same path — even if the
    // part file kept its name/size/mtime, the build nonce must rotate
    // the fingerprint so the cache cannot serve the stale array
    AnnIndex.ivfBuild(emb, "vec_id", "embedding", path, nlist = 8)
    val second = AnnIndex.loadIvfCentroids(spark, path)
    assert(second.length == 8 && first.length == 4)
    // and the nonce marker is present (underscore-prefixed: invisible
    // to the parquet read, visible to the fingerprint listing)
    val p = new org.apache.hadoop.fs.Path(s"$path/centroids")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(p).exists(_.getPath.getName.startsWith("_nonce-")))
  }
}
