package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale document corpora.
  *
  * Everything here is expressed as DataFrame transformations over built-in
  * (codegen'd) functions — no UDFs, no driver materialization — so each
  * operator is one Catalyst-planned job whose shuffles are on compact keys
  * (doc ids, shingle strings, band signatures), never on full documents:
  *
  *  - exact:   hash-aggregate on the full text, deterministic winner.
  *  - jaccard: word n-gram shingles → inverted-index self-join on shingle →
  *             pair intersection counts → Jaccard threshold. The join is on
  *             the *shingle* (high cardinality ⇒ well-distributed); hot
  *             shingles can be frequency-capped (`maxShingleFreq`) the way
  *             large-scale near-dup pipelines drop stop-shingles.
  *  - minhash: per-doc signatures (min of a keyed hash per seed) computed in
  *             one aggregation, LSH banding → candidates join only within
  *             tiny band buckets, then exact-Jaccard verification of the
  *             candidates. This is the MinHash+LSH scale path: all-pairs is
  *             never materialized.
  *  - simhash: per-doc bit signature from token-hash votes; near-dup =
  *             small Hamming distance (verified pairwise on candidates).
  *
  * The hash everywhere is `md5` (not `xxhash64`) deliberately: md5 is
  * available bit-identically in DuckDB, so the correctness oracle can
  * replay the *entire* pipeline, not just row counts. At production scale
  * `xxhash64` is a drop-in (cheaper) replacement.
  */
object Dedup {

  /** Keyed hash families for signature computation. `md5Keyed` is the
    * default: bit-replayable in the SQL oracle. `xx64` is the production
    * choice — ~10× cheaper, native long output — for when cross-engine
    * replay isn't needed. Both give one independent-ish hash per seed.
    */
  object Hashers {
    /** (value, seed) => hash. Seed is a Column so the narrow (exploded
      * per-seed) signature path can drive it from a `sequence()` — with a
      * literal seed both forms produce identical hashes.
      */
    type Keyed = (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column
    val md5Keyed: Keyed = (c, seed) => md5(concat(c, lit("#"), seed.cast("string")))
    val xx64: Keyed = (c, seed) => xxhash64(c, seed)

    /** Modulus for double-hashed minhash families: prime, and small enough
      * that `h1 + (numHashes)·h2` never overflows a long (≈1e9 · 129).
      */
    val P: Long = 1000000007L

    /** Base hash pair feeding Kirsch–Mitzenmacher double hashing:
      * `g_i(x) = (h1(x) + (i+1)·h2(x)) mod P`. ONE string hash per shingle
      * yields the whole numHashes-wide family — vs. hashing the shingle
      * once *per seed*, which at 128 hashes made signature computation 128
      * md5 calls per shingle row and dominated the LSH runtime.
      */
    final case class Base(h1: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                          h2: org.apache.spark.sql.Column => org.apache.spark.sql.Column)

    /** Oracle-replayable base: the two md5 halves, hex→long. DuckDB
      * computes the identical values via `('0x'||substr(md5(x),1,15))::BIGINT`
      * (verified bit-equal to Spark's `conv(..., 16, 10)`).
      */
    val md5Base: Base = Base(
      c => conv(substring(md5(c), 1, 15), 16, 10).cast("long") % P,
      c => conv(substring(md5(c), 17, 15), 16, 10).cast("long") % P)

    /** Production base: two seeded xxhash64 calls (native long, no hex
      * round-trip). `pmod` because xxhash64 is signed.
      */
    val xx64Base: Base = Base(
      c => pmod(xxhash64(c, lit(0)), lit(P)),
      c => pmod(xxhash64(c, lit(1)), lit(P)))
  }

  /** Exact dedup: one row per distinct `textCol`, keeping the smallest id —
    * deterministic, unlike `dropDuplicates`.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(idCol, "n_copies")

  /** [[exact]] with the content hash exposed — the join/export key a
    * pipeline wants alongside the keeper id.
    */
  def exactWithHash(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), md5(col(textCol)).as("text_md5"), col("n_copies"))

  /** Word `n`-gram shingle rows per document (with duplicates). Built with
    * higher-order functions (transform/slice) — stays in whole-stage
    * codegen. No shuffle.
    */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    docs.select(col(idCol),
        split(col(textCol), " ").as("words"))
      // Guard short docs: sequence(1, 0) would produce the DESCENDING
      // array [1, 0] (Spark defaults to step -1) and slice(_, 0, _)
      // throws. Docs with fewer than n words have no n-gram shingles.
      .select(col(idCol), explode(
        expr(s"CASE WHEN size(words) >= $n THEN " +
             s"transform(sequence(1, size(words) - ${n - 1}), " +
             s"i -> concat_ws(' ', slice(words, i, $n))) " +
             s"ELSE array() END")).as("shingle"))

  /** Word `n`-gram shingle *set* per document: (id, shingle), distinct. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    shingleRows(docs, idCol, textCol, n).distinct()

  /** Word `n`-gram shingle rows WITH their 1-based token position:
    * (id, pos, shingle). Same codegen'd HOF pipeline as [[shingleRows]],
    * with `posexplode` carrying the position through.
    */
  def posShingleRows(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 8): DataFrame =
    docs.select(col(idCol), split(col(textCol), " ").as("words"))
      .select(col(idCol), posexplode(
        expr(s"CASE WHEN size(words) >= $n THEN " +
             s"transform(sequence(1, size(words) - ${n - 1}), " +
             s"i -> concat_ws(' ', slice(words, i, $n))) " +
             s"ELSE array() END")).as(Seq("pos0", "shingle")))
      .select(col(idCol), (col("pos0") + 1).cast("long").as("pos"),
        col("shingle"))

  /** Duplicate SPANS, not duplicate documents: the maximal token ranges of
    * each document whose every `n`-gram also occurs in ≥ `minDocs` distinct
    * documents — the "repeated substring" primitive of suffix-array
    * training-data dedup, re-expressed relationally (a position is marked
    * iff its n-gram is corpus-duplicated; runs of consecutive marked
    * positions merge into one span). Unlike whole-doc dedup this localizes
    * WHAT is duplicated: boilerplate headers, license blocks, quoted
    * passages — the spans a curation pipeline clips instead of dropping
    * the document.
    *
    * Output: (id, span_start, span_end, n_ngrams, n_tokens) — 1-based
    * inclusive token positions, one row per maximal span.
    *
    * Scale shape: duplicated-shingle detection is one hash aggregation on
    * the shingle (high-cardinality ⇒ uniform) and a semi-join back — the
    * fan-out is linear in occurrence count, never pairwise quadratic (no
    * doc×doc product anywhere, unlike the Jaccard miner). The run-merge
    * window partitions by document, bounded by document length.
    *
    * Spans are pairwise DISJOINT: marked positions within n−1 of each
    * other (overlapping token extents) merge into one span, so summing
    * n_tokens over a document never double-counts a token.
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 8, minDocs: Int = 2,
                     materialize: Boolean = true): DataFrame = {
    require(minDocs >= 2, "duplicateSpans: minDocs < 2 marks every position")
    // the positional-shingle explode feeds BOTH the duplicated-shingle
    // aggregation and the semi-join back — cache it for the invocation
    // (released once the small span result materializes), same policy as
    // withShingleCache; materialize=false returns the pure lazy plan
    val ps0 = posShingleRows(docs, idCol, textCol, n)
    val ps = if (materialize) ps0.cache() else ps0
    try {
      val spansDf = duplicateSpansFrom(ps, idCol, minDocs, n)
      if (materialize) spansDf.localCheckpoint(true) else spansDf
    } finally if (materialize) ps.unpersist(false)
  }

  /** Clip duplicated spans OUT of the documents: every doc comes back with
    * the tokens covered by a [[duplicateSpans]] span removed — the
    * "remove the boilerplate, keep the document" transform that pairs
    * with span detection (dropping whole docs over shared license headers
    * throws away good data). Output: (id, text_clipped,
    * n_tokens_removed); docs with no duplicated span pass through
    * unchanged with 0 removed.
    *
    * The clip itself is a pure projection: spans are gathered per doc
    * (bounded by doc length) and the token filter is a codegen'd HOF over
    * the word array — no second shuffle beyond the span mining.
    */
  def clipSpans(docs: DataFrame, idCol: String, textCol: String,
                n: Int = 8, minDocs: Int = 2): DataFrame =
    clipBySpans(docs,
      duplicateSpans(docs, idCol, textCol, n, minDocs)
        .select(col(idCol), col("span_start"), col("span_end")),
      idCol, textCol)

  /** Surgical decontamination: instead of DROPPING every candidate doc
    * that shares a long n-gram with the reference corpus
    * ([[decontaminateNgram]]), CLIP the contaminated token runs out and
    * keep the rest of the document — the lower-loss policy when eval
    * contamination is a quoted sentence inside an otherwise-good doc.
    * Output: (id, text_clipped, n_tokens_removed) for every candidate.
    *
    * Same 100 TB shape as the n-gram decontaminator: the reference's
    * DISTINCT shingle set is collapsed and broadcast, the candidate
    * corpus streams (positions semi-join the broadcast set, runs merge in
    * a per-doc window, the clip is a HOF projection) — candidates never
    * shuffle on anything wider than (id, pos).
    */
  def clipContaminated(cand: DataFrame, ref: DataFrame, idCol: String,
                       textCol: String, n: Int = 8): DataFrame = {
    val refSh = shingles(ref, idCol, textCol, n).select("shingle").distinct()
    val marked = posShingleRows(cand, idCol, textCol, n)
      .join(broadcast(refSh), Seq("shingle"), "left_semi")
      .select(col(idCol), col("pos"))
    clipBySpans(cand,
      mergeRuns(marked, idCol, n)
        .select(col(idCol), col("span_start"), col("span_end")),
      idCol, textCol)
  }

  /** Merge marked (id, pos) n-gram positions into maximal DISJOINT runs:
    * (id, span_start, span_end, n_ngrams) — THE one copy of the
    * lag/break/running-sum merge and the 1-based `+ (n-1)` end-of-span
    * convention, shared by span reporting and both clip operators.
    *
    * Two marked positions continue one run whenever their gap is ≤ n−1:
    * a position's n-gram covers tokens [pos, pos+n−1], so any closer pair
    * has OVERLAPPING token extents and splitting them would report
    * overlapping spans whose n_tokens double-count the shared tokens
    * (the round-4 advisory). Breaking only at gap > n−1 makes spans
    * pairwise disjoint and n_tokens additive; the clip operators are
    * invariant to this (they remove the token-range UNION either way).
    */
  private def mergeRuns(marked: DataFrame, idCol: String, n: Int): DataFrame = {
    val byPos = Window.partitionBy(idCol).orderBy("pos")
    marked
      .withColumn("__brk",
        when(col("pos") - lag("pos", 1).over(byPos) <= n - 1, 0L).otherwise(1L))
      .withColumn("__span", sum("__brk").over(byPos))
      .groupBy(col(idCol), col("__span"))
      .agg(min("pos").as("span_start"),
        (max("pos") + lit(n - 1)).as("span_end"),
        count(lit(1)).as("n_ngrams"))
      .select(col(idCol), col("span_start"), col("span_end"), col("n_ngrams"))
  }

  /** Clip token spans out of documents: spans is (id, span_start,
    * span_end) rows; tokens covered by any span are filtered in a HOF
    * projection. Shared tail of [[clipSpans]] and [[clipContaminated]].
    */
  private def clipBySpans(docs: DataFrame, spans: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val grouped = spans.groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("__spans"))
    docs.join(grouped, Seq(idCol), "left")
      .withColumn("__spans", coalesce(col("__spans"),
        array().cast("array<struct<s:bigint,e:bigint>>")))
      .withColumn("__words", split(col(textCol), " "))
      .withColumn("__kept", expr(
        "filter(__words, (w, i) -> " +
          "NOT exists(__spans, sp -> i + 1 >= sp.s AND i + 1 <= sp.e))"))
      .select(col(idCol),
        concat_ws(" ", col("__kept")).as("text_clipped"),
        (size(col("__words")) - size(col("__kept"))).cast("long")
          .as("n_tokens_removed"))
  }

  private def duplicateSpansFrom(ps: DataFrame, idCol: String,
                                 minDocs: Int, n: Int): DataFrame = {
    val dup = ps.groupBy("shingle")
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select("shingle")
    val marked = ps.join(dup, Seq("shingle"), "left_semi")
      .select(col(idCol), col("pos"))
    mergeRuns(marked, idCol, n)
      .withColumn("n_tokens", col("span_end") - col("span_start") + 1)
  }

  /** Shared inverted-index pair mining: intersection and set sizes for
    * every doc pair sharing ≥1 (optionally frequency-capped) shingle —
    * (a, b, n_common, n_a, n_b). Sizes come from the SAME capped set as
    * the intersection counts, so downstream ratios stay internally
    * consistent under stop-shingle capping.
    */
  private def shinglePairCounts(sh: DataFrame, idCol: String,
                                maxShingleFreq: Option[Int]): DataFrame = {
    // ONE grouped-postings pass (optimization r16, guide §2.3/§2.4): the
    // inverted-index SELF-JOIN on the shingle string exchanged and
    // sorted the posting rows twice (the two join sides are the same
    // frame under different renames, which defeats exchange reuse), and
    // the stop-shingle cap needed its own count + anti-join pass before
    // it. Grouping the postings per shingle once subsumes all of it:
    // the cap becomes a size filter on the posting list (identical —
    // the old `hot` count was exactly this list's length), and the
    // (a < b) candidate pairs expand from the SORTED list with codegen
    // HOFs, so position order implies value order. Per-list pair
    // expansion is O(cap²) worst-case per row — the same bound the
    // join had; `maxShingleFreq` remains the skew guard.
    // Capped path (every production caller): the r16 bounded kernel from
    // candidatesFromBands, backported (r16 verdict item 1) — min_k_pairs
    // with k = cap + 1 keeps at most cap+1 sorted ids per shingle in an
    // O(bucket) buffer, so a corpus-hot shingle (a template line in 10⁸
    // docs at 100 TB) never materializes its full posting list the way
    // collect_list + size filter did: length cap+1 proves overflow
    // (dropped — identical to the old `size > cap`), anything shorter IS
    // the complete sorted list (shingle rows are DISTINCT (id, shingle),
    // and min_k_pairs over (0.0, id) sorts by id = sort_array). The
    // UNCAPPED path keeps collect_list: the bounded buffer would be as
    // large as the bucket itself — at corpus scale callers must set
    // `maxShingleFreq` (the skew guard), which every catalog caller that
    // mines a full corpus does.
    val lists = maxShingleFreq match {
      case Some(cap) =>
        sh.groupBy("shingle")
          .agg(graft.functions.TopKFunctions
            .min_k_pairs(lit(0.0), col(idCol), cap + 1).as("__kv"))
          .filter(size(col("__kv")) <= cap)
          .select(expr("transform(__kv, s -> s.value)").as("__ids"))
      case None =>
        sh.groupBy("shingle")
          .agg(sort_array(collect_list(col(idCol))).as("__ids"))
          .select(col("__ids"))
    }
    // two chained generators, not one flattened pair array: the pair
    // stream is O(list²) rows either way (exactly what the join
    // produced), but per-ROW memory stays O(list) — a flatten would
    // materialize a whole list's O(list²) pair structs in one array
    val common = lists
      .select(col("__ids"), posexplode(col("__ids")).as(Seq("__i", "a")))
      .select(col("a"),
        explode(expr("slice(__ids, __i + 2, size(__ids))")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
    val sizes = lists.select(explode(col("__ids")).as(idCol))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    common
      .join(sizes.select(col(idCol).as("a"), col("n_sh").as("n_a")), Seq("a"))
      .join(sizes.select(col(idCol).as("b"), col("n_sh").as("n_b")), Seq("b"))
  }

  /** All pairs (a < b) with Jaccard similarity ≥ `threshold` over word
    * n-gram shingles. Output: a, b, n_common, n_a, n_b, jaccard.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double, n: Int = 3,
                   maxShingleFreq: Option[Int] = None,
                   materialize: Boolean = true): DataFrame =
    withShingleCache(shingles(docs, idCol, textCol, n), materialize) { sh =>
      shinglePairCounts(sh, idCol, maxShingleFreq)
        .withColumn("jaccard",
          col("n_common") / (col("n_a") + col("n_b") - col("n_common")))
        .filter(col("jaccard") >= threshold)
        .select("a", "b", "n_common", "n_a", "n_b", "jaccard")
    }

  /** All pairs (a < b) where the SMALLER shingle set is ≥ `threshold`
    * contained in the other: containment = n_common / min(n_a, n_b).
    * Jaccard misses asymmetric duplication by construction (a 50-word
    * excerpt inside a 5000-word doc has J ≈ 0.01 but containment 1.0);
    * this is the quote/excerpt/subset detector curation pipelines pair
    * with it. Output: a, b, n_common, n_a, n_b, containment. Same
    * inverted-index join and stop-shingle cap as [[jaccardPairs]] — the
    * ratio, not the plan, is what changes.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double, n: Int = 3,
                       maxShingleFreq: Option[Int] = None,
                       materialize: Boolean = true): DataFrame =
    withShingleCache(shingles(docs, idCol, textCol, n), materialize) { sh =>
      shinglePairCounts(sh, idCol, maxShingleFreq)
        .withColumn("containment",
          col("n_common") / least(col("n_a"), col("n_b")))
        .filter(col("containment") >= threshold)
        .select("a", "b", "n_common", "n_a", "n_b", "containment")
    }

  /** Cache the shingle set (it feeds several consumers in each pair
    * pipeline), run `build`, materialize its (small) result, and release
    * the cache — an un-unpersisted cache per invocation would accumulate
    * executor storage for the session lifetime. `materialize = false`
    * instead returns the pure lazy plan with no caching: for plan
    * inspection (PlanSpec) or callers managing their own persistence.
    */
  private def withShingleCache(sh0: DataFrame, materialize: Boolean)(
      build: DataFrame => DataFrame): DataFrame =
    if (!materialize) build(sh0)
    else {
      val sh = sh0.cache()
      try build(sh).localCheckpoint(true)
      finally sh.unpersist(false)
    }

  /** MinHash signature per doc: for seed i, `min(md5(shingle || '#' || i))`.
    * Computed over shingle *rows* (min over a multiset equals min over the
    * set), so the only shuffle is the final partial-aggregated groupBy —
    * no distinct pass.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 8, n: Int = 3,
                        hasher: Hashers.Keyed = Hashers.md5Keyed): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, n)
    val aggs = (0 until numHashes).map(i =>
      min(hasher(col("shingle"), lit(i))).as(s"mh$i"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Elementwise-min aggregator over the Kirsch–Mitzenmacher hash family:
    * each input shingle contributes its whole `g_i = (h1 + (i+1)·h2) mod
    * P` family into one `Array[Long]` buffer. ONE aggregation row per
    * shingle — vs. exploding numHashes rows per shingle, which at 128
    * hashes turned millions of shingles into hundreds of millions of
    * aggregate inputs and dominated the pipeline. Buffers are merged
    * map-side (ObjectHashAggregate), so the shuffle carries one
    * 128-long array per doc per map partition.
    */
  private final class MinHashFamilyAgg(numHashes: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long), Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)
    override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
      val (h1, h2) = in
      // g_i = (h1 + (i+1)·h2) mod P, computed incrementally: both inputs
      // are already reduced mod P, so one add + conditional subtract per
      // step replaces the 64-bit division — bit-identical values, and
      // this loop runs numHashes times per shingle corpus-wide.
      val P = Hashers.P
      var g = h1
      var i = 0
      while (i < numHashes) {
        g += h2
        if (g >= P) g -= P
        if (g < buf(i)) buf(i) = g
        i += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** LSH band keys per document from its shingle set: (id, band, key).
    *
    * The string hash runs ONCE per shingle — (h1, h2) feed the
    * Kirsch–Mitzenmacher family inside [[MinHashFamilyAgg]], which folds
    * all numHashes minima per doc in a single typed aggregation (no
    * per-seed row explosion, no 128-column-wide codegen blowup). Band
    * keys are then md5 over each band's slice of the signature array —
    * one `posexplode` of bands per doc.
    */
  /** Full minhash family per doc — (id, sig: array<long> of length
    * `numHashes`) — via the single-string-hash Kirsch–Mitzenmacher
    * aggregation.
    */
  def signaturesFromShingles(sh: DataFrame, idCol: String, numHashes: Int,
                             base: Hashers.Base): DataFrame = {
    val famAgg = udaf(new MinHashFamilyAgg(numHashes),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    sh.select(col(idCol),
        base.h1(col("shingle")).as("h1"), base.h2(col("shingle")).as("h2"))
      .groupBy(col(idCol))
      .agg(famAgg(col("h1"), col("h2")).as("sig"))
  }

  /** Band keys from precomputed signatures: one row per (doc, band); key =
    * md5 of the band's slice joined with '|' (identical to the DuckDB
    * oracle's mh_i || '|' || ... folding).
    */
  def bandKeysFromSignatures(sig: DataFrame, idCol: String, numHashes: Int,
                             bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    sig
      .select(col(idCol), posexplode(
        expr(s"transform(sequence(0, ${bands - 1}), b -> " +
             s"array_join(transform(sequence(0, ${rowsPerBand - 1}), " +
             s"i -> cast(sig[b * $rowsPerBand + i] AS STRING)), '|'))"))
        .as(Seq("band", "joined")))
      .select(col(idCol), col("band"), md5(col("joined")).as("key"))
  }

  def bandKeysFromShingles(sh: DataFrame, idCol: String, numHashes: Int,
                           bands: Int, base: Hashers.Base): DataFrame =
    bandKeysFromSignatures(
      signaturesFromShingles(sh, idCol, numHashes, base), idCol, numHashes, bands)

  /** Dedup-serve from a PERSISTED signature registry: flag near-dups of
    * an arriving batch against a corpus whose minhash signatures were
    * computed once and stored — the corpus TEXT is never re-read. This
    * is the artifact story the ANN indexes and tokenizer models already
    * have, applied to the dedup pillar: at 100 TB the signature table is
    * ~1 KB/doc of fixed-width longs, and a daily ingest touches only it.
    *
    * `corpusSig` is a (idCol, sig) frame as produced by
    * [[signaturesFromShingles]] (typically `spark.read.parquet` of the
    * registry). Plan shape: the batch is
    * signed once (bounded, checkpointed); its band keys broadcast as a
    * semi-join filter over the corpus band keys — ONE scan of the
    * registry, no corpus-side shuffle before the filter; surviving
    * buckets are capped (`maxBucketSize`) on the corpus side; candidates
    * verify by SIGNATURE AGREEMENT (`n_agree / numHashes` estimates
    * Jaccard, std ≈ √(J(1−J)/numHashes)) — two fixed-width arrays per
    * candidate, no shingle re-join. `threshold` becomes the integer gate
    * `n_agree ≥ ⌈threshold·numHashes⌉`, so the whole serve is
    * oracle-hashable under the md5 base.
    *
    * Output: (idCol = batch doc, corpus_id, n_agree), one row per
    * flagged (batch, corpus) near-pair.
    */
  def dedupeAgainstSignatures(batch: DataFrame, corpusSig: DataFrame,
                              idCol: String, textCol: String,
                              threshold: Double = 0.7,
                              numHashes: Int = 128, bands: Int = 16,
                              n: Int = 3,
                              base: Hashers.Base = Hashers.xx64Base,
                              maxBucketSize: Option[Int] = Some(100)): DataFrame = {
    val minAgree = math.ceil(threshold * numHashes).toLong
    val bSig = signaturesFromShingles(shingles(batch, idCol, textCol, n),
      idCol, numHashes, base).localCheckpoint(true)
    val bKeys = bandKeysFromSignatures(bSig, idCol, numHashes, bands)
      .select(col(idCol).as("bid"), col("band"), col("key"))
    val cKeys = bandKeysFromSignatures(corpusSig, idCol, numHashes, bands)
      .select(col(idCol).as("cid"), col("band"), col("key"))
    val hitKeys = bKeys.select("band", "key").distinct()
    val cHit = cKeys.join(broadcast(hitKeys), Seq("band", "key"))
    val ok = cHit.groupBy("band", "key").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= lit(maxBucketSize.getOrElse(Int.MaxValue)))
      .select("band", "key")
    val cand = cHit.join(ok, Seq("band", "key"))
      .join(broadcast(bKeys), Seq("band", "key"))
      .select("cid", "bid").distinct()
    cand
      .join(corpusSig.select(col(idCol).as("cid"), col("sig").as("sc")),
        Seq("cid"))
      .join(broadcast(bSig.select(col(idCol).as("bid"), col("sig").as("sb"))),
        Seq("bid"))
      .withColumn("n_agree",
        expr("aggregate(zip_with(sc, sb, (x, y) -> IF(x = y, 1, 0)), 0L, " +
             "(acc, v) -> acc + v)"))
      .filter(col("n_agree") >= minAgree)
      .select(col("bid").as(idCol), col("cid").as("corpus_id"), col("n_agree"))
  }

  /** The raw LSH CANDIDATE pairs — band-bucket co-membership BEFORE any
    * verification — exposed for banding-quality evaluation: scoring this
    * set against the exact-Jaccard truth separates the banding's recall
    * (did a true pair share any bucket?) from the verifier's precision,
    * which is how numHashes/bands/bucket caps are actually tuned.
    * Output: (a, b), a < b, distinct.
    */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 128, bands: Int = 16, n: Int = 3,
                        base: Hashers.Base = Hashers.xx64Base,
                        maxBucketSize: Option[Int] = Some(100)): DataFrame = {
    val stacked = bandKeysFromShingles(
      shingles(docs, idCol, textCol, n), idCol, numHashes, bands, base)
    candidatesFromBands(stacked, idCol, maxBucketSize, checkpoint = false)
  }

  /** Precomputed signing artifacts for one corpus side, shared across
    * miners: `sh` = shingle rows (caller-cached), `bands` = LSH band keys
    * (caller-materialized), `sigs` = minhash signatures (estimator-verify
    * path only). [[incrementalDedup]] mines its batch TWICE — against the
    * corpus and against itself — and the signature aggregation is the
    * expensive half of each; this lets the batch be shingled and signed
    * exactly once. All frames keep the caller's id column name; the
    * CALLER owns cache/checkpoint lifecycle.
    */
  private[graft] final case class PreSigned(sh: DataFrame, bands: DataFrame,
                                            sigs: Option[DataFrame] = None)

  /** MinHash+LSH near-dup pairs: band the signatures, bucket-join within
    * bands (candidates only), then verify *only the candidates* with exact
    * Jaccard — the all-pairs set is never formed, which is the entire point
    * of LSH at corpus scale. `bands` × `rowsPerBand` must equal `numHashes`.
    *
    * Banding defaults are tuned for a ~0.7 similarity threshold: 128 hashes
    * in 16 bands ⇒ 8 rows per band, S-curve midpoint (1/16)^(1/8) ≈ 0.71.
    * P[candidate] at Jaccard 0.3 is ≈ 10⁻³ (vs ~31% with the old 8×4/r=2
    * banding, which degenerated toward all-pairs). `maxBucketSize` drops
    * band buckets holding more than that many docs — a hot bucket (boiler-
    * plate, empty docs) contributes O(size²) candidates; the cap bounds
    * bucket-join skew exactly like `maxShingleFreq` does for `jaccardPairs`.
    *
    * `verifyExact = false` verifies candidates from the SIGNATURES instead
    * of the shingle sets: estimated Jaccard = fraction of agreeing family
    * members (std ≈ √(J(1−J)/numHashes), ~0.027 at J=0.9/128 hashes). At
    * dup-heavy corpus scale the exact shingle-join verification dominates
    * the pipeline (every true dup pair re-joins both docs' full shingle
    * sets); the estimator replaces it with a join of two fixed-width
    * arrays per candidate — this is the production path, exact is the
    * oracle-replayable default.
    */
  /** Candidate pairs from band keys in ONE pass: gather each bucket's doc
    * ids, drop buckets over the cap, expand in-bucket pairs. No bucket
    * self-join (which would recompute the signature chain per consumer)
    * and no separate hot-bucket pass — the collect_list buffer IS the
    * bucket (after LSH banding a bucket is a near-dup cluster, orders of
    * magnitude below the doc count; the cap bounds the quadratic pair
    * expansion). Hot buckets are counted and anti-selected BEFORE being
    * materialized, so a pathological bucket (empty docs, boilerplate) is
    * never built as an unbounded buffer in one task; the count agg and
    * the collect agg share the (band, key) partitioning — no extra
    * exchange.
    */
  private def candidatesFromBands(stacked: DataFrame, idCol: String,
                                  maxBucketSize: Option[Int],
                                  checkpoint: Boolean): DataFrame = {
    val c0 = maxBucketSize match {
      case Some(cap) if cap.toLong + 1 <= (1 << 22) =>
        // ONE bounded aggregation pass (optimization r16, guide §2.3):
        // the two-pass form below counted every bucket, joined the
        // survivors back, and re-aggregated them into lists — the band
        // rows crossed two exchanges. min_k_pairs with k = cap + 1 keeps
        // at most cap+1 SORTED ids per bucket in an O(cap) buffer: a
        // result of length cap+1 proves the bucket overflowed (dropped,
        // exactly the old `n > cap`), anything shorter IS the complete
        // bucket. Pairs expand positionally from the sorted list (the
        // old a < b filter), streamed through two chained generators.
        // An unbounded collect_list here would instead materialize a
        // pathological band-key collision's whole bucket before any
        // filter could drop it — the bounded kernel is the point.
        stacked.groupBy("band", "key")
          .agg(graft.functions.TopKFunctions
            .min_k_pairs(lit(0.0), col(idCol), cap + 1).as("__kv"))
          .filter(size(col("__kv")).between(2, cap))
          .select(expr("transform(__kv, s -> s.value)").as("__ids"))
          .select(col("__ids"), posexplode(col("__ids")).as(Seq("__i", "a")))
          .select(col("a"),
            explode(expr("slice(__ids, __i + 2, size(__ids))")).as("b"))
          .select("a", "b").distinct()
      case _ =>
        // uncapped (or absurdly-capped) callers: the bounded buffer
        // would be as large as the bucket itself — keep the two-pass
        // count + join, which never materializes a bucket
        val okKeys = stacked.groupBy("band", "key").agg(count(lit(1)).as("n"))
          .filter(col("n") >= 2 &&
            col("n") <= lit(maxBucketSize.getOrElse(Int.MaxValue)))
          .select("band", "key")
        stacked.join(okKeys, Seq("band", "key"))
          .groupBy("band", "key").agg(collect_list(col(idCol)).as("ids"))
          .select(explode(col("ids")).as("a"), col("ids"))
          .select(col("a"), explode(col("ids")).as("b"))
          .filter(col("a") < col("b"))
          .select("a", "b").distinct()
    }
    if (checkpoint) c0.localCheckpoint(true) else c0
  }

  /** Edit-distance-verified near-dup pairs: LSH band candidates (same
    * signature machinery as [[minhashLshPairs]]) verified by NORMALIZED
    * Levenshtein distance — `dist · 1000 ≤ maxDistPerMille · max(len)`,
    * an all-integer test with no float boundary, replayable by DuckDB's
    * identical `levenshtein`. Character-level distance catches near-dups
    * that token shingles blur (small in-word edits, whitespace damage)
    * and is the verification metric fuzzy-dedup pipelines quote.
    *
    * Scale: per-pair Levenshtein is O(len_a · len_b) — affordable ONLY
    * because candidates are LSH-bucketed and capped, never all-pairs.
    * Output: (a, b, edit_distance).
    */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
                        maxDistPerMille: Int = 300,
                        numHashes: Int = 128, bands: Int = 16, n: Int = 3,
                        base: Hashers.Base = Hashers.xx64Base,
                        maxBucketSize: Option[Int] = Some(100),
                        materialize: Boolean = true): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
    val stacked = bandKeysFromShingles(sh, idCol, numHashes, bands, base)
    val candidates = candidatesFromBands(stacked, idCol, maxBucketSize, materialize)
    val ta = docs.select(col(idCol).as("a"), col(textCol).as("__ta"),
      length(col(textCol)).as("__la"))
    val tb = docs.select(col(idCol).as("b"), col(textCol).as("__tb"),
      length(col(textCol)).as("__lb"))
    candidates.join(ta, Seq("a")).join(tb, Seq("b"))
      .withColumn("__d", levenshtein(col("__ta"), col("__tb")).cast("long"))
      // LONG arithmetic: d*1000 and permille*len both overflow Int for
      // multi-megachar docs, silently inverting the threshold test
      .filter(col("__d") * 1000L <=
        lit(maxDistPerMille.toLong) * greatest(col("__la"), col("__lb")).cast("long"))
      .select(col("a"), col("b"), col("__d").as("edit_distance"))
  }

  /** RECORD LINKAGE (entity resolution) on short structured strings —
    * names, titles, addresses — where [[editDistancePairs]]' shingle-LSH
    * banding is the wrong blocker (3-gram shingles of a 15-char name are
    * nearly all distinct). Classic blocked matching instead: normalize
    * (case-fold, strip non-alphanumerics), block on the normalized
    * SUFFIX (`suffixLen` chars — the stable tail survives prefix-heavy
    * templated names and most typos), pair only within a block, verify
    * with exact Levenshtein ≤ `maxDist`.
    *
    * Scale posture: the self-join is keyed by block, and blocks are
    * count-capped BEFORE pairing (same discipline as the LSH bucket
    * caps) — a degenerate block ("smith") prices as its cap, never as
    * its square. What the cap excludes is never silent:
    * [[blockedFuzzyMatchDropped]] is the census of over-cap blocks and
    * their row counts. Returns (a, b, dist) with a < b.
    */
  def blockedFuzzyMatch(df: DataFrame, idCol: String, nameCol: String,
                        maxDist: Int = 2, suffixLen: Int = 5,
                        maxBlockSize: Option[Int] = Some(100)): DataFrame = {
    val keyed = fuzzyBlockKeyed(df, idCol, nameCol, suffixLen)
    val capped = maxBlockSize match {
      case Some(cap) =>
        val sizes = keyed.groupBy("__blk")
          .agg(count(lit(1)).as("__bc")).filter(col("__bc") <= cap)
        keyed.join(sizes.select("__blk"), Seq("__blk"))
      case None => keyed
    }
    val l = capped.select(col("__blk"), col("__id").as("a"),
      col("__norm").as("__na"))
    val r = capped.select(col("__blk"), col("__id").as("b"),
      col("__norm").as("__nb"))
    l.join(r, Seq("__blk"))
      .filter(col("a") < col("b"))
      .withColumn("dist", levenshtein(col("__na"), col("__nb")))
      .filter(col("dist") <= maxDist)
      .select(col("a"), col("b"), col("dist").cast("long").as("dist"))
  }

  /** Shared normalize-and-block derivation for the fuzzy matcher and its
    * dropped-blocks census — one definition so the census counts exactly
    * the blocks the matcher keys on.
    */
  private def fuzzyBlockKeyed(df: DataFrame, idCol: String, nameCol: String,
                              suffixLen: Int): DataFrame =
    df.select(col(idCol).as("__id"),
        regexp_replace(lower(col(nameCol)), "[^a-z0-9]", "").as("__norm"))
      .withColumn("__blk", expr(s"right(__norm, $suffixLen)"))

  /** THE NO-SILENT-CAPS CENSUS for [[blockedFuzzyMatch]]: the blocks its
    * `maxBlockSize` cap EXCLUDES, with their row counts — so a user knows
    * what the cap priced away instead of discovering a degenerate block
    * ("smith") produced zero links with no trace. One row per over-cap
    * block: (blk, block_size). `sum(block_size)` is the dropped-rows
    * total; an empty result certifies the matcher saw every row.
    *
    * Scale posture: one hash aggregation over the normalized keys —
    * strictly cheaper than the matcher itself — and the output is
    * bounded by the number of DEGENERATE blocks, which is what the
    * report exists to surface.
    */
  def blockedFuzzyMatchDropped(df: DataFrame, idCol: String, nameCol: String,
                               suffixLen: Int = 5,
                               maxBlockSize: Int = 100): DataFrame =
    fuzzyBlockKeyed(df, idCol, nameCol, suffixLen)
      .groupBy("__blk")
      .agg(count(lit(1)).as("block_size"))
      .filter(col("block_size") > maxBlockSize)
      .select(col("__blk").as("blk"), col("block_size"))

  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double, numHashes: Int = 128, bands: Int = 16,
                      n: Int = 3,
                      base: Hashers.Base = Hashers.xx64Base,
                      maxBucketSize: Option[Int] = Some(100),
                      materialize: Boolean = true,
                      verifyExact: Boolean = true): DataFrame =
    minhashLshPairsPre(docs, idCol, textCol, threshold, numHashes, bands, n,
      base, maxBucketSize, materialize, verifyExact, pre = None)

  /** [[minhashLshPairs]] with optionally precomputed signing artifacts
    * (see [[PreSigned]]) — the caller-owned shingles/bands/sigs replace
    * this function's own computation AND its cache/checkpoint management.
    */
  private[graft] def minhashLshPairsPre(docs: DataFrame, idCol: String,
                      textCol: String, threshold: Double, numHashes: Int,
                      bands: Int, n: Int, base: Hashers.Base,
                      maxBucketSize: Option[Int], materialize: Boolean,
                      verifyExact: Boolean,
                      pre: Option[PreSigned]): DataFrame = {
    def candidatesFrom(stacked: DataFrame, checkpoint: Boolean): DataFrame =
      candidatesFromBands(stacked, idCol, maxBucketSize, checkpoint)
    if (verifyExact) {
      // checkpointed (in the default eager mode): the pair set feeds both
      // the intersection count and the final join — without this the
      // whole signature → band → bucket chain executes twice
      def verified(sh: DataFrame, stacked: DataFrame): DataFrame = {
        val candidates = candidatesFrom(stacked, materialize)
        // Exact-Jaccard verification restricted to candidate pairs: join
        // each side's shingle set in, count the intersection per pair.
        val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
        val common = candidates
          .join(sh.select(col(idCol).as("a"), col("shingle")), Seq("a"))
          .join(sh.select(col(idCol).as("b"), col("shingle")), Seq("b", "shingle"))
          .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
        candidates.join(common, Seq("a", "b"))
          .join(sizes.select(col(idCol).as("a"), col("n_sh").as("n_a")), Seq("a"))
          .join(sizes.select(col(idCol).as("b"), col("n_sh").as("n_b")), Seq("b"))
          .withColumn("jaccard",
            col("n_common") / (col("n_a") + col("n_b") - col("n_common")))
          .filter(col("jaccard") >= threshold)
          .select("a", "b", "jaccard")
      }
      pre match {
        case Some(p) =>
          // same materialize contract as the withShingleCache path below:
          // eager-checkpoint the (small) pair set so the caller can
          // release the pre-signed artifacts as soon as this returns
          val v = verified(p.sh, p.bands)
          if (materialize) v.localCheckpoint(true) else v
        case None =>
          // The distinct shingle set feeds three consumers (both sides of
          // the candidate-verification join + the size table) — cached once
          // by the wrapper instead of recomputing the explode+distinct
          // shuffle per consumer, released after the pair set materializes.
          withShingleCache(shingles(docs, idCol, textCol, n), materialize) { sh =>
            verified(sh, bandKeysFromShingles(sh, idCol, numHashes, bands, base))
          }
      }
    } else {
      // Estimator mode never re-reads the shingles: they have exactly one
      // consumer (the signature aggregation), so no shingle cache — the
      // checkpointed signatures (one compact numHashes-long row per doc,
      // spilling partition-local at corpus scale) serve both banding and
      // verification, and the verify join is a fixed-width array zip per
      // candidate instead of a shingle re-join.
      val sigs = pre.flatMap(_.sigs).getOrElse {
        val sigs0 = signaturesFromShingles(
          shingles(docs, idCol, textCol, n), idCol, numHashes, base)
        if (materialize) sigs0.localCheckpoint(true) else sigs0
      }
      val stacked = pre.map(_.bands).getOrElse(
        bandKeysFromSignatures(sigs, idCol, numHashes, bands))
      val candidates = candidatesFrom(stacked, checkpoint = false)
      candidates
        .join(sigs.select(col(idCol).as("a"), col("sig").as("sa")), Seq("a"))
        .join(sigs.select(col(idCol).as("b"), col("sig").as("sb")), Seq("b"))
        .withColumn("jaccard",
          expr("aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)), 0L, " +
               "(acc, v) -> acc + v)") / numHashes)
        .filter(col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    }
  }

  /** Cross-corpus contamination report: for each candidate doc similar to
    * some reference doc, the best-matching reference (max jaccard; ties →
    * smallest ref id). This is the train/eval decontamination primitive:
    * the reference corpus is the eval/benchmark set, candidates are the
    * training corpus, and [[decontaminate]] drops every reported
    * candidate.
    *
    * Two detection paths, unioned:
    *  - exact: full-text md5 equality (catches docs too short to shingle);
    *  - near: LSH band-key join candidate×reference (only docs sharing a
    *    bucket are compared — never the cross product), then exact-Jaccard
    *    verification of those pairs against `threshold`.
    *
    * The reference side is hinted broadcast by default — a benchmark/eval
    * set is orders of magnitude smaller than a training corpus, so the
    * band join and the verify join ship the small side to every executor
    * and the candidate corpus never shuffles. Set `broadcastRef = false`
    * when decontaminating against another full-size corpus.
    *
    * `verifyExact = false` verifies bucket-sharing pairs from the minhash
    * signatures (fraction of agreeing family members) instead of the
    * shingle re-join — the same estimator trade as in
    * [[minhashLshPairs]], for when the candidate corpus is dup-heavy and
    * verification dominates.
    */
  def crossCorpusPairs(cand: DataFrame, ref: DataFrame, idCol: String,
                       textCol: String, threshold: Double,
                       numHashes: Int = 128, bands: Int = 16, n: Int = 3,
                       base: Hashers.Base = Hashers.xx64Base,
                       maxBucketSize: Option[Int] = Some(100),
                       broadcastRef: Boolean = true,
                       materialize: Boolean = true,
                       verifyExact: Boolean = true,
                       bestMatchOnly: Boolean = true): DataFrame =
    crossCorpusPairsPre(cand, ref, idCol, textCol, threshold, numHashes,
      bands, n, base, maxBucketSize, broadcastRef, materialize, verifyExact,
      bestMatchOnly, preRef = None)

  /** [[crossCorpusPairs]] with an optionally pre-signed REFERENCE side
    * (see [[PreSigned]]): the caller's shingles/bands/sigs stand in for
    * this function's own reference-side computation and lifecycle.
    */
  private[graft] def crossCorpusPairsPre(cand: DataFrame, ref: DataFrame,
                       idCol: String, textCol: String, threshold: Double,
                       numHashes: Int, bands: Int, n: Int,
                       base: Hashers.Base, maxBucketSize: Option[Int],
                       broadcastRef: Boolean, materialize: Boolean,
                       verifyExact: Boolean, bestMatchOnly: Boolean,
                       preRef: Option[PreSigned]): DataFrame = {
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (broadcastRef) broadcast(df) else df
    val candId = col(idCol).as("cand_id")
    val refId = col(idCol).as("ref_id")
    // exact text match (works for docs below the shingle window too)
    val exactPairs = cand.select(candId, md5(col(textCol)).as("h"))
      .join(maybeBroadcast(ref.select(refId, md5(col(textCol)).as("h"))), Seq("h"))
      .select(col("cand_id"), col("ref_id"), lit(1.0).as("jaccard"))
    // shared: bucket-join candidate generation (cap hot REFERENCE buckets
    // — boilerplate in the eval set would pair with half the corpus —
    // symmetric to minhashLshPairs' bucket cap) and best-match assembly
    def lshCandidatesFrom(bCand: DataFrame, bRef: DataFrame): DataFrame = {
      val bRefOk = maxBucketSize match {
        case Some(cap) =>
          val hot = bRef.groupBy("band", "key").count().filter(col("count") > cap)
            .select("band", "key")
          bRef.join(maybeBroadcast(hot), Seq("band", "key"), "left_anti")
        case None => bRef
      }
      // No cand_id ≠ ref_id filter: the corpora are distinct datasets
      // whose id spaces may coincide numerically (both 0-based), so id
      // equality does NOT mean same-document. When the corpora overlap
      // (e.g. ref ⊂ cand), a same-id pair is identical text and the md5
      // exact path already reports it at J=1.0 — the union+max assembly
      // collapses the duplicate, so including self-candidates here never
      // changes the report.
      bCand.join(maybeBroadcast(bRefOk), Seq("band", "key"))
        .select("cand_id", "ref_id").distinct()
    }
    // best match per candidate: max jaccard, ties to the smallest ref id
    // bestMatchOnly: the decontamination REPORT wants one row per
    // candidate (its best reference match); set false for consumers that
    // need EVERY pair over the threshold — a "was doc X hit at all" flag
    // derived from the argmax view under-reports (a batch doc that
    // duplicates the corpus but is never any corpus doc's best match
    // would escape).
    def assemble(nearPairs: DataFrame): DataFrame = {
      val allPairs = exactPairs.unionByName(nearPairs)
        .groupBy("cand_id", "ref_id").agg(max("jaccard").as("jaccard"))
      val report =
        if (!bestMatchOnly) allPairs.select("cand_id", "ref_id", "jaccard")
        else allPairs
          .withColumn("rk", row_number().over(
            Window.partitionBy("cand_id")
              .orderBy(col("jaccard").desc, col("ref_id"))))
          .filter(col("rk") === 1)
          .select("cand_id", "ref_id", "jaccard")
      if (materialize) report.localCheckpoint(true) else report
    }
    if (verifyExact) {
      // near-dup via shared LSH buckets, jaccard-verified; owned shingle
      // caches released once the (small) report is materialized (a
      // pre-signed reference side is the CALLER's cache to manage)
      val shCand0 = shingles(cand, idCol, textCol, n)
      val shCand = if (materialize) shCand0.cache() else shCand0
      val shRef = preRef.map(_.sh).getOrElse {
        val shRef0 = shingles(ref, idCol, textCol, n)
        if (materialize) shRef0.cache() else shRef0
      }
      try {
        val bCand = bandKeysFromShingles(shCand, idCol, numHashes, bands, base)
          .select(candId, col("band"), col("key"))
        val bRef = preRef.map(_.bands).getOrElse(
            bandKeysFromShingles(shRef, idCol, numHashes, bands, base))
          .select(refId, col("band"), col("key"))
        val lshCandidates = lshCandidatesFrom(bCand, bRef)
        val nCand = shCand.groupBy(col(idCol)).agg(count(lit(1)).as("n_cand"))
        val nRef = shRef.groupBy(col(idCol)).agg(count(lit(1)).as("n_ref"))
        val common = lshCandidates
          .join(shCand.select(col(idCol).as("cand_id"), col("shingle")), Seq("cand_id"))
          .join(maybeBroadcast(shRef.select(col(idCol).as("ref_id"), col("shingle"))),
            Seq("ref_id", "shingle"))
          .groupBy("cand_id", "ref_id").agg(count(lit(1)).as("n_common"))
        val nearPairs = common
          .join(nCand.select(col(idCol).as("cand_id"), col("n_cand")), Seq("cand_id"))
          .join(maybeBroadcast(nRef.select(col(idCol).as("ref_id"), col("n_ref"))),
            Seq("ref_id"))
          .withColumn("jaccard",
            col("n_common") / (col("n_cand") + col("n_ref") - col("n_common")))
          .filter(col("jaccard") >= threshold)
          .select("cand_id", "ref_id", "jaccard")
        assemble(nearPairs)
      } finally if (materialize) {
        shCand.unpersist(false)
        if (preRef.isEmpty) shRef.unpersist(false)
      }
    } else {
      // estimator: shingles have one consumer each (the signature aggs) —
      // no shingle caches; checkpointed signatures serve banding AND the
      // fixed-width verification join
      val sigCand0 = signaturesFromShingles(
        shingles(cand, idCol, textCol, n), idCol, numHashes, base)
      val sigCand = if (materialize) sigCand0.localCheckpoint(true) else sigCand0
      val sigRef = preRef.flatMap(_.sigs).getOrElse {
        val sigRef0 = signaturesFromShingles(
          shingles(ref, idCol, textCol, n), idCol, numHashes, base)
        if (materialize) sigRef0.localCheckpoint(true) else sigRef0
      }
      val lshCandidates = lshCandidatesFrom(
        bandKeysFromSignatures(sigCand, idCol, numHashes, bands)
          .select(candId, col("band"), col("key")),
        preRef.map(_.bands).getOrElse(
            bandKeysFromSignatures(sigRef, idCol, numHashes, bands))
          .select(refId, col("band"), col("key")))
      val nearPairs = lshCandidates
        .join(sigCand.select(col(idCol).as("cand_id"), col("sig").as("sc")),
          Seq("cand_id"))
        .join(maybeBroadcast(sigRef.select(col(idCol).as("ref_id"), col("sig").as("sr"))),
          Seq("ref_id"))
        .withColumn("jaccard",
          expr("aggregate(zip_with(sc, sr, (x, y) -> IF(x = y, 1, 0)), 0L, " +
               "(acc, v) -> acc + v)") / numHashes)
        .filter(col("jaccard") >= threshold)
        .select("cand_id", "ref_id", "jaccard")
      assemble(nearPairs)
    }
  }

  /** Drop every candidate similar to any reference doc (exact or
    * near-dup) — the decontaminated corpus. Anti-join on the report's
    * candidate ids: one broadcast-able join over compact ids.
    */
  def decontaminate(cand: DataFrame, ref: DataFrame, idCol: String,
                    textCol: String, threshold: Double,
                    broadcastRef: Boolean = true): DataFrame =
    cand.join(
      crossCorpusPairs(cand, ref, idCol, textCol, threshold,
        broadcastRef = broadcastRef)
        .select(col("cand_id").as(idCol)),
      Seq(idCol), "left_anti")

  /** Exact n-gram overlap decontamination report — the published
    * eval-set-contamination check (flag any training doc sharing a long
    * exact word n-gram with the benchmark set; 13-grams are the
    * convention). For each contaminated candidate: how many of its
    * distinct n-grams appear anywhere in the reference corpus, and its
    * total distinct n-gram count (for an overlap ratio downstream).
    *
    * Scale shape: the reference n-gram set is collapsed to DISTINCT
    * shingles and broadcast (an eval set is tiny next to a training
    * corpus), so the candidate corpus never shuffles — one broadcast
    * hash join over compact shingle strings plus a partial-aggregated
    * groupBy on doc id. Set `broadcastRef = false` when the reference is
    * itself corpus-sized (the join then shuffles on the shingle, which is
    * high-cardinality and well distributed).
    */
  def ngramOverlapReport(cand: DataFrame, ref: DataFrame, idCol: String,
                         textCol: String, n: Int = 13,
                         broadcastRef: Boolean = true,
                         materialize: Boolean = true): DataFrame =
    // the candidate shingle set feeds two consumers (sizes + the hit
    // join) — cached once, released after the (small) report materializes
    withShingleCache(shingles(cand, idCol, textCol, n), materialize) { candSh =>
      val refSh0 = shingles(ref, idCol, textCol, n).select("shingle").distinct()
      val refSh = if (broadcastRef) broadcast(refSh0) else refSh0
      val sizes = candSh.groupBy(col(idCol)).agg(count(lit(1)).as("n_ngrams"))
      candSh.join(refSh, Seq("shingle"))
        .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
        .join(sizes, Seq(idCol))
        .select(col(idCol).as("cand_id"), col("n_hits"), col("n_ngrams"))
    }

  /** Drop every candidate doc sharing at least one exact n-gram with the
    * reference corpus — anti-join on the compact contaminated-id set.
    *
    * LEAN FORM (optimization r17, guide §2.3/§2.4): this used to run the
    * full [[ngramOverlapReport]] and throw away everything but the ids —
    * paying the (id, shingle) DISTINCT exchange over the whole candidate
    * shingle set, the per-doc `sizes` aggregation, a shingle cache, and
    * an eager checkpoint, all for columns the anti-join drops. The drop
    * decision only needs "does ANY candidate n-gram hit the reference":
    * raw shingle rows (no distinct — duplicates cannot change the hit id
    * set), one broadcast semi-join, one distinct over the HIT ids only.
    * Identical id set (spec pins clean ≡ report-based ≡ exact);
    * [[ngramOverlapReport]] stays as-is for callers that want the
    * counts (x_decontam_ngram).
    */
  def decontaminateNgram(cand: DataFrame, ref: DataFrame, idCol: String,
                         textCol: String, n: Int = 13,
                         broadcastRef: Boolean = true): DataFrame = {
    val refSh0 = shingles(ref, idCol, textCol, n).select("shingle").distinct()
    val refSh = if (broadcastRef) broadcast(refSh0) else refSh0
    val hitIds = shingleRows(cand, idCol, textCol, n)
      .join(refSh, Seq("shingle"), "left_semi")
      .select(col(idCol)).distinct()
    cand.join(hitIds, Seq(idCol), "left_anti")
  }

  /** Memory-lean n-gram decontamination: the reference shingle set is
    * folded into a BLOOM FILTER (O(n·log(1/fpp)) bits — fixed megabytes
    * where the DISTINCT-broadcast set would be gigabytes of strings at
    * benchmark-suite scale) and shipped to every task; candidates keep
    * only docs none of whose n-grams might be in the reference.
    *
    * The trade is one-sided and safe for decontamination: a Bloom filter
    * has NO false negatives, so every truly contaminated doc is dropped —
    * false positives (rate `fpp`) drop a few clean docs too, which costs
    * training data, never eval integrity. The spec pins the no-false-
    * negative side and bounds the overkill against the exact operator.
    *
    * This public entry sizes the filter from (expectedNgrams, fpp) with
    * the standard formulas and runs the REPLAYABLE md5
    * Kirsch–Mitzenmacher path ([[decontaminateNgramBloomReplayable]]) —
    * the oracle-hashed default. Pass `murmur = true` for the
    * `DataFrameStatFunctions.bloomFilter` sketch variant
    * ([[decontaminateNgramBloomMurmur]]): same one-sided semantics,
    * xxhash-family throughput, no cross-engine replay.
    */
  def decontaminateNgramBloom(cand: DataFrame, ref: DataFrame, idCol: String,
                              textCol: String, n: Int = 13,
                              expectedNgrams: Long = 1000000L,
                              fpp: Double = 0.01,
                              murmur: Boolean = false): DataFrame =
    if (murmur)
      decontaminateNgramBloomMurmur(cand, ref, idCol, textCol, n,
        expectedNgrams, fpp)
    else {
      require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
      // m = -n·ln p / (ln 2)², k = (m/n)·ln 2 — the textbook optimum
      val m = math.ceil(
        -expectedNgrams * math.log(fpp) / (math.log(2) * math.log(2))).toLong
      require(m <= Int.MaxValue,
        s"computed $m filter bits exceeds Int range — call " +
          "decontaminateNgramBloomReplayable with explicit numBits")
      val k = math.max(1,
        math.round(m.toDouble / expectedNgrams * math.log(2)).toInt)
      decontaminateNgramBloomReplayable(cand, ref, idCol, textCol, n,
        m.toInt, k)
    }

  /** The raw-throughput Bloom variant behind [[decontaminateNgramBloom]]
    * (`murmur = true`): Spark's built-in `stat.bloomFilter` sketch probed
    * by a per-row UDF — Spark exposes no public `might_contain`
    * expression for these sketches, and the murmur bit pattern is not
    * replayable cross-engine, so the md5 bitset fold is the public
    * default and this stays the opt-in.
    */
  private[graft] def decontaminateNgramBloomMurmur(
      cand: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, n: Int = 13,
      expectedNgrams: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val spark = cand.sparkSession
    val refSh = shingles(ref, idCol, textCol, n).select("shingle").distinct()
    val bloom = refSh.stat.bloomFilter("shingle", expectedNgrams, fpp)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    // A UDF is UNAVOIDABLE here, not an oversight: Spark's built-in
    // `might_contain` expression only accepts `bloom_filter_agg` binaries
    // (never a util.sketch.BloomFilter), and the murmur bit layout has no
    // public Expression. Do not "fix" this into an expression — the
    // public, codegen-friendly default is the md5 bitset fold below;
    // this murmur variant exists only as the raw-throughput opt-in.
    val mightContain = udf((s: String) => s != null && bloomBc.value.mightContainString(s))
    val contaminated = shingleRows(cand, idCol, textCol, n)
      .filter(mightContain(col("shingle")))
      .select(col(idCol)).distinct()
    cand.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Bitset buffer for the replayable Bloom: reduce sets the k
    * double-hashed bit positions of one shingle, merge ORs — an
    * associative fold, so partial bitsets combine map-side exactly like
    * the minhash family buffers.
    */
  private final class BloomBitsAgg(numBits: Int, k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long), Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = new Array[Byte]((numBits + 7) / 8)
    override def reduce(buf: Array[Byte], in: (Long, Long)): Array[Byte] = {
      val (h1, h2) = in
      val P = Hashers.P
      var g = h1
      var i = 0
      while (i < k) {
        g += h2
        if (g >= P) g -= P
        val bit = (g % numBits).toInt
        buf(bit >> 3) = (buf(bit >> 3) | (1 << (bit & 7))).toByte
        i += 1
      }
      buf
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    override def finish(buf: Array[Byte]): Array[Byte] = buf
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  /** REPLAYABLE Bloom decontamination: same shape as
    * [[decontaminateNgramBloom]] (reference n-grams folded into one
    * broadcast bitset, candidates stream through a membership probe —
    * fixed MBs of filter state regardless of reference size), but the
    * bit positions come from the md5 Kirsch–Mitzenmacher family
    * (`bit_i = (h1 + (i+1)·h2) mod P mod numBits`) instead of an opaque
    * murmur sketch — so a SQL oracle can rebuild the EXACT bit pattern
    * and replay membership, false positives included. The engine-side
    * cost is identical (one keyed hash per shingle, k adds); choose the
    * murmur variant only when md5 throughput matters more than
    * replayability.
    *
    * One-sided like every Bloom: no false negatives (every truly
    * contaminated doc drops), false-positive rate ≈ (1−e^{−kN/m})^k.
    */
  def decontaminateNgramBloomReplayable(cand: DataFrame, ref: DataFrame,
                                        idCol: String, textCol: String,
                                        n: Int = 13, numBits: Int = 1 << 20,
                                        numHashes: Int = 7): DataFrame = {
    require(numBits > 0 && numHashes > 0, "need positive numBits/numHashes")
    val spark = cand.sparkSession
    val base = Hashers.md5Base
    val refSh = shingles(ref, idCol, textCol, n).select("shingle").distinct()
    val agg = udaf(new BloomBitsAgg(numBits, numHashes),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    val bitsRow = refSh
      .select(base.h1(col("shingle")).as("h1"), base.h2(col("shingle")).as("h2"))
      .agg(agg(col("h1"), col("h2")).as("bits"))
      .head()
    val bitsBc = spark.sparkContext.broadcast(bitsRow.getAs[Array[Byte]](0))
    val P = Hashers.P
    val k = numHashes
    val nb = numBits
    val mightContain = udf { (h1: Long, h2: Long) =>
      val bits = bitsBc.value
      var g = h1
      var all = true
      var i = 0
      while (i < k && all) {
        g += h2
        if (g >= P) g -= P
        val bit = (g % nb).toInt
        all = (bits(bit >> 3) & (1 << (bit & 7))) != 0
        i += 1
      }
      all
    }
    val contaminated = shingleRows(cand, idCol, textCol, n)
      .select(col(idCol), base.h1(col("shingle")).as("h1"),
        base.h2(col("shingle")).as("h2"))
      .filter(mightContain(col("h1"), col("h2")))
      .select(col(idCol)).distinct()
    cand.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Embedding-space (semantic) decontamination report — the semantic
    * member of the decontamination family ([[ngramOverlapReport]] is the
    * exact-text member): for each corpus vector, how many reference
    * (eval-set) vectors sit at cosine ≥ `thresholdNum/thresholdDen`, and
    * the resulting contaminated flag. A paraphrased eval item shares no
    * 8-gram with its source but still lands next to it in embedding
    * space, which is what this catches.
    *
    * Candidates come from shared quantized-hyperplane LSH buckets
    * ([[Similarity.hyperplaneSignatures]] — `tables` independent tables
    * of `planes` sign bits over exact integer dots), verified with the
    * same exact rational-threshold test as [[semanticDedup]]:
    * `cos ≥ n/d ⟺ dq ≥ 0 ∧ dq²·d² ≥ n²·na2·nb2`, every term an exact
    * integer evaluated in DECIMAL(38,0) — no float sits on the decision
    * boundary, so the DuckDB oracle replays the whole pipeline
    * hash-exactly. (Zero vectors — cosine undefined — trivially pass the
    * test, as in [[semanticDedup]]; callers who care filter them first.)
    *
    * 100 TB shape: the reference side is an eval/benchmark suite —
    * thousands of vectors, not billions — so its signatures AND its
    * quantized vectors are broadcast; the corpus streams through one
    * scan-and-project per side of the candidate join and never shuffles
    * its embeddings (only compact `(id, rid)` candidate rows and the
    * final per-id hit counts move). `maxRefBucket` drops reference
    * (table, sig) buckets larger than the cap — a degenerate signature
    * (all-zero eval vectors) would otherwise fan every matching corpus
    * row out to the whole bucket.
    */
  def embeddingDecontam(corpus: DataFrame, ref: DataFrame, idCol: String,
                        vecCol: String, thresholdNum: Long = 3L,
                        thresholdDen: Long = 5L, tables: Int = 16,
                        planes: Int = 8,
                        maxRefBucket: Option[Int] = Some(100)): DataFrame = {
    import graft.functions.VectorFunctions.vec_dot
    require(thresholdDen > 0 && thresholdNum >= 0,
      "embeddingDecontam: threshold must be a non-negative rational")
    val sigC = Similarity.hyperplaneSignatures(corpus, idCol, vecCol, tables, planes)
    val sigR0 = Similarity.hyperplaneSignatures(ref, idCol, vecCol, tables, planes)
      .select(col("id").as("rid"), col("t"), col("sig"))
    val sigR = maxRefBucket match {
      case Some(cap) =>
        val w = Window.partitionBy("t", "sig")
        sigR0.withColumn("__bn", count(lit(1)).over(w))
          .filter(col("__bn") <= cap).drop("__bn")
      case None => sigR0
    }
    val cand = sigC.join(broadcast(sigR), Seq("t", "sig"))
      .select(col("id"), col("rid")).distinct()
    val qc = quantizedWithNorm(corpus, idCol, vecCol)
    val qr = quantizedWithNorm(ref, idCol, vecCol)
      .select(col("id").as("rid"), col("q").as("__qr"), col("nq2").as("__nr2"))
    val dec = "decimal(38,0)"
    val dq = vec_dot(col("q"), col("__qr"))
    val dqd = dq.cast(dec)
    val isHit = dq >= 0 &&
      dqd * dqd * lit(thresholdDen * thresholdDen).cast(dec) >=
        lit(thresholdNum * thresholdNum).cast(dec) *
          col("nq2").cast(dec) * col("__nr2").cast(dec)
    val hits = cand
      .join(qc.withColumnRenamed("id", "__cid"), col("id") === col("__cid"))
      .drop("__cid")
      .join(broadcast(qr), Seq("rid"))
      .filter(isHit)
      .groupBy("id").agg(count(lit(1)).as("n_ref_hits"))
    // report base = EVERY corpus row, including null-vector rows (which
    // cannot be contaminated — quantizedWithNorm drops them from the
    // candidate side, so they flag false); the oracle keeps them too
    corpus.select(col(idCol).cast("long").as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_ref_hits"), lit(0L)).as("n_ref_hits"))
      .withColumn("contaminated", col("n_ref_hits") > 0)
  }

  /** Append-batch (incremental) dedup report: for each doc of a SMALL new
    * `batch`, whether it duplicates the BIG existing `corpus` (exact text
    * or LSH-mined near-dup at `threshold`) and whether it duplicates an
    * EARLIER doc of the same batch (smaller id wins, greedy along chains)
    * — the daily-ingest primitive that dedups an increment without ever
    * re-mining the full corpus. Output: (id, dup_of_corpus, dup_in_batch,
    * keep = neither).
    *
    * 100 TB shape: vs-corpus mining is [[crossCorpusPairs]] with the
    * roles swapped — the batch is the broadcast reference side, so the
    * corpus STREAMS through one scan (band keys + md5 probes against
    * broadcast batch tables) and is never shuffled; cost is O(corpus
    * scan) per increment, independent of corpus pair structure.
    * Intra-batch mining runs [[minhashLshPairs]] on the increment alone.
    */
  def incrementalDedup(batch: DataFrame, corpus: DataFrame, idCol: String,
                       textCol: String, threshold: Double = 0.7,
                       numHashes: Int = 128, bands: Int = 16, n: Int = 3,
                       base: Hashers.Base = Hashers.xx64Base,
                       maxBucketSize: Option[Int] = Some(100),
                       verifyExact: Boolean = true): DataFrame = {
    // The batch is mined twice — against the corpus and against itself —
    // and the signature aggregation is the expensive half of each miner:
    // shingle + sign the batch ONCE and hand both miners the same
    // artifacts (round-4 finding: the double signing was the bench's
    // single largest line; one pass is ~2× on this entry).
    val shBatch0 = shingles(batch, idCol, textCol, n)
    val (preBatch, release): (PreSigned, () => Unit) =
      if (verifyExact) {
        // shingles feed band-key signing + both verify joins → cache;
        // band keys feed both miners → eager-checkpoint (compact rows)
        val shBatch = shBatch0.cache()
        val bBatch = bandKeysFromShingles(shBatch, idCol, numHashes, bands, base)
          .localCheckpoint(true)
        (PreSigned(shBatch, bBatch), () => { shBatch.unpersist(false); () })
      } else {
        // estimator verify reads signatures, not shingles: checkpoint the
        // signatures (fixed-width rows) and derive the shared band keys
        val sigBatch = signaturesFromShingles(shBatch0, idCol, numHashes, base)
          .localCheckpoint(true)
        val bBatch = bandKeysFromSignatures(sigBatch, idCol, numHashes, bands)
          .localCheckpoint(true)
        (PreSigned(shBatch0, bBatch, Some(sigBatch)), () => ())
      }
    try {
      // every pair over the threshold, NOT the per-corpus-doc argmax — the
      // flag below is "was this batch doc hit at all"
      val vsCorpus = crossCorpusPairsPre(corpus, batch, idCol, textCol,
        threshold, numHashes, bands, n, base, maxBucketSize,
        broadcastRef = true, materialize = true, verifyExact = verifyExact,
        bestMatchOnly = false, preRef = Some(preBatch))
      val hitByCorpus = vsCorpus.select(col("ref_id").as(idCol)).distinct()
      // within the batch: near pairs (the LATER doc of each mined pair is
      // the duplicate) plus exact text groups (catches docs below the
      // shingle window, where LSH is blind)
      val intraNear = minhashLshPairsPre(batch, idCol, textCol, threshold,
          numHashes, bands, n, base, maxBucketSize, materialize = true,
          verifyExact = verifyExact, pre = Some(preBatch))
        .select(col("b").as(idCol))
      val intraExact = batch
        .select(col(idCol), md5(col(textCol)).as("__h"))
        .withColumn("__lo", min(col(idCol)).over(Window.partitionBy("__h")))
        .filter(col(idCol) =!= col("__lo"))
        .select(col(idCol))
      val intraDup = intraNear.union(intraExact).distinct()
      batch.select(col(idCol))
        .join(hitByCorpus.withColumn("__c", lit(true)), Seq(idCol), "left")
        .join(intraDup.withColumn("__b", lit(true)), Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("__c"), lit(false)).as("dup_of_corpus"),
          coalesce(col("__b"), lit(false)).as("dup_in_batch"))
        .withColumn("keep", !col("dup_of_corpus") && !col("dup_in_batch"))
    } finally release()
  }

  /** Connected components over a near-dup pair list → duplicate clusters:
    * every doc in a component gets `cluster_id` = the component's minimum
    * doc id, plus the member count and a `keep` flag on the canonical
    * (minimum-id) doc — the standard "keep one per dup cluster" curation
    * step downstream of LSH/Jaccard pair mining.
    *
    * Algorithm: min-label propagation with pointer jumping. Labels are
    * initialized to `min(id, min neighbor id)` straight off the edge list
    * (one aggregation — already the distance-1 fixpoint); each round then
    * (a) takes the min of each node's and its neighbors' labels and
    * (b) jumps `label := label(label)` through the label table, so the
    * reach roughly doubles per round — O(log diameter) rounds instead of
    * O(diameter). Every round shuffles only compact (id, label) pairs,
    * never documents, and costs exactly ONE Spark action: the previous
    * label rides along as `old`, the round's lazy `localCheckpoint` is
    * materialized by the change-count itself, and convergence = zero
    * changed labels (labels only ever decrease, so unchanged-everywhere =
    * fixpoint; jumping never skips it — any stored label is a same-
    * component node id, a valid upper bound of the component min). An
    * iterative loop lives or dies on per-round driver latency under a
    * loaded scheduler, so rounds-times-actions is the number to minimize.
    * Docs that appear in no pair are absent (they are their own cluster
    * by definition).
    */
  def duplicateClusters(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
                        maxIter: Int = 12): DataFrame = {
    // NOTE (r16 optimization round, measured and REJECTED): pinning the
    // edge list hash-partitioned + sorted by src and re-partitioning
    // each labels iterate by id makes every per-round join exchange-free
    // on paper (guide §2.4) — but it forces every round onto the static
    // shuffle-partition count, defeating AQE's coalescing of these tiny
    // label exchanges, and measured ~2× SLOWER end-to-end
    // (x_knn_components 5.6 → 10.9 s, x_dedup_clusters 3.5 → 4.8 s
    // isolated steady-state). The rounds shuffle compact (id, label)
    // pairs; AQE-sized exchanges beat statically co-partitioned ones
    // here. Kept as the simple form below.
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(true)
    val labelType = edges.schema("src").dataType
    var labels = edges.groupBy("src").agg(min("dst").as("nmin"))
      .select(col("src").as("id"), least(col("src"), col("nmin")).as("label"))
      .localCheckpoint(false) // lazy: round 1's action materializes it once
    var converged = false
    var i = 0
    // `maxIter` bounds the IMPROVING rounds; the `<=` grants one extra
    // confirmation round, so a graph whose fixpoint lands exactly on the
    // last improving round still certifies (zero changes) instead of
    // tripping the unconverged guard below.
    while (!converged && i <= maxIter) {
      val msgs = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
      // Propagate neighbor minima; `old` (each node's previous label,
      // unique per id — msgs contribute NULL, which max() ignores) rides
      // along so the convergence count needs no second join.
      val prop = labels.select(col("id"), col("label"), col("label").as("old"))
        .unionByName(msgs.withColumn("old", lit(null).cast(labelType)))
        .groupBy("id").agg(min("label").as("label"), max("old").as("old"))
      // Pointer jump: follow the propagated label one hop through the
      // previous label table (left join — the label may be its own root).
      val next = prop.as("p")
        .join(labels.as("l"), col("p.label") === col("l.id"), "left")
        .select(col("p.id").as("id"),
          least(col("p.label"), coalesce(col("l.label"), col("p.label")))
            .as("label"),
          col("p.old").as("old"))
        .localCheckpoint(false)
      // The one action of the round: materializes the checkpoint and
      // counts moved labels in the same job.
      converged = next.filter(col("label") =!= col("old")).count() == 0
      labels = next.select("id", "label")
      i += 1
    }
    // With pointer jumping, maxIter=12 covers diameters into the
    // thousands; hitting it unconverged means the graph is not what a
    // near-dup pair list looks like. Unconverged labels are silently
    // WRONG cluster ids — fail loudly instead of deduping incorrectly.
    if (!converged)
      throw new IllegalStateException(
        s"duplicateClusters still improving after $maxIter rounds " +
        "(plus a confirmation round); raise maxIter for graphs with " +
        "extreme diameter")
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("n_members"))
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .join(sizes.select(col("label").as("cluster_id"), col("n_members")),
        Seq("cluster_id"))
      .withColumn("keep", col("doc_id") === col("cluster_id"))
      .select("doc_id", "cluster_id", "n_members", "keep")
  }

  /** Re-pick each duplicate cluster's canonical doc by an explicit quality
    * score instead of [[duplicateClusters]]' min-id default: highest
    * `scoreCol` wins, ties break to the smallest id — "keep the best copy,
    * not the first copy", the curation policy real pipelines want when dup
    * clusters mix truncated/boilerplate variants with the full document.
    *
    * `clusters` is [[duplicateClusters]] output; `scores` maps `idCol` →
    * `scoreCol`. The rank window partitions by cluster id — a dup cluster
    * is orders of magnitude smaller than the corpus (and bounded by the
    * upstream bucket/shingle caps), so no partition is ever hot.
    */
  def bestPerCluster(clusters: DataFrame, scores: DataFrame, idCol: String,
                     scoreCol: String): DataFrame = {
    // LEFT join + nulls-last rank: a member missing from the scores table
    // stays in the output (unscored docs lose ties but are never silently
    // dropped — n_members must keep matching the emitted rows)
    val w = Window.partitionBy("cluster_id")
      .orderBy(col(scoreCol).desc_nulls_last, col(idCol))
    clusters.drop("keep")
      .join(scores.select(col(idCol), col(scoreCol)), Seq(idCol), "left")
      .withColumn("__rk", row_number().over(w))
      .withColumn("keep", col("__rk") === 1)
      .drop("__rk")
  }

  /** SimHash bit signature (numBits ≤ 32, hex-nibble votes from md5):
    * bit i is 1 iff the majority of tokens have md5 nibble i ≥ 8.
    * Output: id, simhash (bit string, MSB first).
    */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        numBits: Int = 16): DataFrame = {
    require(numBits <= 32, "md5 hex has 32 nibbles")
    val toks = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val votes = (0 until numBits).map(i =>
      sum(when(substring(col("h"), i + 1, 1) >= "8", 1).otherwise(-1)).as(s"v$i"))
    toks.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), concat(
        (0 until numBits).map(i =>
          when(col(s"v$i") >= 0, "1").otherwise("0")): _*).as("simhash"))
  }

  /** SimHash from xxhash64 bit votes — the production variant: one native
    * hash per token (vs. an md5 digest), up to 64 signature bits, no
    * cross-engine replay. Bit i votes +1 iff bit i of xxhash64(token) is
    * set.
    */
  def simhashSignaturesXx(docs: DataFrame, idCol: String, textCol: String,
                          numBits: Int = 32): DataFrame = {
    require(numBits <= 64, "xxhash64 has 64 bits")
    val toks = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until numBits).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$i"))
    toks.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), concat(
        (0 until numBits).map(i =>
          when(col(s"v$i") >= 0, "1").otherwise("0")): _*).as("simhash"))
  }

  /** Embedding near-dup: top `k` most-similar pairs (a < b) by cosine,
    * EXACT all-pairs scoring. Quadratic by definition — the bounded-input
    * verification primitive (recall measurement, spec fixtures). At corpus
    * scale use [[embeddingTopPairsLsh]].
    */
  def embeddingTopPairs(emb: DataFrame, idCol: String, vecCol: String,
                        k: Int): DataFrame =
    rankTopPairs(Similarity.allPairsCosine(emb, idCol, vecCol), k)

  /** Embedding near-dup top pairs at scale: quantized-hyperplane LSH
    * buckets generate candidate pairs (never the corpus×corpus product),
    * candidates are exactly re-ranked by cosine, and the global top-k
    * plans as TakeOrderedAndProject. Approximate by design: a true
    * near-dup pair (high cosine) collides in some table with probability
    * ≈1 at the default 16-table banding; unrelated pairs rarely do. The
    * spec pins recall=1 on planted near-dup fixtures against the exact
    * [[embeddingTopPairs]]. `planes = 0` (the default) derives the bit
    * budget from the corpus count —
    * [[Similarity.hyperplaneCandidatePairs]]' corpus-sized default.
    */
  def embeddingTopPairsLsh(emb: DataFrame, idCol: String, vecCol: String,
                           k: Int, tables: Int = 16, planes: Int = 0,
                           maxBucketSize: Option[Int] = Some(100)): DataFrame = {
    import graft.functions.VectorFunctions.vec_norm
    val cands = Similarity.hyperplaneCandidatePairs(
      emb, idCol, vecCol, tables, planes, maxBucketSize)
    val va = emb.select(col(idCol).as("a"), col(vecCol).as("__va"),
      vec_norm(col(vecCol)).as("__na"))
    val vb = emb.select(col(idCol).as("b"), col(vecCol).as("__vb"),
      vec_norm(col(vecCol)).as("__nb"))
    val scored = cands.join(va, Seq("a")).join(vb, Seq("b"))
      .withColumn("cosine",
        graft.functions.VectorFunctions.vec_dot(col("__va"), col("__vb")) /
          (col("__na") * col("__nb")))
      .select("a", "b", "cosine")
    rankTopPairs(scored, k)
  }

  /** Global top-k of a (a, b, cosine) pair set as sort+limit —
    * TakeOrderedAndProject (distributed per-partition top-k, k-row driver
    * merge), never a single-partition global Window over every pair. The
    * rank window after the limit runs over only k rows.
    */
  private def rankTopPairs(scored: DataFrame, k: Int): DataFrame = {
    val top = scored.orderBy(col("cosine").desc, col("a"), col("b")).limit(k)
    val w = Window.orderBy(col("cosine").desc, col("a"), col("b"))
    top.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("a", "b", "rank")
  }

  // ------------------------------------------------------ semantic dedup

  /** Quantized corpus with per-vector self-dot: `(id, q, nq2)` where `q`
    * is the exact `floor(x·10⁶)` integer copy of the embedding (carried as
    * doubles — every value and dot-product sum stays far below 2⁵³, so the
    * arithmetic is EXACT and engine-independent) and `nq2 = q·q`.
    */
  /** Cell-cohesion report — index observability for the semantic-cell
    * pillar: per cell, how tightly its members align with the centroid
    * they were assigned to. The health check behind IVF/SemDeDup
    * parameter choices: a cell whose min own-dot is ≤ 0 holds
    * anti-aligned members (assignment by least-bad centroid — nlist too
    * small), and a huge max/min spread marks a cell that needs
    * splitting. Exact: member→own-centroid dots are integer lattice
    * values (the same one [[graft.functions.VecDotMatrix]] pass that
    * assigns cells also yields the dot — one projection, no second
    * scoring scan), so the whole report hash-verifies.
    *
    * Output per cell: (cell, n_members, sum_dot, min_dot, max_dot,
    * n_antialigned).
    */
  def cellCohesionReport(emb: DataFrame, idCol: String, vecCol: String,
                         nlist: Int): DataFrame = {
    import graft.functions.VectorFunctions.{vec_dot_matrix, vec_arg_max_id}
    val base = quantizedWithNorm(emb, idCol, vecCol)
    val cents = base.filter(col("nq2") > 0).orderBy("id").limit(nlist)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
    require(cents.nonEmpty, "cellCohesionReport: no non-zero vectors to seed centroids")
    // centroid id → 1-based slot in the dot array, as a map literal
    val slotOf = map(cents.zipWithIndex.flatMap { case ((cid, _, _), i) =>
      Seq(lit(cid), lit(i + 1)) }: _*)
    base
      .withColumn("__cd", vec_dot_matrix(col("q"), cents.map(_._2.toArray)))
      .withColumn("cell", vec_arg_max_id(
        col("__cd"), lit(1.0), cents.map(c => math.sqrt(c._3)), cents.map(_._1)))
      .withColumn("own_dot",
        element_at(col("__cd"), element_at(slotOf, col("cell"))).cast("long"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_members"),
        sum("own_dot").as("sum_dot"),
        min("own_dot").as("min_dot"),
        max("own_dot").as("max_dot"),
        sum(when(col("own_dot") <= 0, 1L).otherwise(0L)).as("n_antialigned"))
  }

  /** Signature-registry health report — observability symmetry with
    * `describeIvf`/`describePq`: document count, parquet FILE census
    * (append-heavy registries accumulate small files; this is the gauge
    * a compaction policy reads), signature-width bounds (a mixed-width
    * registry means two incompatible hash configs got appended — the
    * serve would silently under-agree), and pending tombstones. One
    * listing-sized aggregation over the artifact.
    */
  def describeSigRegistry(spark: org.apache.spark.sql.SparkSession,
                          path: String): DataFrame = {
    // input_file_name() must be projected BEFORE the aggregate (a
    // non-deterministic expression cannot sit inside countDistinct).
    // The sigs dir is pointer-resolved: compactions publish versioned
    // (a never-compacted registry resolves to the plain layout).
    val sigs = spark.read.parquet(AnnIndex.resolveDir(spark, path, "sigs"))
      .withColumn("__file", input_file_name())
    val tombs = spark.read.parquet(s"$path/tombstones")
    sigs.agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__file")).as("n_files"),
        min(size(col("sig"))).cast("long").as("sig_width_min"),
        max(size(col("sig"))).cast("long").as("sig_width_max"))
      .crossJoin(tombs.agg(count(lit(1)).as("n_tombstones")))
  }

  /** The registry's pending tombstone set (distinct ids), if any —
    * the sidecar load every registry read path does FIRST, before
    * resolving the sigs version pointer (the AnnIndex serve-ordering
    * rule: compact publishes the folded version, THEN resets the
    * sidecar, so sidecar-before-pointer can never pair an old unfolded
    * directory with an already-reset sidecar).
    */
  private def loadSigTombstones(spark: org.apache.spark.sql.SparkSession,
                                path: String,
                                idCol: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      Some(spark.read.parquet(s"$path/tombstones")
        .select(col(idCol)).distinct())
    else None
  }

  /** Append a signature batch to a persisted registry — the O(batch)
    * ingest verb. The write lands in the CURRENT sigs version
    * (pointer-resolved): after a versioned compact the plain `sigs/`
    * directory is the RETAINED PREVIOUS version, and a direct-path
    * write there would silently vanish from every serve.
    */
  def appendSignatures(sigs: DataFrame, path: String): Unit =
    sigs.write.mode("append").parquet(
      AnnIndex.resolveDir(sigs.sparkSession, path, "sigs"))

  /** Append takedown ids to the registry's tombstone sidecar — O(ids),
    * the deletion-vector convention; [[compactSigRegistry]] folds it.
    */
  def tombstoneSignatures(ids: DataFrame, path: String,
                          idCol: String = "doc_id"): Unit =
    ids.select(col(idCol)).distinct()
      .write.mode("append").parquet(s"$path/tombstones")

  /** Compact a persisted signature registry — the VACUUM of the dedup
    * artifact lifecycle, symmetric with `AnnIndex.ivfCompact`: fold the
    * tombstone sidecar into the sigs table (broadcast anti-join on the
    * registry's id column), rewrite the append history's small files at
    * `targetBytes` granularity (the [[graft.operators.Scale.compactParquet]]
    * sizing rule — file count derived from the actual byte footprint, no
    * data pass), publish through the SAME versioned-dir + atomic
    * pointer-manifest flip the ANN compactions use (a reader racing the
    * compact resolves either the old or the new COMPLETE directory —
    * never a missing one — and a failed rewrite leaves the serving
    * registry untouched), then RESET the sidecar to an empty
    * schema-bearing file — [[describeSigRegistry]] reads it
    * unconditionally, so clearing must not delete the directory.
    * Readers resolve the serving dir via `AnnIndex.resolveDirPath(path,
    * "sigs")`; a never-compacted registry has no manifest and resolves
    * to the plain `sigs/` layout, so existing artifacts need no change.
    */
  def compactSigRegistry(spark: org.apache.spark.sql.SparkSession,
                         path: String, idCol: String = "doc_id",
                         targetBytes: Long = 128L << 20): Unit = {
    require(targetBytes >= 1L, s"targetBytes must be >= 1, got $targetBytes")
    if (hasSigMeta(spark, path)) {
      compactSigRegistryPartitioned(spark, path, idCol)
      return
    }
    // sidecar BEFORE pointer (see loadSigTombstones); checkpointed so
    // the frame outlives the sidecar reset below
    val tombs = loadSigTombstones(spark, path, idCol)
      .map(_.localCheckpoint(true))
    val sigsDir = AnnIndex.resolveDir(spark, path, "sigs")
    val sigsPath = new org.apache.hadoop.fs.Path(sigsDir)
    val fs = sigsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = tombs.fold(spark.read.parquet(sigsDir))(t =>
      spark.read.parquet(sigsDir)
        .join(broadcast(t), Seq(idCol), "left_anti"))
    val bytes = fs.getContentSummary(sigsPath).getLength
    val parts = math.max(1L, (bytes + targetBytes - 1L) / targetBytes).toInt
    val stage = s"$path/sigs__stage"
    live.repartition(parts).write.mode("overwrite").parquet(stage)
    AnnIndex.publishVersioned(spark, path, "sigs", stage)
    // sidecar reset AFTER the pointer flip: empty but schema-bearing
    tombs.foreach(t =>
      t.limit(0).coalesce(1).write.mode("overwrite")
        .parquet(s"$path/tombstones"))
  }

  /** The band-partitioned registry's compact: fold the tombstone
    * sidecar into BOTH components — the `sp=`-partitioned signature
    * table and the `bk=`-partitioned band rows — each rewritten to one
    * file per bucket (the writeCells small-files rule) and published
    * through the shared versioned pointer flip, sigs FIRST then bands
    * (a racing serve that resolves old bands against new sigs only
    * loses already-deleted candidates at the verify join — never gains
    * a wrong pair). Sidecar reset AFTER both flips.
    */
  private def compactSigRegistryPartitioned(
      spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String): Unit = {
    val tombs = loadSigTombstones(spark, path, idCol)
      .map(_.localCheckpoint(true))
    def fold(df: DataFrame): DataFrame =
      tombs.fold(df)(t => df.join(broadcast(t), Seq(idCol), "left_anti"))
    def rewrite(name: String, partCol: String): Unit = {
      val out = fold(spark.read.parquet(
        AnnIndex.resolveDir(spark, path, name)))
      val stage = s"$path/${name}__stage"
      // empty-fold rule: a plain schema-bearing file (the partitioned
      // write of an empty frame drops the schema); serve's rooted read
      // falls back to the generic read on an unpartitioned layout
      if (out.isEmpty)
        out.coalesce(1).write.mode("overwrite").parquet(stage)
      else
        out.repartition(col(partCol))
          .write.mode("overwrite").partitionBy(partCol).parquet(stage)
      AnnIndex.publishVersioned(spark, path, name, stage)
    }
    rewrite("sigs", "sp")
    rewrite("bands", "bk")
    tombs.foreach(t =>
      t.limit(0).coalesce(1).write.mode("overwrite")
        .parquet(s"$path/tombstones"))
  }

  /** Thresholded auto-compaction for the signature registry — the ACTOR
    * behind [[describeSigRegistry]]'s gauges, `AnnIndex.ivfCompactIfNeeded`'s
    * dedup sibling, sharing the ONE trigger implementation
    * (`AnnIndex.compactionDue`) so the five policy verbs can never
    * drift: fires [[compactSigRegistry]] when the sigs file census
    * exceeds `maxFiles` (small-files pressure — every serve scans the
    * registry once) or pending tombstones exceed `maxTombstoneFracPct`
    * percent of stored rows (every serve anti-joins the sidecar). A
    * quiet registry prices as one listing. Returns whether a compact ran.
    */
  def sigRegistryCompactIfNeeded(spark: org.apache.spark.sql.SparkSession,
                                 path: String, idCol: String = "doc_id",
                                 maxFiles: Long = 512,
                                 maxTombstoneFracPct: Int = 20,
                                 targetBytes: Long = 128L << 20): Boolean = {
    // sidecar BEFORE pointer (see loadSigTombstones)
    val tombs = loadSigTombstones(spark, path, idCol)
    val go = AnnIndex.compactionDue(spark,
      AnnIndex.resolveDir(spark, path, "sigs"), tombs,
      maxFiles, maxTombstoneFracPct)
    if (go) compactSigRegistry(spark, path, idCol, targetBytes)
    go
  }

  // --------------------- band-partitioned signature registry (r16)

  /** The partitioned registry's stored identity: the hash config that
    * signed it (a serve MUST re-sign its batch with the same family or
    * it silently under-agrees on everything) plus the two bucket
    * counts that define the physical layout.
    */
  private[graft] final case class SigRegMeta(numHashes: Int, bands: Int,
                                             shingleN: Int, baseName: String,
                                             bandBuckets: Int,
                                             sigBuckets: Int)

  private[graft] val SigBaseByName: Map[String, Hashers.Base] =
    Map("md5" -> Hashers.md5Base, "xx64" -> Hashers.xx64Base)

  private def nameOfBase(b: Hashers.Base): String =
    if (b eq Hashers.md5Base) "md5"
    else if (b eq Hashers.xx64Base) "xx64"
    else throw new IllegalArgumentException(
      "sig registry: base must be Hashers.md5Base or Hashers.xx64Base — " +
        "the registry persists the family NAME so serves replay it")

  /** Band-key bucket: which `bands/bk=` partition a (band, key) row
    * lives in. Shared by build, append, and serve — the three can never
    * disagree on routing.
    */
  private def bkOf(bandBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col("band"), col("key")), lit(bandBuckets.toLong))

  /** Signature bucket: which `sigs/sp=` partition a doc's signature
    * row lives in.
    */
  private def spOf(idCol: String, sigBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col(idCol)), lit(sigBuckets.toLong))

  private[graft] def hasSigMeta(spark: org.apache.spark.sql.SparkSession,
                                path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/meta")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private[graft] def readSigMeta(spark: org.apache.spark.sql.SparkSession,
                                 path: String): SigRegMeta = {
    require(hasSigMeta(spark, path),
      s"sig registry at $path has no meta — not a band-partitioned " +
        "registry; build one with buildSigRegistry, or serve a plain " +
        "signature frame via dedupeAgainstSignatures")
    val r = spark.read.parquet(s"$path/meta").head()
    SigRegMeta(r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3),
      r.getInt(4), r.getInt(5))
  }

  /** Build a BAND-PARTITIONED signature registry — the serve-scalable
    * form of the flat `sigs/` artifact. The flat registry's serve is one
    * LINEAR scan: every batch re-derives band keys (16 md5 folds per
    * stored doc) over the whole registry and then re-joins the whole
    * signature table for verification — measured 6.36×/decade at the
    * synthesized sf100 sweep, the worst serve ratio in the engine. Here
    * the ingest pays that derivation ONCE and the layout turns both
    * serve reads into rooted partition scans (the `ivfServe` cid
    * discipline):
    *
    *   - `bands/` partitioned by `bk = hash(band, key) mod bandBuckets`:
    *     the candidate-mining rows (doc, band, key) — ~24 B each, the
    *     COMPACT scan floor; a serve lists and reads only the buckets
    *     its batch keys hash into.
    *   - `sigs/` partitioned by `sp = hash(id) mod sigBuckets`: the
    *     ~1 KB/doc signature rows, read ONLY for the candidates'
    *     buckets at verify time — the bulk bytes never stream past a
    *     serve that found few candidates.
    *   - `meta/` pins the hash family + layout so appends and serves
    *     can never sign with a drifted config.
    *
    * Both bucket counts should grow with the corpus (√n posture, like
    * nlist); they are build-time identity, changed only by rebuild.
    * Tombstones reset empty (a rebuild's membership is exactly the
    * corpus given); maintenance shares the versioned-publish lifecycle
    * ([[compactSigRegistry]] folds BOTH components).
    */
  def buildSigRegistry(corpus: DataFrame, idCol: String, textCol: String,
                       path: String, numHashes: Int = 128, bands: Int = 16,
                       n: Int = 3, base: Hashers.Base = Hashers.xx64Base,
                       bandBuckets: Int = 64, sigBuckets: Int = 32): Unit =
    buildSigRegistryFromSignatures(
      signaturesFromShingles(shingles(corpus, idCol, textCol, n),
        idCol, numHashes, base),
      idCol, path, numHashes, bands, n, nameOfBase(base),
      bandBuckets, sigBuckets)

  /** [[buildSigRegistry]] from a PRECOMPUTED (id, sig) frame — the
    * signature-migration path (an existing flat registry re-homed into
    * the partitioned layout without re-reading any corpus text). The
    * hash-config metadata is caller-asserted: it must describe how the
    * signatures were actually made, or serves silently under-agree.
    */
  private[graft] def buildSigRegistryFromSignatures(sigs: DataFrame,
      idCol: String, path: String, numHashes: Int, bands: Int,
      shingleN: Int, baseName: String, bandBuckets: Int,
      sigBuckets: Int): Unit = {
    require(bandBuckets >= 1 && sigBuckets >= 1,
      s"buildSigRegistry: bucket counts must be >= 1, got ($bandBuckets, $sigBuckets)")
    require(SigBaseByName.contains(baseName),
      s"buildSigRegistry: unknown base '$baseName'")
    val spark = sigs.sparkSession
    spark.createDataFrame(Seq(
        (numHashes, bands, shingleN, baseName, bandBuckets, sigBuckets)))
      .toDF("num_hashes", "bands", "shingle_n", "base_name",
        "band_buckets", "sig_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    AnnIndex.publishBuild(spark, path, "sigs") { stage =>
      sigs.withColumn("sp", spOf(idCol, sigBuckets))
        .repartition(col("sp"))
        .write.mode("overwrite").partitionBy("sp").parquet(stage)
    }
    // band keys derive from the PERSISTED signatures — disk is the
    // source of truth (the AnnIndex build discipline): a build that
    // signed one thing and banded another would be caught by the
    // serve-equals-plain gates
    val persisted = spark.read
      .parquet(AnnIndex.resolveDir(spark, path, "sigs"))
    AnnIndex.publishBuild(spark, path, "bands") { stage =>
      compactKey(bandKeysFromSignatures(persisted, idCol, numHashes, bands))
        .withColumn("bk", bkOf(bandBuckets))
        .repartition(col("bk"))
        .write.mode("overwrite").partitionBy("bk").parquet(stage)
    }
    sigs.select(col(idCol)).limit(0)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/tombstones")
  }

  /** Stored band keys are the md5 BYTES, not the hex string: 16 B vs a
    * 32-char string — the bands table is the per-serve scan floor, and
    * hex→binary is a bijection so every equality (mining join, bucket
    * cap) is unchanged. Serve re-applies the same transform to its
    * batch keys.
    */
  private def compactKey(df: DataFrame): DataFrame =
    df.withColumn("key", unhex(col("key")))

  /** O(batch) ingest into a band-partitioned registry: the batch is
    * signed ONCE under the registry's pinned hash config, and both
    * components land append-mode in their hash-routed partitions — no
    * rewrite, no registry scan. The pointer-resolved dirs are the write
    * targets (a direct-path write after a versioned compact would
    * vanish from every serve).
    */
  def appendSigRegistry(batch: DataFrame, idCol: String, textCol: String,
                        path: String): Unit = {
    val spark = batch.sparkSession
    val m = readSigMeta(spark, path)
    val base = SigBaseByName(m.baseName)
    val sigs = signaturesFromShingles(
        shingles(batch, idCol, textCol, m.shingleN),
        idCol, m.numHashes, base)
      .localCheckpoint(true) // two consumers: sigs write + band derive
    // repartition on the bucket column: ONE appended file per touched
    // bucket, not (tasks × buckets) shards — the writeCells rule
    sigs.withColumn("sp", spOf(idCol, m.sigBuckets))
      .repartition(col("sp"))
      .write.mode("append").partitionBy("sp")
      .parquet(AnnIndex.resolveDir(spark, path, "sigs"))
    compactKey(bandKeysFromSignatures(sigs, idCol, m.numHashes, m.bands))
      .withColumn("bk", bkOf(m.bandBuckets))
      .repartition(col("bk"))
      .write.mode("append").partitionBy("bk")
      .parquet(AnnIndex.resolveDir(spark, path, "bands"))
  }

  /** Dedup-serve an arriving batch against a band-partitioned registry
    * — row-identical to [[dedupeAgainstSignatures]] over the same live
    * membership (spec-pinned), but the registry work is partition-rooted
    * instead of linear:
    *
    *   1. the batch is signed once (bounded, checkpointed) and its band
    *      keys' bucket ids collect driver-side — ≤ bandBuckets longs,
    *      never the keys themselves;
    *   2. the `bands/` read is ROOTED at the touched `bk=` dirs (one
    *      shallow listing, the [[AnnIndex.ivfServe]] discipline) with
    *      the literal IN-filter on top as the pruning gate; candidate
    *      mining joins the broadcast batch keys inside those buckets
    *      only — band keys are never re-derived from stored signatures;
    *   3. pending tombstones anti-join the pruned band rows BEFORE the
    *      bucket cap (so a sidecar-suppressed serve equals the
    *      compacted-fold serve row for row);
    *   4. the bounded candidate set's signature buckets collect
    *      driver-side (≤ sigBuckets longs) and the `sigs/` verify read
    *      roots at exactly those `sp=` dirs — the registry's bulk bytes
    *      are touched only where candidates actually live.
    *
    * Output: (idCol = batch doc, corpus_id, n_agree), one row per
    * flagged pair — the [[dedupeAgainstSignatures]] contract.
    */
  def serveSigRegistry(spark: org.apache.spark.sql.SparkSession,
                       path: String, batch: DataFrame, idCol: String,
                       textCol: String, threshold: Double = 0.7,
                       maxBucketSize: Option[Int] = Some(100)): DataFrame = {
    val m = readSigMeta(spark, path)
    val base = SigBaseByName(m.baseName)
    val minAgree = math.ceil(threshold * m.numHashes).toLong
    val bSig = signaturesFromShingles(
        shingles(batch, idCol, textCol, m.shingleN),
        idCol, m.numHashes, base)
      .localCheckpoint(true)
    val bKeys = compactKey(
        bandKeysFromSignatures(bSig, idCol, m.numHashes, m.bands))
      .select(col(idCol).as("bid"), col("band"), col("key"))
      .localCheckpoint(true) // three consumers: bucket probe, hit filter, cand join
    val touchedBk = bKeys.select(bkOf(m.bandBuckets).as("bk"))
      .distinct().collect().map(_.getLong(0)).sorted
    // sidecar BEFORE any component read (the loadSigTombstones rule)
    val tombs = loadSigTombstones(spark, path, idCol)
    val bandsRead = AnnIndex.readPrunedPartitions(spark,
        AnnIndex.resolveDir(spark, path, "bands"), "bk", touchedBk.toSeq)
      .withColumn("bk", col("bk").cast("long"))
      .filter(col("bk").isInCollection(touchedBk))
    val bandsLive = tombs.fold(bandsRead)(t =>
      bandsRead.join(broadcast(t), Seq(idCol), "left_anti"))
    val cKeys = bandsLive.select(col(idCol).as("cid"), col("band"), col("key"))
    // candidate mining + cap: the dedupeAgainstSignatures kernel verbatim
    val hitKeys = bKeys.select("band", "key").distinct()
    val cHit = cKeys.join(broadcast(hitKeys), Seq("band", "key"))
    val ok = cHit.groupBy("band", "key").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= lit(maxBucketSize.getOrElse(Int.MaxValue)))
      .select("band", "key")
    val cand = cHit.join(ok, Seq("band", "key"))
      .join(broadcast(bKeys), Seq("band", "key"))
      .select("cid", "bid").distinct()
      .localCheckpoint(true) // bounded (≤ |batch keys| · cap); feeds the
                             // sp probe AND the verify join
    val touchedSp = cand
      .select(pmod(xxhash64(col("cid")), lit(m.sigBuckets.toLong)).as("sp"))
      .distinct().collect().map(_.getLong(0)).sorted
    val sigsRead = AnnIndex.readPrunedPartitions(spark,
        AnnIndex.resolveDir(spark, path, "sigs"), "sp", touchedSp.toSeq)
      .withColumn("sp", col("sp").cast("long"))
      .filter(col("sp").isInCollection(touchedSp))
    cand
      .join(sigsRead.select(col(idCol).as("cid"), col("sig").as("sc")),
        Seq("cid"))
      .join(broadcast(bSig.select(col(idCol).as("bid"), col("sig").as("sb"))),
        Seq("bid"))
      .withColumn("n_agree",
        expr("aggregate(zip_with(sc, sb, (x, y) -> IF(x = y, 1, 0)), 0L, " +
             "(acc, v) -> acc + v)"))
      .filter(col("n_agree") >= minAgree)
      .select(col("bid").as(idCol), col("cid").as("corpus_id"), col("n_agree"))
  }

  private def quantizedWithNorm(emb: DataFrame, idCol: String,
                                vecCol: String): DataFrame = {
    import graft.functions.VectorFunctions.vec_dot
    emb.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        Similarity.quantize(col(vecCol).cast("array<double>")).as("q"))
      .withColumn("nq2", vec_dot(col("q"), col("q")))
  }

  /** SemDeDup cell assignment: each vector goes to its highest-cosine
    * centroid among the `nlist` deterministic centroids (the non-zero
    * corpus vectors with the smallest ids — swap in k-means centroids at
    * real scale; every downstream shape is identical). The centroid set is
    * collected once (nlist rows — bytes) and inlined as plan literals, so
    * assignment is a pure projection over the scan: nlist codegen'd VecDots
    * per row, ZERO joins, ZERO shuffles of the corpus — the same plan shape
    * as [[Similarity.assignCells]], and PlanSpec gates the no-Exchange
    * property.
    *
    * Ordering is reproducible cross-engine: per-centroid score is
    * `dq / sqrt(nc2)` where `dq` and `nc2` are exact integers, so both
    * engines evaluate ONE correctly-rounded sqrt and ONE correctly-rounded
    * division on identical inputs (monotone with cosine — the row's own
    * norm is a common positive factor). Ties break to the smallest
    * centroid id via the `(score, -cid)` struct max.
    */
  private[graft] def semanticCells(emb: DataFrame, idCol: String,
                                   vecCol: String, nlist: Int): DataFrame = {
    import graft.functions.VectorFunctions.vec_dot_matrix
    val base = quantizedWithNorm(emb, idCol, vecCol)
    val cents = base.filter(col("nq2") > 0).orderBy("id").limit(nlist)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
    require(cents.nonEmpty, "semanticCells: no non-zero vectors to seed centroids")
    // all centroid dots in one VecDotMatrix pass (ascending accumulation,
    // every sum an exact integer — bit-identical to per-centroid VecDots);
    // the argmax is one loop-shaped VecArgMaxId — generated code O(1) in
    // nlist (SemDeDup wants ~100k cells at corpus scale; the per-centroid
    // literal-struct form crossed janino's 64 KB method limit at ~64).
    // norm = 1: the row's own norm is a common positive factor, so
    // score = dq / √nc2 is already monotone with cosine.
    base.withColumn("__cd", vec_dot_matrix(col("q"), cents.map(_._2.toArray)))
      .withColumn("cell", graft.functions.VectorFunctions.vec_arg_max_id(
        col("__cd"), lit(1.0), cents.map(c => math.sqrt(c._3)), cents.map(_._1)))
      .drop("__cd")
  }

  /** Semantic (embedding-space) deduplication, SemDeDup-style: cluster the
    * corpus into `nlist` cells, mine near-dup pairs ONLY within a cell
    * (cosine ≥ `thresholdNum/thresholdDen`), resolve pairs into duplicate
    * groups with [[duplicateClusters]], and keep the smallest-id exemplar
    * per group. Output: `(doc_id, cluster_id, n_members, keep)` — docs in
    * no dup group are absent (they are their own cluster).
    *
    * The threshold is a RATIONAL, tested exactly: `cos(a,b) ≥ n/d` ⟺
    * `dq ≥ 0 ∧ dq²·d² ≥ n²·na2·nb2` with every term an exact integer,
    * evaluated in DECIMAL(38,0) (dq ≤ dim·10¹² ⇒ dq²·d² ≤ ~10³¹ ≪ 10³⁸).
    * No float comparison sits on the decision boundary, which is what lets
    * the DuckDB oracle replay the full pipeline hash-exactly. (Zero
    * vectors — cosine undefined — satisfy the test trivially and group
    * together; callers who care filter them first.)
    *
    * 100 TB shape: cell assignment is a shuffle-free projection; the
    * within-cell self-join shuffles compact (cell, id, q) rows once, and
    * at real scale `nlist` grows with the corpus (SemDeDup uses ~100k
    * clusters) so cells stay small. `maxCellSize` is the saturation guard:
    * an over-cap cell is SKIPPED (no dedup there, loudly bounded work)
    * rather than exploding quadratically.
    */
  /** Corpus-overlap estimation: pairwise shingle-set Jaccard between
    * document GROUPS (sources, snapshots, crawl dumps) from per-group
    * minhash signatures — the audit that answers "how much of corpus A is
    * already in corpus B?" before mixing or deduplicating them
    * (cf. the overlap matrices in pretraining-data reports).
    *
    * Per-group signature = elementwise min of the Kirsch–Mitzenmacher
    * family over ALL the group's shingles — the same single-string-hash
    * aggregation as doc-level minhash ([[signaturesFromShingles]]), just
    * keyed by group. Estimated Jaccard(A, B) = fraction of agreeing
    * family members (std ≈ √(J(1−J)/numHashes)).
    *
    * 100 TB shape: the corpus-wide work is ONE map-side-combined
    * aggregation emitting G fixed-width signatures (G = #groups — tiny);
    * the G² compare runs on that aggregated frame, never on documents.
    * `verifyExact = true` additionally joins the distinct (group,
    * shingle) sets pairwise for exact intersection counts — the
    * oracle/audit configuration; production estimates from signatures
    * alone.
    *
    * Output: (a, b, n_hashes, n_matches, n_sh_a, n_sh_b[, n_common]) —
    * all integer, so with the md5 base the whole pipeline is
    * DuckDB-replayable.
    */
  def corpusOverlap(docs: DataFrame, groupCol: String, textCol: String,
                    numHashes: Int = 128, n: Int = 3,
                    base: Hashers.Base = Hashers.xx64Base,
                    verifyExact: Boolean = false): DataFrame = {
    val shd = shingles(docs, groupCol, textCol, n)
    val sig = signaturesFromShingles(shd, groupCol, numHashes, base)
    val sizes = shd.groupBy(col(groupCol)).agg(count(lit(1)).as("n_sh"))
    // EVERY group appears, even one whose documents are all too short to
    // shingle (no signature): its pairs report n_sh = 0 / 0 matches —
    // an absent row would silently read as "no overlap" when the truth
    // is "never measured"
    val groups = docs.select(col(groupCol)).distinct()
    val side = groups
      .join(sig, Seq(groupCol), "left")
      .join(sizes, Seq(groupCol), "left")
      .select(col(groupCol),
        coalesce(col("sig"), array().cast("array<long>")).as("sig"),
        coalesce(col("n_sh"), lit(0L)).as("n_sh"))
    val lhs = side.select(col(groupCol).as("a"), col("sig").as("sa"),
      col("n_sh").as("n_sh_a"))
    val rhs = side.select(col(groupCol).as("b"), col("sig").as("sb"),
      col("n_sh").as("n_sh_b"))
    // Deliberate G×G product of the aggregated signature frame (G groups,
    // fixed-width rows) — broadcast, never the document corpus.
    val pairs = lhs.join(broadcast(rhs), col("a") < col("b"))
      .select(col("a"), col("b"), lit(numHashes.toLong).as("n_hashes"),
        expr("aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)), 0L, " +
             "(acc, v) -> acc + v)").as("n_matches"),
        col("n_sh_a"), col("n_sh_b"))
    if (!verifyExact) pairs
    else {
      val la = shd.select(col(groupCol).as("a"), col("shingle"))
      val lb = shd.select(col(groupCol).as("b"), col("shingle"))
      val common = la.join(lb, Seq("shingle"))
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
      pairs.join(common, Seq("a", "b"), "left")
        .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
    }
  }

  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    thresholdNum: Long = 2L, thresholdDen: Long = 5L,
                    nlist: Int = 16,
                    maxCellSize: Option[Int] = Some(250)): DataFrame = {
    import graft.functions.VectorFunctions.vec_dot
    require(thresholdDen > 0 && thresholdNum >= 0,
      "semanticDedup: threshold must be a non-negative rational")
    val cells = semanticCells(emb, idCol, vecCol, nlist)
    val ok = cells.groupBy("cell").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2 &&
        col("n") <= lit(maxCellSize.getOrElse(Int.MaxValue)))
      .select("cell")
    val mem = cells.join(ok, Seq("cell"))
    val lhs = mem.select(col("cell"), col("id").as("a"),
      col("q").as("__qa"), col("nq2").as("__na2"))
    val rhs = mem.select(col("cell"), col("id").as("b"),
      col("q").as("__qb"), col("nq2").as("__nb2"))
    val dec = "decimal(38,0)"
    val dq = vec_dot(col("__qa"), col("__qb"))
    val dqd = dq.cast(dec)
    val isDup = dq >= 0 &&
      dqd * dqd * lit(thresholdDen * thresholdDen).cast(dec) >=
        lit(thresholdNum * thresholdNum).cast(dec) *
          col("__na2").cast(dec) * col("__nb2").cast(dec)
    val pairs = lhs.join(rhs, Seq("cell"))
      .filter(col("a") < col("b"))
      .filter(isDup)
      .select("a", "b")
    duplicateClusters(pairs)
  }
}
