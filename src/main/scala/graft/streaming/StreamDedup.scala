package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.streaming.OutputMode.Append

import graft.operators.Dedup.Hashers

/** Streaming near-duplicate detection — the streaming counterpart of
  * `Dedup.minhashLshPairs` (estimator configuration): as documents
  * arrive, each is minhash-signed and LSH-banded STATELESSLY (pure
  * projections — a document's whole text rides in one row, so the
  * signature needs no aggregation and no shuffle), then bucketed per
  * (band, key) with keyed state holding the bucket's members. A new
  * arrival emits a candidate pair for every stored member whose
  * signature-agreement Jaccard estimate clears the threshold.
  *
  * Scale posture:
  *  - state per bucket is at most `maxBucketSize` (id, signature) pairs;
  *    a bucket that fills SATURATES — no further compares or inserts —
  *    mirroring the batch operator's hot-bucket drop (boilerplate/empty
  *    docs would otherwise accumulate unbounded state and quadratic
  *    emission).
  *  - the only shuffle is the groupByKey on compact (band, key) keys.
  *  - the same document colliding with a partner in several bands emits
  *    one pair PER band (streams can't globally dedup without another
  *    stateful stage); consumers take `dropDuplicates("a", "b")` — the
  *    spec pins exact agreement with the batch estimator after that.
  *
  * State uses NoTimeout: the spec corpus is bounded. A production
  * deployment bounds bucket lifetime with ProcessingTimeTimeout (stale
  * buckets evict; dups separated by more than the timeout go undetected
  * — the usual streaming-dedup horizon trade, same as watermarked
  * `dropDuplicates`).
  */
object StreamDedup {

  final case class BandedDoc(id: Long, band: Int, key: String, sig: Seq[Long])
  final case class Member(id: Long, sig: Seq[Long])
  final case class NearDupPair(a: Long, b: Long, jaccard: Double, band: Int)

  /** Per-row minhash signature + band keys — no aggregation, no shuffle
    * (streaming-safe in append mode). The per-shingle hash pair comes
    * from the SAME Spark expressions as the batch path (`xxhash64(s, 0/1)
    * mod P` — `Hashers.xx64Base`), then crosses a typed boundary so it is
    * evaluated ONCE per shingle; the Kirsch–Mitzenmacher fold and the
    * md5 band-key folding run in plain Scala per partition, numerically
    * identical to the batch `MinHashFamilyAgg`/`bandKeysFromSignatures`
    * (a spec pins bit-equality). Folding the family in a Catalyst HOF
    * instead re-inlines the hash pair into the `numHashes`-iteration
    * lambda — ~2·numHashes xxhash64 calls per shingle, a ~50× slowdown
    * measured at sf0.1.
    */
  private[streaming] def bandedSignatures(docs: DataFrame, idCol: String,
                                          textCol: String, numHashes: Int,
                                          bands: Int, n: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val P = Hashers.P
    val spark = docs.sparkSession
    import spark.implicits._
    val hashed = docs
      .select(col(idCol).cast("long").as("id"),
        split(col(textCol), " ").as("words"))
      .withColumn("sh", expr(
        s"CASE WHEN size(words) >= $n THEN array_distinct(" +
        s"transform(sequence(1, size(words) - ${n - 1}), " +
        s"i -> concat_ws(' ', slice(words, i, $n)))) ELSE array() END"))
      .filter(size(col("sh")) > 0)
      // ONE xxhash64 pair per distinct shingle (min over the distinct set
      // equals the batch aggregation's min over shingle rows)
      .select(col("id"), expr(
        s"transform(sh, s -> struct(pmod(xxhash64(s, 0), ${P}L) AS _1, " +
        s"pmod(xxhash64(s, 1), ${P}L) AS _2))").as("hp"))
      .as[(Long, Seq[(Long, Long)])]
    hashed.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hexChars = "0123456789abcdef".toCharArray
      it.flatMap { case (id, hp) =>
        val sig = Array.fill(numHashes)(Long.MaxValue)
        hp.foreach { case (h1, h2) =>
          // incremental Kirsch–Mitzenmacher: inputs are mod-P reduced, so
          // add + conditional subtract replaces the per-step 64-bit mod —
          // bit-identical to (h1 + (i+1)·h2) % P
          var g = h1
          var i = 0
          while (i < numHashes) {
            g += h2
            if (g >= P) g -= P
            if (g < sig(i)) sig(i) = g
            i += 1
          }
        }
        val sigSeq = sig.toSeq // shared across the doc's bands
        (0 until bands).map { b =>
          val joined = (b * rowsPerBand until (b + 1) * rowsPerBand)
            .map(sig(_)).mkString("|")
          md.reset()
          val digest = md.digest(joined.getBytes("UTF-8"))
          val hex = new Array[Char](digest.length * 2)
          var j = 0
          while (j < digest.length) {
            hex(2 * j) = hexChars((digest(j) >> 4) & 0xf)
            hex(2 * j + 1) = hexChars(digest(j) & 0xf)
            j += 1
          }
          (id, b, new String(hex), sigSeq)
        }
      }
    }.toDF("id", "band", "key", "sig")
  }

  /** The static corpus half of streaming incremental dedup: band keys +
    * signatures of the EXISTING corpus, shaped for [[vsCorpusHits]]'
    * stream-static join. Build once per corpus snapshot and `cache()` it —
    * a stream-static join re-reads the static side every micro-batch, so
    * an uncached index would re-mine the corpus signatures per trigger.
    */
  def corpusBandIndex(corpus: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 128, bands: Int = 16,
                      n: Int = 3,
                      maxBucketSize: Option[Int] = Some(100)): DataFrame = {
    val banded = bandedSignatures(corpus, idCol, textCol, numHashes, bands, n)
      .select(col("id").as("corpus_id"), col("band"), col("key"),
        col("sig").as("csig"))
    // Hot-bucket cap at INDEX BUILD time: a degenerate (band, key) holding
    // ~10^6 boilerplate docs would otherwise fan every matching arrival
    // out by a million joined rows per trigger — the same skew guard as
    // the batch paths (maxBucketSize) and the stateful stream path
    // (saturation), applied where it's a one-off batch aggregation.
    maxBucketSize match {
      case Some(cap) =>
        val hot = banded.groupBy("band", "key").count()
          .filter(col("count") > cap).select("band", "key")
        banded.join(hot, Seq("band", "key"), "left_anti")
      case None => banded
    }
  }

  /** Streaming incremental dedup vs a static corpus: as documents arrive
    * they are signed statelessly and joined (stream-static, append-safe)
    * against the corpus band index on (band, key); a collision whose
    * signature-agreement Jaccard estimate clears `threshold` emits
    * (doc_id, corpus_id, est_jaccard, band) — the streaming counterpart
    * of [[graft.operators.Dedup.incrementalDedup]]'s vs-corpus half.
    * One row per colliding band (streams can't globally dedup without
    * another stateful stage); consumers `dropDuplicates("doc_id")` for a
    * flag, or keep the pairs for attribution. An exact corpus copy has an
    * identical signature (estimate 1.0), so the LSH path subsumes the
    * exact-text check for any doc wide enough to shingle; sub-window docs
    * are the batch operator's md5 path.
    *
    * Scale posture: the only per-batch work is signing the increment and
    * a hash join against the (cached) index — the corpus is never
    * re-shuffled per trigger, and no streaming state accumulates at all.
    */
  def vsCorpusHits(stream: DataFrame, corpusIndex: DataFrame, idCol: String,
                   textCol: String, threshold: Double, numHashes: Int = 128,
                   bands: Int = 16, n: Int = 3): DataFrame = {
    val s = bandedSignatures(stream, idCol, textCol, numHashes, bands, n)
    // Width guard INSIDE the estimate (not a droppable extra column, so
    // pruning can't optimize it away): if this call's numHashes disagrees
    // with the parameters the index was built with, zip_with would
    // null-pad the shorter signature and est_jaccard would silently
    // DEFLATE — under-reporting duplicates is the worst failure mode a
    // dedup gate can have, so a config mismatch errors loudly instead.
    s.join(corpusIndex, Seq("band", "key"))
      .withColumn("est_jaccard",
        expr(s"CASE WHEN size(sig) = $numHashes AND size(csig) = $numHashes " +
          s"THEN size(filter(zip_with(sig, csig, (x, y) -> x = y), z -> z))" +
          s" / cast($numHashes as double) " +
          s"ELSE raise_error(concat('vsCorpusHits: signature width mismatch — " +
          s"stream ', cast(size(sig) as string), ', corpus index ', " +
          s"cast(size(csig) as string), ', configured $numHashes; the index " +
          s"must be built with the same numHashes/bands/n')) END"))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id").as("doc_id"), col("corpus_id"),
        col("est_jaccard"), col("band"))
  }

  /** Candidate near-dup pairs over a document stream (or a batch frame —
    * the logic is mode-agnostic). Output is append-mode: (a, b,
    * estimated jaccard, band), a < b, one row per colliding band.
    *
    * Derived state partitioning measured and REJECTED here (r17 family
    * drill: 3.45/2.88/3.10 s at 32/8/1 shards — no stable win; the line
    * is dominated by the stateless 128-hash signing, not by state-store
    * bookkeeping, and the flatMapGroupsWithState stage wants the
    * parallelism for its compare loops). Same verdict for
    * [[vsCorpusHits]] (4.43/4.53/4.53 — stateless sign + hash join,
    * nothing for the conf to coalesce).
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double, numHashes: Int = 128, bands: Int = 16,
                   n: Int = 3, maxBucketSize: Int = 100): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = bandedSignatures(docs, idCol, textCol, numHashes, bands, n)
      .as[BandedDoc]
    banded.groupByKey(d => (d.band, d.key))
      .flatMapGroupsWithState[List[Member], NearDupPair](
        Append, GroupStateTimeout.NoTimeout) {
        case ((band, _), batch, state: GroupState[List[Member]]) =>
          var members = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
          // id order makes within-batch emission deterministic under any
          // shuffle arrival order
          batch.toSeq.sortBy(_.id).foreach { d =>
            val saturated = members.size >= maxBucketSize
            if (!saturated && !members.exists(_.id == d.id)) {
              members.foreach { m =>
                var agree = 0
                var i = 0
                while (i < numHashes) {
                  if (m.sig(i) == d.sig(i)) agree += 1
                  i += 1
                }
                val est = agree.toDouble / numHashes
                if (est >= threshold)
                  out += NearDupPair(math.min(m.id, d.id), math.max(m.id, d.id),
                    est, band)
              }
              members = Member(d.id, d.sig) :: members
            }
          }
          state.update(members)
          out.iterator
      }
  }
}
