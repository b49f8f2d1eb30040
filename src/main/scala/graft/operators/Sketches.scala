package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Fixed-memory frequency sketching over unbounded token streams.
  *
  * The exact vocabulary query (`groupBy(token).count`) shuffles every
  * distinct token; at web-corpus scale the long tail is billions of
  * near-singleton keys whose counts nobody reads. The heavy-hitters
  * question — "which items exceed ε of the stream?" — needs none of
  * that: a count-min sketch compresses the whole frequency table into
  * `depth × width` counters (kilobytes at ε = 10⁻⁴), merges
  * associatively (tree-reduce, no key shuffle), and answers point
  * queries with a one-sided guarantee: `true ≤ est ≤ true + ε·N` with
  * probability ≥ `confidence`.
  */
object Sketches {

  /** Per-partition candidate generation: each task runs a SPACE-SAVING
    * summary (Metwally et al. 2005) capped at `capacity` counters —
    * memory is O(capacity) per task REGARDLESS of the partition's
    * distinct count (an exact map would grow with the tail, which at
    * web-corpus scale is exactly what must not happen). Guarantee:
    * every item with partition count ≥ N_p / capacity is in the
    * summary; since a globally ε-heavy item is ε-heavy in at least one
    * partition (averaging argument), the UNION of per-partition
    * summaries with capacity ≥ 1/ε is a guaranteed superset of the
    * global ε-heavy hitters — no adversarial-spread caveat.
    *
    * Eviction is deterministic for a fixed partitioning: victim = the
    * least-recently-inserted member of the minimum-count bucket (FIFO
    * within bucket), and parquet row order per partition is fixed.
    */
  private[operators] def localTopCandidates(items: DataFrame, itemCol: String,
                                            capacity: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col(itemCol).cast("string"))
      .filter(col(itemCol).isNotNull)
      .as[String]
      .mapPartitions { it =>
        // counts: item → over-estimated count; buckets: count → items in
        // insertion order (TreeMap gives O(log·) min-bucket access, the
        // stream-summary structure without the pointer juggling)
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        val buckets = new java.util.TreeMap[Long, java.util.LinkedHashSet[String]]
        def add(s: String, c: Long): Unit = {
          counts.update(s, c)
          var set = buckets.get(c)
          if (set == null) { set = new java.util.LinkedHashSet[String](); buckets.put(c, set) }
          set.add(s); ()
        }
        def remove(s: String, c: Long): Unit = {
          val set = buckets.get(c)
          set.remove(s)
          if (set.isEmpty) buckets.remove(c)
          ()
        }
        it.foreach { s =>
          counts.get(s) match {
            case Some(c) => remove(s, c); add(s, c + 1L)
            case None if counts.size < capacity => add(s, 1L)
            case None =>
              val minEntry = buckets.firstEntry()
              val minC = minEntry.getKey
              val victim = minEntry.getValue.iterator().next()
              remove(victim, minC); counts.remove(victim)
              add(s, minC + 1L) // space-saving: inherit the evicted floor
          }
        }
        counts.keysIterator
      }
      .toDF(itemCol).distinct()
  }

  /** Approximate top-k heavy hitters: ONE sketch pass over the items
    * (associative partial aggregation, no per-key shuffle), a bounded
    * per-partition candidate mine, then a broadcast-sketch probe of the
    * (small) candidate set and a distributed TakeOrdered top-k. Output:
    * `(item, est_count, rank)` — `est_count` carries the CMS one-sided
    * error (`≥ true count`, `≤ true + ε·N` w.p. `confidence`).
    *
    * 100 TB shape: the token stream is touched exactly twice, both times
    * as a scan-and-fold with NO shuffle of the items themselves — the
    * sketch partials and the candidate lists that move between executors
    * are kilobytes. Contrast with the exact vocabulary pipeline, which
    * exchanges every distinct key; this is the operator you run when the
    * tail doesn't fit anywhere.
    *
    * Recall: the candidate pass runs per-partition space-saving at
    * capacity `max(localTopM, ⌈1/eps⌉)`, so every ε-heavy item is
    * GUARANTEED in the candidate set (see [[localTopCandidates]]) —
    * the returned top-k can only miss an item whose true frequency is
    * below ε·N, which the CMS could not rank reliably anyway.
    */
  def heavyHittersCms(items: DataFrame, itemCol: String, k: Int,
                      eps: Double = 1e-4, confidence: Double = 0.99,
                      seed: Int = 42, localTopM: Int = 512): DataFrame = {
    require(k > 0 && eps > 0 && confidence > 0 && confidence < 1,
      "heavyHittersCms: need k > 0, eps > 0, 0 < confidence < 1")
    val spark = items.sparkSession
    val strs = items.select(col(itemCol).cast("string").as(itemCol))
      .filter(col(itemCol).isNotNull)
    val sketch = strs.stat.countMinSketch(itemCol, eps, confidence, seed)
    val bc = spark.sparkContext.broadcast(sketch.toByteArray)
    val estimate = udf { (s: String) =>
      // deserialize once per executor-thread closure init, not per row
      CmsCache.get(bc.value).estimateCount(s)
    }
    val capacity = math.max(localTopM, math.ceil(1.0 / eps).toInt)
    localTopCandidates(strs, itemCol, capacity)
      .withColumn("est_count", estimate(col(itemCol)))
      .orderBy(col("est_count").desc, col(itemCol))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("est_count").desc, col(itemCol))))
  }

  /** Space-saving as a typed MERGEABLE [[org.apache.spark.sql.expressions.Aggregator]]
    * — the summary-as-aggregation-state form of [[localTopCandidates]]'
    * per-partition mine, usable anywhere Spark aggregates: batch groupBy
    * (map-side partial summaries merge at the exchange) and WATERMARKED
    * STREAMING windows (the state store holds one bounded summary per
    * window instead of per-item counts — the fixed-memory answer to
    * "top users per hour" on an unbounded stream).
    *
    * Merge follows Agarwal et al. 2012 (Mergeable Summaries): pointwise
    * count sum, then prune to the top `capacity` by (count desc, item
    * asc) — the merged summary is again a valid space-saving summary of
    * the concatenated streams, so ε-heavy items (capacity ≥ 1/ε)
    * survive any merge tree Spark chooses. When `capacity` exceeds the
    * group's distinct-item count the summary IS the exact count map —
    * the regime the oracle-hashed catalog entry runs in; the bounded
    * eviction regime is spec-pinned.
    */
  final class SpaceSavingAgg(capacity: Int)
      extends org.apache.spark.sql.expressions.Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(capacity > 0, "SpaceSavingAgg: capacity must be > 0")
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      b.get(item) match {
        case Some(c)                   => b.updated(item, c + 1L)
        case None if b.size < capacity => b.updated(item, 1L)
        case None =>
          // deterministic eviction: the (count, item)-smallest entry goes,
          // the newcomer inherits its floor (the space-saving invariant)
          val (minItem, minC) = b.minBy { case (it, c) => (c, it) }
          (b - minItem).updated(item, minC + 1L)
      }
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = b.foldLeft(a) { case (acc, (it, c)) =>
        acc.updated(it, acc.getOrElse(it, 0L) + c)
      }
      if (summed.size <= capacity) summed
      else summed.toSeq.sortBy { case (it, c) => (-c, it) }
        .take(capacity).toMap
    }
    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Mergeable QUANTILE sketch as a typed Aggregator — the third classic
    * mergeable summary next to count-min ([[heavyHittersCms]]) and
    * space-saving ([[SpaceSavingAgg]]): per group (or per watermarked
    * stream window), the q-quantiles of a numeric column with state
    * bounded by `capacity` weighted tuples, never by the group's row
    * count.
    *
    * Mechanics: the buffer is (value, weight) tuples. Under capacity it
    * is the exact multiset (weights 1); over capacity a COMPACTION
    * sorts by value and merges adjacent pairs, keeping the LOWER value
    * with the summed weight — deterministic (no sampling coin), merge-
    * order independent in the exact regime, and one-sided: an estimate
    * can only sit at or below the true quantile, with rank error
    * bounded by the largest merged weight (each compaction at most
    * doubles it). A KLL/GK-grade bound costs randomized compactors;
    * this trades a looser constant for bit-reproducibility, the same
    * trade every exact-regime oracle in this catalog makes.
    *
    * `finish` returns the quantile VALUES (selection only, no
    * interpolation arithmetic), so in the exact regime the output is
    * the element at rank `max(1, ceil(q·n))` — replayable by any engine
    * that can sort, which is what makes the catalog entries
    * hash-verifiable where the data fits the summary.
    */
  final class QuantileSketchAgg(capacity: Int, qs: Seq[Double])
      extends org.apache.spark.sql.expressions.Aggregator[Double, Seq[(Double, Long)], Seq[Double]] {
    require(capacity >= 2, "QuantileSketchAgg: capacity must be >= 2")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "QuantileSketchAgg: quantiles must lie in (0, 1]")
    override def zero: Seq[(Double, Long)] = Seq.empty
    override def reduce(b: Seq[(Double, Long)], x: Double): Seq[(Double, Long)] =
      compact(b :+ ((x, 1L)))
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      compact(a ++ b)
    private def compact(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      if (b.size <= capacity) b
      else {
        val sorted = b.sortBy(_._1)
        val out = Seq.newBuilder[(Double, Long)]
        var i = 0
        while (i + 1 < sorted.size) {
          out += ((sorted(i)._1, sorted(i)._2 + sorted(i + 1)._2))
          i += 2
        }
        if (i < sorted.size) out += sorted(i)
        out.result()
      }
    override def finish(b: Seq[(Double, Long)]): Seq[Double] = {
      val sorted = b.sortBy(_._1)
      val total = sorted.iterator.map(_._2).sum
      qs.map { q =>
        if (total == 0L) Double.NaN
        else {
          val target = math.max(1L, math.ceil(q * total).toLong)
          var cum = 0L
          var ans = sorted.last._1
          val it = sorted.iterator
          var found = false
          while (it.hasNext && !found) {
            val (v, w) = it.next()
            cum += w
            if (cum >= target) { ans = v; found = true }
          }
          ans
        }
      }
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** K-MINIMUM-VALUES distinct-count sketch as a typed Aggregator — the
    * fourth classic mergeable summary here (count-min: frequencies;
    * space-saving: top-k; pair-compaction: quantiles; KMV: distinct
    * counts, Beyer et al. 2007). State = the `capacity` smallest
    * DISTINCT hash values seen, so per-group (or per-stream-window)
    * memory is O(capacity) regardless of cardinality; estimate =
    * `(capacity−1) · 2⁶⁰ / h_k` with `h_k` the k-th minimum (relative
    * std ≈ 1/√(capacity−2)), or the EXACT distinct count while the
    * buffer is under capacity.
    *
    * Unlike space-saving, the merge (union, keep k smallest) is
    * associative+commutative with NO tie-order sensitivity — the sketch
    * is a pure function of the input SET in BOTH regimes, so with an
    * oracle-replayable hash (md5-hex-prefix, as [[Dedup.Hashers.md5Base]])
    * even the estimator regime hash-verifies cross-engine: the k-th
    * minimum is just a rank selection any engine can replay.
    *
    * Inputs are the 60-bit hash values (callers hash in the DataFrame
    * expression — codegen'd, and the choice of md5 vs xxhash64 stays a
    * plan-level decision exactly like the minhash families).
    */
  final class KmvDistinctAgg(capacity: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Seq[Long], Long] {
    require(capacity >= 2, "KmvDistinctAgg: capacity must be >= 2")
    override def zero: Seq[Long] = Seq.empty
    // negative input = the null-item sentinel (callers encode "nothing
    // to count" as -1 so the group still AGGREGATES — the hash families
    // feeding this are 60-bit, always >= 0); skipping here keeps the
    // whole operator one-pass for all-null groups instead of a second
    // scan + join to resurrect them
    override def reduce(b: Seq[Long], h: Long): Seq[Long] =
      if (h < 0) b else insert(b, h)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      b.foldLeft(a)(insert)
    // invariant: sorted ascending, distinct, size ≤ capacity
    private def insert(b: Seq[Long], h: Long): Seq[Long] = {
      // O(1) hot path: once the buffer is full, the overwhelming
      // majority of inputs exceed the k-th minimum — reject on the tail
      // element before the O(capacity) scan (indexWhere would otherwise
      // walk the whole buffer per row just to conclude "too large")
      if (b.size >= capacity && h >= b.last) return b
      val i = b.indexWhere(_ >= h)
      if (i >= 0 && b(i) == h) b // already present
      else if (i < 0 && b.size >= capacity) b // larger than the k-th min
      else {
        val pos = if (i < 0) b.size else i
        val ins = (b.take(pos) :+ h) ++ b.drop(pos)
        if (ins.size > capacity) ins.take(capacity) else ins
      }
    }
    override def finish(b: Seq[Long]): Long =
      if (b.size < capacity) b.size.toLong
      else ((BigInt(capacity - 1) << 60) / BigInt(b.last).max(1)).toLong
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }

  /** The md5-hex-prefix 60-bit hash feeding [[KmvDistinctAgg]] in
    * oracle-replayable configurations — DuckDB computes the identical
    * value as `('0x' || substr(md5(x), 1, 15))::BIGINT`.
    */
  def kmvHash60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Per-group distinct-count report: the KMV estimate next to the exact
    * `count(DISTINCT)` — the accuracy-audit configuration (the exact
    * column is what the estimate is judged against). PRODUCTION at
    * 100 TB drops `withExact`: the sketch's partial buffers merge
    * map-side and only `capacity` longs per group cross the exchange,
    * vs. the exact path shuffling every distinct item.
    */
  def kmvDistinct(items: DataFrame, groupCol: String, itemCol: String,
                  capacity: Int = 1024, withExact: Boolean = true): DataFrame = {
    val agg = udaf(new KmvDistinctAgg(capacity),
      org.apache.spark.sql.Encoders.scalaLong)
    // a group whose items are ALL null must row out with 0 distinct,
    // not vanish — the same silent-absence failure mode corpusOverlap
    // guards against (an absent row reads as "no items" only if the
    // reader already knows the group existed). Null items feed the
    // aggregator as the -1 sentinel it skips, so the guard costs
    // NOTHING: one groupBy over the unfiltered input (null GROUP KEYS
    // stay groups too — Spark groupBy keeps them), no second scan, no
    // resurrection join.
    val est = agg(when(col(itemCol).isNotNull, kmvHash60(col(itemCol)))
      .otherwise(lit(-1L))).as("n_distinct_est")
    if (withExact)
      items.groupBy(col(groupCol))
        .agg(countDistinct(col(itemCol)).as("n_distinct"), est)
    else items.groupBy(col(groupCol)).agg(est)
  }

  /** Heaps'-law vocabulary-growth curve on KMV sketches — the 100 TB
    * form of the exact `x_corpus_heaps` report: distinct-token estimates
    * at nested corpus prefixes (by id percentile), ONE token pass, state
    * = `capacity` longs per prefix instead of an exact `count(DISTINCT)`
    * whose per-prefix distinct sets all shuffle. Each token row explodes
    * to its qualifying prefixes (≤ |fractions| compact (pct, hash) rows,
    * collapsed map-side by the mergeable KMV partials), so the exchange
    * carries |fractions|·capacity longs TOTAL regardless of corpus size.
    *
    * Estimator-regime oracle-replayable for the same reason as
    * [[kmvDistinct]]: with the md5-prefix hash the k-th minimum is a
    * rank selection any engine replays exactly.
    *
    * Output: (pct, n_distinct_est) — one row per fraction.
    */
  def heapsKmv(docs: DataFrame, idCol: String, textCol: String,
               capacity: Int = 4096,
               fractions: Seq[Int] = Seq(20, 40, 60, 80, 100)): DataFrame = {
    // the max-id probe is a 1-row agg action, the same prefix-anchor
    // the exact variant takes (percentile cuts are policy over ids)
    val mx = docs.agg(max(col(idCol))).head().getLong(0)
    val agg = udaf(new KmvDistinctAgg(capacity),
      org.apache.spark.sql.Encoders.scalaLong)
    docs.select(col(idCol).as("__id"),
        explode(split(col(textCol), " ")).as("tok"))
      .select(kmvHash60(col("tok")).as("h"),
        explode(expr(s"filter(array(${fractions.mkString(", ")}), " +
          s"f -> __id * 100 <= ${mx}L * f)")).as("pct"))
      .groupBy(col("pct"))
      .agg(agg(col("h")).as("n_distinct_est"))
  }

  /** Pairwise corpus-overlap estimates from KMV sketches — the SET
    * ALGEBRA the mergeable k-min summary buys (Beyer et al. 2007):
    * for every unordered group pair, estimated |A|, |B|, |A∪B|, |A∩B|
    * and a Jaccard figure, WITHOUT ever joining the corpora on content.
    * The k-min of A∪B is the k-min of (k-min(A) ∪ k-min(B)) — union
    * sketches compose from the per-group buffers — and the classic
    * intersection estimator is ρ·|A∪B|_est with ρ the fraction of the
    * union buffer present in BOTH input buffers.
    *
    * Scale shape: ONE distinct shuffle of (group, hash) is the only
    * data-sized op; everything after runs on capacity-bounded buffers
    * (G·cap rows), the pair matrix is G²·cap compact longs — the
    * inherent output size — and NOTHING collects to the driver (the
    * exact pairwise twin x_corpus_overlap joins corpora on content;
    * this replaces that join with sketch algebra).
    *
    * Integer-exact cross-engine: the estimate `(cap−1)·2⁶⁰ // h_k`
    * overflows BIGINT, so it is computed in DECIMAL(38,0) with the
    * exact-floor identity `floor(N/h) = (N − N % h) / h` — the
    * subtraction makes the division exact-integer, which decimal
    * arithmetic represents exactly (a bare decimal division rounds at
    * result scale and could flip the floor). DuckDB replays in HUGEINT.
    *
    * Output, one row per pair (ga < gb): group ests, `n_union_est`,
    * `n_inter_est`, raw `n_matched`/`k_union`, and
    * `jaccard_pctx100 = matched·10⁴ // k_union`.
    */
  def kmvOverlapMatrix(items: DataFrame, groupCol: String, itemCol: String,
                       capacity: Int = 1024): DataFrame = {
    require(capacity >= 2, "kmvOverlapMatrix: capacity must be >= 2")
    val numLit = lit((BigInt(capacity - 1) << 60).toString)
      .cast(org.apache.spark.sql.types.DecimalType(38, 0))
    def floorDiv(n: org.apache.spark.sql.Column,
                 d: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      ((n - n % d) / d).cast("long")
    def estExpr(sz: org.apache.spark.sql.Column,
                hk: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(sz < capacity, sz.cast("long"))
        .otherwise(floorDiv(numLit, greatest(hk, lit(1L))))
    val hd = items.filter(col(itemCol).isNotNull)
      .select(col(groupCol).as("g"), kmvHash60(col(itemCol)).as("h"))
      .distinct()
    val w = Window.partitionBy("g").orderBy("h")
    val buf = hd.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= capacity).select("g", "h")
    val gest = buf.groupBy("g")
      .agg(count(lit(1)).as("sz"), max("h").as("hk"))
      .select(col("g"), estExpr(col("sz"), col("hk")).as("est"))
    // every buffer row fans out to its group's G−1 pairs; distinct folds
    // a hash present in both buffers to ONE union-candidate row
    val gs = buf.select(col("g").as("g2")).distinct()
    val comb = buf.join(broadcast(gs), col("g") =!= col("g2"))
      .select(least(col("g"), col("g2")).as("ga"),
        greatest(col("g"), col("g2")).as("gb"), col("h"))
      .distinct()
    val wp = Window.partitionBy("ga", "gb").orderBy("h")
    val ubuf = comb.withColumn("rk", row_number().over(wp))
      .filter(col("rk") <= capacity).select("ga", "gb", "h")
    val flagged = ubuf
      .join(buf.select(col("g").as("ga"), col("h"), lit(1).as("in_a")),
        Seq("ga", "h"), "left")
      .join(buf.select(col("g").as("gb"), col("h"), lit(1).as("in_b")),
        Seq("gb", "h"), "left")
    val pstats = flagged.groupBy("ga", "gb").agg(
      count(lit(1)).as("k_union"),
      max("h").as("hk"),
      sum(when(col("in_a") === 1 && col("in_b") === 1, 1).otherwise(0))
        .cast("long").as("n_matched"))
    val prod = col("n_matched")
      .cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("n_union_est")
    pstats
      .select(col("ga"), col("gb"), col("n_matched"), col("k_union"),
        estExpr(col("k_union"), col("hk")).as("n_union_est"))
      .join(gest.select(col("g").as("ga"), col("est").as("n_a_est")), "ga")
      .join(gest.select(col("g").as("gb"), col("est").as("n_b_est")), "gb")
      .select(col("ga"), col("gb"), col("n_a_est"), col("n_b_est"),
        col("n_union_est"),
        floorDiv(prod, col("k_union")).as("n_inter_est"),
        col("n_matched"),
        col("k_union").cast("long").as("k_union"),
        // integer floor division (both operands non-negative) — a bare
        // `/` on longs is DOUBLE division in Spark
        expr("CAST(n_matched * 10000 DIV k_union AS BIGINT)")
          .as("jaccard_pctx100"))
  }

  /** Per-executor deserialized-sketch cache: the broadcast ships bytes
    * (CountMinSketch is Serializable but re-deserializing per row would
    * dominate); each executor inflates it once.
    */
  private object CmsCache {
    @volatile private var cached: (Array[Byte], CountMinSketch) = null
    def get(bytes: Array[Byte]): CountMinSketch = {
      val c = cached
      if (c != null && (c._1 eq bytes)) c._2
      else {
        val s = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
        cached = (bytes, s)
        s
      }
    }
  }

  /** Exact token frequencies of the `probe` items from a sketch built
    * over `items` — the point-query surface of the sketch, exposed for
    * spec-level error-bound checks.
    */
  private[operators] def cmsEstimates(items: DataFrame, itemCol: String,
                                      probe: Seq[String], eps: Double,
                                      confidence: Double, seed: Int): Map[String, Long] = {
    val strs = items.select(col(itemCol).cast("string").as(itemCol))
      .filter(col(itemCol).isNotNull)
    val sketch = strs.stat.countMinSketch(itemCol, eps, confidence, seed)
    probe.map(s => s -> sketch.estimateCount(s)).toMap
  }
}
