package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * stratified sampling, context-window sequence packing, and PII
  * scrubbing. All window/projection work — one shuffle on the stratum or
  * pack key at most, deterministic under any partitioning.
  */
object Curation {

  /** Up to `perStratum` rows per stratum, chosen by a deterministic
    * integer-hash order of the key (not `rand()`): the sample is
    * reproducible across runs/engines and stable as long as the sampled
    * keys' hash order is — the auditable alternative to random sampling.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       perStratum: Int): DataFrame = {
    require(df.schema(keyCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"stratifiedSample needs a numeric key (a silent cast-to-null would " +
        s"degrade to lexicographic order), got ${df.schema(keyCol).dataType.simpleString}")
    val order = AsOfJoin.mixKey(col(keyCol))
    val w = Window.partitionBy(col(stratumCol)).orderBy(order, col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }

  /** Greedy sequential packing: within each group (ordered by `orderCol`),
    * assign documents to bins of ~`budget` tokens — `bin = floor(
    * (running_total - own_tokens) / budget)`, i.e. a doc starts a new bin
    * when the budget would overflow *before* it. The deterministic
    * SQL-replayable approximation of context-window packing; exact
    * first-fit packing needs stateful iteration (mapGroups) and loses
    * replayability.
    */
  def packSequences(df: DataFrame, groupCol: String, orderCol: String,
                    tokenCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("__running", sum(col(tokenCol)).over(w))
      .withColumn("bin",
        floor((col("__running") - col(tokenCol)) / budget).cast("long"))
      .drop("__running")
  }

  /** RAG-style overlapping token-window chunking: split each document
    * into windows of `window` tokens advancing by `stride` (stride <
    * window ⇒ overlap), the standard retrieval-corpus / long-context
    * preprocessing step. Chunk starts are 0, s, 2s, …, ⌈(n−w)/s⌉·s — the
    * final chunk may be short (the tail), and every token is covered.
    *
    * Pure integer arithmetic over split/sequence/slice — exactly
    * replayable in any SQL engine — and a shuffle-free projection +
    * explode: each document expands to ~n/s rows locally, so the op
    * scales with corpus size, not corpus count.
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int): DataFrame = {
    require(window > 0, "window must be positive")
    require(stride > 0 && stride <= window,
      "stride must be in [1, window] — a stride past the window skips tokens")
    docs.select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol),
        expr(s"""posexplode(transform(
          sequence(0, (greatest(size(__toks) - $window, 0) + $stride - 1) div $stride),
          i -> struct(i * $stride AS start_tok,
                      slice(__toks, i * $stride + 1, $window) AS w)))""")
          .as(Seq("chunk_id", "c")))
      .select(col(idCol), col("chunk_id"),
        col("c.start_tok").as("start_tok"),
        size(col("c.w")).as("n_tokens"),
        array_join(col("c.w"), " ").as("chunk"))
  }

  /** Deterministic domain-mixture sampling: build a training mix with
    * target proportions per domain (web 60% / code 20% / books 20%…) over
    * a `total`-row budget. Each domain contributes `floor(total × weight)`
    * rows, chosen in md5-of-key order — a reproducible, engine-agnostic
    * shuffle (same winners every run, every engine), unlike `rand()`
    * sampling. Domains absent from `weights` contribute nothing.
    *
    * One shuffle on the domain column for the per-domain rank window.
    * Per-domain ordering is inherent to exact-k sampling; at extreme
    * domain skew trade exactness for `sample(fraction)` per domain, which
    * needs no window at all.
    */
  def domainMix(df: DataFrame, domainCol: String, keyCol: String,
                weights: Map[String, Double], total: Long): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w <= 1),
      "weights must be proportions in [0, 1]")
    val cap = weights.foldLeft(lit(0L)) { case (acc, (d, p)) =>
      // exact decimal floor: IEEE double gives 100 × 0.29 =
      // 28.999999999999996 → floor 28, one row short of the documented
      // floor(total × weight) = 29
      val k = (BigDecimal(total) * BigDecimal(p))
        .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
      when(col(domainCol) === d, lit(k)).otherwise(acc)
    }
    val w = Window.partitionBy(col(domainCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Snapshot diff: classify every key of two corpus snapshots as
    * `added` (only in `newDf`), `removed` (only in `oldDf`), or `changed`
    * (both, but any compared column differs). Each row fingerprints as
    * md5 over the concatenation of PER-COLUMN md5s — fixed-width blocks,
    * so no value can alias across a column boundary regardless of its
    * content; the only residual collision is a literal value equal to
    * the NULL sentinel. Unchanged keys are omitted — at corpus scale the
    * diff is the small output, the snapshots are the big inputs. One
    * full outer join on the key with both sides reduced to
    * (key, fingerprint) BEFORE the join — full rows never shuffle.
    *
    * PRECONDITION: `keyCol` is unique within each snapshot (it is the
    * join key); duplicate keys make the outer join many-to-many and the
    * classification meaningless.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff: no columns to compare")
    def fp(df: DataFrame, as: String): DataFrame =
      df.select(col(keyCol),
        md5(concat_ws("",
          compareCols.map(c => md5(coalesce(col(c).cast("string"),
            lit("\u0000null")))): _*)).as(as))
    fp(oldDf, "__old").join(fp(newDf, "__new"), Seq(keyCol), "full_outer")
      .withColumn("change",
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(col("__old") =!= col("__new"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(col(keyCol), col("change"))
  }

  /** Contrastive training triplets (anchor, positive, negative): positives
    * come from a mined near-dup pair list (each pair yields one triplet,
    * anchor = the smaller id); negatives are drawn WITHOUT any cross join
    * or random state by a deterministic per-shard derangement — docs get
    * [[shuffleShards]]' md5-derived (shard, pos), and the negative for a
    * doc at (s, p) is its half-shard-rotation partner at
    * (s, (p − ⌊n_s/2⌋) mod n_s). Reproducible
    * across engines/runs, uniform-ish by construction (the md5 order is
    * already a shuffle), and never a global window — positions are
    * per-shard, the rotation is a self-join on (shard, rotated pos).
    * Anchor = negative is only possible in a 1-doc shard and is filtered,
    * as is the rare positive = negative collision.
    */
  def contrastiveTriplets(docs: DataFrame, pairs: DataFrame, idCol: String,
                          aCol: String = "a", bCol: String = "b",
                          numShards: Int = 32): DataFrame = {
    val pos = shuffleShards(docs.select(col(idCol)).distinct(), idCol, numShards)
    val sizes = Window.partitionBy(col("shard"))
    val sized = pos.withColumn("__n", count(lit(1)).over(sizes))
    val rotated = sized.select(col("shard"),
      pmod(col("pos") + (col("__n") / 2).cast("long"), col("__n")).as("pos"),
      col(idCol).as("negative"))
    val negatives = sized.join(rotated, Seq("shard", "pos"))
      .select(col(idCol).as("anchor"), col("negative"))
      .filter(col("anchor") =!= col("negative"))
    pairs.select(least(col(aCol), col(bCol)).as("anchor"),
        greatest(col(aCol), col(bCol)).as("positive"))
      .join(negatives, Seq("anchor"))
      .filter(col("negative") =!= col("positive"))
      .select("anchor", "positive", "negative")
  }

  /** Keep each domain's top `num/den` fraction by a score column: row
    * ranks (score desc, key asc — deterministic under float score ties)
    * and domain sizes come from two window functions over the SAME
    * partitioning (one shuffle), and the quartile test `rn·den ≤ n·num`
    * is pure integer arithmetic — no percentile estimate, no float
    * boundary. This is the relative quality gate ("top 25% per language
    * by quality score") that keeps domains comparable when their score
    * distributions differ.
    *
    * Scale: the rank window sorts within each domain partition. Domains
    * are bounded-cardinality by definition here (languages, sources); for
    * million-domain keys use [[stratifiedSample]]-style hash ordering
    * instead.
    */
  def topFractionByDomain(df: DataFrame, domainCol: String, keyCol: String,
                          scoreCol: String, num: Int = 1, den: Int = 4): DataFrame = {
    require(num > 0 && den > 0 && num <= den,
      "topFractionByDomain: fraction must be in (0, 1]")
    val byScore = Window.partitionBy(col(domainCol))
      .orderBy(col(scoreCol).desc, col(keyCol))
    val whole = Window.partitionBy(col(domainCol))
    // row_number() is IntegerType: the rank test multiplies in LONG so a
    // domain past Int.MaxValue/den rows can't wrap negative and leak the
    // bottom of the distribution through the gate
    df.withColumn("__rn", row_number().over(byScore).cast("long"))
      .withColumn("__n", count(lit(1)).over(whole))
      .filter(col("__rn") * den <= col("__n") * num)
      .drop("__rn", "__n")
  }

  /** Temperature-scaled domain mixing (α = 1/2): per-domain budgets
    * proportional to √(domain size) instead of raw size — the standard
    * move to up-weight small domains / flatten head domains when
    * composing a training mix (α=1 reproduces natural proportions, α=0 is
    * uniform; √ is the common middle). Rows within a domain are chosen in
    * the same deterministic md5-of-key order as [[domainMix]].
    *
    * Budgets are INTEGER-exact end to end so any engine reproduces them
    * bit-for-bit: weight_d = isqrt(n_d) (floor of a correctly-rounded
    * IEEE sqrt of an integer — exact for any count < 2⁵²), and
    * target_d = total · weight_d div Σweights in integer arithmetic. No
    * float sum ever crosses a floor boundary. Domain counts are collected
    * to the driver — the domain list is small by definition (it's a mix
    * policy), the data never is.
    */
  def domainMixTemperature(df: DataFrame, domainCol: String, keyCol: String,
                           total: Long): DataFrame = {
    // domains compare as strings (works for any key type) and NULL-domain
    // rows get no budget — they can never match the cap chain below, so
    // they are excluded explicitly rather than crashing the driver sort
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as("__d"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    require(counts.nonEmpty, "domainMixTemperature: no non-null domains")
    val weights = counts.map { case (d, n) => (d, math.sqrt(n.toDouble).toLong) }
    val sumW = weights.map(_._2).sum
    require(sumW > 0, "domainMixTemperature: all domains empty")
    val cap = weights.foldLeft(lit(0L)) { case (acc, (d, wgt)) =>
      when(col(domainCol).cast("string") === d, lit(total * wgt / sumW))
        .otherwise(acc)
    }
    val w = Window.partitionBy(col(domainCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Deterministic global shuffle + sharding for training-data export:
    * each row gets a `shard` in [0, numShards) and a 0-based `pos` within
    * its shard, both derived from md5 of the key — a reproducible
    * corpus-wide permutation (same layout every run, every engine) that
    * breaks source/domain ordering before sequential training reads,
    * without `rand()`'s nondeterminism.
    *
    * md5 is uniform so shards are balanced by construction: the per-shard
    * rank window rides a hash shuffle with no hot partition, and a shard
    * maps 1:1 onto an output file for the downstream writer
    * (`df.write.partitionBy("shard")`).
    */
  def shuffleShards(df: DataFrame, keyCol: String, numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val hx = md5(col(keyCol).cast("string"))
    // 15 hex chars < 2^60: non-negative long, no overflow, replayable in
    // any engine with md5 + hex→int
    val shard = conv(substring(hx, 1, 15), 16, 10).cast("long") % numShards
    val w = Window.partitionBy(col("shard")).orderBy(hx, col(keyCol))
    df.withColumn("shard", shard)
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
  }

  /** Rendezvous (highest-random-weight) shard assignment — the STABLE
    * alternative to `hash(key) % N` ([[shuffleShards]]' modulus):
    * growing N → N+1 remaps EVERY key whose modulus changes (~all of
    * them), which at 100 TB means a full re-export because capacity was
    * added. HRW (Thaler & Ravishankar 1996, public knowledge) scores
    * every (key, shard) pair with an independent hash and assigns the
    * argmax — so adding a shard moves exactly the keys the NEW shard
    * now wins (≈ 1/(N+1) of them, and they ALL move TO the new shard),
    * and removing one moves only its own keys. Spec-pinned, both ways.
    *
    * A pure projection: N md5-derived 60-bit scores folded by a
    * struct-ordered array_max, O(N) work per row with NO shuffle —
    * right for policy-sized shard counts (≤ 1024 enforced; consistent
    * hashing with virtual nodes is the same idea when N must be huge).
    * md5 keeps the argmax replayable in any engine.
    */
  def rendezvousShard(id: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 1024,
      s"rendezvousShard: nShards must be in [1, 1024], got $nShards")
    val entries = (0 until nShards).map { sid =>
      struct(
        Sketches.kmvHash60(
          concat(id.cast("string"), lit(":"), lit(sid))).as("h"),
        lit(sid).as("s"))
    }
    array_max(array(entries: _*)).getField("s")
  }

  /** Take rows in `orderCols` order until a global token budget is
    * exhausted — "fill the training mix with the best documents first,
    * stop at N tokens". Emits every row whose running-total-before
    * (`cum_before`) is still under `budget`, so the budget is exceeded by
    * at most one document (the standard convention).
    *
    * The naive formulation is a global-window cumulative sum — a single
    * partition holding the whole corpus. Here it is the two-pass
    * partition-offset scheme (same shape as `Chunker.withChunkIds`):
    * range-partition + sort gives the global order across partitions;
    * pass 1 reduces each partition to one subtotal (a `numPartitions`-long
    * driver array — bytes, not rows); pass 2 streams each partition with
    * its broadcast prefix offset, short-circuiting as soon as the budget
    * is crossed. Partitions that start past the budget emit nothing
    * without reading a row. `tokenCol` must be a non-negative LongType
    * (cast upstream); ordering is total when `orderCols` contain a unique
    * key.
    */
  /** Shared core of the two-pass partition-offset rankers
    * ([[takeByBudget]], [[curriculumBuckets]]): range-partition + sort by
    * `ord`, localCheckpoint the sorted RDD (both passes stream the SAME
    * cached blocks — without truncating lineage the emit pass would
    * re-execute the range shuffle + sort from scratch; blocks live until
    * the session drops persistent RDDs, which the bench does between
    * queries), collect per-partition `weigh` subtotals (driver traffic =
    * #partitions longs), and return (sorted rdd, exclusive prefix sums).
    */
  private def sortedPrefix(df: DataFrame, ord: Seq[Column], parts: Int,
                           weigh: org.apache.spark.sql.Row => Long)
      : (org.apache.spark.rdd.RDD[org.apache.spark.sql.Row], Array[Long]) = {
    val sorted = df.repartitionByRange(parts, ord: _*)
      .sortWithinPartitions(ord: _*)
    val rdd = sorted.rdd.localCheckpoint()
    val subtotals = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += weigh(r))
      Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    (rdd, subtotals.scanLeft(0L)(_ + _))
  }

  def takeByBudget(df: DataFrame, orderCols: Seq[String], tokenCol: String,
                   budget: Long, partitions: Option[Int] = None): DataFrame = {
    require(orderCols.nonEmpty && budget > 0)
    require(df.schema(tokenCol).dataType == org.apache.spark.sql.types.LongType,
      s"tokenCol must be LongType, got ${df.schema(tokenCol).dataType.simpleString}")
    val keyCols = orderCols.map(col).toIndexedSeq
    val spark = df.sparkSession
    val parts = partitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val tokIdx = df.schema.fieldIndex(tokenCol)
    val (rdd, prefix) = sortedPrefix(df, keyCols, parts, { r =>
      // loud contract check here, not an executor NPE three jobs later:
      // nulls and negatives both corrupt the running budget silently
      if (r.isNullAt(tokIdx))
        throw new IllegalArgumentException(
          s"takeByBudget: null token count (tokenCol must be non-null)")
      val t = r.getLong(tokIdx)
      if (t < 0)
        throw new IllegalArgumentException(
          s"takeByBudget: negative token count $t")
      t
    })
    val outSchema = df.schema
      .add("cum_before", org.apache.spark.sql.types.LongType, nullable = false)
    val taken = rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = prefix(pid)
      if (run >= budget) Iterator.empty
      else it.map { r => val before = run; run += r.getLong(tokIdx); (before, r) }
        .takeWhile(_._1 < budget)
        .map { case (before, r) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ before) }
    }
    spark.createDataFrame(taken, outSchema)
  }

  /** Corpus-wide sequence packing: concatenate the (deterministically
    * ordered) corpus into one token stream and assign each document its
    * global token offset and the fixed-length training sequence its
    * first token lands in — the standard "pack documents into S-token
    * rows" pretraining step, at corpus scale. A doc with
    * `cum_before + n_tokens - 1 >= (seq_first + 1)·S` continues into the
    * following sequence(s); `seq_last` reports where its tail lands.
    *
    * Scale shape: delegates the global cumsum to [[takeByBudget]]'s
    * two-pass partition-offset machinery (budget = ∞): one range
    * shuffle, a #partitions-long driver collect, then a pure projection
    * — no single-partition running-sum window.
    */
  def packCorpus(df: DataFrame, orderCols: Seq[String], tokenCol: String,
                 seqLen: Long, partitions: Option[Int] = None): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    // `div`, not `/`: long/long `/` is DOUBLE division in Spark and goes
    // inexact past 2^53 total tokens — integer floor division throughout
    takeByBudget(df, orderCols, tokenCol, Long.MaxValue, partitions)
      .withColumn("seq_first", expr(s"cum_before div ${seqLen}L"))
      .withColumn("seq_last", expr(
        s"greatest(cum_before + $tokenCol - 1, cum_before) div ${seqLen}L"))
  }

  /** Exact curriculum bucketing: global 0-based rank in difficulty order
    * (easy-first by default) and an exact ntile bucket
    * `⌊rank·nBuckets/n⌋` — the schedule tables curriculum training reads
    * (Bengio et al. 2009 curriculum learning — public knowledge).
    *
    * Spark's own `ntile` window collapses an unpartitioned ORDER BY into
    * ONE task; this is the distributed-exact form: range-partition on the
    * order key, sort within partitions, collect only the per-partition
    * COUNTS (driver traffic = #partitions longs), then emit each row's
    * rank as partition-prefix + local index — the same two-pass
    * partition-offset machinery as [[takeByBudget]], one shuffle total.
    */
  def curriculumBuckets(df: DataFrame, keyCol: String, scoreCol: String,
                        nBuckets: Int, easyFirst: Boolean = true,
                        partitions: Option[Int] = None): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = df.sparkSession
    val ord: Seq[Column] = Seq(
      if (easyFirst) col(scoreCol).asc else col(scoreCol).desc,
      col(keyCol).asc)
    val parts = partitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val projected = df.select(col(keyCol), col(scoreCol))
    val scoreIdx = projected.schema.fieldIndex(scoreCol)
    val (rdd, prefix) = sortedPrefix(projected, ord, parts, { r =>
      // a null score has engine-specific sort placement (Spark NULLS
      // FIRST vs DuckDB NULLS LAST) — reject loudly, don't mis-rank
      if (r.isNullAt(scoreIdx))
        throw new IllegalArgumentException(
          s"curriculumBuckets: null $scoreCol (scores must be non-null)")
      1L
    })
    val n = prefix.last
    require(n > 0, "curriculumBuckets needs a non-empty input")
    val outSchema = projected.schema
      .add("rank", org.apache.spark.sql.types.LongType, nullable = false)
      .add("bucket", org.apache.spark.sql.types.IntegerType, nullable = false)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var r = prefix(pid)
      it.map { row =>
        val rank = r; r += 1
        org.apache.spark.sql.Row.fromSeq(
          row.toSeq :+ rank :+ ((rank * nBuckets) / n).toInt)
      }
    }
    spark.createDataFrame(out, outSchema)
  }

  /** DSIR-style importance weighting for data selection (Data Selection
    * via Importance Resampling, Xie et al. 2023 — public knowledge):
    * score each corpus document by how target-domain-like its token
    * distribution is. Per token, the importance ratio is the add-one-
    * smoothed target/source count ratio `(ct+1)/(cs+1)`; a document's
    * score is the sum of its per-occurrence ratios, folded in sorted
    * token order (`aggregate(sort_array(...))` ≡ DuckDB `list_reduce
    * (list(... ORDER BY ...))` — the bm25TopK cross-engine-exact fold).
    * High-score docs are the ones importance resampling keeps.
    *
    * Scale shape: both count tables are VOCAB-sized (bounded — they stop
    * growing once the corpus covers the token space), so the ratio table
    * broadcasts; the corpus explodes once and re-groups by doc id —
    * compact (id, tok, ratio) rows, never full texts. One shuffle for
    * the source counts, one for the per-doc fold.
    */
  def dsirWeights(corpus: DataFrame, target: DataFrame,
                  idCol: String, textCol: String,
                  materialize: Boolean = true): DataFrame = {
    require(target.limit(1).count() > 0,
      "dsirWeights needs a non-empty target corpus")
    // materialize the compact (id, tok) explosion ONCE: the source-count
    // pass and the per-doc fold both read it — without a checkpoint each
    // would re-scan and re-split the corpus (and any expensive upstream,
    // e.g. a quality gate feeding this operator, would run twice)
    val corpusToks0 = corpus.select(col(idCol),
      explode(split(col(textCol), " ")).as("tok"))
    val corpusToks =
      if (materialize) corpusToks0.localCheckpoint(true) else corpusToks0
    val src = corpusToks.groupBy("tok").agg(count(lit(1)).as("cs"))
    val tgt = target.select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("ct"))
    val ratio = dsirRatios(src, tgt)
    corpusToks
      .join(broadcast(ratio), Seq("tok"))
      .select(col(idCol), struct(col("tok"), col("r")).as("c"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        expr("aggregate(sort_array(collect_list(c)), 0.0D, (a, x) -> a + x.r)")
          .as("dsir_score"))
  }

  /** The DSIR smoothed importance-ratio table from (tok, cs) source
    * counts and (tok, ct) target counts: `(ct+1)/(cs+1)` as ONE double
    * division. Shared by [[dsirWeights]] and the streaming gate's model
    * builder — the stream≡batch bit-equality guarantee requires the
    * IDENTICAL expression, so there is exactly one copy of it.
    * Corpus tokens all appear in the source counts by construction →
    * left join; a token unseen in the target smooths to 1/(cs+1).
    */
  def dsirRatios(sourceCounts: DataFrame, targetCounts: DataFrame): DataFrame =
    sourceCounts.join(targetCounts, Seq("tok"), "left")
      .select(col("tok"),
        ((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") /
          (col("cs") + lit(1L)).cast("double")).as("r"))

  /** [[dsirRatios]] from raw corpora — the model-builder form the
    * streaming gate collects (vocab-sized) into its plan-constant table.
    */
  def dsirRatioTable(corpus: DataFrame, target: DataFrame,
                     textCol: String): DataFrame = {
    def counts(df: DataFrame, as: String) =
      df.select(explode(split(col(textCol), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as(as))
    dsirRatios(counts(corpus, "cs"), counts(target, "ct"))
  }

  /** Deterministic weighted sampling by SYSTEMATIC selection over the
    * cumulative weight line: lay the corpus on [0, W) in `orderCols`
    * order (each doc owns the interval [cum_before, cum_before + w)),
    * drop a sample point at every multiple of `step`, and keep each doc
    * with multiplicity = points inside its interval. Inclusion
    * probability is exactly w/step (docs with w ≥ step are always kept,
    * with proportional multiplicity) — the classic
    * probability-proportional-to-size systematic draw, with NO RNG: the
    * draw is a pure function of the ordered weights, so it replays
    * bit-identically in the oracle and is append-stable for audit.
    *
    * Scale shape: the global cumulative weights come from
    * [[takeByBudget]]'s two-pass partition-offset machinery (budget = ∞)
    * — one range shuffle plus a #partitions-long driver collect; the
    * pick arithmetic is a pure integer projection. No global window, no
    * single-task sort.
    *
    * `n_picks = ceil((cum_before + w) / step) − ceil(cum_before / step)`,
    * all in long arithmetic (`div`-based ceil — `/` is double division
    * in Spark and goes inexact past 2⁵³ total weight).
    */
  def systematicSample(df: DataFrame, orderCols: Seq[String],
                       weightCol: String, step: Long,
                       partitions: Option[Int] = None): DataFrame = {
    require(step > 0, s"systematicSample: step must be positive, got $step")
    takeByBudget(df, orderCols, weightCol, Long.MaxValue, partitions)
      .withColumn("n_picks", expr(
        s"((cum_before + $weightCol + ${step}L - 1L) div ${step}L)" +
        s" - ((cum_before + ${step}L - 1L) div ${step}L)"))
      .filter(col("n_picks") >= 1)
  }

  /** Scrub common PII shapes (emails, long digit runs, phone-ish
    * sequences) from a text column — pure regexp projection, the standard
    * pre-training hygiene pass.
    */
  /** Per-stage attrition (funnel) report over an ordered pipeline of
    * named frames: rows surviving each stage and rows the stage dropped
    * — the audit artifact a curation run ships with its output (a
    * pipeline that silently eats 40% of a corpus at one stage should
    * say so in numbers, not be discovered from the final count).
    *
    * Cost: one count aggregate per stage (each a partial-agg scan of
    * that stage's plan — no rows move, only per-partition counts), a
    * #stages-row union, and a window over those #stages rows. Stage
    * plans share scans where Spark can (the frames are usually
    * successive narrowings of one source).
    */
  def funnelReport(stages: Seq[(String, DataFrame)]): DataFrame = {
    require(stages.nonEmpty, "funnelReport: need at least one stage")
    val counts = stages.zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("n_rows"))
        .select(lit((i + 1).toLong).as("stage_no"), lit(name).as("stage"),
          col("n_rows"))
    }
    val w = Window.orderBy("stage_no")
    counts.reduce(_ unionByName _)
      .withColumn("dropped",
        coalesce(lag(col("n_rows"), 1).over(w) - col("n_rows"), lit(0L)))
  }

  /** Turn-level SFT view of a conversation table: rows grouped by
    * `convCol`, ordered by `orderCol`, alternate user/assistant roles
    * (first turn = user), and each turn gets its token interval
    * [tok_start, tok_end) in the assembled sequence — the LOSS MASK a
    * trainer applies (loss only where `loss_turn`, i.e. assistant
    * turns). Token cost of a turn = whitespace tokens of its text + 1
    * for the role tag; same arithmetic as [[sftAssemble]] so intervals
    * align with the assembled string's token stream.
    *
    * Scale: one keyed window (partitioned by conversation) — role
    * parity and the running offset are per-key, never a global sort.
    */
  /** The ONE place the SFT token/role arithmetic lives: a turn costs
    * its whitespace tokens + 1 for the role tag; odd turns (1-based)
    * are the user, even turns the assistant (= the loss turns).
    * [[sftTurns]]' intervals are only valid against [[sftAssemble]]'s
    * assembled text because BOTH route through these.
    */
  private def sftTurnTokens(textCol: String): Column =
    (size(split(col(textCol), " ")) + 1).cast("long")
  private def sftIsUser(turnIdx: Column): Column = turnIdx % 2 === 1

  def sftTurns(docs: DataFrame, convCol: String, orderCol: String,
               textCol: String): DataFrame = {
    val w = Window.partitionBy(col(convCol)).orderBy(col(orderCol))
    docs
      .withColumn("turn_idx", row_number().over(w).cast("long"))
      .withColumn("role",
        when(sftIsUser(col("turn_idx")), lit("user"))
          .otherwise(lit("assistant")))
      .withColumn("turn_tokens", sftTurnTokens(textCol))
      .withColumn("tok_end",
        sum(col("turn_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tok_start", col("tok_end") - col("turn_tokens"))
      .withColumn("loss_turn", col("role") === "assistant")
      .select(col(convCol), col("turn_idx"), col("role"),
        col("turn_tokens"), col("tok_start"), col("tok_end"),
        col("loss_turn"))
  }

  /** Assemble chat-format SFT examples: one row per conversation with
    * the tagged text (`<|user|>\n…\n<|assistant|>\n…`), turn count,
    * total tokens, and `loss_tokens` (assistant-turn tokens — the
    * denominator of a trainer's per-example loss normalization).
    *
    * The per-conversation `collect_list` is bounded by conversation
    * length — the same budget argument as sequence packing, NOT a
    * corpus-sized collect; the groupBy shuffles each turn once, keyed
    * by conversation.
    */
  def sftAssemble(docs: DataFrame, convCol: String, orderCol: String,
                  textCol: String,
                  userTag: String = "<|user|>",
                  assistantTag: String = "<|assistant|>"): DataFrame = {
    val w = Window.partitionBy(col(convCol)).orderBy(col(orderCol))
    val turns = docs
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__role_tag",
        when(sftIsUser(col("__rn")), lit(userTag)).otherwise(lit(assistantTag)))
      .withColumn("__tagged",
        concat(col("__role_tag"), lit("\n"), col(textCol)))
      .withColumn("__toks", sftTurnTokens(textCol))
    turns.groupBy(col(convCol))
      .agg(
        count(lit(1)).cast("long").as("n_turns"),
        sum("__toks").cast("long").as("total_tokens"),
        sum(when(!sftIsUser(col("__rn")), col("__toks")).otherwise(lit(0L)))
          .cast("long").as("loss_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__rn"), col("__tagged")))),
            s => s.getField("__tagged")),
          "\n").as("sft_text"))
      .withColumn("sft_md5", md5(col("sft_text")))
  }

  /** T5-style span corruption (Raffel et al., JMLR 2020 §3.1.4): turn
    * each document into a denoising training pair — mask ~`maskPermille`
    * of whitespace tokens, collapse each RUN of masked tokens to one
    * sentinel in the input, and emit the masked runs (prefixed by their
    * sentinel) as the target. The objective-data op every
    * encoder-decoder / UL2 pretraining pipeline runs over the whole
    * corpus.
    *
    * Masking is a deterministic integer hash of (doc, position) — the
    * shuffle-shards convention, no RNG state — so the pairs are a pure
    * function of the corpus and hash-verify cross-engine:
    * `masked(i) ⇔ (((doc_id % 1000003)·31 + i) % 1000003)·2654435761
    * % 1000000007 % 1000 < maskPermille` (every intermediate ≤ ~2.7·10¹⁵,
    * exact in BIGINT everywhere).
    *
    * Shape: posexplode → two per-doc windows (lag for run starts, a
    * running sum for sentinel numbering) → ordered reassembly via the
    * sorted-struct collect. Everything is keyed by document — per-doc
    * sort + bounded collect_list, never a global window; one shuffle of
    * (doc, pos, token) rows.
    *
    * Output: (idCol, n_tokens, n_masked, n_spans, input_text,
    * target_text) — e.g. "a <extra_id_0> d" / "<extra_id_0> b c".
    */
  def spanCorruptionPairs(docs: DataFrame, idCol: String, textCol: String,
                          maskPermille: Int = 150): DataFrame = {
    require(maskPermille >= 0 && maskPermille <= 1000,
      s"spanCorruptionPairs: maskPermille must be in [0,1000], got $maskPermille")
    val e = docs.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .withColumn("m",
        expr(s"((($idCol % 1000003L) * 31L + pos) % 1000003L) * 2654435761L" +
          s" % 1000000007L % 1000L < ${maskPermille}L"))
    val w = Window.partitionBy(col(idCol)).orderBy("pos")
    val spans = e
      .withColumn("start", col("m") &&
        !coalesce(lag(col("m"), 1).over(w), lit(false)))
      .withColumn("k",
        sum(col("start").cast("long")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
    val sentinel = concat(lit("<extra_id_"), col("k"), lit(">"))
    val pieces = spans
      .withColumn("in_piece",
        when(!col("m"), col("tok"))
          .when(col("start"), sentinel))           // null for span tails
      .withColumn("tgt_piece",
        when(col("m") && col("start"), concat(sentinel, lit(" "), col("tok")))
          .when(col("m"), col("tok")))             // null for kept tokens
    // collect_list skips the null structs of non-contributing rows
    def joined(piece: String): Column =
      array_join(
        transform(
          array_sort(collect_list(when(col(piece).isNotNull,
            struct(col("pos"), col(piece).as("p"))))),
          s => s.getField("p")),
        " ")
    pieces.groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(col("m").cast("long")).as("n_masked"),
        sum(col("start").cast("long")).as("n_spans"),
        joined("in_piece").as("input_text"),
        joined("tgt_piece").as("target_text"))
  }

  def scrubPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol,
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol),
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          // bare digit runs before the phone shape, so an id number
          // scrubs as <NUM> rather than <PHONE>
          "(?<!\\d)\\d{9,}(?!\\d)", "<NUM>"),
        // phone shape is a strict 3-3-4 grouping with optional country
        // code — loose "9+ digit-ish chars" patterns destroy dates,
        // amounts, and version strings in real corpora
        "(?<![\\d.])\\+?\\d{0,2}[\\s.]?\\(?\\d{3}\\)?[\\s.-]\\d{3}[\\s.-]\\d{4}(?![\\d.])",
        "<PHONE>"))

  /** DPO/RLHF preference-pair assembly — the post-training sibling of
    * [[sftAssemble]]: per prompt GROUP, rank candidate responses by
    * `(score desc, id asc)` and pair the single best ("chosen") against
    * each of the next `maxPairs` strictly-worse candidates
    * ("rejected"). Ties are NOT preferences — an equal-scored runner-up
    * produces no pair (a tie teaches the reward model nothing and a
    * deterministic tie-break would fabricate a preference).
    *
    * Scale posture: one keyed rank window (no global sort) and a keyed
    * best-vs-rest join; output ≤ maxPairs rows per group.
    */
  def preferencePairs(df: DataFrame, groupCol: String, idCol: String,
                      scoreCol: String, maxPairs: Int = 3): DataFrame = {
    require(maxPairs >= 1, s"maxPairs must be >= 1, got $maxPairs")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val ranked = df.select(col(groupCol), col(idCol), col(scoreCol))
      .withColumn("__rk", row_number().over(w))
    val best = ranked.filter(col("__rk") === 1)
      .select(col(groupCol), col(idCol).as("chosen_id"),
        col(scoreCol).as("__cs"))
    val rest = ranked.filter(col("__rk") > 1 && col("__rk") <= maxPairs + 1)
      .select(col(groupCol), col(idCol).as("rejected_id"),
        col(scoreCol).as("__rs"))
    best.join(rest, Seq(groupCol))
      .filter(col("__rs") < col("__cs"))
      .select(col(groupCol), col("chosen_id"), col("rejected_id"),
        (col("__cs") - col("__rs")).as("margin"))
  }

  /** k-anonymity audit over quasi-identifier columns — the release gate
    * a data card needs before publishing rows with demographic-ish
    * attributes: one row per quasi-identifier combination with its
    * population and an `at_risk` flag (`n_rows < k` ⇒ the combination
    * identifies fewer than k individuals). ONE partial-aggregable
    * hash-aggregate; no row-level data leaves the executors.
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityAudit: no quasi-identifier columns")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_rows"))
      .withColumn("at_risk", col("n_rows") < k)
  }

  /** Sharded JSONL corpus export — the TEXT sibling of
    * [[Embeddings.exportNpy]] and what a dataset release actually
    * ships: deterministic md5-hash shards ([[shuffleShards]]), one
    * `.jsonl` file per shard written executor-side with rows in shard
    * order and a trailing newline, plus the id manifest. `lineCol`
    * carries the caller's CANONICAL serialized line (explicit field
    * order and escaping — the exporter never re-serializes, so the
    * bytes are a pure function of the input set). The returned report's
    * sha256 is over the exact file bytes — unlike the `.npy` report the
    * WHOLE row (counts, lengths, digest) is cross-engine replayable.
    */
  def exportJsonl(df: DataFrame, idCol: String, lineCol: String,
                  outDir: String, numShards: Int = 16): DataFrame = {
    val sharded = shuffleShards(
      df.select(col(idCol), col(lineCol).cast("string").as(lineCol)),
      idCol, numShards)
    Embeddings.writeShards(sharded, idCol, lineCol, outDir, numShards,
      "jsonl") { rows =>
      val sb = new java.lang.StringBuilder
      rows.foreach { r => sb.append(r.getString(2)).append('\n') }
      (sb.toString.getBytes("UTF-8"), rows.size.toLong, 0L)
    }
  }

  /** Water-filling token-budget allocation across domains — the
    * optimizer behind a training-mix spec: given per-domain available
    * tokens and a total budget B, find the level L with
    * `Σ min(available_d, L) = B` and allocate `min(available_d, L)` —
    * small domains keep everything, large domains are capped at a
    * COMMON level (maximally flat mix under the budget; the classic
    * water-filling solution). All-integer and EXACT: the fractional
    * level splits into `L = (B − P_sat) div n_unsat` plus a remainder
    * distributed as +1 to the first `r` unsaturated domains in
    * (available asc, domain asc) order, so Σ allocated ≡ B when
    * B ≤ Σ available (everything saturates otherwise).
    *
    * Scale posture: corpus work is ONE groupBy count; the sort windows
    * run over the DOMAIN table (vocabulary-sized — the same budget
    * argument as every broadcast model table), never the corpus.
    */
  def domainWaterfill(df: DataFrame, domainCol: String, tokensCol: String,
                      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val avail = df.groupBy(col(domainCol))
      .agg(sum(col(tokensCol)).cast("long").as("available"))
    val w = Window.orderBy(col("available").asc, col(domainCol).asc)
    val ranked = avail
      .withColumn("__k", row_number().over(w).cast("long"))
      .withColumn("__p", sum("available").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = avail.agg(count(lit(1)).cast("long").as("__n"))
    // a domain saturates iff raising everyone to ITS level is
    // affordable: P_{k-1} + c_k·(n−k+1) ≤ B — a prefix of the asc order
    val flagged = ranked.crossJoin(broadcast(tot))
      .withColumn("saturated",
        col("__p") - col("available") +
          col("available") * (col("__n") - col("__k") + 1) <= budget)
    val satStats = flagged.agg(
      sum(when(col("saturated"), 1L).otherwise(0L)).cast("long").as("__i"),
      sum(when(col("saturated"), col("available")).otherwise(0L))
        .cast("long").as("__pi"))
    flagged.crossJoin(broadcast(satStats))
      .withColumn("__rem_n", col("__n") - col("__i"))
      .withColumn("__level",
        when(col("__rem_n") > 0,
          expr(s"(${budget}L - __pi) div __rem_n")).otherwise(lit(0L)))
      .withColumn("__r",
        when(col("__rem_n") > 0,
          expr(s"(${budget}L - __pi) % __rem_n")).otherwise(lit(0L)))
      .withColumn("allocated",
        when(col("saturated"), col("available"))
          .otherwise(col("__level") +
            when(col("__k") - col("__i") <= col("__r"), 1L).otherwise(0L)))
      .select(col(domainCol), col("available"), col("allocated"),
        col("saturated"))
  }

  /** Enforce a [[domainWaterfill]] allocation: per domain, take rows in
    * `keyCol` order until the domain's allocated token budget is
    * reached — each domain may overrun by at most one document
    * (`cum_before < allocated`, the [[takeByBudget]] convention, here
    * per-domain so the cumulative sum is a KEYED window, never a
    * global sort). The end-to-end "fill the mix to budget B" step:
    * allocate with water-filling, then select.
    */
  def waterfillTake(df: DataFrame, domainCol: String, keyCol: String,
                    tokensCol: String, budget: Long): DataFrame = {
    val alloc = domainWaterfill(df, domainCol, tokensCol, budget)
      .select(col(domainCol), col("allocated"))
    val w = Window.partitionBy(col(domainCol)).orderBy(col(keyCol))
    df.withColumn("__cum_before",
        sum(col(tokensCol)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
          col(tokensCol))
      .join(broadcast(alloc), Seq(domainCol))
      .filter(col("__cum_before") < col("allocated"))
      .drop("__cum_before", "allocated")
  }

  /** l-diversity audit — [[kAnonymityAudit]]'s companion: a group can
    * be k-anonymous yet still leak if everyone in it shares the same
    * SENSITIVE value (the homogeneity attack). One row per
    * quasi-identifier combination with its population, the number of
    * distinct sensitive values, and `at_risk` when that diversity is
    * below l. Same one-aggregate shape (count + count distinct
    * partial-aggregate together).
    */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversityAudit: no quasi-identifier columns")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_rows"),
        countDistinct(col(sensitiveCol)).cast("long").as("n_sensitive"))
      .withColumn("at_risk", col("n_sensitive") < l)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * third member of the privacy trilogy: a group can be k-anonymous
    * AND l-diverse yet still leak when its sensitive-value
    * DISTRIBUTION deviates from the corpus's (a group that is 90% one
    * diagnosis reveals plenty even with several distinct values
    * present). One row per quasi-identifier group with its
    * total-variation distance (permille) from the global distribution
    * and `at_risk` when it exceeds `tPermille`.
    *
    * Exact common-denominator arithmetic: per (group, value) the gap
    * is `|n_gv·N − N_v·n_g|` in DECIMAL(38,0) (no float, no overflow),
    * `tv_permille = ⌊10³·Σ_v gap / (2·n_g·N)⌋` — values ABSENT from
    * the group contribute their full global mass (the broadcast
    * cross of groups × the value-domain table makes absences explicit;
    * the sensitive domain is policy-bounded, so the fan-out is a
    * constant factor on the group table).
    */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, tPermille: Long): DataFrame = {
    require(quasiCols.nonEmpty, "tClosenessAudit: no quasi-identifier columns")
    require(tPermille >= 0 && tPermille <= 1000,
      s"tClosenessAudit: tPermille must be in [0,1000], got $tPermille")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val rows = df.select(quasiCols.map(col) :+ col(sensitiveCol).as("__s"): _*)
    val n = rows.count()
    require(n > 0, "tClosenessAudit: empty input")
    val globals = rows.groupBy("__s").agg(count(lit(1)).as("__nv"))
    val gv = rows.groupBy(quasiCols.map(col) :+ col("__s"): _*)
      .agg(count(lit(1)).as("__ngv"))
    val g = gv.groupBy(quasiCols.map(col): _*).agg(sum("__ngv").as("__ng"))
    val gap = abs(
      coalesce(col("__ngv"), lit(0L)).cast(dec) * lit(n).cast(dec) -
        col("__nv").cast(dec) * col("__ng").cast(dec))
    val num = sum(gap).cast(dec) * lit(1000L).cast(dec)
    val den = col("__ng").cast(dec) * lit(n).cast(dec) * lit(2L).cast(dec)
    g.crossJoin(broadcast(globals))
      .join(gv, quasiCols :+ "__s", "left")
      .groupBy(quasiCols.map(col) :+ col("__ng"): _*)
      .agg(((num - num % den) / den).cast("long").as("tv_permille"))
      .select(quasiCols.map(col) :+ col("__ng").as("n_rows") :+
        col("tv_permille") :+
        (col("tv_permille") > tPermille).as("at_risk"): _*)
  }

  /** Enforcement twin of [[kAnonymityAudit]]: SUPPRESS every row whose
    * quasi-identifier combination has fewer than k members (the
    * standard k-anonymization-by-suppression baseline). Broadcast-anti
    * shape when the risky-group set is small — which is exactly the
    * regime suppression is for.
    */
  def kAnonymitySuppress(df: DataFrame, quasiCols: Seq[String],
                         k: Long): DataFrame = {
    val risky = kAnonymityAudit(df, quasiCols, k)
      .filter(col("at_risk")).select(quasiCols.map(col): _*)
    df.join(broadcast(risky), quasiCols, "left_anti")
  }
}
