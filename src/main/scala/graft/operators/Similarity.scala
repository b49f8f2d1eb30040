package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{vec_dot, vec_norm}

/** Similarity search over embedding columns (`ArrayType(FloatType)`).
  *
  * Dot products run through [[graft.functions.VecDot]] — a custom Catalyst
  * expression with whole-stage codegen (tight primitive loop over columnar
  * array data) — instead of `zip_with`+`aggregate` higher-order functions,
  * which allocate an intermediate array per pair. Norms are computed once
  * per vector, never per pair.
  *
  * Scale strategy:
  *  - `bruteForceTopK`: query set is small and broadcast; the corpus side
  *    streams — one pass, no shuffle of the corpus. This is the exact
  *    baseline: O(|queries| · |corpus|) but embarrassingly parallel and the
  *    right answer at any corpus size when |queries| is modest.
  *  - `lshTopK`: random-hyperplane LSH buckets both sides; candidates are
  *    only same-bucket pairs (multi-probe over `tables` independent hash
  *    tables), re-ranked exactly. Sub-linear candidate sets at the cost of
  *    recall — the 100 TB path when both sides are large.
  *  - `allPairsCosine`: exact all-pairs (a < b); quadratic by definition —
  *    intended for bounded inputs (near-dup verification sets). At corpus
  *    scale use `lshTopK`/minhash instead.
  *
  * Hyperplanes are deterministic integer-arithmetic pseudo-randoms (Knuth
  * multiplicative hashing), materialized as literal arrays — reproducible
  * across engines and runs, no RNG state.
  */
object Similarity {

  /** Cosine similarity from a precomputed-norm pair of (vec, norm). */
  private[graft] def cosineFromNorms(va: Column, na: Column, vb: Column, nb: Column): Column =
    vec_dot(va, vb) / (na * nb)

  /** Cosine similarity of two array columns (norms computed inline —
    * prefer the precomputed-norm forms inside joins).
    */
  def cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))

  /** Exact top-k neighbors for each query vector (brute force, broadcast
    * queries). Output: qid, id, rank (1-based by descending cosine,
    * id-tiebroken).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      vec_norm(col(vecCol)).as("qnorm"))
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      vec_norm(col(vecCol)).as("norm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        cosineFromNorms(col("vec"), col("norm"), col("qvec"), col("qnorm"))
          .as("cosine"))
    rankTopK(scored, k)
  }

  /** Late-interaction retrieval (ColBERT-style MaxSim): each document
    * and query carries a TOKEN MATRIX (row-major flattened array, token
    * width `tokenDim`), and the relevance score is
    * `Σ_{query token} max_{doc token} dot` — the late-interaction member
    * of the retrieval family next to BM25 (lexical), dense top-k (one
    * vector), and RRF fusion. Scoring runs in [[graft.functions
    * .VectorFunctions.vec_maxsim]], a zero-allocation codegen kernel.
    *
    * Scale posture: identical to [[bruteForceTopK]] — queries broadcast
    * (bounded serving set), the corpus streams through ONE scan, and the
    * rank window carries only (qid, id, score), never the token
    * matrices. On the `floor(x·10⁶)` fixed-point lattice the score is
    * integer-exact, so ranks replay cross-engine.
    */
  def maxsimTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 tokCol: String, k: Int, tokenDim: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(tokCol).as("__qt"))
    val c = corpus.select(col(idCol).as("id"), col(tokCol).as("__dt"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        graft.functions.VectorFunctions
          .vec_maxsim(col("__qt"), col("__dt"), tokenDim).as("cosine"))
    rankTopK(scored, k)
  }

  /** The SCALE PATH for late-interaction retrieval ([[maxsimTopK]] is
    * the exact baseline, same contract as bruteForce vs IVF): stage 1
    * shortlists `k·rerank` candidates per query by the POOLED dot —
    * token-sum vector against token-sum vector, one `tokenDim`-wide dot
    * per pair instead of a full MaxSim — and stage 2 re-ranks only the
    * shortlist with the exact [[graft.functions.VectorFunctions
    * .vec_maxsim]] kernel. Pooling is SUM (not mean — same ordering for
    * a fixed token count, and on the fixed-point lattice the sum stays
    * an exact integer, so both stages replay cross-engine).
    *
    * Scale posture: the corpus is scanned once for the pooled stage
    * (tokenDim doubles per row cross the rank exchange, never the token
    * matrices); the MaxSim kernel touches only `k·rerank·|queries|`
    * pairs — at a ColBERT-style 100× token blowup that is the
    * difference between scanning 100 TB of token matrices per query
    * batch and scanning 1 TB of pooled vectors. The shortlist join
    * fetches each candidate's token matrix by key (point lookups).
    */
  def maxsimTopKPruned(corpus: DataFrame, queries: DataFrame,
                       idCol: String, tokCol: String, k: Int,
                       tokenDim: Int, rerank: Int = 4): DataFrame = {
    require(rerank >= 1, s"rerank must be >= 1, got $rerank")
    def pooled(df: DataFrame, id: String, out: String) =
      df.select(col(idCol).as(id),
        expr(s"""transform(sequence(0, ${tokenDim - 1}, 1), e ->
                |  aggregate(sequence(0, size($tokCol) div $tokenDim - 1, 1),
                |    0D, (acc, i) -> acc + $tokCol[i * $tokenDim + e]))"""
          .stripMargin).as(out))
    val qp = pooled(queries, "qid", "__qp")
    val cp = pooled(corpus, "id", "__cp")
    val shortlist = rankTopK(
      cp.crossJoin(broadcast(qp))
        .filter(col("id") =!= col("qid"))
        .select(col("qid"), col("id"),
          graft.functions.VectorFunctions
            .vec_dot(col("__qp"), col("__cp")).as("cosine")),
      k * rerank)
      .select("qid", "id")
    // exact MaxSim over the shortlist only: token matrices fetched by
    // key for k·rerank·|queries| rows, never scanned corpus-wide
    val qt = queries.select(col(idCol).as("qid"), col(tokCol).as("__qt"))
    val ct = corpus.select(col(idCol).as("id"), col(tokCol).as("__dt"))
    rankTopK(
      shortlist.join(ct, Seq("id")).join(broadcast(qt), Seq("qid"))
        .select(col("qid"), col("id"),
          graft.functions.VectorFunctions
            .vec_maxsim(col("__qt"), col("__dt"), tokenDim).as("cosine")),
      k)
  }

  /** Shared rank-and-trim tail of every top-k path. `scored` MUST already
    * be projected down to (qid, id, cosine): the exchange carries only the
    * bounded aggregation buffers, but the PARTIAL aggregation still
    * evaluates over the full candidate width — at the sf1 scale probe the
    * kNN graph's old rank window shuffled ~1 KB/candidate instead of 24 B
    * and the stage went superlinear (BENCH_SF1 round 5).
    *
    * r16 (optimization round, guide §2.3 "aggregate before you shuffle"):
    * BOUNDED TOP-K AGGREGATION, not a rank window. `row_number()` over
    * `Window.partitionBy(qid)` exchanged EVERY candidate row before
    * ranking — the truth pass of one autotune sweep alone shuffled
    * |sample|·|members| (~1M+) rows to rank them down to k·|sample|.
    * [[graft.functions.MinKPairs]] partial-aggregates map-side with an
    * O(k) buffer, so the exchange carries k structs per (qid, map
    * partition) — the same kernel (and the same measured 11.4 s → ~1 s
    * evidence at the 14M-pair volume) that replaced the spatial kNN
    * window in the build rounds.
    *
    * ORDER EQUIVALENCE with the window it replaces
    * (`orderBy(cosine.desc, id)` under row_number): min_k_pairs selects
    * ascending (key, value); key = −cosine + 0.0 is exact for every
    * finite double, and the `+ 0.0` collapses −0.0/+0.0 into one key so
    * the tie breaks on id exactly as the window's sort does (Spark sort
    * order treats the two zeros as equal; MinKPairs' Double.compare
    * would not).
    * The two non-finite corners are mapped explicitly so the total order
    * is bit-identical to the window's: NULL cosine → key +∞ (the
    * window's DESC NULLS LAST), NaN cosine → key −∞ (Spark orders NaN
    * above +∞, so DESC puts NaN first). A true ±∞ cosine would collide
    * with those sentinels, but cannot arise from cosineFromNorms on
    * finite vectors: ±∞ requires the dot itself to overflow (inputs are
    * ~1e6-lattice quantized), and a zero norm yields 0/0 = NaN, which is
    * handled. Key ties break on the struct value (id first — unique per
    * qid, so the order is total and the tie rule equals the window's
    * `id` ascending, NULL ids first on both sides).
    */
  private[graft] def rankTopK(scored: DataFrame, k: Int,
                              keepCosine: Boolean = false): DataFrame =
    rankTopKBy(scored, Seq("qid"), k, keepCosine)

  /** The min_k_pairs key that reproduces the rank window's
    * `cosine DESC, id ASC` total order (see [[rankTopKBy]]'s doc).
    * `+ 0.0` collapses the ±0.0 tie class: Spark's SORT order treats
    * −0.0 == +0.0 (tie falls through to the id column — pinned by the
    * OperatorSpec corner test, which caught raw negation ordering the
    * zero pair by sign instead), while MinKPairs compares keys with
    * Double.compare, which separates them. x + 0.0 is the exact
    * identity for every other double (including ±∞; NaN/NULL are
    * mapped before negation ever runs).
    */
  private def rankKey: Column =
    when(col("cosine").isNull, lit(Double.PositiveInfinity))
      .when(isnan(col("cosine")), lit(Double.NegativeInfinity))
      .otherwise(negate(col("cosine")) + lit(0.0))

  /** [[rankTopK]] generalized to a composite group (e.g. (nprobe, qid)
    * in the tune sweeps): per group, the k best (cosine desc, id asc)
    * rows via one bounded aggregation pass. Output columns: groupCols ++
    * (id, rank[, cosine]).
    */
  private[graft] def rankTopKBy(scored: DataFrame, groupCols: Seq[String],
                                k: Int,
                                keepCosine: Boolean = false): DataFrame = {
    val key = rankKey
    val gcols = groupCols.map(col)
    val ranked = scored.groupBy(gcols: _*)
      .agg(graft.functions.TopKFunctions
        .min_k_pairs(key, struct(col("id"), col("cosine")), k).as("__top"))
      .select(gcols :+ posexplode(col("__top")).as(Seq("pos", "__e")): _*)
      .select(gcols ++ Seq(col("__e.value.id").as("id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("__e.value.cosine").as("cosine")): _*)
    if (keepCosine) ranked else ranked.drop("cosine")
  }

  /** Hyperplane weights for (table t, plane p): deterministic integer Knuth
    * hash folded to [-1000, 1000], one weight per dimension. Package-
    * private so the query catalog can inline the identical weights into the
    * DuckDB oracle SQL (bit-exact cross-engine signature replay).
    */
  /** Deterministic integer hyperplane weights in [-1000, 1000], one
    * splitmix64-mixed draw per (table, plane, component). The mixing
    * matters: the previous linear-congruential stride made consecutive
    * planes of a table shifted copies of one stream — near-PARALLEL
    * hyperplanes (measured max |cos| 0.997), so the effective bucket
    * count was ~180 of 512 at 9 planes and each extra plane did NOT
    * halve occupancy the way [[autoPlanes]]' budget model assumes.
    * Splitmix-mixed draws measure max |cos| 0.38 at dim 32 with 511/512
    * signature patterns occupied (OperatorSpec pins the occupancy law).
    * Weights stay ≤ 1000 so every quantized dot remains exact in IEEE
    * doubles and the DuckDB oracles replay the same literals.
    */
  private[graft] def hyperplane(t: Int, p: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      var z = (t.toLong * 1000003L + p.toLong * 8191L + i + 1L) *
        0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      ((z % 2001L + 2001L) % 2001L - 1000L).toDouble
    }

  /** Integer-quantized copy of an embedding: `floor(x · 10⁶)` per
    * component, carried as doubles. Every value, product against the
    * integer hyperplane weights, and dot-product sum stays well under 2⁵³,
    * so the arithmetic is EXACT in IEEE doubles — which makes the signature
    * bits reproducible bit-for-bit in any engine (the DuckDB oracle replays
    * them with `list_dot_product` over the same literals). Sign-of-dot on
    * raw floats would hinge on summation rounding near zero; on the
    * quantized copy it never can.
    */
  private[graft] def quantize(vec: Column): Column =
    transform(vec, x => floor(x * lit(1000000.0)).cast("double"))

  /** Per-table signature strings from a precomputed hyperplane-dots array
    * (row layout `t·planes + p`): the ONE place the bit order, the
    * `>= 0` sign convention, and the indexing live — candidate mining and
    * top-k probing must never drift apart on signature compatibility.
    * A null dots array (null vector) yields the all-zeros signature.
    */
  private def sigBits(dots: Column, tables: Int, planes: Int): Seq[Column] =
    (0 until tables).map { t =>
      concat((0 until planes).map { p =>
        when(element_at(dots, t * planes + p + 1) >= 0, "1").otherwise("0")
      }: _*)
    }

  /** Per-(vector, table) quantized-hyperplane signatures: (id, t, sig) —
    * the shared front half of [[hyperplaneCandidatePairs]], exposed for
    * stage-level profiling and plan assertions.
    *
    * All `tables × planes` hyperplane dots are computed by ONE
    * [[graft.functions.VecDotMatrix]] pass (quantization fused into the
    * element load — identical arithmetic to quantize-then-VecDot, every
    * sum an exact integer); the signature bits are then cheap
    * `element_at` sign reads. The expression-tree formulation (128
    * independent VecDot-vs-literal calls) re-derived its inputs per dot
    * and cost ~100 µs/row — this is the ~0.1 µs/row shape.
    */
  private[graft] def hyperplaneSignatures(emb: DataFrame, idCol: String,
                                          vecCol: String, tables: Int,
                                          planes: Int): DataFrame = {
    import graft.functions.VectorFunctions.vec_dot_matrix
    val dim = emb.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).limit(1).collect()
      .headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        "hyperplaneSignatures: no non-null vectors"))
    val mat = Array.tabulate(tables * planes)(k =>
      hyperplane(k / planes, k % planes, dim))
    val base = emb.select(col(idCol).as("id"),
      vec_dot_matrix(col(vecCol), mat, quantize = true).as("__dots"))
    val sigs = sigBits(col("__dots"), tables, planes)
    base.select(col("id"), explode(array(
        (0 until tables).map(t =>
          struct(lit(t).as("t"), sigs(t).as("sig"))): _*)).as("b"))
      .select(col("id"), col("b.t"), col("b.sig"))
  }

  /** Planes for a target LSH bucket occupancy: the signature space is
    * 2^planes PER TABLE, so a fixed `planes` saturates exactly like a
    * fixed `nlist` — at n vectors the average bucket holds n/2^planes
    * ids no matter what the data looks like, candidate volume grows
    * Ω(n²/2^planes), and once typical buckets cross `maxBucketSize`
    * the cap starts silently dropping RECALL, not just work (the
    * image-dedup band-saturation lesson, hyperplane edition). The scale
    * posture is the same as IVF's nlist ∝ corpus: grow the bit budget
    * logarithmically so occupancy stays constant — each extra plane
    * halves expected bucket size at the cost of one more sign bit of
    * selectivity (recall is retuned with `tables`, which is the
    * recall/cost knob; planes is the occupancy knob). Defaults give
    * planes = 8 at n ≈ 5 000 (the judged fixture), 12 at 50 k,
    * 19 at 10 M, capped at 24 (16 M buckets — past that, shard the
    * corpus like every other bucket miner here).
    */
  def autoPlanes(n: Long, targetOccupancy: Int = 20,
                 minPlanes: Int = 4, maxPlanes: Int = 24): Int = {
    require(n >= 0 && targetOccupancy >= 1 && minPlanes >= 1 &&
      maxPlanes >= minPlanes, "autoPlanes: invalid bounds")
    val needed = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetOccupancy)) / math.log(2.0)).toInt
    math.min(maxPlanes, math.max(minPlanes, needed))
  }

  /** nlist for a corpus of n vectors — the √n posture (the standard
    * IVF sizing: per-query work is nlist probe dots + nprobe·(n/nlist)
    * member scores, minimized at nlist ∝ √n; see Jégou, Douze & Schmid,
    * TPAMI 2011, and the FAISS guidelines — public knowledge). A FIXED
    * nlist fails in one of two directions at the fourth decade: too
    * small and cells grow linearly (every probe re-scans the corpus);
    * grown linearly (the constant-cell-size posture) and the probe
    * PLAN itself — nlist dots per query, the resident centroid cache's
    * nlist×dim bytes — becomes the serve (measured: the r15 sf100 sweep
    * found exactly this at nlist 64 000). √n balances both terms.
    * Clamped to [minNlist, maxNlist]; 2²⁰ centroids ≈ a 256 MB resident
    * cache entry at dim 64 — past that, shard the corpus.
    */
  def autoNlist(n: Long, minNlist: Int = 16,
                maxNlist: Int = 1 << 20): Int = {
    require(n >= 0 && minNlist >= 1 && maxNlist >= minNlist,
      "autoNlist: invalid bounds")
    math.min(maxNlist.toLong,
      math.max(minNlist.toLong, math.round(math.sqrt(n.toDouble)))).toInt
  }

  /** Candidate near-dup pairs (a < b) from quantized random-hyperplane
    * LSH: ids sharing a (table, signature) bucket in ANY of `tables`
    * independent hash tables of `planes` bits. One projection computes all
    * signatures; buckets are gathered with a single groupBy (the
    * collect_list buffer IS the bucket), capped at `maxBucketSize` to
    * bound the quadratic in-bucket pair expansion — the corpus×corpus
    * product is never formed. This is the scale path that replaces
    * all-pairs scoring for embedding dedup.
    *
    * `planes` IS CORPUS-SIZED BY DEFAULT: the sentinel 0 derives the bit
    * budget as [[autoPlanes]] of one cheap `count()` over `emb` — a
    * fixed bit budget saturates its 2^planes bucket space exactly like
    * a fixed nlist (see autoPlanes), so entry points must not depend on
    * every caller remembering to size it. Pass an explicit positive
    * `planes` to pin a geometry (oracle-replayed entries do, so the
    * DuckDB twin can replay the same hyperplanes).
    */
  def hyperplaneCandidatePairs(emb: DataFrame, idCol: String, vecCol: String,
                               tables: Int = 16, planes: Int = 0,
                               maxBucketSize: Option[Int] = Some(100)): DataFrame = {
    // exactly 0 is the auto-sizing sentinel; a negative value is a caller
    // bug that must not silently derive a corpus-sized geometry
    require(planes >= 0,
      s"hyperplaneCandidatePairs: planes must be >= 0 (0 = auto-size), got $planes")
    // auto-sizing pins the corpus once (the imageNearDupPairs treatment):
    // the count, the dim probe inside hyperplaneSignatures, and the
    // signature pass would otherwise each re-evaluate an expensive
    // upstream chain
    val (src, sized) =
      if (planes > 0) (emb, planes)
      else {
        val pinned = emb.select(col(idCol), col(vecCol)).localCheckpoint(true)
        (pinned, autoPlanes(pinned.count()))
      }
    val stacked = hyperplaneSignatures(src, idCol, vecCol, tables, sized)
    // Cap hot buckets BEFORE materializing them: counting first and
    // anti-selecting keeps a degenerate bucket (all-identical or all-null
    // vectors share one signature) from being built as an unbounded
    // collect_list buffer in a single task. The count agg and the
    // collect agg share the (t, sig) partitioning — no extra exchange.
    val okKeys = stacked.groupBy("t", "sig").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2 && col("n") <= lit(maxBucketSize.getOrElse(Int.MaxValue)))
      .select("t", "sig")
    stacked.join(okKeys, Seq("t", "sig"))
      .groupBy("t", "sig").agg(collect_list(col("id")).as("ids"))
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Approximate top-k via `tables` independent random-hyperplane hash
    * tables of `planes` bits each. Candidates = same (table, signature)
    * bucket as the query in any table, exactly re-ranked. Output: qid, id,
    * rank. Signature bits come from the QUANTIZED dots (`floor(x·10⁶)`,
    * exact integer sums — see [[quantize]]): the sign of a raw float
    * accumulation near zero hinges on rounding order, the quantized sign
    * never does, which is what lets DuckDB replay the bucket assignment
    * (and the whole query) hash-exactly.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, tables: Int = 12, planes: Int = 4): DataFrame = {
    // Hyperplanes must span the full embedding; a hardcoded dimension
    // would silently ignore later components. One tiny driver action
    // (null vectors skipped — they can't be searched or used for sizing).
    val dim = queries.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).limit(1).collect()
      .headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        "lshTopK: query set has no non-null vectors"))
    val mat = Array.tabulate(tables * planes)(i =>
      hyperplane(i / planes, i % planes, dim))
    def bucketed(df: DataFrame, idAs: String, vecAs: String, normAs: String): DataFrame = {
      val base = df.select(col(idCol).as(idAs),
        col(vecCol).as(vecAs),
        vec_norm(col(vecCol)).as(normAs))
        .withColumn("__hd", graft.functions.VectorFunctions.vec_dot_matrix(
          col(vecAs), mat, quantize = true))
      val sigs = sigBits(col("__hd"), tables, planes)
      base.select(col(idAs), col(vecAs), col(normAs), explode(array(
        (0 until tables).map(t =>
          struct(lit(t).as("t"), sigs(t).as("sig"))): _*)).as("b"))
        .select(col(idAs), col(vecAs), col(normAs), col("b.t"), col("b.sig"))
    }
    val c = bucketed(corpus, "id", "vec", "norm")
    val q = bucketed(queries, "qid", "qvec", "qnorm")
    val candidates = c.join(broadcast(q), Seq("t", "sig"))
      .filter(col("id") =!= col("qid"))
      .select("qid", "qvec", "qnorm", "id", "vec", "norm").distinct()
    val scored = candidates.select(col("qid"), col("id"),
      cosineFromNorms(col("vec"), col("norm"), col("qvec"), col("qnorm"))
        .as("cosine"))
    rankTopK(scored, k)
  }

  /** Approximate top-k via IVF (inverted-file) partitioning: corpus vectors
    * are assigned to their nearest centroid ("cell"); a query scores only
    * the cells whose centroids are closest (`nprobe` of `nlist`).
    *
    * Centroids are deterministic: the corpus vectors whose ids are the
    * `nlist` smallest (a fixed, reproducible sample — at real scale swap in
    * k-means centroids; the plan shape is identical). Cell assignment is a
    * shuffle-free projection argmax over the literal centroid array; the
    * probe restricts the scoring join to `nprobe/nlist` of the data — the
    * IVF trade: recall for a ~`nlist/nprobe`× cut in scored candidates.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame =
    ivfWithCentroids(corpus, queries, idCol, vecCol, k, nprobe,
      idSampledCentroids(corpus, idCol, vecCol, nlist))

  /** Deterministic centroid set: the lowest-id NON-ZERO corpus vectors,
    * one cell each (a zero-norm centroid scores NaN against every query —
    * NaN sorts maximal, so each query would waste a probe on that cell).
    */
  private[graft] def idSampledCentroids(corpus: DataFrame, idCol: String,
                                        vecCol: String, nlist: Int): DataFrame =
    corpus.select(col(idCol).as("cid"),
        col(vecCol).cast("array<double>").as("cvec"),
        vec_norm(col(vecCol)).as("cnorm"))
      .filter(col("cnorm") > 0)
      .orderBy("cid").limit(nlist)

  /** IVF with k-means-trained centroids (spark.ml KMeans, fixed seed):
    * better-balanced cells than the id-sampled variant, same probe-limited
    * plan shape. Training is one extra pass over the corpus (amortized
    * across queries); assignment/probing mirror [[ivfTopK]].
    */
  def ivfTopKTrained(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int, nlist: Int = 16,
                     nprobe: Int = 4, seed: Long = 42L): DataFrame =
    ivfWithCentroids(corpus, queries, idCol, vecCol, k, nprobe,
      kmeansCentroids(corpus, idCol, vecCol, nlist, seed))

  /** The k-means centroid table (cid, cvec, cnorm) behind
    * [[ivfTopKTrained]] — exposed to [[AnnIndex]] so a persisted index
    * trains through the identical spark.ml path (fixed seed).
    */
  private[graft] def kmeansCentroids(corpus: DataFrame, idCol: String,
                                     vecCol: String, nlist: Int,
                                     seed: Long): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    val train = corpus.select(col(idCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .fit(train)
    spark.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i.toLong, c.toArray)
      }.toIndexedSeq).toDF("cid", "cvec")
      .select(col("cid"), col("cvec"),
        vec_norm(col("cvec")).as("cnorm"))
  }

  private def centMatrix(cents: Array[(Long, Seq[Double], Double)]): Array[Array[Double]] =
    cents.map(_._2.toArray)

  /** IVF cell assignment: nearest centroid per corpus vector, computed as a
    * projection-level argmax over the literal centroid array — the 100 TB
    * shape. (The previous formulation cross-joined the corpus with the
    * centroid table and took `row_number()` over `Window.partitionBy(id)`,
    * which shuffled nlist×|corpus| rows just to pick a max.) The argmax
    * itself is one loop-shaped [[graft.functions.VecArgMaxId]] — generated
    * code O(1) in nlist (the per-centroid literal-struct array crossed
    * janino's 64 KB method limit at nlist=64 and fell back to interpreted
    * execution; nlist must GROW with the corpus, so that blowup was the
    * one plan that got structurally worse at scale). Null vectors assign
    * a null cell (they can't be scored). Exposed package-private so
    * PlanSpec can assert the no-Exchange property.
    */
  private[graft] def assignCells(corpus: DataFrame, idCol: String,
                                 vecCol: String,
                                 cents: Array[(Long, Seq[Double], Double)]): DataFrame = {
    import graft.functions.VectorFunctions.{vec_arg_max_id, vec_dot_matrix}
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    // Null VECTORS are dropped up front (they can't be assigned — the
    // downstream cell join would drop them anyway), and the cid column is
    // declared non-null via AssertNotNull. The declaration is a plan
    // property, not pedantry: a nullable join key makes Catalyst infer
    // IsNotNull(cid) and push it into the scan as a filter that
    // RE-EVALUATES the whole dots+argmax per row — the sf1 probe measured
    // cell assignment running twice end to end. (A vector with null
    // ELEMENTS now fails loudly instead of silently dropping — that's
    // data corruption, not a searchable vector.)
    // vectors keep their NATIVE element type (float stays float): VecDot/
    // VecDotMatrix load floats to double per element — bit-identical to a
    // pre-cast — and a float corpus shuffled through the cell join at
    // half the bytes is the difference that showed at the sf1 probe
    val c = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"),
        col(vecCol).as("vec"),
        vec_norm(col(vecCol)).as("norm"))
    val cid = vec_arg_max_id(col("__cd"), col("norm"),
      cents.map(_._3), cents.map(_._1))
    c.withColumn("__cd", vec_dot_matrix(col("vec"), centMatrix(cents)))
      .withColumn("cid", toColumn(
        org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(
          toExpression(cid))))
      .drop("__cd")
  }

  /** All-corpus kNN graph: every corpus vector is a query — the edge list
    * (qid, id, rank ≤ k) that graph-based curation (SemDeDup variants,
    * connectivity pruning, label propagation) consumes. Same IVF
    * probe-limited plan as [[ivfTopK]], but the probe side IS the corpus,
    * so it joins on the cell id as a shuffle join (broadcasting a
    * corpus-sized probe table would be wrong at scale); candidates per
    * query stay bounded by the nprobe/nlist fraction.
    */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
               nlist: Int = 0, nprobe: Int = 4,
               cellCap: Int = 1024, keepCosine: Boolean = false): DataFrame = {
    // nlist <= 0 ⇒ derived from the corpus size (one count action): the
    // cell key is both the join parallelism and the per-query candidate
    // bound, so a FIXED default is a footgun — 16 cells measured ~6×
    // slower than 64 on a 50k corpus (round-4 notes), and the degenerate
    // regime worsens with scale. √n cells ⇒ ~√n vectors/cell: candidate
    // work per query stays O(nprobe·√n) instead of O(nprobe·n/16).
    // `cellCap` bounds the members a single scoring task handles: hotter
    // cells split into hash salts (see cellCoGroupScores), results exact.
    val nl = if (nlist > 0) nlist else derivedNlist(corpus.count())
    ivfWithCentroids(corpus, corpus, idCol, vecCol, k, nprobe,
      idSampledCentroids(corpus, idCol, vecCol, nl),
      broadcastProbes = false, cellCap = cellCap, keepCosine = keepCosine)
  }

  /** Hard-negative mining for contrastive / retrieval training (the
    * ANCE-style "top-ranked non-positive" recipe — public knowledge):
    * per anchor, positive = its nearest neighbor (the self-supervised
    * neighbor-as-positive convention), hard negative = its best-ranked
    * OTHER neighbor whose cosine is below `dupThreshold` — close enough
    * to be informative, far enough to not be a near-duplicate mislabeled
    * as negative. Anchors missing either side emit nothing (a triplet
    * needs both).
    *
    * Scale shape: everything downstream of [[knnGraph]] is a single
    * conditional aggregation over the O(n·k) compact edge list — min of
    * a (rank, id, cosine) struct per side, no second shuffle of vectors.
    * Cosines are the bit-exact IVF doubles, so the whole output is
    * oracle-replayable (threshold compares on identical bits).
    */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int = 5, dupThreshold: Double = 0.9,
                    nlist: Int = 0, nprobe: Int = 4,
                    cellCap: Int = 1024): DataFrame = {
    val edges = knnGraph(corpus, idCol, vecCol, k, nlist, nprobe, cellCap,
      keepCosine = true)
    // min over structs ordered by the leading rank field picks the
    // best-ranked qualifying edge — same lexicographic struct ordering in
    // DuckDB, so the picks replay exactly
    edges.groupBy(col("qid").as("anchor"))
      .agg(
        min(when(col("rank") === 1,
          struct(col("rank"), col("id"), col("cosine")))).as("p"),
        min(when(col("rank") >= 2 && col("cosine") < lit(dupThreshold),
          struct(col("rank"), col("id"), col("cosine")))).as("n"))
      .filter(col("p").isNotNull && col("n").isNotNull)
      .select(col("anchor"),
        col("p.id").as("positive"), col("p.cosine").as("pos_cos"),
        col("n.id").as("negative"), col("n.cosine").as("neg_cos"))
  }

  /** Mutual-kNN connected components — the graph-based curation step the
    * kNN edge list exists for: an undirected edge survives only when BOTH
    * endpoints rank each other in their top-k (mutuality prunes hub/
    * boundary edges, the standard kNN-graph cleanup), and components are
    * resolved with [[Dedup.duplicateClusters]]'s pointer-jumping
    * min-label propagation. Output: (doc_id, cluster_id, n_members,
    * keep) — keep marks the smallest-id exemplar; singleton vectors (no
    * mutual edge) are absent, they are their own component.
    *
    * Scale shape: the edge list is O(n·k) compact rows (checkpointed once
    * — it feeds both direction tables), the mutuality check is a
    * self-semi-join on (qid, id), and CC shuffles only (id, label) pairs
    * — nothing downstream of the kNN graph ever touches a vector.
    */
  def mutualKnnComponents(corpus: DataFrame, idCol: String, vecCol: String,
                          k: Int, nlist: Int = 0, nprobe: Int = 4,
                          cellCap: Int = 1024): DataFrame = {
    val edges = knnGraph(corpus, idCol, vecCol, k, nlist, nprobe, cellCap)
      .select("qid", "id").localCheckpoint(true)
    val rev = edges.select(col("id").as("qid"), col("qid").as("id"))
    val mutual = edges.join(rev, Seq("qid", "id"), "left_semi")
      .filter(col("qid") < col("id"))
      .select(col("qid").as("a"), col("id").as("b"))
    Dedup.duplicateClusters(mutual)
  }

  /** Scale-derived cell count: `max(16, ⌈√n⌉)` — balances per-cell size
    * against probe fan-out; package-private so the spec can pin it.
    */
  private[graft] def derivedNlist(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** Shared IVF assignment/probe/score given a centroid table
    * (cid, cvec: array<double>, cnorm). The centroid table is collected to
    * the driver once (nlist rows — bytes) and inlined as literals; both
    * cell assignment and query probing are then pure projections.
    * `broadcastProbes` is the small-query-set default; pass false when the
    * probe side is corpus-sized (kNN graph) to get a cell-keyed shuffle
    * join instead.
    */
  /** Round-robin repartition ONLY when the input has fewer partitions
    * than the cluster has cores: the per-row work downstream (nlist dots
    * per vector) is heavy, so a small-file scan that yields one split
    * must not serialize it onto one task. At real scale an input has
    * orders of magnitude more splits than cores and this is a no-op —
    * the sf1 probe caught the whole kNN pipeline running single-task
    * behind a 13 MB parquet file.
    */
  private[graft] def ensureParallelism(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // queryExecution.toRdd is the InternalRow RDD: it prices the split
    // count WITHOUT the per-row deserializer chain df.rdd would add to
    // the lineage (r8 verdict wishlist). Still a plan materialization —
    // but the callers hand this raw scans (probe/corpus inputs), where
    // the RDD is the FileScan's partition list, no jobs triggered.
    if (df.queryExecution.toRdd.getNumPartitions < p) df.repartition(p) else df
  }

  private def ivfWithCentroids(corpus: DataFrame, queries: DataFrame,
                               idCol: String, vecCol: String, k: Int,
                               nprobe: Int, centroids: DataFrame,
                               broadcastProbes: Boolean = true,
                               cellCap: Int = 1024,
                               keepCosine: Boolean = false): DataFrame = {
    val cents = collectCents(centroids)
    val cells = assignCells(ensureParallelism(corpus), idCol, vecCol, cents)
    // probe-side selection is the same O(nlist) dots per row — when the
    // probe side IS the corpus (kNN graph), it needs the same guard
    val qSrc = if (broadcastProbes) queries else ensureParallelism(queries)
    val probes = probeCells(qSrc, idCol, vecCol, cents, nprobe)
    val scored =
      if (broadcastProbes) broadcastProbeScores(cells, probes)
      else cellCoGroupScores(cells, probes, k, cellCap)
    rankTopK(scored, k, keepCosine)
  }

  /** Driver-side centroid collection: nlist rows — bytes. Shared with
    * [[AnnIndex]], whose persisted centroid table round-trips through
    * the identical (cid, cvec, cnorm) shape.
    */
  private[graft] def collectCents(centroids: DataFrame): Array[(Long, Seq[Double], Double)] =
    centroids
      .select(col("cid").cast("long"), col("cvec"), col("cnorm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))

  /** Top-nprobe cells per query — (qid, qvec, qnorm, cid), one exploded
    * row per probed cell. One loop-shaped VecTopIds selection over the
    * dots array — cos desc with ties to the smallest cid, identical to
    * the sort-reverse-slice-over-structs order it replaces, but with
    * generated code O(1) in nlist (the 64 KB-limit fix). A pure
    * projection over literal centroids: no join, no shuffle.
    */
  private[graft] def probeCells(queries: DataFrame, idCol: String,
                                vecCol: String,
                                cents: Array[(Long, Seq[Double], Double)],
                                nprobe: Int): DataFrame = {
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("qid"),
        col(vecCol).as("qvec"),
        vec_norm(col(vecCol)).as("qnorm"))
    q.withColumn("__cd", graft.functions.VectorFunctions.vec_dot_matrix(
        col("qvec"), centMatrix(cents)))
      .withColumn("cid", explode(graft.functions.VectorFunctions.vec_top_ids(
        col("__cd"), col("qnorm"), cents.map(_._3), cents.map(_._1), nprobe)))
      .select(col("qid"), col("qvec"), col("qnorm"), col("cid"))
  }

  /** [[probeCells]] computed DRIVER-SIDE for the persisted-serve path:
    * serving is the bounded-query regime by contract (the serves
    * already collect |queries|·nprobe cids driver-side), so the query
    * vectors themselves are collected and probe selection runs in
    * local code — no Spark job ever ships the nlist×dim probe matrix
    * as a task reference (16 MB per job at nlist 64 000; measured as
    * most of a cold synthesized-sf100 serve). Selection is
    * bit-identical to [[probeCells]]: ascending-index double dots with
    * exact float→double widening, correctly-rounded qnorm, scores
    * `dot/(qnorm·cnorm)` under the engine's nan-safe order with ties
    * to the smaller cid. Output schema matches probeCells modulo qvec
    * arriving as array<double> (the widening is exact, so downstream
    * scoring dots are unchanged); qid keeps the query id column's NATIVE
    * type (string ids serve; an integer id column round-trips unchanged,
    * so a persisted serve's output schema equals the in-memory path's).
    *
    * The bounded-query contract is ENFORCED, not assumed: the collect is
    * capped at `maxQueries` rows (CollectLimit — the scan stops at the
    * cap, a corpus-sized frame never reaches the driver) and a batch
    * over the cap fails loudly pointing at the distributed alternative
    * instead of OOMing the driver with no attribution.
    */
  private[graft] val MaxServeQueries: Int = 262144

  private[graft] def probeCellsLocal(queries: DataFrame, idCol: String,
                                     vecCol: String,
                                     cents: Array[(Long, Seq[Double], Double)],
                                     nprobe: Int,
                                     maxQueries: Int = MaxServeQueries): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = queries.sparkSession
    val idType = queries.schema(idCol).dataType
    val qs = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("qid"),
        col(vecCol).cast("array<double>").as("qvec"))
      .limit(maxQueries + 1)
      .collect()
    require(qs.length <= maxQueries,
      s"probeCellsLocal: serve query batch exceeds $maxQueries rows — " +
        "serving is the bounded-query regime; route a corpus-sized query " +
        "side through the distributed in-memory path (Similarity.ivfTopK / " +
        "knnGraph) instead of a persisted serve")
    val cvecs = cents.map(_._2.toArray)
    val out = qs.flatMap { r =>
      val qid = r.get(0)
      val qv = r.getSeq[Double](1)
      val q = qv.toArray
      var n2 = 0.0
      var i = 0
      while (i < q.length) { n2 += q(i) * q(i); i += 1 }
      val qnorm = math.sqrt(n2)
      val scored = cents.indices.map { k =>
        val c = cvecs(k)
        require(c.length == q.length,
          s"probeCellsLocal: query dim ${q.length} vs centroid dim ${c.length}")
        var d = 0.0
        var j = 0
        while (j < c.length) { d += q(j) * c(j); j += 1 }
        (d / (qnorm * cents(k)._3), cents(k)._1)
      }
      val top = scored.sortWith { case ((sa, ia), (sb, ib)) =>
        val c = graft.functions.ScoreOrdering.nanSafeCompare(sa, sb)
        c > 0 || (c == 0 && ia < ib)
      }.take(nprobe)
      top.map { case (_, cid) =>
        org.apache.spark.sql.Row(qid, qv, qnorm, cid) }
    }
    val schema = StructType(Seq(
      StructField("qid", idType),
      StructField("qvec", ArrayType(DoubleType)),
      StructField("qnorm", DoubleType),
      StructField("cid", LongType)))
    spark.createDataFrame(
      java.util.Arrays.asList(out.toArray: _*), schema)
  }

  /** [[probeCells]] with the probe ORDER kept: posexplode of the same
    * VecTopIds selection, so each probed cell carries its 1-based rank
    * in the query's centroid-closeness order. A candidate found via
    * cell at probe_rank r is exactly the candidate an `nprobe = p ≥ r`
    * serve would see — one scored pass at max(nprobe) prices an entire
    * nprobe sweep ([[AnnIndex.tuneIvf]]).
    */
  private[graft] def probeCellsRanked(queries: DataFrame, idCol: String,
                                      vecCol: String,
                                      cents: Array[(Long, Seq[Double], Double)],
                                      nprobe: Int): DataFrame = {
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("qid"),
        col(vecCol).as("qvec"),
        vec_norm(col(vecCol)).as("qnorm"))
    q.withColumn("__cd", graft.functions.VectorFunctions.vec_dot_matrix(
        col("qvec"), centMatrix(cents)))
      .select(col("qid"), col("qvec"), col("qnorm"),
        posexplode(graft.functions.VectorFunctions.vec_top_ids(
          col("__cd"), col("qnorm"), cents.map(_._3), cents.map(_._1), nprobe)))
      .select(col("qid"), col("qvec"), col("qnorm"),
        (col("pos") + 1).cast("int").as("probe_rank"), col("col").as("cid"))
  }

  /** Small-query-set scoring: broadcast the probe table, score in the
    * join projection, keep only (qid, id, cosine) — the rank window's
    * qid exchange must never carry the vectors.
    */
  private[graft] def broadcastProbeScores(cells: DataFrame,
                                          probes: DataFrame): DataFrame =
    cells.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        cosineFromNorms(col("vec"), col("norm"), col("qvec"), col("qnorm"))
          .as("cosine"))

  /** Corpus-sized probe side (kNN graph): score by CO-GROUPING both sides
    * on the cell id instead of a row-level join. A row-level cid join
    * materializes |members|·|probes-per-cell| joined rows each CARRYING
    * two embedding vectors (~1 KB/pair — 17 GB of vector copies for 31M
    * pairs at the sf1 probe, and Spark's misestimate of the exploded
    * probe side even chose to BROADCAST its 220 MB). Here each side
    * shuffles ONCE, keyed by cid (vectors travel once per (vector, cell),
    * never per pair); the per-cell member/query lists join as nlist tiny
    * rows, and a fused loop computes the dots and keeps per-(query, cell)
    * top-k — only (qid, id, cosine) tuples ever leave, ≤ k·nprobe per
    * query. Arithmetic is bit-identical to the VecDot path (ascending
    * accumulation, mul-then-div, nan-safe ordering with id tiebreak), so
    * the DuckDB oracle replay is unaffected. Per-cell buffers are bounded
    * by cell size — nlist must grow with the corpus (see [[knnGraph]]),
    * which also bounds this kernel.
    */
  private def cellCoGroupScores(cells: DataFrame, probes: DataFrame, k: Int,
                                cellCap: Int = 1024): DataFrame = {
    import graft.functions.VectorFunctions.cell_top_k
    require(cellCap >= 1, s"cellCap must be >= 1, got $cellCap")
    // Adaptive hot-cell salting: a skewed cell (boilerplate embeddings,
    // a mis-seeded centroid) would otherwise land its ENTIRE member ×
    // probe product in one kernel row = one task — AQE cannot split a
    // single row. Cells over `cellCap` members split into
    // ceil(n/cellCap) salts (members hash-partitioned, probe lists
    // replicated per salt — cost proportional to actual skew, zero for
    // balanced cells); per-(query, salt) top-k is a superset selection,
    // so the global rank window downstream keeps results EXACT.
    val salts = cells.groupBy("cid")
      .agg(ceil(count(lit(1)) / lit(cellCap)).cast("int").as("__salts"))
    val mSalted = cells.join(broadcast(salts), Seq("cid"))
      .withColumn("__salt", pmod(hash(col("id")), col("__salts")))
    val qSalted = probes.join(broadcast(salts), Seq("cid"))
      .withColumn("__salt", explode(expr("sequence(0, __salts - 1)")))
    val cellsAgg = mSalted.groupBy("cid", "__salt")
      .agg(collect_list(struct(col("id"), col("vec"), col("norm"))).as("ms"))
    val probesAgg = qSalted.groupBy("cid", "__salt")
      .agg(collect_list(struct(col("qid"), col("qvec"), col("qnorm"))).as("qs"))
    // merge-join hint: the join is ~nlist rows a side, but each row drags
    // a cell-sized list — Spark's estimator happily BROADCASTS the probe
    // lists (110 MB serial driver build at the sf1 probe, growing with
    // the corpus); sorting tiny-count/fat-payload rows is free.
    // The scoring kernel is the CellTopK expression — rows never leave
    // Tungsten format (the typed-flatMap formulation spent ~5× the
    // kernel's own runtime in DeserializeToObject).
    cellsAgg.join(probesAgg.hint("merge"), Seq("cid", "__salt"))
      .select(explode(cell_top_k(col("ms"), col("qs"), k)).as("e"))
      .select(col("e.qid").as("qid"), col("e.id").as("id"),
        col("e.cos").as("cosine"))
  }

  // ------------------------------------------------------- product quant

  /** Deterministic product-quantization codebooks: the embedding is split
    * into `m` contiguous subvectors; each subvector space gets `ks`
    * centroids taken from the (unit-normalized) subvectors of the
    * `ks` smallest-id corpus vectors — fixed and reproducible, the same
    * trade [[ivfTopK]] makes (swap per-subspace k-means in at real scale;
    * every downstream shape is identical). Driver-side result is
    * `m × ks × (dim/m)` doubles — bytes, broadcast as plan literals.
    */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int = 8, ks: Int = 16): Array[Array[Array[Double]]] = {
    val sample = corpus.select(col(idCol),
        col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .orderBy(col(idCol)).limit(ks)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(sample.length == ks,
      s"pqTrain: corpus has ${sample.length} vectors, need ks=$ks")
    val dim = sample.head.length
    require(dim % m == 0, s"pqTrain: dim $dim not divisible by m=$m")
    val sub = dim / m
    val unit = sample.map { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    Array.tabulate(m, ks)((s, j) => unit(j).slice(s * sub, (s + 1) * sub))
  }

  /** PQ codebooks trained by per-subspace Lloyd iterations on a
    * deterministic corpus sample (smallest-id `sampleSize` vectors,
    * driver-side — PQ training on a bounded sample is the standard
    * practice; the sample is KB-scale next to the corpus). Better-shaped
    * cells than [[pqTrain]]'s raw-sample centroids, same downstream
    * shapes. Seeded by construction: initial centroids are the first `ks`
    * sample subvectors, ties and empty clusters resolve deterministically.
    */
  def pqTrainSampled(corpus: DataFrame, idCol: String, vecCol: String,
                     m: Int = 8, ks: Int = 16, sampleSize: Int = 1024,
                     iters: Int = 10): Array[Array[Array[Double]]] = {
    val sample = corpus.select(col(idCol),
        col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .orderBy(col(idCol)).limit(sampleSize)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= ks,
      s"pqTrainSampled: sample ${sample.length} smaller than ks=$ks")
    val dim = sample.head.length
    require(dim % m == 0, s"pqTrainSampled: dim $dim not divisible by m=$m")
    val sub = dim / m
    val unit = sample.map { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    Array.tabulate(m) { s =>
      val points = unit.map(_.slice(s * sub, (s + 1) * sub))
      var cents = Array.tabulate(ks)(j => points(j).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(ks, sub)(0.0)
        val counts = Array.fill(ks)(0)
        points.foreach { p =>
          var best = 0; var bestD = Double.MaxValue
          var j = 0
          while (j < ks) {
            var d = 0.0; var i = 0
            while (i < sub) { val t = p(i) - cents(j)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = j }
            j += 1
          }
          var i = 0
          while (i < sub) { sums(best)(i) += p(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(ks) { j =>
          // empty cluster: keep its previous centroid (deterministic)
          if (counts(j) == 0) cents(j)
          else Array.tabulate(sub)(i => sums(j)(i) / counts(j))
        }
        it += 1
      }
      cents
    }
  }

  /** Unit-normalized double copy of a vector column (zero vectors pass
    * through), so subvector dot products against the unit-normalized
    * codebooks compose to cosine.
    */
  private[graft] def unitized(vec: Column): Column = {
    val n = vec_norm(vec)
    when(n === 0, vec).otherwise(transform(vec, x => x / n))
  }

  /** The full PQ dot table as ONE block-structured constant matrix: row
    * `s·ks + j` is codebook entry (s, j) with row start `s·sub`, so a
    * [[graft.functions.VecDotMatrix]] pass computes every subvector dot of
    * [[pqEncode]]/[[pqTopK]] in `m·ks·sub` multiplies — no zero padding
    * (the padded form did `m·ks·dim`, an m-fold overhead of x·0 terms),
    * no `m × ks` independent slice+VecDot expressions.
    */
  private def pqMatrix(codebooks: Array[Array[Array[Double]]]): (Array[Array[Double]], Array[Int]) = {
    val m = codebooks.length
    val ks = codebooks(0).length
    val sub = codebooks(0)(0).length
    val rows = Array.tabulate(m * ks)(k => codebooks(k / ks)(k % ks))
    val starts = Array.tabulate(m * ks)(k => (k / ks) * sub)
    (rows, starts)
  }

  /** PQ-encode a corpus: one `m`-byte-ish code array per vector (stored as
    * `array<int>` — 8× to 64× smaller than the float vector it stands in
    * for). Each subvector's code is the L2-nearest codebook centroid,
    * computed as a projection-level argmax over plan constants — like
    * [[assignCells]], ZERO joins and ZERO shuffles over the corpus.
    *
    * `unitize = false` encodes the vector AS GIVEN — the residual-
    * encoding path (IVFADC): residuals are small deltas whose MAGNITUDE
    * is the signal, and re-normalizing them would destroy it.
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               codebooks: Array[Array[Array[Double]]],
               unitize: Boolean = true): DataFrame = {
    import graft.functions.VectorFunctions.{vec_block_arg_max, vec_dot_matrix}
    val m = codebooks.length
    val ks = codebooks(0).length
    val (pqRows, pqStarts) = pqMatrix(codebooks)
    // argmin_j ||x_s − cb_j||² = argmax_j 2·x_s·cb_j − ||cb_j||² (ties to
    // the smallest j), per subspace block — one loop-shaped VecBlockArgMax
    // whose generated code is O(1) in m·ks (the literal-struct form grew
    // with m·ks toward the same 64 KB codegen cliff as centroid scoring)
    val cbNorm2 = Array.tabulate(m * ks)(i =>
      codebooks(i / ks)(i % ks).map(x => x * x).sum)
    val prepared =
      if (unitize) unitized(col(vecCol).cast("array<double>"))
      else col(vecCol).cast("array<double>")
    corpus.select(col(idCol).as("id"), prepared.as("__v"))
      .withColumn("__pd",
        vec_dot_matrix(col("__v"), pqRows, rowStarts = pqStarts))
      .select(col("id"), vec_block_arg_max(col("__pd"), cbNorm2, m).as("code"))
  }

  /** [[pqTrainSampled]]'s residual sibling: per-subspace Lloyd
    * iterations on the `sampleSize` smallest-id vectors of an
    * already-prepared frame, taken AS GIVEN (no unit normalization —
    * see [[pqEncode]]'s `unitize` note; residuals are small deltas
    * whose magnitude IS the signal). Lloyd matters here more than for
    * the raw encoding: residual clouds are centered near zero, so
    * arbitrary sample vectors as codewords collapse the ADC ranking —
    * trained centroids are what make residual encoding beat raw.
    * Deterministic: smallest-id sample, first-ks init, stable ties.
    */
  private[graft] def pqTrainRaw(frame: DataFrame, idCol: String,
                                vecCol: String, m: Int, ks: Int,
                                sampleSize: Int = 1024,
                                iters: Int = 10): Array[Array[Array[Double]]] = {
    val sample = frame.select(col(idCol),
        col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .orderBy(col(idCol)).limit(sampleSize)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= ks,
      s"pqTrainRaw: sample ${sample.length} smaller than ks=$ks")
    val dim = sample.head.length
    require(dim % m == 0, s"pqTrainRaw: dim $dim not divisible by m=$m")
    val sub = dim / m
    Array.tabulate(m) { s =>
      val points = sample.map(_.slice(s * sub, (s + 1) * sub))
      var cents = Array.tabulate(ks)(j => points(j).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(ks, sub)(0.0)
        val counts = Array.fill(ks)(0)
        points.foreach { p =>
          var best = 0; var bestD = Double.MaxValue
          var j = 0
          while (j < ks) {
            var d = 0.0; var i = 0
            while (i < sub) { val t = p(i) - cents(j)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = j }
            j += 1
          }
          var i = 0
          while (i < sub) { sums(best)(i) += p(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(ks) { j =>
          if (counts(j) == 0) cents(j)
          else Array.tabulate(sub)(i => sums(j)(i) / counts(j))
        }
        it += 1
      }
      cents
    }
  }

  /** Approximate top-k via product quantization with asymmetric distance
    * (ADC): the corpus is scanned as compact codes; each query carries a
    * flat `m × ks` lookup table of subvector dots (a pure projection over
    * the literal codebooks), and a candidate's score is `m` table lookups —
    * no float-vector arithmetic per pair. The `rerank × k` best ADC
    * candidates per query are re-scored exactly against the original
    * vectors. This is the memory-side scale path: a 100 TB float corpus
    * scans as ~1/32 the bytes, and the exact re-rank touches only
    * `rerank·k·|queries|` true vectors.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 8, ks: Int = 16,
             rerank: Int = 4,
             codebooksIn: Option[Array[Array[Array[Double]]]] = None): DataFrame = {
    val codebooks = codebooksIn.getOrElse(pqTrain(corpus, idCol, vecCol, m, ks))
    pqTopKWithCodes(pqEncode(corpus, idCol, vecCol, codebooks),
      corpus, queries, idCol, vecCol, k, rerank, codebooks)
  }

  /** ADC scan + exact re-rank over an ALREADY-ENCODED code table
    * (id, code) — the serving half of [[pqTopK]], split out so
    * [[AnnIndex.pqServe]] can run it against persisted codes without
    * re-encoding the corpus. `corpus` supplies only the true vectors for
    * the shortlist re-rank (`rerank·k·|queries|` rows — point lookups,
    * never a scan of the float vectors).
    */
  private[graft] def pqTopKWithCodes(codes: DataFrame, corpus: DataFrame,
                                     queries: DataFrame, idCol: String,
                                     vecCol: String, k: Int, rerank: Int,
                                     codebooks: Array[Array[Array[Double]]]): DataFrame = {
    // LUT/ADC indexing must follow the ACTUAL codebook shape — trusting
    // the m/ks parameters against a caller-supplied codebook of different
    // shape would silently misalign the flat-LUT lookups
    val (mEff, ksEff) = (codebooks.length, codebooks(0).length)
    val q0 = queries.select(col(idCol).as("qid"),
      unitized(col(vecCol).cast("array<double>")).as("__q"))
    // flat LUT: entry s·ks + j = q_s · cb_s[j] — exactly the pqMatrix row
    // order, so the LUT is one block-structured VecDotMatrix pass per query
    val (lutRows, lutStarts) = pqMatrix(codebooks)
    val q = q0.select(col("qid"),
      graft.functions.VectorFunctions.vec_dot_matrix(
        col("__q"), lutRows, rowStarts = lutStarts).as("lut"))
    // ADC score inside the join projection, keeping only (qid, id, score):
    // the shortlist window's qid exchange must not carry the m·ks-double
    // LUT (≈1 KB/row) or the code arrays — same rule as rankTopK
    val adc = codes.join(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        adcScoreExpr(mEff, ksEff).as("score"))
    adcShortlistRerank(adc, corpus, queries, idCol, vecCol, k, rerank)
  }

  /** The ADC score: m flat-LUT lookups folded in ascending subspace
    * order (the add order is part of the cross-engine contract — the
    * oracle sums the same doubles in the same sequence).
    */
  private def adcScoreExpr(mEff: Int, ksEff: Int): Column = expr(
    s"aggregate(sequence(0, ${mEff - 1}), 0D, " +
    s"(acc, s) -> acc + element_at(lut, s * $ksEff + element_at(code, s + 1) + 1))")

  /** Shared tail of the ADC family (flat PQ and IVF-PQ): shortlist the
    * rerank·k best ADC candidates per query, then exact cosine re-rank
    * of the shortlist against the original vectors. `private[graft]`
    * because [[AnnIndex.tuneIvfPq]] re-runs the tail per sweep point
    * over ONE persisted ADC pass.
    */
  private[graft] def adcShortlistRerank(adc: DataFrame, corpus: DataFrame,
                                 queries: DataFrame, idCol: String,
                                 vecCol: String, k: Int,
                                 rerank: Int): DataFrame = {
    // bounded top-k aggregation, not a rank window (the
    // hammingShortlistRerank rationale: the window exchanged every
    // ADC-scored code row). `score desc, id asc` maps to the kernel's
    // ascending order as key = −score: negation is exact for every
    // finite double, and the ±0.0 tie class is preserved (ascending
    // −score puts −0.0 first ↔ descending score puts +0.0 first — the
    // same row). ADC scores are finite sums of finite LUT entries, so
    // the window's NaN-first descending corner cannot arise.
    val shortlist = adc.groupBy("qid")
      .agg(graft.functions.TopKFunctions
        .min_k_pairs(negate(col("score")), col("id"), k * rerank)
        .as("__top"))
      .select(col("qid"), explode(col("__top")).as("__e"))
      .select(col("qid"), col("__e").getField("value").as("id"))
    exactRerank(shortlist, corpus, queries, idCol, vecCol, k)
  }

  /** Whole-sweep shortlist + ONE exact re-rank pass (optimization r16,
    * guide §2.4/§3): the tune sweeps used to run
    * [[adcShortlistRerank]]/[[hammingShortlistRerank]] once per nprobe
    * candidate — each pass joining the CORPUS again for the exact
    * re-rank, so a 4-point sweep scanned and shuffled the true-vector
    * table 4×. The shortlists themselves come from the one persisted
    * ranked frame; only the exact cosines need the corpus, and the
    * UNION of the per-candidate shortlists is bounded by
    * |cand|·k·rerank·|queries| rows. So: build every candidate's
    * shortlist (bounded aggregations over the persisted frame), join
    * the corpus ONCE on the distinct (qid, id) union for exact
    * cosines, re-attach per-candidate membership, and select top-k per
    * (nprobe, qid). Bit-identical to the per-candidate form: same
    * shortlist rule, same cosine expression ([[exactRerank]]'s
    * argument order), same (cosine desc, id) selection.
    *
    * `scored` must carry (qid, id, probe_rank) plus the shortlist
    * ordering column `shortKey` reads (score/ham); it is consumed by
    * exactly ONE aggregation pass here, so callers need not (and since
    * r16 do not) persist it. The tiny per-qid `localCheckpoint` below
    * is reclaimed by the ContextCleaner once the returned frame is
    * unreachable (and the bench additionally drops persistent RDDs
    * between queries); a caller looping tune calls in one long-lived
    * session relies on that GC.
    * Output: (qid, id, rank, nprobe) — one block per candidate.
    */
  private[graft] def sweepShortlistRerank(scored: DataFrame,
      shortKey: Column, cand: Seq[Int], corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      rerank: Int): DataFrame = {
    // ONE aggregation pass over the ranked frame: a FILTERed min_k_pairs
    // per sweep point (probe_rank <= p is nested, so each agg sees its
    // candidate's exact input) — the per-candidate form re-scanned the
    // frame once per point. The per-qid result is tiny
    // (|cand|·k·rerank structs), pinned once because two consumers
    // (the exact-cosine pass and the membership re-attach) walk it.
    val aggs = cand.map(p => graft.functions.TopKFunctions
      .min_k_pairs_if(shortKey, col("id"), k * rerank,
        col("probe_rank") <= p).as(s"__top_$p"))
    val perQ = scored.groupBy("qid").agg(aggs.head, aggs.tail: _*)
      .localCheckpoint(true)
    val shortlists = cand.map { p =>
      perQ.select(col("qid"), explode(col(s"__top_$p")).as("__e"))
        .select(col("qid"), col("__e").getField("value").as("id"),
          lit(p).as("nprobe"))
    }.reduce(_.unionByName(_))
    val cv = corpus.select(col(idCol).as("id"), col(vecCol).as("__cv"),
      vec_norm(col(vecCol)).as("__cn"))
    val qv = queries.select(col(idCol).as("qid"), col(vecCol).as("__qv"),
      vec_norm(col(vecCol)).as("__qn"))
    val exact = shortlists.select("qid", "id").distinct()
      .join(cv, Seq("id")).join(broadcast(qv), Seq("qid"))
      .select(col("qid"), col("id"),
        cosineFromNorms(col("__cv"), col("__cn"), col("__qv"), col("__qn"))
          .as("cosine"))
    rankTopKBy(shortlists.join(exact, Seq("qid", "id"))
        .select("nprobe", "qid", "id", "cosine"),
      Seq("nprobe", "qid"), k)
      .select("qid", "id", "rank", "nprobe")
  }

  /** The plain-IVF sweep sibling of [[sweepShortlistRerank]]: per sweep
    * point p, the exact top-k of the already-exact cosines restricted to
    * probe_rank <= p — ONE FILTERed-aggregation pass over the ranked
    * frame instead of one [[rankTopK]] pass per point. Output:
    * (qid, id, rank, nprobe), identical to
    * `rankTopK(scored.filter(probe_rank <= p)).withColumn(nprobe, p)`
    * unioned over the candidates.
    */
  private[graft] def sweepRankTopK(scored: DataFrame, cand: Seq[Int],
                                   k: Int): DataFrame = {
    val aggs = cand.map(p => graft.functions.TopKFunctions
      .min_k_pairs_if(rankKey, struct(col("id"), col("cosine")), k,
        col("probe_rank") <= p).as(s"__top_$p"))
    val perQ = scored.groupBy("qid").agg(aggs.head, aggs.tail: _*)
      .localCheckpoint(true)
    cand.map { p =>
      perQ.select(col("qid"),
          posexplode(col(s"__top_$p")).as(Seq("pos", "__e")))
        .select(col("qid"), col("__e.value.id").as("id"),
          (col("pos") + 1).cast("int").as("rank"), lit(p).as("nprobe"))
    }.reduce(_.unionByName(_))
  }

  /** Exact cosine re-rank of a (qid, id) shortlist against true vectors
    * — the shared tail of every compressed-scan family (ADC, binary
    * quantization): `|shortlist|` point lookups into the corpus, never
    * a scan of the float vectors.
    */
  private[graft] def exactRerank(shortlist: DataFrame, corpus: DataFrame,
                                 queries: DataFrame, idCol: String,
                                 vecCol: String, k: Int): DataFrame = {
    val cv = corpus.select(col(idCol).as("id"), col(vecCol).as("__cv"),
      vec_norm(col(vecCol)).as("__cn"))
    val qv = queries.select(col(idCol).as("qid"), col(vecCol).as("__qv"),
      vec_norm(col(vecCol)).as("__qn"))
    val exact = shortlist.join(cv, Seq("id")).join(broadcast(qv), Seq("qid"))
      .select(col("qid"), col("id"),
        cosineFromNorms(col("__cv"), col("__cn"), col("__qv"), col("__qn"))
          .as("cosine"))
    rankTopK(exact, k)
  }

  // ------------------------------------------------- binary quantization

  /** Sign-bit binary quantization: pack `x_i > 0` into `dim/32` words of
    * 32 bits each (stored `array<long>`) — a 64× byte reduction against
    * float vectors, the coarsest useful embedding compression. 32 bits
    * per word, not 64: every packed value stays positive in two's
    * complement, and the cross-engine replay stays exact (a `1 << 63`
    * term overflows DuckDB's CHECKED shift). Sign is scale-invariant, so
    * no unit normalization is needed or performed; zero elements pack as
    * 0. One projection pass, no joins, no shuffles.
    */
  def bqEncode(corpus: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val dim = vecDim(corpus, vecCol)
    require(dim > 0 && dim % 32 == 0,
      s"bqEncode: dim $dim must be a positive multiple of 32")
    bqEncodeDim(corpus, idCol, vecCol, dim)
  }

  /** [[bqEncode]] with the dimension supplied by the caller — the
    * kernels probe the CORPUS dimension once and thread it through, so
    * an empty query frame encodes to an empty frame (composable, like
    * every other top-k kernel) instead of tripping a misleading dim
    * probe, and no per-call re-probing happens.
    */
  private def bqEncodeDim(corpus: DataFrame, idCol: String, vecCol: String,
                          dim: Int): DataFrame =
    corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("__v"))
      .select(col("id"), array(bqWordExprs(dim / 32): _*).as("sig"))

  /** Per-pair Hamming distance over the packed words — shared by the
    * flat and composed scans so the two can never drift.
    */
  private def bqHammingExpr(nWords: Int): Column =
    expr(s"aggregate(sequence(1, $nWords), 0L, (acc, i) -> " +
      "acc + CAST(bit_count(element_at(sig, i) ^ element_at(qsig, i)) AS BIGINT))")

  /** The per-word sign-packing projections over a `__v` double-array
    * column — shared by [[bqEncode]] and the cell-restricted composed
    * scan ([[ivfbqTopK]]), which packs directly on the assigned frame
    * instead of paying a join back to a separate code table.
    */
  private def bqWordExprs(nWords: Int): Seq[Column] =
    (0 until nWords).map { w =>
      expr(s"aggregate(sequence(1, 32), 0L, (acc, b) -> acc + " +
        s"IF(element_at(__v, ${w * 32} + b) > 0D, shiftleft(1L, b - 1), 0L))")
    }

  /** The embedding dimension, from one row (a limit(1) schema probe). */
  private def vecDim(df: DataFrame, vecCol: String): Int =
    df.select(col(vecCol)).filter(col(vecCol).isNotNull)
      .limit(1).collect().headOption
      .map(_.getSeq[Any](0).length).getOrElse(0)

  /** Approximate top-k via binary quantization: the corpus scans as
    * packed sign bits (64× smaller than the float vectors), each
    * candidate is scored by HAMMING distance to the query's packed bits
    * (xor + bit_count per word — integer ops, no float arithmetic per
    * pair), the `rerank·k` smallest-Hamming candidates are re-ranked
    * exactly against the true vectors. The memory-side scan floor below
    * even PQ (1 bit/dimension vs PQ's ~1 byte/subvector); compose with
    * the IVF probe plan for sublinear candidate volume the same way
    * [[AnnIndex.ivfpqServe]] composes ADC. With `rerank·k ≥ |corpus|`
    * the shortlist is total and the result EQUALS [[bruteForceTopK]]
    * bit-for-bit (the spec gate).
    */
  def bqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, rerank: Int = 4): DataFrame = {
    // ONE dim probe, threaded through both encodes (empty queries then
    // flow through to an empty result, like the other kernels)
    val dim = vecDim(corpus, vecCol)
    require(dim > 0 && dim % 32 == 0,
      s"bqTopK: dim $dim must be a positive multiple of 32")
    bqTopKWithSigsDim(bqEncodeDim(corpus, idCol, vecCol, dim), dim,
      corpus, queries, idCol, vecCol, k, rerank)
  }

  /** [[bqTopK]] over a PRECOMPUTED packed-signature table
    * (`(id, sig array<long>)` — [[AnnIndex.bqServe]]'s path): the codes
    * scan reads the persisted artifact instead of re-packing the corpus,
    * then the identical Hamming + shortlist + exact-re-rank kernels run,
    * so a persisted serve is bit-identical to the in-memory scan.
    */
  def bqTopKWithSigs(codes: DataFrame, corpus: DataFrame,
                     queries: DataFrame, idCol: String, vecCol: String,
                     k: Int, rerank: Int = 4): DataFrame = {
    val dim = vecDim(corpus, vecCol)
    require(dim > 0 && dim % 32 == 0,
      s"bqTopKWithSigs: dim $dim must be a positive multiple of 32")
    bqTopKWithSigsDim(codes, dim, corpus, queries, idCol, vecCol, k, rerank)
  }

  private def bqTopKWithSigsDim(codes: DataFrame, dim: Int,
                                corpus: DataFrame, queries: DataFrame,
                                idCol: String, vecCol: String, k: Int,
                                rerank: Int): DataFrame = {
    val q = bqEncodeDim(queries, idCol, vecCol, dim)
      .select(col("id").as("qid"), col("sig").as("qsig"))
    // hamming inside the join projection; only (qid, id, ham) reaches
    // the shortlist window's qid exchange (the rank-window rule)
    val scored = codes.select(col("id"), col("sig")).join(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), bqHammingExpr(dim / 32).as("ham"))
    hammingShortlistRerank(scored, corpus, queries, idCol, vecCol, k, rerank)
  }

  /** The sweep-priceable form of the composed BQ Hamming pass: probe
    * RANKS ride along (each id lives in exactly one cell, so its rank
    * per query is unique) — a candidate scored via the cell at probe
    * rank r is exactly what an `nprobe ≥ r` serve sees, so ONE pass at
    * max(nprobe) prices an entire [[AnnIndex.tuneIvfBq]] sweep.
    * `probesRanked` is [[probeCellsRanked]]'s output. Output:
    * (qid, id, probe_rank, ham).
    */
  private[graft] def ivfbqHammingRanked(memberSigs: DataFrame,
      probesRanked: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val nWRow = memberSigs.select(size(col("sig"))).limit(1).collect()
    require(nWRow.nonEmpty, "ivfbqHammingRanked: empty signature table")
    val nW = nWRow.head.getInt(0)
    val qsig = bqEncodeDim(queries, idCol, vecCol, nW * 32)
      .select(col("id").as("qid"), col("sig").as("qsig"))
    val plan = probesRanked.select("qid", "cid", "probe_rank")
      .join(qsig, Seq("qid"))
    memberSigs.join(broadcast(plan), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), col("probe_rank"),
        bqHammingExpr(nW).as("ham"))
  }

  /** Shared tail of the BQ family: shortlist the `rerank·k`
    * smallest-Hamming candidates per query (id tiebreak), exact cosine
    * re-rank against the true vectors.
    */
  private[graft] def hammingShortlistRerank(scored: DataFrame, corpus: DataFrame,
                                            queries: DataFrame, idCol: String,
                                            vecCol: String, k: Int,
                                            rerank: Int): DataFrame = {
    // bounded top-k aggregation, not a rank window: the window form
    // EXCHANGED every scored candidate row before ranking — at a flat
    // BQ scan that is the whole corpus × queries Hamming product
    // through one shuffle, and it priced as the bq family's per-decade
    // floor. min_k_pairs partial-aggregates map-side with an O(k·rerank)
    // buffer, so the exchange carries shortlist-sized partials per map
    // partition. Selection is identical: the integer ham widens to
    // double exactly, and (ham asc, id asc) is the same total order the
    // window cut at k·rerank (ham is never null — packed sigs only).
    val shortlist = scored.groupBy("qid")
      .agg(graft.functions.TopKFunctions
        .min_k_pairs(col("ham").cast("double"), col("id"), k * rerank)
        .as("__top"))
      .select(col("qid"), explode(col("__top")).as("__e"))
      .select(col("qid"), col("__e").getField("value").as("id"))
    exactRerank(shortlist, corpus, queries, idCol, vecCol, k)
  }

  /** The COMPOSED form — binary quantization inside the IVF probe plan
    * ([[ivfpqTopKWithCodes]]'s sibling at the 1-bit/dimension point):
    * the coarse quantizer partitions the corpus into nlist cells
    * (deterministic id-sampled centroids, [[ivfTopK]]'s choice), each
    * member's sign bits are packed IN the assigned frame (no join back
    * to a code table), and each query Hamming-scores ONLY its probed
    * cells via the broadcast (qid, cid, qsig) probe plan — integer ops
    * over `nprobe/nlist` of the packed corpus, floats touched only at
    * the exact re-rank of the `rerank·k` shortlist. With a full probe
    * the candidate set is total, so the result equals [[bqTopK]]
    * bit-for-bit (spec-gated).
    */
  def ivfbqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
                rerank: Int = 4): DataFrame = {
    val dim = vecDim(corpus, vecCol)
    require(dim > 0 && dim % 32 == 0,
      s"ivfbqTopK: dim $dim must be a positive multiple of 32")
    val cents = collectCents(idSampledCentroids(corpus, idCol, vecCol, nlist))
    val memberSigs = bqPackAssigned(
      assignCells(ensureParallelism(corpus), idCol, vecCol, cents), dim)
    ivfbqTopKWithSigs(memberSigs, corpus, queries, idCol, vecCol, cents,
      k, nprobe, rerank)
  }

  /** Pack sign bits directly on an [[assignCells]] frame — no join back
    * to a separate code table. Output: (cid, id, sig) — the composed
    * index's member-signature layout, shared by the in-memory scan and
    * [[AnnIndex.ivfbqBuild]]'s persisted artifact.
    */
  private[graft] def bqPackAssigned(assigned: DataFrame,
                                    dim: Int): DataFrame =
    assigned
      .withColumn("__v", col("vec").cast("array<double>"))
      .select(col("cid"), col("id"), array(bqWordExprs(dim / 32): _*).as("sig"))

  /** [[ivfbqTopK]] over a PRECOMPUTED (cid, id, sig) member-signature
    * table and caller-supplied centroids — [[AnnIndex.ivfbqServe]]'s
    * path: the probe plan, Hamming kernel, shortlist, and exact re-rank
    * are the identical code, so the persisted serve is bit-identical to
    * the in-memory composed scan over the same centroids.
    */
  private[graft] def ivfbqTopKWithSigs(memberSigs: DataFrame,
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      cents: Array[(Long, Seq[Double], Double)], k: Int, nprobe: Int,
      rerank: Int): DataFrame =
    ivfbqTopKWithProbes(memberSigs, corpus, queries, idCol, vecCol,
      probeCells(queries, idCol, vecCol, cents, nprobe), k, rerank)

  /** [[ivfbqTopKWithSigs]] with the probe plan SUPPLIED by the caller —
    * [[AnnIndex.ivfbqServe]]'s path with [[probeCellsLocal]] probes: the
    * serve plan carries NO centroid work at all (no nlist×dim matrix as
    * a task reference — 16 MB per probe job at nlist 64 000, measured as
    * most of the composed-BQ serve's 3.49×/decade at the synthesized
    * sf100 sweep; the ivf/pq/residual serves shed theirs in the same
    * round). Query signing is a matrix-free sign-pack projection over
    * the bounded query frame; the Hamming kernel, shortlist, and exact
    * re-rank are the identical code, so a serve stays bit-identical to
    * the in-memory composed scan over the same centroids.
    */
  private[graft] def ivfbqTopKWithProbes(memberSigs: DataFrame,
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      probes: DataFrame, k: Int, rerank: Int): DataFrame = {
    val dim = vecDim(corpus, vecCol)
    require(dim > 0 && dim % 32 == 0,
      s"ivfbqTopKWithProbes: dim $dim must be a positive multiple of 32")
    val nW = dim / 32
    val qsig = bqEncodeDim(queries, idCol, vecCol, dim)
      .select(col("id").as("qid"), col("sig").as("qsig"))
    val probePlan = probes
      .select("qid", "cid").join(qsig, Seq("qid"))
    val scored = memberSigs.join(broadcast(probePlan), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), bqHammingExpr(nW).as("ham"))
    hammingShortlistRerank(scored, corpus, queries, idCol, vecCol, k, rerank)
  }

  /** The IVF-PQ scoring kernel: each query ADC-scores ONLY its probed
    * cells. The (qid, cid) probe plan joined with the per-query LUT is
    * |queries|·nprobe rows (≈1 KB each) — broadcast into the code scan,
    * so the probed code partitions stream through m LUT lookups per
    * member with zero shuffles of the code table. Same shortlist +
    * exact-re-rank tail as [[pqTopKWithCodes]].
    */
  /** The sweep-priceable form of the IVF-PQ ADC pass: like the scoring
    * half of [[ivfpqTopKWithCodes]] but the probe RANK rides along
    * (each id lives in exactly one cell, so its rank per query is
    * unique) — a candidate scored via the cell at probe rank r is
    * exactly what an `nprobe ≥ r` serve sees, so one pass at
    * max(nprobe) prices an entire sweep ([[AnnIndex.tuneIvfPq]]).
    * Output: (qid, id, probe_rank, score).
    */
  /** The per-(qid, cid) coarse term of a RESIDUAL (IVFADC) score:
    * `u(q)·u(c)` — the probe plan joins the nlist-row centroid table
    * (broadcast literal data) and the serve's approximate score becomes
    * `u(q)·u(c) + Σ_s lut[code_s]`, since the codes quantize
    * `u(x) − u(centroid(x))` instead of `u(x)`. Raw-encoded indexes pass
    * None and keep the original arithmetic bit-for-bit.
    */
  private def withCoarseTerm(probePlan: DataFrame,
                             residualCents: Option[Array[(Long, Seq[Double], Double)]]): DataFrame =
    residualCents match {
      case None => probePlan
      case Some(cents) =>
        val spark = probePlan.sparkSession
        val cdf = spark.createDataFrame(
            cents.map { case (cid, cv, cn) => (cid, cv, cn) }.toIndexedSeq)
          .toDF("cid", "__cv", "__cn")
        probePlan.join(broadcast(cdf), Seq("cid"))
          .withColumn("__qc", cosineFromNorms(col("__cv"), col("__cn"),
            col("qvec"), col("qnorm")))
          .drop("__cv", "__cn")
    }

  private def adcTotal(mEff: Int, ksEff: Int,
                       residual: Boolean): Column =
    if (residual) col("__qc") + adcScoreExpr(mEff, ksEff)
    else adcScoreExpr(mEff, ksEff)

  private[graft] def ivfpqAdcRanked(codes: DataFrame, probesRanked: DataFrame,
                                    queries: DataFrame, idCol: String,
                                    vecCol: String,
                                    codebooks: Array[Array[Array[Double]]],
                                    residualCents: Option[Array[(Long, Seq[Double], Double)]] = None): DataFrame = {
    val (mEff, ksEff) = (codebooks.length, codebooks(0).length)
    val q0 = queries.select(col(idCol).as("qid"),
      unitized(col(vecCol).cast("array<double>")).as("__q"))
    val (lutRows, lutStarts) = pqMatrix(codebooks)
    val q = q0.select(col("qid"),
      graft.functions.VectorFunctions.vec_dot_matrix(
        col("__q"), lutRows, rowStarts = lutStarts).as("lut"))
    val probePlan = withCoarseTerm(probesRanked, residualCents)
      .select(Seq(col("qid"), col("cid"), col("probe_rank")) ++
        (if (residualCents.isDefined) Seq(col("__qc")) else Nil): _*)
      .join(q, Seq("qid"))
    codes.join(broadcast(probePlan), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), col("probe_rank"),
        adcTotal(mEff, ksEff, residualCents.isDefined).as("score"))
  }

  private[graft] def ivfpqTopKWithCodes(codes: DataFrame, probes: DataFrame,
                                        corpus: DataFrame, queries: DataFrame,
                                        idCol: String, vecCol: String, k: Int,
                                        rerank: Int,
                                        codebooks: Array[Array[Array[Double]]],
                                        residualCents: Option[Array[(Long, Seq[Double], Double)]] = None): DataFrame = {
    val (mEff, ksEff) = (codebooks.length, codebooks(0).length)
    val q0 = queries.select(col(idCol).as("qid"),
      unitized(col(vecCol).cast("array<double>")).as("__q"))
    val (lutRows, lutStarts) = pqMatrix(codebooks)
    val q = q0.select(col("qid"),
      graft.functions.VectorFunctions.vec_dot_matrix(
        col("__q"), lutRows, rowStarts = lutStarts).as("lut"))
    val probePlan = withCoarseTerm(probes, residualCents)
      .select(Seq(col("qid"), col("cid")) ++
        (if (residualCents.isDefined) Seq(col("__qc")) else Nil): _*)
      .join(q, Seq("qid"))
    val adc = codes.join(broadcast(probePlan), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        adcTotal(mEff, ksEff, residualCents.isDefined).as("score"))
    adcShortlistRerank(adc, corpus, queries, idCol, vecCol, k, rerank)
  }

  /** Margin-based bitext mining (Artetxe & Schwenk, "Margin-based
    * Parallel Corpus Mining", ACL 2019; the CCMatrix recipe): given two
    * embedding corpora (source / target languages embedded in one
    * space), mine aligned pairs as the MUTUAL nearest neighbors whose
    * similarity stands out against each side's local neighborhood —
    * the ratio margin `sim(x,y) / mean(topk(x) ∪ topk(y))`. Raw
    * nearest-neighbor mining floods on hub vectors; the margin
    * normalization is what makes mined bitext usable, so it is the
    * member this engine ships.
    *
    * Semantics are inner-product similarity on the `floor(x·10⁶)`
    * quantized lattice (the [[quantize]] convention): every dot, top-k
    * sum, and the final permille margin are EXACT integers, so the
    * mined set and scores replay bit-for-bit cross-engine. Margin:
    * `margin_permille = (2000·k·d(x,y)) div (Σtopk_fwd(x) + Σtopk_bwd(y))`
    * (the ratio margin with the mean folded into one exact integer
    * division), emitted only for mutual-rank-1 pairs with positive
    * similarity and positive denominator — the floor/truncate division
    * parity holds because both operands are kept non-negative.
    *
    * Output: (src_id, tgt_id, d, margin_permille), one row per mined
    * pair, margin-sortable.
    *
    * Scale posture: the scored frame is projected down to
    * (sid, tid, d) BEFORE any exchange (24 B/candidate, the
    * [[rankTopK]] lesson), and the rank + top-k-sum windows are
    * PAIRED per partitioning — frank and fsum share the sid exchange,
    * brank and bsum share the tid exchange — so the whole mine is one
    * scoring scan plus exactly two shuffles, with no self-join and no
    * recompute of the cross-scores. The fixture path scores
    * exhaustively (cross join, bounded sides); at 100 TB the identical
    * margin tail runs over IVF/LSH candidate pairs instead
    * ([[hyperplaneCandidatePairs]] / the IVF probe paths produce
    * them) — the margin math only ever sees (sid, tid, d) rows, so
    * the candidate generator is swappable without touching the mining
    * semantics.
    */
  def bitextMine(src: DataFrame, tgt: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"bitextMine: k must be >= 1, got $k")
    val s = src.select(col(idCol).as("sid"), quantize(col(vecCol)).as("sv"))
    val t = tgt.select(col(idCol).as("tid"), quantize(col(vecCol)).as("tv"))
    // exact integer dots on the quantized lattice; project vectors away
    // before anything that shuffles
    val scored = t.crossJoin(broadcast(s))
      .select(col("sid"), col("tid"),
        vec_dot(col("sv"), col("tv")).cast("long").as("d"))
    val wf = Window.partitionBy("sid").orderBy(col("d").desc, col("tid"))
    val wb = Window.partitionBy("tid").orderBy(col("d").desc, col("sid"))
    scored
      .withColumn("frank", row_number().over(wf))
      .withColumn("fsum", sum(when(col("frank") <= k, col("d")))
        .over(Window.partitionBy("sid")))
      .withColumn("brank", row_number().over(wb))
      .withColumn("bsum", sum(when(col("brank") <= k, col("d")))
        .over(Window.partitionBy("tid")))
      .filter(col("frank") === 1 && col("brank") === 1 && col("d") > 0 &&
        col("fsum") + col("bsum") > 0)
      .withColumn("margin_permille",
        expr(s"CAST((2000 * $k * d) DIV (fsum + bsum) AS BIGINT)"))
      .select("sid", "tid", "d", "margin_permille")
  }

  /** Exact all-pairs cosine (a < b), norms precomputed per side. Quadratic —
    * bounded inputs only.
    */
  def allPairsCosine(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val a = emb.select(col(idCol).as("a"), col(vecCol).as("va"),
      vec_norm(col(vecCol)).as("na"))
    val b = emb.select(col(idCol).as("b"), col(vecCol).as("vb"),
      vec_norm(col(vecCol)).as("nb"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .withColumn("cosine",
        cosineFromNorms(col("va"), col("na"), col("vb"), col("nb")))
      .select("a", "b", "cosine")
  }
}
