package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column aggregation: group-level mean pooling (class
  * centroids, user/topic profiles, cluster seeds for IVF training).
  *
  * Shape: `posexplode` the vector, aggregate per (group, position), then
  * reassemble the ordered array. The shuffle carries (group, pos) partial
  * sums — dims × groups rows — never whole vectors; partial aggregation
  * collapses the exploded rows map-side, so this holds at any corpus
  * size. The alternative (aggregate whole arrays with `zip_with` in a
  * reduce) cannot partial-aggregate and ships every vector to one task
  * per group.
  */
object Embeddings {

  /** Norm-outlier gate: flag embeddings whose L2 norm falls in the
    * extreme `tailFrac` tails — the cheap sanity filter for corrupt /
    * zero / exploding vectors before any ANN or dedup pass (a zeroed
    * vector silently matches nothing; an exploding one dominates every
    * dot product).
    *
    * Cutoffs are RANK-based, not percentile-function-based: the k-th
    * smallest / largest norm (k = ⌈n·tailFrac⌉) via two TakeOrdered
    * top-k's — no global sort, no single-partition window, and no
    * engine-specific percentile interpolation semantics; ties at the
    * cutoff flag identically in any engine. Norms are bit-exact
    * (ascending-index dot + correctly-rounded sqrt), so the whole output
    * is oracle-hashable.
    *
    * Scale shape: one corpus scan for norms, two k-row TakeOrdereds
    * (k ≪ n), cutoffs rejoin as a broadcast 1-row bound — the corpus
    * never sorts or shuffles.
    */
  def normOutliers(df: DataFrame, idCol: String, vecCol: String,
                   tailFrac: Double = 0.01): DataFrame = {
    require(tailFrac > 0 && tailFrac < 0.5,
      s"tailFrac must be in (0, 0.5), got $tailFrac")
    import graft.functions.VectorFunctions.vec_norm
    // materialize the compact (id, norm) projection ONCE: the count, the
    // two tail TakeOrdereds, and the final filter all read it, and without
    // a checkpoint each would re-scan the corpus and re-run the dot
    // products (4 full passes) — same shared-frame discipline as
    // Dedup.withShingleCache
    val norms = df.filter(col(vecCol).isNotNull)
      .select(col(idCol), vec_norm(col(vecCol)).as("norm"))
      .localCheckpoint(true)
    // one-row driver probe for n → k (same pattern as the bm25 avgdl probe)
    val n = norms.count()
    require(n > 0, "normOutliers needs a non-empty corpus")
    val k = math.ceil(n * tailFrac).toLong.max(1L)
    require(k <= Int.MaxValue,
      s"tail of $k rows exceeds a TakeOrdered limit — lower tailFrac " +
        "(rank-based cutoffs gather the k-row tails; at this scale use a " +
        "smaller fraction)")
    val lowCut = norms.orderBy(col("norm").asc, col(idCol).asc).limit(k.toInt)
      .agg(max(col("norm")).as("low_cut"))
    val highCut = norms.orderBy(col("norm").desc, col(idCol).desc).limit(k.toInt)
      .agg(min(col("norm")).as("high_cut"))
    norms.crossJoin(broadcast(lowCut)).crossJoin(broadcast(highCut))
      .filter(col("norm") <= col("low_cut") || col("norm") >= col("high_cut"))
      .select(col(idCol), col("norm"),
        when(col("norm") <= col("low_cut"), lit("low")).otherwise(lit("high"))
          .as("side"))
  }

  /** Per-group elementwise mean: (group, n_vecs, centroid: Array[Double]).
    * Assembly sorts the (pos, mean) pairs per group — `array_sort` on a
    * struct array orders by the leading `pos` field, so the rebuilt array
    * is position-correct regardless of row arrival order.
    */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(groupCol), col("pos"))
      .agg(count(lit(1)).as("n"), avg(col("x").cast("double")).as("m"))
      .groupBy(col(groupCol))
      .agg(max("n").as("n_vecs"),
        transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))

  /** Exact integer-space pooling projection — the cross-engine-verifiable
    * form: each element maps to `floor(x · scale)` (floor is unambiguous
    * in every engine, unlike round-half ties), summed as longs per
    * (group, position). Float mean values themselves are NOT reproducible
    * across engines (summation order changes the double), which is why
    * the oracle checks this projection and [[meanPool]] is spec-pinned
    * against it instead.
    */
  def poolSums(df: DataFrame, groupCol: String, vecCol: String,
               scale: Long = 1000000L): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(groupCol), col("pos"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(floor(col("x").cast("double") * scale).cast("long")).as("sum_scaled"))

  /** Fused second-moment pass for [[dominantDirectionReport]]: ONE typed
    * aggregation buffer per partition carrying the exact integer sums
    * `[Σ q_i·q_j (i ≤ j) ++ Σ q_i ++ n]` over the quantized vectors —
    * replacing the `posexplode` formulation that materialized d²+d+1
    * rows per input row (~1 000 rows/row at d = 32) before the hash-agg
    * absorbed them; at sf0.1 that explode was the single most expensive
    * headline line (9.2 s) for what is ONE fused multiply-add sweep.
    *
    * Exactness at ANY corpus size: each slot is a signed 128-bit
    * accumulator packed as two longs (hi, unsigned lo) — per-row
    * products of `floor(x·10⁶)` lattice values are exact integer-valued
    * doubles (the input contract bounds |q| ≤ 2^26.5 so products stay
    * under 2^53, checked per row, fail-loud), and 128-bit integer
    * addition never rounds, so the merged totals equal the DECIMAL(38,0)
    * sums of the old plan bit-for-bit in any partitioning / merge order.
    * Buffer: 2·(d(d+1)/2 + d + 1) longs (~9 KB at d = 32) — the shuffle
    * carries one buffer per map partition, never rows; only the upper
    * triangle is accumulated (Σqqᵀ is symmetric), halving the per-row
    * multiply count vs the exploded outer product.
    */
  private[graft] class SecondMomentAgg(dim: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Array[Double], Array[Long], Array[Long]] {
    private val tri = dim * (dim + 1) / 2
    private val slots = tri + dim + 1
    /** |q| bound keeping every pairwise product an exact double. */
    private val maxAbs = 94906265.0 // floor(sqrt(2^53))

    override def zero: Array[Long] = new Array[Long](2 * slots)

    /** 128-bit signed add of x into slot s: (hi, lo-as-unsigned). */
    @inline private def add128(b: Array[Long], s: Int, x: Long): Unit = {
      val i = s << 1
      val lo = b(i + 1)
      val nlo = lo + x
      // carry-out of the unsigned 64-bit add (bit 63 carry chain)
      val carry = ((lo & x) | ((lo | x) & ~nlo)) >>> 63
      b(i) += (x >> 63) + carry
      b(i + 1) = nlo
    }

    override def reduce(b: Array[Long], q: Array[Double]): Array[Long] = {
      if (q.length != dim)
        throw new IllegalArgumentException(
          s"SecondMomentAgg: vector length ${q.length} != dim $dim")
      var i = 0
      var slot = 0
      while (i < dim) {
        val qi = q(i)
        if (!(math.abs(qi) <= maxAbs)) // catches NaN too
          throw new IllegalArgumentException(
            s"SecondMomentAgg: |q|=$qi exceeds the exact-product range " +
              s"(quantized inputs must stay <= $maxAbs)")
        // integer-lattice contract: a fractional value inside the bound
        // would have its pairwise products silently truncated by .toLong
        // and break the documented exact-DECIMAL equivalence
        if (qi != math.rint(qi))
          throw new IllegalArgumentException(
            s"SecondMomentAgg: q=$qi is not integer-valued — inputs must " +
              "be pre-quantized to the integer lattice (floor(x*1e6))")
        var j = i
        while (j < dim) { add128(b, slot, (qi * q(j)).toLong); j += 1; slot += 1 }
        i += 1
      }
      i = 0
      while (i < dim) { add128(b, tri + i, q(i).toLong); i += 1 }
      add128(b, tri + dim, 1L)
      b
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var s = 0
      while (s < slots) {
        val i = s << 1
        val lo = x(i + 1)
        val ylo = y(i + 1)
        val nlo = lo + ylo
        val carry = ((lo & ylo) | ((lo | ylo) & ~nlo)) >>> 63
        x(i) += y(i) + carry
        x(i + 1) = nlo
        s += 1
      }
      x
    }

    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  private[graft] object SecondMomentAgg {
    /** Unpack slot `s` of a packed (hi, unsigned-lo) buffer to BigInt. */
    def slotValue(packed: IndexedSeq[Long], s: Int): BigInt = {
      val mask = (BigInt(1) << 64) - 1
      (BigInt(packed(2 * s)) << 64) + (BigInt(packed(2 * s + 1)) & mask)
    }
    /** Upper-triangle slot index of (i, j) with i <= j. */
    def triSlot(dim: Int, i: Int, j: Int): Int =
      i * dim - i * (i - 1) / 2 + (j - i)
  }

  /** Dominant covariance direction of the embedding corpus by power
    * iteration on the fix-point lattice, reported as per-label
    * projection mass — the drift/anisotropy diagnostic behind
    * "all-but-the-top" postprocessing (Mu & Viswanath, ICLR 2018) and
    * embedding-health dashboards: one overwhelming direction shared by
    * every label means the space is collapsing; strongly label-split
    * projection sums mean the top PC encodes the class.
    *
    * Exactness: vectors quantize to `floor(x·10⁶)`; ONE corpus pass
    * aggregates the upper-triangle second-moment statistics in a fused
    * per-partition [[SecondMomentAgg]] buffer (exact 128-bit integer
    * sums; the shuffle carries one ~9 KB buffer per partition, never
    * rows — the former `posexplode` formulation materialized d²+d+1
    * rows per input row before the hash-agg absorbed them). The scaled
    * covariance `M = n·Σqqᵀ − (Σq)(Σq)ᵀ` (same eigenvectors as the
    * covariance, integer-exact) is model-sized (d², KB-bounded
    * collect), and `iters` rounds of
    * `v ← trunc((M·v)·10⁶ / max|M·v|)` run in BigInt on the driver —
    * every iterate is an exact integer, so the direction and every
    * projection replay bit-for-bit cross-engine (the oracle unrolls
    * the same iterations as CTEs in HUGEINT; integer sums are
    * order-free, so the fused buffer matches the oracle's DECIMAL
    * aggregation exactly). The final scoring pass broadcasts the
    * direction as a literal into a codegen'd dot.
    *
    * Output: one row per label — (label, n_vecs, sum_proj,
    * sum_abs_proj), projections on the `floor(x·10⁶)` × `10⁶`-scaled
    * direction lattice.
    */
  def dominantDirectionReport(df: DataFrame, vecCol: String,
                              labelCol: String, iters: Int = 12): DataFrame = {
    import graft.functions.VectorFunctions.vec_dot
    val qcol = transform(col(vecCol), x => floor(x * lit(1000000.0)).cast("double"))
    val dim = df.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).limit(1).collect()
      .headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        "dominantDirectionReport: no non-null vectors"))
    val statsAgg = udaf(new SecondMomentAgg(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]())
    val packed = df.filter(col(vecCol).isNotNull)
      .select(qcol.as("__q"))
      .agg(statsAgg(col("__q")).as("s"))
      .head().getAs[scala.collection.Seq[Long]](0).toIndexedSeq
    import SecondMomentAgg.{slotValue, triSlot}
    val tri = dim * (dim + 1) / 2
    val n = slotValue(packed, tri + dim)
    require(n > 0, "dominantDirectionReport: empty corpus")
    val cs = Array.tabulate(dim)(i => slotValue(packed, tri + i))
    val m = Array.tabulate(dim, dim)((i, j) =>
      n * slotValue(packed,
        if (i <= j) triSlot(dim, i, j) else triSlot(dim, j, i)) - cs(i) * cs(j))
    val scale = BigInt(1000000L)
    var v = Array.fill(dim)(BigInt(1))
    for (_ <- 0 until iters) {
      val raw = Array.tabulate(dim)(i =>
        (0 until dim).map(j => m(i)(j) * v(j)).sum)
      val mx = raw.map(_.abs).max
      require(mx > 0, "dominantDirectionReport: zero covariance matrix")
      v = raw.map(r => (r * scale) / mx) // BigInt /: truncation toward zero
    }
    val vlit = array(v.map(x => lit(x.toDouble)): _*)
    df.select(col(labelCol).as("label"),
        vec_dot(qcol, vlit).cast("long").as("p"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum("p").as("sum_proj"),
        sum(abs(col("p"))).as("sum_abs_proj"))
  }

  /** Greedy k-center exemplar selection (Gonzalez 1985's farthest-point
    * traversal — the 2-approximation behind coreset data pruning à la
    * Sener & Savarese, ICLR 2018): pick the corpus's `k` most mutually
    * distant embeddings — seed topics, eval probes, or the "keep the
    * diverse ones" side of aggressive semantic dedup.
    *
    * Exact on the `floor(x·10⁶)` lattice: squared L2 distance is the
    * integer `‖a‖² + ‖b‖² − 2⟨a,b⟩`; round 0 picks the max-norm vector
    * (tie → min id), round r the vector maximizing its min distance to
    * the already-selected set (ties → min id). Deterministic, so the
    * whole selection replays cross-engine.
    *
    * Scale shape: k passes over the corpus, each a pure projection
    * against ≤ k broadcast-literal vectors followed by a TakeOrdered
    * argmax (one-row collect per round — the kmeans/BPE round budget);
    * the selected set is model-sized driver state. The corpus is never
    * shuffled.
    *
    * Output: (round, idCol, score) — score is the selection criterion
    * (norm² for round 0, min-squared-distance-to-prior for the rest).
    */
  def kcenterExemplars(df: DataFrame, idCol: String, vecCol: String,
                       k: Int): DataFrame = {
    import graft.functions.VectorFunctions.vec_dot
    require(k >= 1, s"kcenterExemplars: k must be >= 1, got $k")
    val spark = df.sparkSession
    val qcol = transform(col(vecCol), x => floor(x * lit(1000000.0)).cast("double"))
    val base = df.select(col(idCol).as("__id"), qcol.as("__q"))
      .withColumn("__n2", vec_dot(col("__q"), col("__q")).cast("long"))
    // (id, vector, norm2, score) of everything selected so far
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Double], Long, Long)]
    def pick(scored: DataFrame): Unit = {
      val r = scored
        .filter(!col("__id").isin(selected.map(_._1).toSeq: _*))
        .orderBy(col("__score").desc, col("__id"))
        .limit(1).collect()
      require(r.nonEmpty, s"kcenterExemplars: k=$k exceeds the corpus size")
      val row = r(0)
      selected += ((row.getLong(0), row.getSeq[Double](1),
        row.getLong(2), row.getLong(3)))
    }
    pick(base.withColumn("__score", col("__n2")))
    (1 until k).foreach { _ =>
      val mind = selected.map { case (_, v, n2, _) =>
        col("__n2") + lit(n2) -
          lit(2L) * vec_dot(col("__q"), array(v.map(lit(_)): _*)).cast("long")
      }.reduce(least(_, _))
      pick(base.withColumn("__score", mind))
    }
    import spark.implicits._
    selected.zipWithIndex
      .map { case ((id, _, _, score), r) => (r.toLong, id, score) }
      .toSeq.toDF("round", idCol, "score")
  }

  /** Symmetric int8 quantization per vector: `q_i = round(x_i / s · 127)`
    * with `s = max|x_i|` over the FINITE elements, emitted as (`qvec`
    * tinyint array, `qscale`) — a 4× memory cut for ANN candidate storage
    * (dequantize `q·s/127`, or score int8 directly and rescale). Pure
    * codegen'd Column HOFs (arbitrary column names welcome): one
    * `aggregate` for the max-abs, one `transform` to quantize; no
    * shuffle. All-zero vectors get `qscale = 0` and an all-zero `qvec`;
    * NaN/±Inf elements are excluded from the scale and quantize to 0
    * (under ANSI mode a cast of a non-finite would otherwise kill the
    * job; under non-ANSI it would silently zero the whole vector).
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    import org.apache.spark.sql.Column
    def xd(c: Column): Column = c.cast("double")
    // abs(x) < Inf is false for both NaN (sorts above Inf in Spark SQL
    // comparisons) and ±Inf — one finiteness predicate for both cases
    def finite(c: Column): Column = abs(xd(c)) < lit(Double.PositiveInfinity)
    val s = aggregate(col(vecCol), lit(0.0),
      (a, x) => when(finite(x), greatest(a, abs(xd(x)))).otherwise(a))
    df.withColumn("qscale", s)
      .withColumn("qvec", transform(col(vecCol), x =>
        round(when(col("qscale") === 0 || not(finite(x)), lit(0.0))
          .otherwise(xd(x) / col("qscale") * 127.0)).cast("tinyint")))
  }

  /** TRAINED scalar quantization (the FAISS `SQ8`-style storage path):
    * per-DIMENSION corpus min/max define an affine grid, every element
    * maps to `⌊(x − min_d)·levels / (max_d − min_d)⌋` — where
    * [[quantizeInt8]] scales each vector by its own max-abs (no training,
    * instant, per-row), this is the trained variant whose grid is shared
    * corpus-wide, so codes are comparable ACROSS vectors and the
    * dequantized corpus is what a serving tier actually memory-maps.
    *
    * Exactness contract: elements are first fixed-pointed at
    * `⌊x·2^scaleBits⌋` (exact — float→double is exact, ×2^k is exact),
    * then every downstream step is LONG arithmetic: min/max, the
    * integral-divide code, and the reconstruction error
    * `|xi·levels − (min_d·levels + code·(max_d − min_d))|` (the residual
    * on the ×levels grid). Bit-replayable by any engine; no float
    * rounding anywhere past the fixed-point step.
    *
    * Scale posture: one posexplode shuffle keyed (pos) for the dim-sized
    * stats table (broadcast back), one groupBy(id) to reassemble —
    * both partial-aggregate; nothing driver-side, no whole-vector
    * shuffle beyond the unavoidable explode/reassemble pair.
    */
  /** The per-dimension fixed-point elements: (id, pos, xi) with
    * `xi = ⌊x·2^scaleBits⌋` — both the grid trainer and the coder
    * start here so they can never disagree on the lattice.
    */
  private def fixedPoint(df: DataFrame, idCol: String, vecCol: String,
                         scaleBits: Int): DataFrame = {
    val scale = math.pow(2.0, scaleBits) // exact power of two
    df.select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col(idCol), col("pos"),
        floor(col("x").cast("double") * lit(scale)).cast("long").as("xi"))
  }

  /** Train the quantization grid: per-dimension (pos, mn, mx) on the
    * fixed-point lattice. dim rows — persist it next to the exported
    * codes; it is everything a loader needs to dequantize.
    */
  def scalarGrid(df: DataFrame, idCol: String, vecCol: String,
                 scaleBits: Int = 20): DataFrame =
    fixedPoint(df, idCol, vecCol, scaleBits)
      .groupBy("pos").agg(min("xi").as("mn"), max("xi").as("mx"))

  def scalarQuantizeTrained(df: DataFrame, idCol: String, vecCol: String,
                            levels: Int = 255,
                            scaleBits: Int = 20): DataFrame =
    scalarQuantizeWithGrid(df, idCol, vecCol,
      scalarGrid(df, idCol, vecCol, scaleBits), levels, scaleBits)

  /** Quantize against an EXISTING grid (the incremental-batch path: the
    * grid trains once, later corpus slices encode against it without a
    * second stats pass — same identity argument as the persisted ANN
    * index). Codes clamp to [0, levels]: out-of-grid values in a later
    * batch saturate rather than escape the uint range.
    */
  def scalarQuantizeWithGrid(df: DataFrame, idCol: String, vecCol: String,
                             grid: DataFrame, levels: Int = 255,
                             scaleBits: Int = 20): DataFrame = {
    require(levels > 0 && levels <= 65535, "levels must fit uint16")
    val fx = fixedPoint(df, idCol, vecCol, scaleBits)
    val st = grid.select(col("pos"), col("mn"), col("mx"))
    // LEFT join + coalesce-into-raise: an inner join would silently DROP
    // any dimension the grid never saw (a 128-dim batch against a 64-dim
    // grid would truncate every vector with no error); a dimension
    // mismatch must fail loudly
    val coded = fx.join(broadcast(st), Seq("pos"), "left")
      .withColumn("mn", coalesce(col("mn"),
        raise_error(concat(
          lit("scalarQuantizeWithGrid: dimension "), col("pos").cast("string"),
          lit(" absent from the grid"))).cast("long")))
      .withColumn("code",
        // clamp is identity when the grid was trained on this corpus;
        // it only bites for out-of-grid values in a later batch
        greatest(lit(0L), least(lit(levels.toLong),
          when(col("mx") > col("mn"),
            expr(s"(xi - mn) * $levels div (mx - mn)")).otherwise(lit(0L)))))
      .withColumn("err",
        abs(col("xi") * levels -
          (col("mn") * levels + col("code") * (col("mx") - col("mn")))))
    // the left-join guard above catches dims the grid never saw (vector
    // LONGER than the grid); this one catches the converse — a vector
    // SHORTER than the grid joins every one of its dims and would
    // silently emit a short code row, diverging from
    // encodeWithGridProjection's fail-loud length contract
    val gridDim = st.agg(count(lit(1)).cast("long").as("__grid_dim"))
    coded.groupBy(col(idCol))
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("code")))),
          s => s.getField("code").cast("int")).as("codes"),
        sum("err").cast("long").as("err_scaled"),
        count(lit(1)).cast("long").as("n_dims"))
      .crossJoin(broadcast(gridDim))
      .withColumn("n_dims",
        when(col("n_dims") === col("__grid_dim"), col("n_dims"))
          .otherwise(raise_error(concat(
            lit("scalarQuantizeWithGrid: expected "),
            col("__grid_dim").cast("string"), lit(" dims, got "),
            col("n_dims").cast("string"), lit(" for id "),
            col(idCol).cast("string"))).cast("long")))
      .drop("__grid_dim")
      .withColumn("code_digest",
        md5(concat_ws(",", transform(col("codes"), _.cast("string")))))
  }

  /** Two-stage RESIDUAL scalar quantization — the scalar form of the
    * residual-quantizer idea (faiss RQ / Chen, Guan & Wang's RVQ):
    * stage 1 codes each dimension on the trained SQ grid; stage 2
    * trains a second grid ON THE RECONSTRUCTION RESIDUALS and codes
    * those. Two uint8 codes per dimension recover most of the fidelity
    * a single 8-bit grid loses — `reduction_permille` quantifies it per
    * vector (‖stage-2 error‖ / ‖stage-1 error‖, both on their exact
    * lattices).
    *
    * All integer-exact: fixed-point `⌊x·2^scaleBits⌋` components,
    * stage-1 residual `r = xi·levels − (mn₁·levels + code₁·(mx₁−mn₁))`
    * stays integral, stage 2 repeats the identical grid arithmetic on
    * `r` (error lattice ×levels²). Plan: two grid aggregations + two
    * broadcast joins over the exploded corpus — the exact
    * [[scalarQuantizeTrained]] shape, twice.
    *
    * Output per vector: (idCol, code1_digest, code2_digest, err1_scaled,
    * err2_scaled, reduction_permille) — reduction is null when stage 1
    * was already exact.
    */
  def residualQuantize(df: DataFrame, idCol: String, vecCol: String,
                       levels: Int = 255, scaleBits: Int = 20): DataFrame = {
    require(levels > 0 && levels <= 65535, "levels must fit uint16")
    val fx = fixedPoint(df, idCol, vecCol, scaleBits)
    val g1 = fx.groupBy("pos").agg(min("xi").as("mn1"), max("xi").as("mx1"))
    val c1 = fx.join(broadcast(g1), Seq("pos"))
      .withColumn("code1", when(col("mx1") > col("mn1"),
        expr(s"(xi - mn1) * $levels div (mx1 - mn1)")).otherwise(lit(0L)))
      .withColumn("r", col("xi") * levels -
        (col("mn1") * levels + col("code1") * (col("mx1") - col("mn1"))))
    val g2 = c1.groupBy("pos").agg(min("r").as("mn2"), max("r").as("mx2"))
    val c2 = c1.join(broadcast(g2), Seq("pos"))
      .withColumn("code2", when(col("mx2") > col("mn2"),
        expr(s"(r - mn2) * $levels div (mx2 - mn2)")).otherwise(lit(0L)))
      .withColumn("err2", abs(col("r") * levels -
        (col("mn2") * levels + col("code2") * (col("mx2") - col("mn2")))))
    def digest(codeCol: String): Column =
      md5(concat_ws(",",
        transform(array_sort(collect_list(struct(col("pos"), col(codeCol)))),
          s => s.getField(codeCol).cast("string"))))
    c2.groupBy(col(idCol))
      .agg(digest("code1").as("code1_digest"),
        digest("code2").as("code2_digest"),
        sum(abs(col("r"))).cast("long").as("err1_scaled"),
        sum("err2").cast("long").as("err2_scaled"))
      .withColumn("reduction_permille",
        when(col("err1_scaled") > 0,
          expr(s"CAST(err2_scaled * 1000 DIV (err1_scaled * $levels) AS BIGINT)")))
  }

  /** PROJECTION-ONLY encode against a LOADED grid: (mn, mx) ride the
    * plan as two dim-length constant arrays and codes compute per row
    * with an indexed `transform` — no join, no shuffle, ZERO streaming
    * state, so the same expression serves a live embedding stream
    * (the ingest-time featurizer). Identical codes to
    * [[scalarQuantizeWithGrid]] by construction: same fixed-point
    * lattice, same integral divide, same rail clamp — including the
    * NULL-vector contract (dropped, exactly as the join path's
    * posexplode drops them). Fails loudly on a NON-null vector whose
    * length differs from the grid's dimensionality.
    */
  def encodeWithGridProjection(df: DataFrame, idCol: String,
                               vecCol: String,
                               grid: Seq[(Int, Long, Long)],
                               levels: Int = 255,
                               scaleBits: Int = 20): DataFrame = {
    val sorted = grid.sortBy(_._1)
    require(sorted.nonEmpty &&
      sorted.map(_._1) == (0 until sorted.size).toSeq,
      "grid positions must be dense 0..dim-1")
    val dim = sorted.size
    val mnArr = array(sorted.map(g => lit(g._2)): _*)
    val mxArr = array(sorted.map(g => lit(g._3)): _*)
    val scale = math.pow(2.0, scaleBits)
    df.select(col(idCol), col(vecCol))
      .filter(col(vecCol).isNotNull)
      .withColumn("__mn", mnArr)
      .withColumn("__mx", mxArr)
      // the size check lives INSIDE the codes expression (as the
      // transform's source), so no projection pruning can bypass it
      .withColumn("codes", expr(
        s"""transform(
           |  CASE WHEN size($vecCol) <> $dim
           |    THEN raise_error(concat(
           |      'encodeWithGridProjection: expected $dim dims, got ',
           |      CAST(size($vecCol) AS STRING)))
           |    ELSE $vecCol END,
           |  (x, i) ->
           |  CAST(greatest(CAST(0 AS BIGINT), least(CAST($levels AS BIGINT),
           |    CASE WHEN __mx[i] > __mn[i]
           |      THEN (CAST(floor(CAST(x AS DOUBLE) * ${scale}D) AS BIGINT) - __mn[i])
           |             * $levels div (__mx[i] - __mn[i])
           |      ELSE CAST(0 AS BIGINT) END)) AS INT))""".stripMargin))
      .withColumn("code_digest",
        md5(concat_ws(",", transform(col("codes"), _.cast("string")))))
      .drop("__mn", "__mx")
  }

  /** Export the corpus scalar-quantized: uint8 `.npy` shard files
    * (4× smaller than [[exportNpy]]'s float32 — the artifact a serving
    * tier actually memory-maps), the id manifest, AND the trained grid
    * as a parquet sidecar (`outDir/grid`: pos, mn, mx, levels,
    * scale_bits — everything a loader needs to dequantize
    * `mn/2^s + code·(mx−mn)/(levels·2^s)`).
    *
    * The grid trains in ONE stats pass and both persists and feeds the
    * coder — the sidecar and the codes can never disagree. Sharding,
    * manifest, per-shard file writes, and the (shard_no, n_rows, n_dim,
    * byte_len, sha256) report all follow [[exportNpy]]'s determinism
    * contract.
    */
  def exportNpyQuantized(df: DataFrame, idCol: String, vecCol: String,
                         outDir: String, numShards: Int = 16,
                         levels: Int = 255,
                         scaleBits: Int = 20): DataFrame = {
    // fail FAST: the quantizer itself accepts uint16 levels, but these
    // shards are '|u1' — discovering levels=1023 executor-side would
    // kill the job after the grid and manifest already landed
    require(levels > 0 && levels <= 255,
      s"u8 export requires levels <= 255, got $levels")
    val spark = df.sparkSession
    val grid = scalarGrid(df, idCol, vecCol, scaleBits)
    grid.withColumn("levels", lit(levels))
      .withColumn("scale_bits", lit(scaleBits))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/grid")
    val reloaded = spark.read.parquet(s"$outDir/grid")
    val codes = scalarQuantizeWithGrid(df, idCol, vecCol, reloaded,
      levels, scaleBits).select(col(idCol), col("codes"))
    val sharded = Curation.shuffleShards(codes, idCol, numShards)
    writeNpyShards(sharded, idCol, "codes", outDir, numShards) { rows =>
      val mat = rows.map(_.getSeq[Int](2).toArray).toArray
      (Npy.encodeU8(mat), mat.length.toLong,
        (if (mat.isEmpty) 0 else mat(0).length).toLong)
    }
  }

  /** Export the embedding column as float32 `.npy` shard files — the
    * tensor interchange training stacks actually load — plus an id
    * manifest parquet (shard, pos, id) so predictions join back to ids
    * by (shard, row).
    *
    * Determinism end to end: rows assign to md5-hash shards in md5
    * order (the [[Curation.shuffleShards]] convention — a reproducible
    * permutation independent of input partitioning), each complete
    * shard serializes in pos order to ONE [[Npy]] file written
    * executor-side through the Hadoop FS, and the returned report
    * (shard_no, n_rows, n_dim, byte_len, sha256) is a pure function of
    * the input set — the sha256 column is what the determinism spec
    * pins across runs and partitionings.
    *
    * Scale budget: one shard = one task's memory
    * (`rows/numShards · dim · 4` bytes) — size `numShards` like any
    * capped `collect_list` bucket; the shuffle moves each vector once.
    * Executors resolve the output filesystem from the URI with the
    * SESSION Hadoop configuration (broadcast), so `spark.hadoop.*`
    * credentials and fs impls apply on a real cluster.
    */
  def exportNpy(df: DataFrame, idCol: String, vecCol: String,
                outDir: String, numShards: Int = 16): DataFrame = {
    val sharded = Curation.shuffleShards(
      df.select(col(idCol), col(vecCol).cast("array<float>").as(vecCol)),
      idCol, numShards)
    writeNpyShards(sharded, idCol, vecCol, outDir, numShards) { rows =>
      val mat = rows.map(_.getSeq[Float](2).toArray).toArray
      (Npy.encodeF32(mat), mat.length.toLong,
        (if (mat.isEmpty) 0 else mat(0).length).toLong)
    }
  }

  /** The shared shard-writer behind [[exportNpy]] and
    * [[exportNpyQuantized]]: persist the sharded frame (the manifest
    * write and the shard write are two actions — without the cache the
    * whole upstream pipeline would execute twice), DELETE stale
    * `shard_*.npy` from a previous export (the manifest overwrites, but
    * shard files are keyed by number — a narrower re-export would leave
    * orphans that a globbing loader reads as live data), write one file
    * per shard executor-side, and return the report EAGERLY (numShards
    * rows, collected so the cache releases before returning).
    *
    * `encodeShard` sees one shard's rows pre-sorted by pos as
    * (shard, pos, vector) Rows and returns (bytes, n_rows, n_dim).
    */
  private def writeNpyShards(sharded: DataFrame, idCol: String,
                             vecCol: String, outDir: String, numShards: Int)
                            (encodeShard: Seq[org.apache.spark.sql.Row] =>
                              (Array[Byte], Long, Long)): DataFrame =
    writeShards(sharded, idCol, vecCol, outDir, numShards, "npy")(encodeShard)

  /** The payload-agnostic form of the shard writer: `ext` names the
    * shard files (`shard_NNNNN.<ext>`); everything else — persist,
    * manifest, stale-shard deletion, streamed boundary cutting, the
    * (shard_no, n_rows, n_dim, byte_len, sha256) report — is shared by
    * the `.npy` tensor exporters and the `.jsonl` corpus exporter.
    */
  private[graft] def writeShards(sharded: DataFrame, idCol: String,
                             vecCol: String, outDir: String, numShards: Int,
                             ext: String)
                            (encodeShard: Seq[org.apache.spark.sql.Row] =>
                              (Array[Byte], Long, Long)): DataFrame = {
    val spark = sharded.sparkSession
    import spark.implicits._
    val cached = sharded.persist()
    try {
      cached.select(col("shard"), col("pos"), col(idCol).as("id"))
        .write.mode("overwrite").parquet(s"$outDir/manifest")
      // the session's Hadoop conf (spark.hadoop.* credentials, fs impls)
      // resolves the filesystem on BOTH sides: directly on the driver,
      // broadcast to the tasks — a bare `new Configuration()` would drop
      // every session-level setting on a real cluster
      val hconf = spark.sparkContext.hadoopConfiguration
      val bconf = spark.sparkContext.broadcast(
        new graft.core.SerializableHadoopConf(hconf))
      val dfs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(outDir), hconf)
      Option(dfs.globStatus(
          new org.apache.hadoop.fs.Path(outDir, s"shard_*.$ext")))
        .toSeq.flatten.foreach(st => dfs.delete(st.getPath, false))
      val out = outDir
      val report = cached
        .select(col("shard").cast("int"), col("pos"), col(vecCol))
        .repartition(numShards, col("shard"))
        .sortWithinPartitions("shard", "pos")
        .mapPartitions { it =>
          // rows arrive SORTED by (shard, pos) with every shard complete
          // in this task (hash-partitioned on shard): stream the iterator
          // and cut a file on each shard boundary — one shard buffered at
          // a time (inherent: the .npy header needs the row count), never
          // the whole task
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(out), bconf.value.value)
          val buf = it.buffered
          new Iterator[(Int, Long, Long, Long, String)] {
            override def hasNext: Boolean = buf.hasNext
            override def next(): (Int, Long, Long, Long, String) = {
              val shard = buf.head.getInt(0)
              val rows = scala.collection.mutable.ArrayBuffer
                .empty[org.apache.spark.sql.Row]
              while (buf.hasNext && buf.head.getInt(0) == shard)
                rows += buf.next()
              val (bytes, n, dim) = encodeShard(rows.toSeq) // pos-sorted
              val p = new org.apache.hadoop.fs.Path(out,
                f"shard_$shard%05d." + ext)
              val os = fs.create(p, true)
              try os.write(bytes) finally os.close()
              val sha = java.security.MessageDigest.getInstance("SHA-256")
                .digest(bytes).map(b => f"$b%02x").mkString
              (shard, n, dim, bytes.length.toLong, sha)
            }
          }
        }
        .collect().toSeq
      spark.createDataset(report)
        .toDF("shard_no", "n_rows", "n_dim", "byte_len", "sha256")
    } finally cached.unpersist()
  }
}
