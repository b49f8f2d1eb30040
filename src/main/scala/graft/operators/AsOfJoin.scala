package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: each left row picks up the latest right row
  * with `right.ts <= left.ts` on the same key — the standard
  * feature-at-time-of-event join for training data (no future leakage).
  *
  * Spark has no native as-of join; the scalable formulation is
  * union-merge: tag both sides, union, then one window pass per key in
  * time order carrying the last-seen right payload forward
  * (`last(..., ignoreNulls)` over unbounded-preceding). Cost: ONE shuffle
  * on the key + a per-partition sort — no range-join row explosion, no
  * broadcast requirement, so it survives 100 TB where an inequality join
  * condition would degenerate to nested loops.
  *
  * Ties at equal timestamps: right rows order before left rows (inclusive
  * `>=` semantics, like DuckDB ASOF); duplicate right rows at the same
  * (key, ts) should be pre-deduplicated by the caller for determinism.
  */
object AsOfJoin {

  /** Left rows + `rightCols` from the as-of matched right row (null when
    * nothing matches). Output columns: all of `left`, then `rightCols`
    * prefixed with `asof_`.
    *
    * `direction` (the pandas `merge_asof` trio, same semantics):
    *  - `"backward"` (default): latest right with `rts ≤ lts`;
    *  - `"forward"`: earliest right with `rts ≥ lts` (the same one
    *    union-merge pass traversed in descending time);
    *  - `"nearest"`: the closer of the two, ties to backward. The
    *    distance comparison subtracts the ORIGINAL ts values (numeric
    *    stays numeric, timestamps compare as exact day-time intervals —
    *    no epoch-to-double rounding sits on the tie boundary). Both
    *    window passes share the one key exchange; only the sort runs
    *    twice.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightCols: Seq[String],
               direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"joinAsOf: direction must be backward|forward|nearest, got $direction")
    val keyCols = keys.map(col)
    val lPayload = struct(left.columns.map(col).toIndexedSeq: _*).as("__l")
    val rPayload = struct((rightTs +: rightCols).map(col).toIndexedSeq: _*).as("__r")
    val rStruct = right.select((rightTs +: rightCols).map(col): _*).schema

    val lTagged = left.select(keyCols ++ Seq(col(leftTs).as("__ts"),
      lit(1).as("__is_left"), lPayload): _*)
      .withColumn("__r", lit(null).cast(rStruct))
    // Join semantics: NULL keys never match (window partitioning would
    // otherwise group NULLs together) — drop null-key right rows; null-key
    // left rows pass through unmatched.
    val rTagged = right
      .filter(keyCols.map(_.isNotNull).reduce(_ && _))
      .select(keyCols ++ Seq(col(rightTs).as("__ts"),
        lit(0).as("__is_left"), rPayload): _*)
      .withColumn("__l", lit(null).cast(left.schema))

    val wB = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts").desc, col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)

    val union = lTagged.unionByName(rTagged)
    val matched = direction match {
      case "backward" =>
        union.withColumn("__rmatch", last(col("__r"), ignoreNulls = true).over(wB))
      case "forward" =>
        union.withColumn("__rmatch", last(col("__r"), ignoreNulls = true).over(wF))
      case "nearest" =>
        union
          .withColumn("__bm", last(col("__r"), ignoreNulls = true).over(wB))
          .withColumn("__fm", last(col("__r"), ignoreNulls = true).over(wF))
          .withColumn("__rmatch",
            when(col("__bm").isNull, col("__fm"))
              .when(col("__fm").isNull, col("__bm"))
              .when(col("__ts") - col("__bm").getField(rightTs) <=
                    col("__fm").getField(rightTs) - col("__ts"), col("__bm"))
              .otherwise(col("__fm")))
    }
    matched
      .filter(col("__is_left") === 1)
      .select(left.columns.map(c => col(s"__l.$c").as(c)).toIndexedSeq ++
        rightCols.map(c => col(s"__rmatch.$c").as(s"asof_$c")) :+
        col(s"__rmatch.$rightTs").as(s"asof_$rightTs"): _*)
  }

  /** Overflow-safe deterministic mixer for numeric keys: reduce mod a
    * prime first (bounds the product far below Long range, ANSI-safe for
    * 64-bit ids), Knuth-multiply, reduce mod a second prime. The final
    * value has no algebraic relationship to `key mod m` for small m — the
    * property a naive `(key*K) mod 100` lacks (that is a bijection of
    * `key mod 100`, so strided keys all land in one bucket).
    */
  private[operators] def mixKey(key: org.apache.spark.sql.Column) =
    pmod(pmod(key.cast("long"), lit(1000003L)) * lit(2654435761L), lit(1000000007L))

  /** Deterministic hash-bucket train/test split: bucket = mixed key mod
    * 100, split = "train" iff bucket < trainPct. Pure integer arithmetic —
    * reproducible across runs, engines, and re-partitioning, and stable
    * under appends (a row's split never changes), which random sampling
    * cannot guarantee. Null keys land deterministically in "test".
    */
  def trainTestSplit(df: DataFrame, key: String, trainPct: Int): DataFrame = {
    require(trainPct > 0 && trainPct < 100)
    require(df.schema(key).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"trainTestSplit needs a numeric key, got ${df.schema(key).dataType.simpleString}")
    val bucket = pmod(mixKey(col(key)), lit(100L))
    df.withColumn("split",
      when(bucket < trainPct, "train").otherwise("test"))
  }

  /** Leakage-free split: the split is assigned to the duplicate CLUSTER,
    * not the document — a doc-keyed split puts near-duplicate copies on
    * both sides, leaking train content into eval (the contamination
    * failure decontamination exists to prevent, reintroduced by the
    * split itself). `clusters` is [[Dedup.duplicateClusters]]' (id,
    * cluster_id) labeling; docs absent from it are singletons and
    * cluster under their own id. Same stable integer-hash bucketing as
    * [[trainTestSplit]] — append-stable, engine-exact.
    *
    * Scale shape: one left join against the (small — only clustered
    * docs) label table, then a pure projection.
    */
  def leakFreeSplit(docs: DataFrame, clusters: DataFrame, idCol: String,
                    trainPct: Int): DataFrame = {
    // duplicateClusters labels its id column "doc_id" regardless of the
    // caller's key — align it to idCol so embedding-keyed corpora
    // (vec_id, ...) compose without a rename at every call site
    val labelId =
      if (clusters.columns.contains(idCol)) idCol
      else if (clusters.columns.contains("doc_id")) "doc_id"
      else throw new IllegalArgumentException(
        s"leakFreeSplit: clusters has neither '$idCol' nor 'doc_id' " +
          s"(columns: ${clusters.columns.mkString(", ")})")
    val labeled = docs.join(
        clusters.select(col(labelId).as(idCol), col("cluster_id")),
        Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
    trainTestSplit(labeled, "cluster_id", trainPct)
  }

  /** Keyless range-containment join at scale: every `points` row joined
    * to every `intervals` row with `start ≤ pt ≤ end` (inclusive), when
    * there is NO equi key to hash on. Spark's native plan for a pure
    * inequality join is BroadcastNestedLoopJoin — quadratic work and a
    * driver-sized broadcast that falls over once the interval side
    * grows. Bin-and-refine restores a shuffled equi-join: the domain is
    * quantized into `binWidth` bins, each interval EXPLODES across the
    * bins it touches, points join on their single bin, and the exact
    * containment predicate refines. Each (point, interval) match is
    * found exactly once — in the point's bin — so no dedup pass.
    *
    * Work = |points| + Σ(span/binWidth) + true matches: pick `binWidth`
    * near the typical interval span so each interval explodes to ~2
    * rows. Guards are DECLARATIVE fail-loud (raise_error inside the
    * projection, codegen-friendly): negative domains (integer DIV
    * truncates toward zero — a negative value would bin wrong, not
    * error), inverted intervals, and per-interval explosion above
    * `maxBinsPerInterval` (a domain-spanning interval silently turning
    * the explode quadratic is the failure mode the cap exists for).
    * Column names from both sides pass through — callers disambiguate.
    */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
                      ptCol: String, startCol: String, endCol: String,
                      binWidth: Long,
                      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth >= 1L, s"binWidth must be >= 1, got $binWidth")
    require(maxBinsPerInterval >= 1,
      s"maxBinsPerInterval must be >= 1, got $maxBinsPerInterval")
    val p = points.withColumn("__bin",
      when(col(ptCol) < 0L,
        raise_error(lit(s"binnedRangeJoin: negative $ptCol"))
          .cast("long"))
      .otherwise(expr(s"CAST(`$ptCol` DIV $binWidth AS BIGINT)")))
    val iv = intervals
      .withColumn("__sb",
        when(col(startCol) < 0L || col(endCol) < col(startCol),
          raise_error(lit(s"binnedRangeJoin: negative or inverted " +
            s"[$startCol, $endCol] interval")).cast("long"))
        .otherwise(expr(s"CAST(`$startCol` DIV $binWidth AS BIGINT)")))
      .withColumn("__eb", expr(s"CAST(`$endCol` DIV $binWidth AS BIGINT)"))
      .withColumn("__bin", explode(
        when(col("__eb") - col("__sb") >= maxBinsPerInterval.toLong,
          raise_error(lit(s"binnedRangeJoin: interval spans more than " +
            s"$maxBinsPerInterval bins — raise binWidth or the cap"))
            .cast("array<long>"))
        .otherwise(sequence(col("__sb"), col("__eb")))))
      .drop("__sb", "__eb")
    p.join(iv, Seq("__bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bin")
  }
}
