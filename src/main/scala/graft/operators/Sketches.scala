package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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

  /** Per-partition candidate generation: each task keeps an exact local
    * count map and emits its top `localTopM` items — bounded memory per
    * task regardless of tail size (the space-saving flavor of candidate
    * mining). A global ε-heavy hitter is a local heavy hitter in at
    * least one partition unless adversarially spread; `localTopM`
    * hundreds at ε = 10⁻⁴ covers real corpora with room to spare.
    */
  private[operators] def localTopCandidates(items: DataFrame, itemCol: String,
                                            localTopM: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col(itemCol).cast("string"))
      .filter(col(itemCol).isNotNull)
      .as[String]
      .mapPartitions { it =>
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach(s => counts.update(s, counts.getOrElse(s, 0L) + 1L))
        // deterministic tie-break on the item keeps the candidate set
        // stable across runs for a fixed partitioning
        counts.toSeq.sortBy { case (s, n) => (-n, s) }
          .take(localTopM).map(_._1).iterator
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
    localTopCandidates(strs, itemCol, localTopM)
      .withColumn("est_count", estimate(col(itemCol)))
      .orderBy(col("est_count").desc, col(itemCol))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("est_count").desc, col(itemCol))))
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
