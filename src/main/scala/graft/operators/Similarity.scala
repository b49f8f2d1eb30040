package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`ArrayType(FloatType)`).
  *
  * The math is built from higher-order functions (`zip_with` +
  * `aggregate`), computed in double precision — codegen'd expressions, no
  * UDFs, so the dot products run inside whole-stage codegen on executors.
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
  * multiplicative hashing), so results are reproducible across engines and
  * runs — no RNG state, and the oracle can replay them.
  */
object Similarity {

  /** Cosine similarity of two array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** Exact top-k neighbors for each query vector (brute force, broadcast
    * queries). Output: qid, id, rank (1-based by descending cosine,
    * id-tiebroken).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .withColumn("cosine", cosine(col("qvec").cast("array<double>"),
                                   col("vec").cast("array<double>")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "rank")
  }

  /** Random-hyperplane signature for one hash table: `planes` sign bits.
    * Hyperplane weight for (table t, plane p, dim i) is an integer Knuth
    * hash folded to [-1000, 1000] — pure arithmetic, replayable anywhere.
    */
  private def signature(vec: Column, t: Int, planes: Int): Column =
    concat((0 until planes).map { p =>
      val dots = expr(
        s"""aggregate(
           |  zip_with(__vec, sequence(0, size(__vec) - 1),
           |    (x, i) -> x * (((2654435761 * (${t * 1000003 + p * 64} + i + 1)) % 2001 + 2001) % 2001 - 1000)),
           |  cast(0.0 as double), (acc, x) -> acc + x)""".stripMargin)
      when(dots >= 0, "1").otherwise("0")
    }: _*)

  /** Approximate top-k via `tables` independent random-hyperplane hash
    * tables of `planes` bits each. Candidates = same (table, signature)
    * bucket as the query in any table, exactly re-ranked. Output: qid, id,
    * rank.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, tables: Int = 12, planes: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, idAs: String, vecAs: String): DataFrame = {
      val base = df.select(col(idCol).as(idAs),
        col(vecCol).cast("array<double>").as("__vec"))
      base.select(col(idAs), col("__vec").as(vecAs), explode(array(
        (0 until tables).map(t =>
          struct(lit(t).as("t"), signature(col("__vec"), t, planes).as("sig"))): _*)).as("b"))
        .select(col(idAs), col(vecAs), col("b.t"), col("b.sig"))
    }
    val c = bucketed(corpus, "id", "vec")
    val q = bucketed(queries, "qid", "qvec")
    val candidates = c.join(broadcast(q), Seq("t", "sig"))
      .filter(col("id") =!= col("qid"))
      .select("qid", "qvec", "id", "vec").distinct()
    val scored = candidates.withColumn("cosine", cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "rank")
  }

  /** Exact all-pairs cosine (a < b). Quadratic — bounded inputs only. */
  def allPairsCosine(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val a = emb.select(col(idCol).as("a"), col(vecCol).cast("array<double>").as("va"))
    val b = emb.select(col(idCol).as("b"), col(vecCol).cast("array<double>").as("vb"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .select("a", "b", "cosine")
  }
}
