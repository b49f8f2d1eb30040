package graft.operators

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Tables

/** SemDeDup-style semantic dedup: planted-group recovery, the
  * single-cell ≡ global-threshold equivalence, cell saturation, and the
  * no-shuffle plan shape of cell assignment.
  */
class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val dim = 8

  /** A unit-ish vector along `axis` plus a tiny deterministic wiggle —
    * in-group cosine ≈ 0.9999, cross-group ≈ 0.
    */
  private def near(axis: Int, wiggle: Int): Seq[Float] =
    Seq.tabulate(dim)(i =>
      (if (i == axis) 1.0f else 0.0f) +
        (if (i == (axis + 1) % dim) wiggle * 0.01f else 0.0f))

  // ids interleaved so nlist=3 puts one centroid in each planted group
  private lazy val planted = Seq(
    (1L, near(0, 1)), (2L, near(2, 1)), (3L, near(4, 1)), // group seeds
    (4L, near(0, 2)), (5L, near(0, 3)),                   // group A members
    (6L, near(2, 2)),                                     // group B member
    (7L, near(4, 2)), (8L, near(4, 3)),                   // group C members
    // singletons: diagonal directions, cosine ≈ 0.7 to nothing planted
    (31L, Seq.tabulate(dim)(i => if (i >= 6) 1.0f else 0.0f)),
    (32L, Seq.tabulate(dim)(i => if (i == 1 || i == 3) 1.0f else -1.0f))
  ).toDF("vec_id", "embedding")

  test("planted groups are recovered; keep = smallest id per group") {
    val out = Dedup.semanticDedup(planted, "vec_id", "embedding",
        thresholdNum = 9L, thresholdDen = 10L, nlist = 3)
      .select("doc_id", "cluster_id", "keep")
      .as[(Long, Long, Boolean)].collect().toSet
    val expected = Set(
      (1L, 1L, true), (4L, 1L, false), (5L, 1L, false),
      (2L, 2L, true), (6L, 2L, false),
      (3L, 3L, true), (7L, 3L, false), (8L, 3L, false))
    assert(out == expected, s"got $out")
  }

  test("nlist=1 degenerates to the global threshold pair graph") {
    // with a single cell the within-cell pair mining sees every pair, so
    // groups must match what the exact all-pairs cosine threshold implies
    val out = Dedup.semanticDedup(planted, "vec_id", "embedding",
        thresholdNum = 9L, thresholdDen = 10L, nlist = 1,
        maxCellSize = None)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    val pairs = Similarity.allPairsCosine(planted, "vec_id", "embedding")
      .filter(col("cosine") >= 0.9) // planted cosines are far from 0.9
      .select("a", "b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    val ids = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(out.map(_._1) == ids,
      "cluster membership must equal the docs that appear in some pair")
  }

  test("over-cap cells are skipped, not exploded") {
    // groups A (1,4,5) and C (3,7,8) exceed a cap of 2 -> their cells are
    // skipped and their members absent; group B (size 2) still dedups
    val out = Dedup.semanticDedup(planted, "vec_id", "embedding",
        thresholdNum = 9L, thresholdDen = 10L, nlist = 3,
        maxCellSize = Some(2))
      .select("doc_id").as[Long].collect().toSet
    assert(!out.exists(Set(1L, 4L, 5L, 3L, 7L, 8L)), s"capped cell leaked: $out")
    assert(out == Set(2L, 6L), s"got $out")
  }

  test("cell assignment plans as a projection: no Exchange over the corpus") {
    val cells = Dedup.semanticCells(planted, "vec_id", "embedding", 3)
    val exchanges = cells.queryExecution.executedPlan.collect {
      case e: Exchange => e
    }
    assert(exchanges.isEmpty,
      s"semantic cell assignment must not shuffle, found: $exchanges")
  }

  test("real corpus: every cluster keeps exactly one exemplar") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding").cache()
    val clusters = out.select("cluster_id").distinct().count()
    val kept = out.filter(col("keep")).count()
    assert(clusters == kept, s"$clusters clusters but $kept keepers")
    // cluster id is always a member id and the minimum of its members
    val bad = out.groupBy("cluster_id").agg(min("doc_id").as("lo"))
      .filter(col("cluster_id") =!= col("lo")).count()
    assert(bad == 0)
    out.unpersist()
  }
}
