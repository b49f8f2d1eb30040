package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Embedding-space decontamination: planted eval-neighbors are flagged,
  * distant vectors survive, and the ref-bucket cap saturates loudly
  * (degenerate buckets drop rather than fan out).
  */
class EmbeddingDecontamSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val dim = 8

  private def axis(a: Int, wiggle: Int = 0): Seq[Float] =
    Seq.tabulate(dim)(i =>
      (if (i == a) 1.0f else 0.0f) +
        (if (i == (a + 1) % dim) wiggle * 0.01f else 0.0f))

  test("eval neighbors are flagged, distant vectors survive") {
    // eval set along axes 0 and 2; corpus holds two paraphrase-grade
    // neighbors (cos ≈ 0.9999), one moderate vector, one orthogonal
    val ref = Seq((100L, axis(0)), (101L, axis(2))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, axis(0, wiggle = 1)),  // ≈ ref 100 → contaminated
      (2L, axis(2, wiggle = 2)),  // ≈ ref 101 → contaminated
      (3L, axis(5)),              // orthogonal to both → clean
      (4L, Seq.tabulate(dim)(i => if (i == 0 || i == 4) 1.0f else 0.0f))
      // cos vs ref100 = 1/√2 ≈ 0.707 < 4/5 → clean at τ = 4/5
    ).toDF("vec_id", "embedding")
    val out = Dedup.embeddingDecontam(corpus, ref, "vec_id", "embedding",
        thresholdNum = 4L, thresholdDen = 5L)
      .select("id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false),
      s"got $out")
  }

  test("flags agree with the exact all-pairs threshold on a planted mix") {
    val ref = (0 until 4).map(a => (200L + a, axis(2 * a))).toDF("vec_id", "embedding")
    val corpus = (0 until 24).map { i =>
      (i.toLong, axis(i % dim, wiggle = i % 3))
    }.toDF("vec_id", "embedding")
    val got = Dedup.embeddingDecontam(corpus, ref, "vec_id", "embedding",
        thresholdNum = 9L, thresholdDen = 10L)
      .select("id", "contaminated").as[(Long, Boolean)].collect().toMap
    // exact oracle: cosine vs every ref vector, no LSH
    val refV = ref.as[(Long, Seq[Float])].collect()
    val expect = corpus.as[(Long, Seq[Float])].collect().map { case (id, v) =>
      val hit = refV.exists { case (_, r) =>
        val dot = v.zip(r).map { case (a, b) => a.toDouble * b }.sum
        val cos = dot / (math.sqrt(v.map(x => x.toDouble * x).sum) *
          math.sqrt(r.map(x => x.toDouble * x).sum))
        cos >= 0.9
      }
      id -> hit
    }.toMap
    // planted cosines sit far from τ = 0.9, and true neighbors share
    // LSH buckets with probability ≈ 1 at 16×8 banding
    assert(got == expect, s"got $got expected $expect")
  }

  test("over-cap ref buckets drop: a degenerate eval set flags nothing") {
    // 12 identical eval vectors in every bucket with cap 8 → dropped →
    // even an exact copy in the corpus survives (loud saturation, no fanout)
    val ref = (0 until 12).map(i => (300L + i, axis(1))).toDF("vec_id", "embedding")
    val corpus = Seq((1L, axis(1)), (2L, axis(4))).toDF("vec_id", "embedding")
    val out = Dedup.embeddingDecontam(corpus, ref, "vec_id", "embedding",
        thresholdNum = 1L, thresholdDen = 2L, maxRefBucket = Some(8))
      .select("id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> false, 2L -> false), s"got $out")
  }
}
