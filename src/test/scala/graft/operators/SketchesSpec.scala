package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min heavy hitters: planted hitters are found in rank order, the
  * CMS point estimates respect the one-sided error bound, and the
  * candidate mine keeps per-task memory bounded while still surfacing
  * every true heavy hitter.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // 1000×hot1, 600×hot2, 300×hot3, 2000 singleton-tail tokens
  private def fixture = (
    Seq.fill(1000)("hot1") ++ Seq.fill(600)("hot2") ++ Seq.fill(300)("hot3")
      ++ (0 until 2000).map(i => s"tail_$i")
  ).toDF("tok")

  test("planted heavy hitters surface in rank order with sane estimates") {
    val out = Sketches.heavyHittersCms(fixture, "tok", k = 3, eps = 1e-4)
      .as[(String, Long, Int)].collect().toSeq
    assert(out.map(_._1) == Seq("hot1", "hot2", "hot3"), s"got $out")
    val est = out.map(r => r._1 -> r._2).toMap
    // one-sided bound: est >= true, est <= true + eps*N (N = 3900)
    assert(est("hot1") >= 1000 && est("hot1") <= 1000 + 1)
    assert(est("hot2") >= 600 && est("hot2") <= 600 + 1)
    assert(est("hot3") >= 300 && est("hot3") <= 300 + 1)
    assert(out.map(_._3) == Seq(1, 2, 3))
  }

  test("point estimates never undercount (CMS one-sided guarantee)") {
    val est = Sketches.cmsEstimates(fixture, "tok",
      Seq("hot1", "hot2", "hot3", "tail_7", "absent"), 0.01, 0.99, 42)
    assert(est("hot1") >= 1000 && est("hot2") >= 600 && est("hot3") >= 300)
    assert(est("tail_7") >= 1)
    assert(est("absent") >= 0)
    // ε = 0.01 over N = 3900 bounds every overcount by 39
    est.foreach { case (s, e) =>
      val truth = Map("hot1" -> 1000L, "hot2" -> 600L, "hot3" -> 300L,
        "tail_7" -> 1L, "absent" -> 0L)(s)
      assert(e <= truth + 39, s"$s overcounted: $e vs $truth")
    }
  }

  test("candidate mine is bounded yet complete for true hitters") {
    val cands = Sketches.localTopCandidates(
        fixture.repartition(8, col("tok")), "tok", capacity = 4)
      .as[String].collect().toSet
    assert(Set("hot1", "hot2", "hot3").subsetOf(cands), s"got $cands")
    // 8 partitions × 4-counter space-saving summaries bound the set
    assert(cands.size <= 32)
  }

  test("space-saving summary memory is capped, superset property holds") {
    // one partition, capacity 8, a 500-distinct-token tail: the summary
    // holds at most 8 items no matter the tail, and the ε-heavy item
    // (count 100 of N=600 → ε≈1/6 ≥ 1/8) is guaranteed present
    val tail = (1 to 500).map(i => s"t_$i")
    val stream = Seq.fill(100)("heavy") ++ tail
    val df = stream.toDF("tok").coalesce(1)
    val cands = Sketches.localTopCandidates(df, "tok", capacity = 8)
      .as[String].collect().toSet
    assert(cands.size <= 8, s"summary exceeded capacity: ${cands.size}")
    assert(cands.contains("heavy"))
  }

  test("agrees with the exact top-k on real fixture tokens") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    val approx = Sketches.heavyHittersCms(toks, "tok", k = 10, eps = 1e-4)
      .select("tok").as[String].collect().toSeq
    val exact = toks.groupBy("tok").count()
      .orderBy(col("count").desc, col("tok"))
      .limit(10).select("tok").as[String].collect().toSeq
    assert(approx == exact)
  }

  test("SpaceSavingAgg: exact regime equals groupBy count for any merge tree") {
    // capacity > distinct items → summary IS the exact count map,
    // independent of partitioning (merge = pointwise sum, no prune)
    val agg = udaf(new Sketches.SpaceSavingAgg(64),
      org.apache.spark.sql.Encoders.STRING)
    val small = (1 to 900).map(i => s"t_${i % 40}").toDF("tok")
    val exact = small.groupBy("tok").count()
      .as[(String, Long)].collect().toMap
    for (parts <- Seq(1, 4, 8)) {
      val m = small.repartition(parts)
        .agg(agg(col("tok")).as("s"))
        .as[Map[String, Long]].head()
      assert(m == exact, s"parts=$parts")
    }
  }

  test("SpaceSavingAgg: eviction regime stays capped, keeps the heavy item") {
    val agg = udaf(new Sketches.SpaceSavingAgg(4),
      org.apache.spark.sql.Encoders.STRING)
    val tail = (1 to 300).map(i => s"z_$i")
    val df = (Seq.fill(200)("hot") ++ tail).toDF("tok").coalesce(1)
    val m = df.agg(agg(col("tok")).as("s")).as[Map[String, Long]].head()
    assert(m.size <= 4, s"summary exceeded capacity: $m")
    assert(m.contains("hot"))
    // one-sided error: the estimate never undercounts the true 200
    assert(m("hot") >= 200L)
  }

  test("QuantileSketchAgg: exact regime equals sorted-rank selection, any partitioning") {
    val qs = Seq(0.5, 0.9, 0.99)
    val agg = udaf(new Sketches.QuantileSketchAgg(4096, qs),
      org.apache.spark.sql.Encoders.scalaDouble)
    val vals = (1 to 1000).map(i => ((i * 7919) % 1000).toDouble)
    val sorted = vals.sorted
    val expected = qs.map(q =>
      sorted(math.max(1, math.ceil(q * vals.size).toLong).toInt - 1))
    for (parts <- Seq(1, 4, 8)) {
      val got = vals.toDF("v").repartition(parts)
        .agg(agg(col("v")).as("q")).as[Seq[Double]].head()
      assert(got == expected, s"parts=$parts")
    }
  }

  test("QuantileSketchAgg: compaction caps memory, estimates stay one-sided") {
    val a = new Sketches.QuantileSketchAgg(16, Seq(0.5, 0.9))
    // fold 10k values through reduce: buffer never exceeds capacity
    var buf = a.zero
    val vals = (1 to 10000).map(i => ((i * 104729) % 10000).toDouble)
    vals.foreach { v =>
      buf = a.reduce(buf, v)
      assert(buf.size <= 16, s"buffer grew to ${buf.size}")
    }
    val Seq(est50, est90) = a.finish(buf)
    val sorted = vals.sorted
    val true50 = sorted(vals.size / 2 - 1); val true90 = sorted(vals.size * 9 / 10 - 1)
    // one-sided: compaction keeps the LOWER value of each merged pair,
    // so estimates never exceed the true quantile
    assert(est50 <= true50 && est90 <= true90, s"($est50,$est90) vs ($true50,$true90)")
    // and they are still order-of-magnitude right (rank error bounded)
    assert(est50 > 0 && est90 >= est50)
  }

  test("SpaceSavingAgg: merge prunes to capacity deterministically") {
    val a = new Sketches.SpaceSavingAgg(3)
    val left = Map("x" -> 10L, "y" -> 5L, "z" -> 2L)
    val right = Map("y" -> 4L, "w" -> 3L, "v" -> 1L)
    // summed: x10 y9 z2 w3 v1 → top-3 by (cnt desc, item asc): x, y, w
    assert(a.merge(left, right) == Map("x" -> 10L, "y" -> 9L, "w" -> 3L))
  }

  test("KmvDistinctAgg: exact under capacity, ~1/sqrt(k) error over it") {
    val items = (0 until 5000).map(i => s"item_$i")
      .toDF("v").union((0 until 5000).map(i => s"item_$i").toDF("v")) // dups
    // exact regime: capacity above cardinality → exact distinct count
    val exact = Sketches.kmvDistinct(items.withColumn("g", lit("all")),
      "g", "v", capacity = 8192).select("n_distinct", "n_distinct_est")
      .as[(Long, Long)].head()
    assert(exact == ((5000L, 5000L)), s"exact regime broke: $exact")
    // estimator regime: capacity 256 over 5000 distinct → ±25% (>4σ)
    val est = Sketches.kmvDistinct(items.withColumn("g", lit("all")),
      "g", "v", capacity = 256).select("n_distinct_est").as[Long].head()
    assert(math.abs(est - 5000L) <= 1250, s"KMV estimate $est vs 5000")
  }

  test("KmvDistinctAgg: pure function of the input set in BOTH regimes") {
    // KMV merge = set union keep-k-smallest: partitioning/merge order
    // must not change even the ESTIMATOR-regime output (unlike
    // space-saving, whose eviction is order-dependent). This is what
    // lets the catalog entry run oracle-hashed at capacity < distinct.
    val items = (0 until 3000).map(i => s"k_$i").toDF("v")
      .withColumn("g", lit("all"))
    val ests = Seq(1, 7, 32).map { p =>
      Sketches.kmvDistinct(items.repartition(p), "g", "v", capacity = 64)
        .select("n_distinct_est").as[Long].head()
    }
    assert(ests.distinct.size == 1, s"partitioning changed the estimate: $ests")
  }

  test("kmvOverlapMatrix: exact regime recovers true set cardinalities") {
    // A = 0..59, B = 40..99 (overlap 40..59), C disjoint; capacity 256
    // keeps every buffer under capacity → the "estimates" are the exact
    // set sizes and the pair algebra must recover the truth precisely
    val items = ((0 until 60).map(i => ("A", s"v_$i"))
      ++ (40 until 100).map(i => ("B", s"v_$i"))
      ++ (0 until 30).map(i => ("C", s"c_$i"))).toDF("g", "v")
    val rows = Sketches.kmvOverlapMatrix(items, "g", "v", capacity = 256)
      .select("ga", "gb", "n_a_est", "n_b_est", "n_union_est",
        "n_inter_est", "jaccard_pctx100")
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    assert(rows.map(r => (r._1, r._2)) == Seq(("A", "B"), ("A", "C"), ("B", "C")))
    val ab = rows.head
    assert(ab == (("A", "B", 60L, 60L, 100L, 20L, 2000L)), s"A-B: $ab")
    val ac = rows(1)
    assert((ac._5, ac._6, ac._7) == ((90L, 0L, 0L)), s"A-C: $ac")
  }

  test("kmvOverlapMatrix: estimator regime is a pure function of the set") {
    // over-capacity buffers: estimates within KMV error AND invariant
    // to partitioning + duplication (set semantics), the property that
    // lets the catalog entry run oracle-hashed in the estimator regime
    val base = ((0 until 2000).map(i => ("A", s"v_$i"))
      ++ (1000 until 3000).map(i => ("B", s"v_$i"))).toDF("g", "v")
    val out = Seq(1, 7, 32).map { p =>
      Sketches.kmvOverlapMatrix(base.repartition(p).union(base), "g", "v",
          capacity = 128)
        .select("n_a_est", "n_b_est", "n_union_est", "n_inter_est")
        .as[(Long, Long, Long, Long)].head()
    }
    assert(out.distinct.size == 1, s"partitioning changed the matrix: $out")
    val (na, nb, nu, ni) = out.head
    assert(math.abs(na - 2000) <= 600 && math.abs(nb - 2000) <= 600,
      s"group ests off: $na $nb")
    assert(math.abs(nu - 3000) <= 900, s"union est off: $nu")
    assert(math.abs(ni - 1000) <= 600, s"intersection est off: $ni")
  }

  test("kmvDistinct: a group whose items are ALL null rows out with 0") {
    // silent-absence guard: filtering nulls before the groupBy would
    // make an all-null group vanish — "no overlap" when the truth is
    // "never measured". The report must carry every input group —
    // INCLUDING a null group KEY (an equi-join resurrection would drop
    // it: null never equi-matches null).
    val items = Seq((Some("a"), Some("x")), (Some("a"), None),
        (Some("b"), None), (Some("b"), None),
        (None, Some("y")), (None, Some("z")), (None, None))
      .toDF("g", "v")
    val rows = Sketches.kmvDistinct(items, "g", "v", capacity = 16)
      .select("g", "n_distinct", "n_distinct_est")
      .as[(Option[String], Long, Long)].collect().toSeq
      .sortBy(_._1.getOrElse(""))
    assert(rows == Seq((None, 2L, 2L), (Some("a"), 1L, 1L),
      (Some("b"), 0L, 0L)), s"got $rows")
  }
}
