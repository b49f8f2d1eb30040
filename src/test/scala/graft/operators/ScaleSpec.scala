package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Tables

class ScaleSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("zValue interleaves bits; zorderBy clusters both dimensions") {
    val z = Seq((3L, 5L)).toDF("x", "y")
      .select(Scale.zValue(col("x"), col("y"), 3)).first().getLong(0)
    // x=011, y=101 → y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 39
    assert(z == 39L)
    // a 64×64 grid z-ordered into 16 range partitions: every partition
    // covers a compact z range, so BOTH per-partition dimension spans stay
    // well under the domain (a plain sort by x leaves the y span at 63)
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y))
      .toDF("x", "y")
    val laid = Scale.zorderBy(grid, "x", "y", bits = 6, partitions = 16)
    val spans = laid.withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .agg(avg("xs"), avg("ys")).first()
    assert(spans.getDouble(0) < 32 && spans.getDouble(1) < 32,
      s"spans: ${spans.getDouble(0)}, ${spans.getDouble(1)}")
  }

  test("salted aggregation equals direct groupBy") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .withColumn("price_dec", col("l_extendedprice").cast("decimal(18,2)"))
    val direct = li.groupBy("l_returnflag")
      .agg(sum("price_dec").as("sum_price_dec"), count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
      .as[(String, BigDecimal, Long)].collect().toSeq
    val salted = Scale.saltedSum(li, "l_returnflag", "price_dec")
      .orderBy("l_returnflag")
      .as[(String, BigDecimal, Long)].collect().toSeq
    assert(salted == direct)
  }

  test("keyProfile surfaces heavy hitters with exact integer shares") {
    // 60 rows of one hot key + 40 spread over 40 keys
    val rows = (1 to 60).map(_ => "hot") ++ (1 to 40).map(i => s"k$i")
    val df = rows.toDF("k")
    val prof = Scale.keyProfile(df, "k", 5)
      .as[(String, Long, Long)].collect()
    assert(prof.head == (("hot", 60L, 600000L)), s"got ${prof.head}")
    // remaining slots: count-1 keys, tie-broken by key name ascending
    assert(prof.tail.map(_._1).toSeq == Seq("k1", "k10", "k11", "k12"))
    assert(prof.tail.forall(p => p._2 == 1L && p._3 == 10000L))
    // top-k must plan as TakeOrdered, not a global sort
    val plan = Scale.keyProfile(df, "k", 5).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
  }

  test("bucketed join plans without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val (bo, bl) = Scale.bucketJoinTables(spark, orders, li,
      "o_orderkey", 8, "spec_bucket_orders", "spec_bucket_lineitem")
    // At real scale neither side broadcasts; force that regime here so the
    // bucketed (shuffle-free) sort-merge path is what gets planned.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = bo.join(bl, "o_orderkey")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      // correctness: same row count as the plain join
      val plain = orders.join(li, "o_orderkey").count()
      assert(joined.count() == plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("pruneStats: disjoint-range flags match a hand census; inputs validated") {
    // 3 "files" with value ranges [0,9], [10,19], [20,29] on v, and a
    // second column w anti-correlated — predicate v in [12, 15] prunes
    // files 0 and 2; predicate w in [0, 100] prunes nothing
    val rows = (0 until 30).map(i => (i / 10, i.toLong, (29 - i).toLong))
    val df = rows.toDF("f", "v", "w")
    val out = Scale.pruneStats(df, Seq("v", "w"),
        Seq(("v", 12L, 15L), ("w", 0L, 100L)), fileLabel = col("f"))
      .orderBy("file")
      .select("file", "n_rows", "min_v", "max_v", "prune_v", "prune_w")
      .as[(Int, Long, Long, Long, Int, Int)].collect().toSeq
    assert(out == Seq((0, 10L, 0L, 9L, 1, 0), (1, 10L, 10L, 19L, 0, 0),
      (2, 10L, 20L, 29L, 1, 0)), s"got $out")
    intercept[IllegalArgumentException] {
      Scale.pruneStats(df, Seq("v"), Seq(("w", 0L, 1L)))
    }
    intercept[IllegalArgumentException] {
      Scale.pruneStats(df, Seq("v"), Seq(("v", 5L, 1L)))
    }
  }

  test("pruneStats: a z-ordered layout prunes where a shuffled one cannot") {
    // same data, two layouts: files cut along v (sorted) vs files cut
    // round-robin — the sorted layout's zone maps prune a narrow
    // predicate, the shuffled layout's maps all span the domain
    val n = 400
    val sorted = (0 until n).map(i => (i / 50, i.toLong)).toDF("f", "v")
    val shuffled = (0 until n).map(i => (i % 8, i.toLong)).toDF("f", "v")
    def pruned(df: org.apache.spark.sql.DataFrame): Long =
      Scale.pruneStats(df, Seq("v"), Seq(("v", 100L, 120L)),
          fileLabel = col("f"))
        .agg(sum("prune_v")).head().getLong(0)
    assert(pruned(sorted) == 7L, "sorted layout should prune 7 of 8 files")
    assert(pruned(shuffled) == 0L, "round-robin layout cannot prune")
  }
}
