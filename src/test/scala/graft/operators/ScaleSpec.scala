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
}
