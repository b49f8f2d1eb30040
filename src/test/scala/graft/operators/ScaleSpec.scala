package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Tables

class ScaleSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

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
