package graft.queries


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.{HostedTables, Tables}
import graft.core.{Chunker, ServiceName, WriteMode}
import graft.operators.{Calibration, Cdc, Curation, Dedup, Embeddings, GraphOps, HtmlText, Multimodal, Profiling, Regression, Scale, Similarity, Sketches, TextAnalysis}
import graft.sinks.HostedStore
import graft.streaming.EventStreams

/** The relational breadth suite (TPC-H `q<N>_*` and the `q_*`
  * window/rollup/as-of entries), queries + DuckDB oracles. Part of the
  * QueryCatalog split (r12) — entries verbatim; shared helpers in
  * [[CatalogHelpers]].
  */
private[queries] object RelationalCatalog {
  import CatalogHelpers._

  val queries: Map[String, Q] = Map(
    "q1_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          (sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("long").as("sum_base_price_cents"),
          (sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")) * 10000).cast("long").as("sum_disc_price_e4"),
          count(lit(1)).as("count_order"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q18_large_orders" -> ((s, dir) => {
      // TPC-H Q18 shape: orders whose total quantity clears a threshold —
      // a HAVING aggregate driving a semi-join back to the fact tables.
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum("l_quantity").cast("long").as("total_qty"))
        .filter(col("total_qty") > 150)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(25)
    }),

    "q_grouping_sets" -> ((s, dir) =>
      // Explicit GROUPING SETS beyond rollup/cube: per-lang, per-source,
      // and grand-total document counts in one pass, with grouping flags.
      t(s, dir, "documents")
        .groupingSets(Seq(Seq(col("lang")), Seq(col("source")), Seq()),
          col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          grouping(col("lang")).cast("long").as("g_lang"),
          grouping(col("source")).cast("long").as("g_source"))
        .orderBy("g_lang", "g_source", "lang", "source")),

    "q10_returned_items" -> ((s, dir) => {
      // TPC-H Q10 shape: who returned the most revenue — 4-table join,
      // partial agg on a compound group key, top-20 as TakeOrdered.
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                col("o_orderdate") < to_timestamp(lit("1996-07-01 00:00:00")))
      t(s, dir, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")) * 10000).cast("long").as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("c_custkey"))
        .limit(20)
    }),

    "q5_local_supplier_volume" -> ((s, dir) => {
      // TPC-H Q5 shape: 6-table join where the optimizer's work — dim
      // broadcasts, join reorder, partial agg — IS the query plan. The
      // customer-supplier same-nation equi-pair rides the supplier join.
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      t(s, dir, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")) * 10000).cast("long").as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("n_name"))
    }),

    "q6_forecast_revenue" -> ((s, dir) =>
      // TPC-H Q6 shape: pure scan-side query — every predicate (date
      // range, discount band, quantity cap) must reach the parquet scan
      // as PushedFilters; the plan is one WholeStageCodegen scan+agg.
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
                col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
                col("l_quantity") < 24)
        .agg((sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(18,4)")) * 10000).cast("long").as("revenue_e4"))),

    "q7_volume_shipping" -> ((s, dir) => {
      // TPC-H Q7 shape: the same dimension table joined TWICE under
      // different roles (supplier nation vs customer nation) with a
      // symmetric either-direction pair predicate, then a year rollup —
      // the join-aliasing decorrelation pattern.
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      t(s, dir, "supplier")
        .join(t(s, dir, "lineitem"), col("s_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(n1, col("s_nationkey") === col("n1_key"))
        .join(n2, col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
                (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01 00:00:00")) &&
                col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")) * 10000).cast("long").as("revenue_e4"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    "q8_market_share" -> ((s, dir) => {
      // TPC-H Q8 shape: national market share inside a region — the
      // conditional-aggregate-over-join pattern. The share is emitted as
      // exact integer (numerator_e4, denominator_e4) instead of a float
      // ratio so the cross-engine hash is bit-stable.
      val nc = t(s, dir, "nation")
        .select(col("n_nationkey").as("nc_key"), col("n_regionkey").as("nc_region"))
      val ns = t(s, dir, "nation")
        .select(col("n_nationkey").as("ns_key"), col("n_name").as("supp_nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
        .filter(col("p_type") === "PROMO")
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(nc, col("c_nationkey") === col("nc_key"))
        .join(t(s, dir, "region"), col("nc_region") === col("r_regionkey"))
        .filter(col("r_name") === "AMERICA")
        .join(t(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(ns, col("s_nationkey") === col("ns_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          (sum(when(col("supp_nation") === "NATION_1",
              (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .cast("decimal(18,4)"))
            .otherwise(lit(0).cast("decimal(18,4)"))) * 10000)
            .cast("long").as("nation_volume_e4"),
          (sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")) * 10000).cast("long").as("total_volume_e4"))
        .orderBy("o_year")
    }),

    "q14_promo_revenue" -> ((s, dir) =>
      // TPC-H Q14 shape: promotional revenue share by ship month —
      // CASE-inside-aggregate over a fact-dim join; exact integer
      // numerator/denominator instead of the float percentage.
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .groupBy(month(col("l_shipdate")).as("ship_month"))
        .agg(
          (sum(when(col("p_type") === "PROMO",
              (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .cast("decimal(18,4)"))
            .otherwise(lit(0).cast("decimal(18,4)"))) * 10000)
            .cast("long").as("promo_revenue_e4"),
          (sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")) * 10000).cast("long").as("total_revenue_e4"))
        .orderBy("ship_month")),

    "q19_disjunctive_revenue" -> ((s, dir) =>
      // TPC-H Q19 shape: a disjunction of brand/size/quantity conjunct
      // bundles over a fact-dim join — the predicate shape that tests
      // whether the optimizer pushes a common join key through an OR of
      // otherwise-unrelated filters.
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#14" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
        .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")) * 10000).cast("long").as("revenue_e4"))),

    "q13_customer_distribution" -> ((s, dir) => {
      // TPC-H Q13 shape: LEFT outer join with an IN-JOIN predicate (the
      // filter belongs to the join, so customers whose only orders are
      // urgent still count as zero-order customers), then a distribution
      // over the per-customer counts — two aggregations, the second on a
      // tiny key space. count(o_orderkey) (not count(*)) makes the
      // unmatched-row count 0, the outer-join subtlety the shape exists
      // to exercise.
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    "q15_top_supplier" -> ((s, dir) => {
      // TPC-H Q15 shape: quarterly revenue per supplier, then the
      // argmax-by-scalar-subquery join (revenue = max(revenue)) — ties
      // all surface, exactly as the spec's view formulation does. The
      // 1-row max aggregate is broadcast; revenue is exact e4 integer so
      // the equality join has no float boundary.
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
        .groupBy(col("l_suppkey"))
        .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")) * 10000).cast("long").as("total_revenue_e4"))
      val mx = rev.agg(max(col("total_revenue_e4")).as("__mx"))
      rev.join(broadcast(mx), col("total_revenue_e4") === col("__mx"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue_e4"))
        .orderBy("s_suppkey")
    }),

    "q17_small_quantity_revenue" -> ((s, dir) => {
      // TPC-H Q17 shape: per-part average-quantity gate re-joined against
      // the fact table — the correlated-aggregate decorrelation pattern.
      // The 0.2·avg threshold runs in EXACT integer space:
      // qty < 0.2·(sum/n) ⟺ 5·qty·n < sum (quantities are integral
      // doubles), so no boundary row flips between engines. Both the
      // stats aggregation and the probe shuffle on l_partkey — at scale
      // they co-partition, one exchange feeds both.
      val li = t(s, dir, "lineitem")
      val brandParts = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey"))
      val fact = li.join(broadcast(brandParts),
        col("l_partkey") === col("p_partkey"))
      val stats = fact.groupBy(col("l_partkey").as("__pk"))
        .agg(count(lit(1)).as("__n"),
          sum(col("l_quantity").cast("long")).as("__sum_qty"))
      fact.join(stats, col("l_partkey") === col("__pk"))
        .filter(col("l_quantity").cast("long") * 5 * col("__n") <
          col("__sum_qty"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("revenue_cents"),
          count(lit(1)).as("n_rows"))
    }),

    "q22_dormant_customers" -> ((s, dir) => {
      // TPC-H Q22 shape (adapted: every fixture customer has SOME order,
      // so "no orders at all" is degenerate — the anti-join runs against
      // the last year instead): above-average-balance customers with no
      // RECENT orders, per market segment. Anti-join + a scalar global
      // aggregate subquery, the classic decorrelation pair.
      val cust = t(s, dir, "customer")
      // the "above average" gate runs in EXACT integer space:
      // bal > avg ⟺ bal_cents · n > sum_cents (a float avg threshold
      // could flip boundary customers between engines by one ulp)
      val Array(sumCents, nPos) = cust.filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(18,2)")) * 100).cast("long"),
          count(lit(1)))
        .head.toSeq.map(_.asInstanceOf[Long]).toArray
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("2001-01-01 00:00:00")))
        .select(col("o_custkey"))
      cust.filter(
          (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long") * nPos
            > sumCents)
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          (sum(col("c_acctbal").cast("decimal(18,2)")) * 100)
            .cast("long").as("total_bal_cents"))
        .orderBy("c_mktsegment")
    }),

    "q3_shipping_priority" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < to_timestamp(lit("1998-06-30 00:00:00")))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > to_timestamp(lit("1998-06-30 00:00:00")))
      cust.join(ord, cust("c_custkey") === ord("o_custkey"))
        .join(li, ord("o_orderkey") === li("l_orderkey"))
        .groupBy(col("l_orderkey"))
        // ×10000 BIGINT preserves ordering (positive scale factor) and
        // renders identically across engines.
        .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")) * 10000).cast("long").as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("l_orderkey"))
        .limit(10)
    }),

    "q_window_topn" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    }),

    "q_topk_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)),

    "q_join_agg_nation" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      // Dimension joins: both sides tiny — explicitly broadcast.
      cust.join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_customers"),
          (sum(col("c_acctbal").cast("decimal(18,2)")) * 100)
            .cast("long").as("sum_acctbal_cents"))
        .orderBy("r_name", "n_name")
    }),

    "q_events_densified" -> ((s, dir) =>
      // Gap-filled hourly grid per event type: explicit zeros for silent
      // hours — the feature-store prep step models need.
      graft.operators.TimeSeries.densifyHourly(
          t(s, dir, "events"), "event_type", "ts")
        .orderBy("hour_ms", "event_type")),

    "q_events_hourly" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(col("value").cast("decimal(18,2)")) * 100)
            .cast("long").as("total_value_cents"))
        .select(unix_millis(col("hour")).as("hour_ms"), col("event_type"),
          col("n"), col("total_value_cents"))
        .orderBy("hour_ms", "event_type")),

    "q21_late_suppliers" -> ((s, dir) => {
      // TPC-H Q21 shape: correlated EXISTS + NOT EXISTS (multi-supplier
      // orders where ONLY this supplier shipped late) — written as SQL
      // subqueries so Catalyst's decorrelation plans them as one semi
      // and one anti join; lateness = shipped > 60 days after order
      // (this schema carries no commit/receipt dates).
      Seq("supplier", "lineitem", "orders", "nation").foreach(n =>
        t(s, dir, n).createOrReplaceTempView(s"__q21_$n"))
      s.sql("""
        SELECT s_name, count(*) AS numwait
        FROM __q21_supplier
        JOIN __q21_lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN __q21_orders ON o_orderkey = l1.l_orderkey
        JOIN __q21_nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM __q21_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM __q21_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 25""")
    }),

    "q16_supplier_variety" -> ((s, dir) => {
      // TPC-H Q16 shape: null-aware NOT IN anti join + count(DISTINCT)
      // over a grouped join — the distinct agg plans as a two-phase
      // partial/merge expand, the NOT IN as an anti join.
      Seq("part", "lineitem", "supplier").foreach(n =>
        t(s, dir, n).createOrReplaceTempView(s"__q16_$n"))
      s.sql("""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM __q16_part JOIN __q16_lineitem ON p_partkey = l_partkey
        WHERE p_size IN (1, 2, 3, 4, 5)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM __q16_supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 20""")
    }),

    "q_interval_join" -> ((s, dir) => {
      // click → purchase attribution within 30 minutes, via the same
      // intervalJoin used for the watermarked stream-stream path (batch
      // frames: the watermark is eliminated, the plan family is the same).
      val ev = t(s, dir, "events")
      EventStreams.intervalJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          "user_id", "30 minutes")
        .select(col("user_id"), unix_millis(col("l_ts")).as("click_ms"),
          unix_millis(col("r_ts")).as("purchase_ms"))
        .orderBy("user_id", "click_ms", "purchase_ms")
    }),

    "x_range_join_binned" -> ((s, dir) => {
      // KEYLESS range containment at scale: no user_id to hash on —
      // Spark's native plan for the bare inequality join is a
      // BroadcastNestedLoopJoin (quadratic, driver-bound broadcast).
      // Bin-and-refine restores an equi-join: the 5 busiest hours (by
      // event count) become incident windows, every event lands in its
      // epoch-hour bin, windows explode across their bins (~1 each),
      // and the exact containment predicate refines. PlanSpec gates the
      // no-BNL shape; the oracle replays with DuckDB's native
      // inequality join — same rows, different plan.
      val ev = t(s, dir, "events")
      val windows = ev
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("h")).limit(5)
        .select(unix_millis(col("h")).as("w_start"),
          (unix_millis(col("h")) + lit(3599999L)).as("w_end"))
      val points = ev.select(unix_millis(col("ts")).as("ev_ms"),
        col("event_id"), col("event_type"))
      graft.operators.AsOfJoin.binnedRangeJoin(points, windows, "ev_ms",
          "w_start", "w_end", binWidth = 3600000L)
        .select("w_start", "event_id", "ev_ms", "event_type")
        .orderBy("w_start", "event_id")
    }),

    "q_events_json" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")),

    "q_pivot_status" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))
        .orderBy("o_orderpriority")),

    "q_exists_urgent" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q_percentiles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // Discrete order statistics (value at rank ceil(p·n)), not
      // interpolated quantiles: the result IS a data value, so both engines
      // emit the identical float64 — no interpolation-arithmetic drift —
      // and ×100 BIGINT cents renders identically. The per-priority window
      // has ~5 partitions of n/5 rows; for a true 100 TB percentile use
      // approx_percentile (sketch-mergeable) instead — this is the exact
      // oracle-checkable form.
      val w = Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(
          Window.partitionBy("o_orderpriority")))
        .groupBy("o_orderpriority")
        .agg(
          (round(max(when(col("rn") === ceil(col("cnt") * 0.5),
            col("o_totalprice"))) * 100)).cast("long").as("median_price_cents"),
          (round(max(when(col("rn") === ceil(col("cnt") * 0.95),
            col("o_totalprice"))) * 100)).cast("long").as("p95_price_cents"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    "q_distinct_parts" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    "q_cube_orders" -> ((s, dir) => {
      // CUBE over (status, priority): all four grouping combinations in
      // one partial-aggregated pass (same SQL-surface idiom as ROLLUP).
      t(s, dir, "orders").createOrReplaceTempView("v_orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents
          |FROM v_orders
          |GROUP BY CUBE(o_orderstatus, o_orderpriority)
          |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    }),

    "q_rollup_nation" -> ((s, dir) => {
      // SQL surface: rollup + null-first ordering (the Dataset API's
      // ambiguity detector misfires on rollup-key sorts; the SQL path is
      // the same Catalyst plan without the Dataset-id bookkeeping).
      t(s, dir, "customer").createOrReplaceTempView("v_customer")
      t(s, dir, "nation").createOrReplaceTempView("v_nation")
      t(s, dir, "region").createOrReplaceTempView("v_region")
      s.sql(
        """SELECT /*+ BROADCAST(n, r) */
          |  r_name AS region_name, n_name AS nation_name,
          |  count(*) AS n_customers,
          |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_acctbal_cents
          |FROM v_customer c
          |JOIN v_nation n ON c.c_nationkey = n.n_nationkey
          |JOIN v_region r ON n.n_regionkey = r.r_regionkey
          |GROUP BY ROLLUP(r_name, n_name)
          |ORDER BY region_name ASC NULLS FIRST, nation_name ASC NULLS FIRST
          |""".stripMargin)
    }),

    "q_setops_customers" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val building = cust.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val wealthy = cust.filter(col("c_acctbal") > 5000.0).select("c_custkey")
      val bigSpenders = t(s, dir, "orders")
        .filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey").as("c_custkey"))
      building.intersect(wealthy).except(bigSpenders).orderBy("c_custkey")
    }),

    "q_asof_join" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      // one signup row per (user, ts): deterministic dedup for tie-safety
      val signups = events.filter(col("event_type") === "signup")
        .groupBy("user_id", "ts").agg(max("value").as("signup_value"))
      graft.operators.AsOfJoin.joinAsOf(purchases, signups,
          Seq("user_id"), "ts", "ts", Seq("signup_value"))
        .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"),
          unix_millis(col("asof_ts")).as("signup_ts_ms"),
          (col("asof_signup_value").cast("decimal(18,2)") * 100)
            .cast("long").as("signup_value_cents"))
        .orderBy("event_id")
    }),

    "q_asof_forward" -> ((s, dir) => {
      // forward as-of: each purchase matched to the user's EARLIEST
      // click at-or-after it (post-purchase engagement) — the same
      // union-merge pass traversed in descending time.
      val events = t(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = events.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("value").as("click_value"))
      graft.operators.AsOfJoin.joinAsOf(purchases, clicks,
          Seq("user_id"), "ts", "ts", Seq("click_value"),
          direction = "forward")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"),
          unix_millis(col("asof_ts")).as("click_ts_ms"),
          (col("asof_click_value").cast("decimal(18,2)") * 100)
            .cast("long").as("click_value_cents"))
        .orderBy("event_id")
    }),

    "q_asof_nearest" -> ((s, dir) => {
      // nearest as-of (attribution): each purchase matched to the
      // user's CLOSEST click either side, ties to the earlier one —
      // exact interval comparison, never epoch-to-double rounding.
      val events = t(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = events.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("value").as("click_value"))
      graft.operators.AsOfJoin.joinAsOf(purchases, clicks,
          Seq("user_id"), "ts", "ts", Seq("click_value"),
          direction = "nearest")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"),
          unix_millis(col("asof_ts")).as("click_ts_ms"),
          (col("asof_click_value").cast("decimal(18,2)") * 100)
            .cast("long").as("click_value_cents"))
        .orderBy("event_id")
    }),

    "q_train_test_split" -> ((s, dir) =>
      graft.operators.AsOfJoin.trainTestSplit(
          t(s, dir, "orders"), "o_orderkey", 80)
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          (sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long").as("sum_price_cents"))
        .orderBy("split")),

    "q_props_map" -> ((s, dir) =>
      // JSON props -> typed map column, then per-key aggregation
      t(s, dir, "events")
        .withColumn("props_map",
          from_json(col("props"), org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))
        .withColumn("k", element_at(col("props_map"), "k").cast("long"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
        .orderBy("k_mod")),

    "x_sessionize" -> ((s, dir) =>
      graft.streaming.Sessionize.sessions(t(s, dir, "events"), "30 minutes")
        .orderBy("user_id", "session_start_ms")),

    "x_session_funnel" -> ((s, dir) => {
      // SESSION-scoped conversion: the view→click→purchase machine run
      // WITHIN each 30-minute gap session — per-visit funnel depth, the
      // product-analytics refinement of the corpus-wide x_event_funnel.
      // Sessions are lag/cumsum islands (deterministic: ordered by
      // (tms, event_id) — unique, so no tie-order divergence); the
      // stage machine is a codegen'd HOF fold over the session's
      // time-ordered event codes, replayed by DuckDB list_reduce. The
      // per-user windows are bounded by per-user activity, the same
      // budget as sessionization itself.
      val ev = t(s, dir, "events").select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("tms"),
        when(col("event_type") === "view", 1)
          .when(col("event_type") === "click", 2)
          .when(col("event_type") === "purchase", 3)
          .otherwise(0).as("code"))
      val ord = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("tms", "event_id")
      val sess = ev
        .withColumn("brk", when(col("tms") -
          lag("tms", 1).over(ord) >= 1800000L, 1).otherwise(0))
        .withColumn("sid", sum(col("brk")).over(ord.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      sess.groupBy(col("user_id"), col("sid"))
        .agg(min(col("tms")).as("session_start_ms"),
          count(lit(1)).as("n_events"),
          sort_array(collect_list(struct(col("tms"), col("event_id"),
            col("code")))).as("__evs"))
        .withColumn("funnel_depth",
          expr("CAST(aggregate(transform(__evs, e -> e.code), 0, (a, b) -> " +
            "CASE WHEN b = 1 AND a = 0 THEN 1 " +
            "WHEN b = 2 AND a = 1 THEN 2 " +
            "WHEN b = 3 AND a = 2 THEN 3 ELSE a END) AS BIGINT)"))
        .select("session_start_ms", "user_id", "n_events", "funnel_depth")
        .orderBy("user_id", "session_start_ms")
    }),

    "x_stream_anomaly" -> ((s, dir) => {
      // Custom keyed state (flatMapGroupsWithState) with an ORACLE-HASHED
      // output: per-user running anomaly gate on exact integer cents —
      // value > 3·mean(previous) tested as value·n > 3·sum, no float
      // anywhere, so the custom-state path replays as a window query.
      // Mode-agnostic (same code runs the stream); the spec pins
      // cross-micro-batch state continuity.
      import s.implicits._
      val ev = t(s, dir, "events")
        .select(col("user_id").cast("long").as("user_id"),
          unix_millis(col("ts")).as("tms"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("value_cents"))
        .as[graft.streaming.Sessionize.CentsEvent]
      graft.streaming.Sessionize.anomaliesExact(ev)
        // n_prev completes the total order: two identical flagged events
        // (same user, ms-tied tms, same cents) differ only in state
        .toDF().orderBy("user_id", "tms", "value_cents", "n_prev")
    }),

    "q_stream_hourly" -> ((s, dir) => {
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      // fixed title, dropped first: re-runs replace the table instead of
      // accumulating one leaked hosted table per invocation
      val title = "stream_hourly_check"
      HostedStore.dropByTitle(title)
      EventStreams.runUpsertWindowedOnce(s, dir, "events.parquet", schema, title)
        .orderBy("window_start_ms", "event_type")
    }))

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_base_price_cents,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS sum_disc_price_e4,
        |  count(*) AS count_order,
        |  sum(l_quantity) / count(*) AS avg_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
        |GROUP BY l_orderkey
        |ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(sum(l_quantity) AS BIGINT) > 150)
        |SELECT c_custkey, c_name, o_orderkey, total_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 25""".stripMargin,

    "q_grouping_sets" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(grouping(lang) AS BIGINT) AS g_lang,
        |  CAST(grouping(source) AS BIGINT) AS g_source
        |FROM documents
        |GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY g_lang, g_source, lang, source""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_e4 DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q7_volume_shipping" ->
      """SELECT supp_nation, cust_nation, CAST(l_year AS INT) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         year(l_shipdate) AS l_year,
        |         l_extendedprice, l_discount
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CASE WHEN ns.n_name = 'NATION_1'
        |        THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
        |        ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT) AS nation_volume_e4,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS total_volume_e4
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation nc ON c_nationkey = nc.n_nationkey
        |JOIN region ON nc.n_regionkey = r_regionkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ns ON s_nationkey = ns.n_nationkey
        |WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q14_promo_revenue" ->
      """SELECT CAST(month(l_shipdate) AS INT) AS ship_month,
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
        |        ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT) AS promo_revenue_e4,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS total_revenue_e4
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY ship_month ORDER BY ship_month""".stripMargin,

    "q19_disjunctive_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q13_customer_distribution" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS total_revenue_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue_e4
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue_e4 = (SELECT max(total_revenue_e4) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q17_small_quantity_revenue" ->
      """WITH fact AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#23'),
        |stats AS (
        |  SELECT l_partkey AS pk, count(*) AS n,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM fact GROUP BY 1)
        |SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue_cents,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM fact JOIN stats ON l_partkey = pk
        |WHERE CAST(l_quantity AS BIGINT) * 5 * n < sum_qty""".stripMargin,

    "q22_dormant_customers" ->
      """WITH pos AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_cents,
        |         CAST(count(*) AS BIGINT) AS n_pos
        |  FROM customer WHERE c_acctbal > 0),
        |recent AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_bal_cents
        |FROM customer, pos
        |WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * n_pos > sum_cents
        |  AND c_custkey NOT IN (SELECT o_custkey FROM recent)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q5_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue_e4 DESC, n_name""".stripMargin,

    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,

    "q_join_agg_nation" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_acctbal_cents
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q21_late_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 25""".stripMargin,

    "q16_supplier_variety" ->
      """SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_size IN (1, 2, 3, 4, 5)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 20""".stripMargin,

    "x_range_join_binned" ->
      // DuckDB replays with its NATIVE inequality join — identical rows
      // prove bin-and-refine changed the plan, not the result
      """WITH h AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n
        |          FROM events GROUP BY 1),
        |top AS (SELECT h FROM h ORDER BY n DESC, h LIMIT 5),
        |iv AS (SELECT CAST(epoch_ms(h) AS BIGINT) AS w_start,
        |              CAST(epoch_ms(h) + 3599999 AS BIGINT) AS w_end
        |       FROM top),
        |p AS (SELECT CAST(epoch_ms(ts) AS BIGINT) AS ev_ms, event_id,
        |             event_type
        |      FROM events)
        |SELECT iv.w_start, p.event_id, p.ev_ms, p.event_type
        |FROM p JOIN iv ON p.ev_ms BETWEEN iv.w_start AND iv.w_end
        |ORDER BY iv.w_start, p.event_id""".stripMargin,

    "q_interval_join" ->
      """SELECT c.user_id, epoch_ms(c.ts) AS click_ms, epoch_ms(p.ts) AS purchase_ms
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY 1, 2, 3""".stripMargin,

    "q_events_densified" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT date_trunc('hour', min(ts)) AS lo,
        |             date_trunc('hour', max(ts)) AS hi FROM events),
        |grid AS (SELECT t.event_type,
        |                unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS hour
        |         FROM (SELECT DISTINCT event_type FROM events) t, b)
        |SELECT CAST(epoch_ms(grid.hour) AS BIGINT) AS hour_ms,
        |       grid.event_type, coalesce(h.n, 0) AS n
        |FROM grid LEFT JOIN hourly h
        |  ON h.hour = grid.hour AND h.event_type = grid.event_type
        |ORDER BY hour_ms, grid.event_type""".stripMargin,

    "q_events_hourly" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_events_json" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_pivot_status" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_exists_urgent" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_percentiles" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS cnt
        |  FROM orders)
        |SELECT o_orderpriority,
        |  CAST(round(max(CASE WHEN rn = ceil(cnt * 0.5) THEN o_totalprice END) * 100) AS BIGINT) AS median_price_cents,
        |  CAST(round(max(CASE WHEN rn = ceil(cnt * 0.95) THEN o_totalprice END) * 100) AS BIGINT) AS p95_price_cents,
        |  count(*) AS n
        |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_distinct_parts" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_rollup_nation" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
        |  count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_acctbal_cents
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region_name NULLS FIRST, nation_name NULLS FIRST""".stripMargin,

    "q_setops_customers" ->
      """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | INTERSECT
        | SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
        |ORDER BY c_custkey""".stripMargin,

    "q_asof_join" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |signups AS (
        |  SELECT user_id, ts, max(value) AS signup_value
        |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms,
        |  epoch_ms(s.ts) AS signup_ts_ms,
        |  CAST(CAST(s.signup_value AS DECIMAL(18,2)) * 100 AS BIGINT) AS signup_value_cents
        |FROM purchases p ASOF LEFT JOIN signups s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY event_id""".stripMargin,

    "q_asof_forward" ->
      // DuckDB native ASOF with the <= comparator IS the forward join
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |clicks AS (
        |  SELECT user_id, ts, max(value) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms,
        |  epoch_ms(c.ts) AS click_ts_ms,
        |  CAST(CAST(c.click_value AS DECIMAL(18,2)) * 100 AS BIGINT) AS click_value_cents
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts <= c.ts
        |ORDER BY event_id""".stripMargin,

    "q_asof_nearest" ->
      // nearest = argmin over the user's clicks by (|Δt|, backward
      // preferred) — equivalent to closer-of(backward-latest,
      // forward-earliest) with ties to backward
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |clicks AS (
        |  SELECT user_id, ts, max(value) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |ranked AS (
        |  SELECT p.event_id, p.user_id, p.ts, c.ts AS cts, c.click_value,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)),
        |               (c.ts <= p.ts) DESC) AS rn
        |  FROM purchases p LEFT JOIN clicks c ON c.user_id = p.user_id)
        |SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
        |  epoch_ms(cts) AS click_ts_ms,
        |  CAST(CAST(click_value AS DECIMAL(18,2)) * 100 AS BIGINT) AS click_value_cents
        |FROM ranked WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q_train_test_split" ->
      """SELECT CASE WHEN ((o_orderkey % 1000003) * 2654435761) % 1000000007 % 100 < 80
        |            THEN 'train' ELSE 'test' END AS split,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_price_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_props_map" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |  count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "x_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS tms, value FROM events),
        |marked AS (
        |  SELECT user_id, tms, value,
        |    CASE WHEN tms - lag(tms) OVER (PARTITION BY user_id ORDER BY tms) >= 1800000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |sess AS (
        |  SELECT user_id, tms, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY tms
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT min(tms) AS session_start_ms, max(tms) + 1800000 AS session_end_ms,
        |  user_id, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value_cents
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start_ms""".stripMargin,

    "x_session_funnel" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms,
        |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |         WHEN 'purchase' THEN 3 ELSE 0 END AS code
        |  FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN tms - lag(tms) OVER
        |      (PARTITION BY user_id ORDER BY tms, event_id) >= 1800000
        |    THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |sess AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id
        |      ORDER BY tms, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked),
        |agg AS (
        |  SELECT user_id, sid, min(tms) AS session_start_ms,
        |         count(*) AS n_events,
        |         list(code ORDER BY tms, event_id) AS codes
        |  FROM sess GROUP BY 1, 2)
        |SELECT session_start_ms, user_id, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(list_reduce(list_prepend(0, codes),
        |    (a, b) -> CASE WHEN b = 1 AND a = 0 THEN 1
        |                   WHEN b = 2 AND a = 1 THEN 2
        |                   WHEN b = 3 AND a = 2 THEN 3 ELSE a END) AS BIGINT)
        |    AS funnel_depth
        |FROM agg ORDER BY user_id, session_start_ms""".stripMargin,

    "x_stream_anomaly" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS tms,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS value_cents
        |  FROM events),
        |w AS (SELECT user_id, tms, value_cents,
        |    count(*) OVER win AS n_prev,
        |    coalesce(sum(value_cents) OVER win, 0) AS sum_prev
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY tms, value_cents
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT user_id, tms, value_cents,
        |  CAST(n_prev AS BIGINT) AS n_prev,
        |  CAST(sum_prev AS BIGINT) AS sum_prev_cents
        |FROM w WHERE n_prev > 0 AND value_cents * n_prev > 3 * sum_prev
        |ORDER BY user_id, tms, value_cents, n_prev""".stripMargin,

    "q_stream_hourly" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
