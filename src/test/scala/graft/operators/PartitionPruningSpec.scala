package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Tables

/** Partition-layout discipline: at 100 TB the events table would be laid
  * out partitioned by date; queries with date predicates must prune
  * partitions at planning time (read only the matching directories), not
  * filter after scanning everything.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark

  test("date-partitioned layout prunes partitions for date predicates") {
    val out = "target/spec_events_partitioned"
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("event_date", to_date(col("ts")))
    events.write.mode("overwrite").partitionBy("event_date").parquet(out)

    val q = spark.read.parquet(out)
      .filter(col("event_date") === "2024-01-03")
      .select("event_id", "value")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(event_date"), p)
    assert(q.count() ==
      events.filter(col("event_date") === "2024-01-03").count())
    val allDates = events.select("event_date").distinct().count()
    assert(allDates > 1, "fixture should span multiple dates")
  }
}
