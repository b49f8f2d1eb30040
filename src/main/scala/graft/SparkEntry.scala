package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.QueryCatalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7 minimum slice: hosted-table round trip through the
    * connector (create + append + pushed-down scan) feeding a
    * Catalyst-planned aggregation.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    QueryCatalog.all("ref_scan_pushdown")(spark, dir)
  }

  /** One entry per implemented operator from SURVEY.md §2 (ref_*) plus the
    * mandated extensions (q_* relational/streaming, x_* pipeline ops).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = QueryCatalog.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops that SQL cannot express
    * faithfully (approximate ANN, the stubbed media decode) — those get
    * the driver's rows-only check and are pinned by ScalaTest instead.
    */
  def oracleSql: Map[String, String] = QueryCatalog.oracles
}
