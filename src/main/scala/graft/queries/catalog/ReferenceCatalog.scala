package graft.queries


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.{HostedTables, Tables}
import graft.core.{Chunker, ServiceName, WriteMode}
import graft.operators.{Calibration, Cdc, Curation, Dedup, Embeddings, GraphOps, HtmlText, Multimodal, Profiling, Regression, Scale, Similarity, Sketches, TextAnalysis}
import graft.sinks.HostedStore
import graft.streaming.EventStreams

/** The reference surface (`ref_*`): every `agol_pandas` callable with a
  * data-visible behavior, queries + DuckDB oracles. Part of the
  * QueryCatalog split (r12) — entries verbatim; shared helpers in
  * [[CatalogHelpers]].
  */
private[queries] object ReferenceCatalog {
  import CatalogHelpers._

  val queries: Map[String, Q] = Map(
    "ref_scan_pushdown" -> ((s, dir) => {
      val id = hostedCopy(s, dir, "orders", "q_scan_src", None,
        Seq("o_orderkey", "o_custkey", "o_totalprice"))
      HostedTables.read(s, id)
        .filter(col("o_totalprice") > 150000.0)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    "ref_name_normalize" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), ServiceName.normalizeCol(col("p_name")).as("svc_name"))
        .orderBy("p_partkey")),

    "ref_utc_normalize" -> ((s, dir) =>
      t(s, dir, "orders") // Tables.load applies TimestampNorm.toUtc
        .select(col("o_orderkey"), unix_millis(col("o_orderdate")).as("ts_ms"))
        .orderBy("o_orderkey")),

    "ref_chunk_ids" -> ((s, dir) =>
      Chunker.withChunkIds(
          t(s, dir, "orders").select("o_orderkey"), Seq("o_orderkey"), 500)
        .select("o_orderkey", "chunk_id")
        .orderBy("o_orderkey")),

    "ref_chunk_report" -> ((s, dir) =>
      Chunker.withChunkIds(
          t(s, dir, "orders").select("o_orderkey"), Seq("o_orderkey"), 500)
        .groupBy("chunk_id")
        .agg(count(lit(1)).as("n_rows"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
        .orderBy("chunk_id")),

    "ref_write_append" -> ((s, dir) => writeScenario(s, dir, WriteMode.Append, "q_wr_append")),
    "ref_write_overwrite" -> ((s, dir) => writeScenario(s, dir, WriteMode.Overwrite, "q_wr_overwrite")),
    "ref_write_upsert" -> ((s, dir) => writeScenario(s, dir, WriteMode.Upsert, "q_wr_upsert")),
    "ref_write_update" -> ((s, dir) => writeScenario(s, dir, WriteMode.Update, "q_wr_update")),
    "ref_write_insert" -> ((s, dir) => writeScenario(s, dir, WriteMode.Insert, "q_wr_insert")),

    "ref_create_table" -> ((s, dir) => {
      val id = hostedCopy(s, dir, "part", "q_create_part", Some("p_partkey"),
        Seq("p_partkey", "p_name", "p_brand", "p_retailprice"))
      HostedTables.read(s, id).orderBy("p_partkey")
    }),

    "ref_save_orchestrator" -> ((s, dir) => {
      HostedStore.dropByTitle("q_save_customer")
      val df = t(s, dir, "customer")
      val (id, _) = HostedTables.save(df, "q_save_customer",
        Some("c_custkey"), chunkSize = 500).fold(sys.error, identity)
      // Idempotent re-save (resolve existing + upsert) must be a no-op.
      HostedTables.save(df, "q_save_customer", Some("c_custkey"), chunkSize = 500)
        .fold(sys.error, identity)
      HostedTables.read(s, id).orderBy("c_custkey")
    }),

    "ref_layer_points" -> ((s, dir) => {
      // The spatial read surface (ap:246-249): a point feature LAYER —
      // attributes + the geometry: struct<x,y> convention column — served
      // through the same connector verbs as tables. The layer item is a
      // store fixture (portal layers pre-exist; the reference never
      // creates one), the READ path is the capability under test. The
      // oracle recomputes x/y from the parquet source: both engines do
      // one exact long→double scale, so the doubles replay bit-for-bit.
      val back = customerPointLayer(s, dir, "q_layer_points")
      back.select(col("c_custkey"), col("c_name"),
          graft.api.Geometry.x(back).as("x"), graft.api.Geometry.y(back).as("y"))
        .orderBy("c_custkey")
    }),

    "ref_layer_bbox" -> ((s, dir) => {
      // The envelope query on a point layer (`geometryEnvelope` on
      // `table.query`, ap:246-249): a bounding-box predicate over the
      // geometry convention column pushes down as nested-path filters, so
      // the service pages back only in-box features. Same fixture as
      // ref_layer_points; the oracle replays the box as a plain WHERE
      // over the recomputed doubles (both engines compare exact values).
      val back = customerPointLayer(s, dir, "q_layer_bbox")
      back.filter(graft.api.Geometry.inEnvelope(back, 0.0, 100.0, 4000.0, 10000.0))
        .select(col("c_custkey"),
          graft.api.Geometry.x(back).as("x"), graft.api.Geometry.y(back).as("y"))
        .orderBy("c_custkey")
    }),

    "ref_csv_stage" -> ((s, dir) => {
      // Reference parity for the analyze→publishParameters CSV round-trip
      // (src/agol_pandas.py:441-447, 515): an UNTYPED csv is staged —
      // schema inferred, then canonicalized to the hosted palette
      // (string/bigint/double/timestamp) — loaded through the save
      // orchestrator, and read back through the connector. The oracle
      // re-infers the same file with DuckDB's read_csv, so the check
      // covers type canonicalization, not just the data round-trip.
      val path = writeCsvStageFixture(s, dir)
      val staged = HostedTables.stageCsv(s, path).fold(sys.error, identity)
      HostedStore.dropByTitle("q_csv_stage")
      val (id, _) = HostedTables.save(staged, "q_csv_stage", Some("doc_id"),
        chunkSize = 1000).fold(sys.error, identity)
      HostedTables.read(s, id).orderBy("doc_id")
    }))

  val oracles: Map[String, String] = Map(
    "ref_layer_points" ->
      """SELECT c_custkey, c_name, c_acctbal AS x,
        |       CAST(c_custkey AS DOUBLE) * CAST(0.5 AS DOUBLE) AS y
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "ref_layer_bbox" ->
      """SELECT c_custkey, x, y FROM (
        |  SELECT c_custkey, c_acctbal AS x,
        |         CAST(c_custkey AS DOUBLE) * CAST(0.5 AS DOUBLE) AS y
        |  FROM customer)
        |WHERE x >= 0.0 AND x <= 4000.0 AND y >= 100.0 AND y <= 10000.0
        |ORDER BY c_custkey""".stripMargin,

    "ref_scan_pushdown" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 150000.0 ORDER BY o_orderkey""".stripMargin,

    "ref_name_normalize" ->
      """SELECT p_partkey,
        |  substring(lower(regexp_replace(regexp_replace(
        |    CASE WHEN regexp_matches(substring(trim(p_name), 1, 1), '^[0-9]$')
        |         THEN '_' || trim(p_name) ELSE trim(p_name) END,
        |    '[^\w]', '_', 'g'), '_+', '_', 'g')), 1, 128) AS svc_name
        |FROM part ORDER BY p_partkey""".stripMargin,

    "ref_utc_normalize" ->
      "SELECT o_orderkey, epoch_ms(o_orderdate) AS ts_ms FROM orders ORDER BY o_orderkey",

    "ref_chunk_ids" ->
      """SELECT o_orderkey,
        |  CAST(floor((row_number() OVER (ORDER BY o_orderkey) - 1) / 500) AS BIGINT) AS chunk_id
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "ref_chunk_report" ->
      """WITH c AS (SELECT o_orderkey,
        |  CAST(floor((row_number() OVER (ORDER BY o_orderkey) - 1) / 500) AS BIGINT) AS chunk_id
        |  FROM orders)
        |SELECT chunk_id, count(*) AS n_rows, min(o_orderkey) AS min_key,
        |       max(o_orderkey) AS max_key
        |FROM c GROUP BY chunk_id ORDER BY chunk_id""".stripMargin,

    "ref_write_append" ->
      s"""WITH $writeScenarioSourceSql
         |SELECT * FROM t UNION ALL SELECT * FROM s
         |ORDER BY o_orderkey, o_totalprice""".stripMargin,

    "ref_write_overwrite" ->
      s"""WITH $writeScenarioSourceSql
         |SELECT * FROM s ORDER BY o_orderkey, o_totalprice""".stripMargin,

    "ref_write_upsert" ->
      s"""WITH $writeScenarioSourceSql
         |SELECT * FROM s
         |UNION ALL
         |SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM s)
         |ORDER BY o_orderkey, o_totalprice""".stripMargin,

    "ref_write_update" ->
      s"""WITH $writeScenarioSourceSql
         |SELECT * FROM s WHERE o_orderkey IN (SELECT o_orderkey FROM t)
         |UNION ALL
         |SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM s)
         |ORDER BY o_orderkey, o_totalprice""".stripMargin,

    "ref_write_insert" ->
      s"""WITH $writeScenarioSourceSql
         |SELECT * FROM t
         |UNION ALL
         |SELECT * FROM s WHERE o_orderkey NOT IN (SELECT o_orderkey FROM t)
         |ORDER BY o_orderkey, o_totalprice""".stripMargin,

    "ref_create_table" ->
      """SELECT p_partkey, p_name, p_brand, p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin,

    "ref_save_orchestrator" ->
      "SELECT * FROM customer ORDER BY c_custkey",

    "ref_csv_stage" ->
      s"""SELECT doc_id, lang, source, n_chars, score, created
         |FROM read_csv('$csvStagePath', header=true)
         |ORDER BY doc_id""".stripMargin)
}
