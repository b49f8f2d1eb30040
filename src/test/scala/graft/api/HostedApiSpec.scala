package graft.api

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{IndexPoll, WriteMode}
import graft.sinks.{HostedSinks, HostedStore}

/** Reference-fidelity behaviors of the high-level API surface:
  * item-properties passthrough (`src/agol_pandas.py:316,477,548`), the
  * name-OR-table_id save addressing (`:581-584`, documented semantics),
  * and async unique-index creation with the client poll budget
  * (`:286-307`).
  */
class HostedApiSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark

  private def orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")

  test("item properties flow through createTable and merge on save/write") {
    HostedStore.dropByTitle("props_t1")
    val id = HostedTables.createTable(orders, "props_t1", Some("o_orderkey"),
        properties = Map("tags" -> "etl,orders", "snippet" -> "v1"))
      .fold(e => fail(e), identity)
    val p1 = HostedSinks.active.propertiesOf(id)
    // title is stamped into the properties like the reference's
    // item_properties["title"] = name
    assert(p1("title") == "props_t1")
    assert(p1("tags") == "etl,orders" && p1("snippet") == "v1")

    HostedTables.write(orders, id, WriteMode.Append,
      properties = Map("snippet" -> "v2")).fold(e => fail(e), identity)
    assert(HostedSinks.active.propertiesOf(id)("snippet") == "v2")
    assert(HostedSinks.active.propertiesOf(id)("tags") == "etl,orders")

    HostedTables.save(orders, "props_t1", Some("o_orderkey"),
      properties = Map("credits" -> "graft")).fold(e => fail(e), identity)
    val p3 = HostedSinks.active.propertiesOf(id)
    assert(p3("credits") == "graft" && p3("title") == "props_t1")
  }

  test("save addresses an existing table by table id, skipping title resolution") {
    HostedStore.dropByTitle("props_t2")
    val id = HostedTables.createTable(orders, "props_t2", Some("o_orderkey"))
      .fold(e => fail(e), identity)
    // by-id save upserts into the existing item even though the name we
    // pass does not resolve to any title
    val (gotId, _) = HostedTables.save(orders.limit(10), "no_such_title",
        Some("o_orderkey"), tableId = Some(id))
      .fold(e => fail(e), identity)
    assert(gotId == id)
    // createTable made an empty table; the by-id save upserted 10 rows
    assert(HostedStore.rowCount(id) == 10)
    // unknown id fails loudly instead of silently creating a new table
    assert(HostedTables.save(orders, "x", tableId = Some("item_999999")).isLeft)
  }

  test("unique index: reference naming and async visibility under the poll budget") {
    HostedStore.dropByTitle("props_t3")
    val id = HostedStore.create("props_t3", orders.schema)
    HostedStore.indexCreationPollDelay = 3
    try {
      val name = HostedStore.addUniqueIndex(id, "o_orderkey")
      assert(name == s"UX_PROPS_T3_${id.toUpperCase}_o_orderkey_ASC")
      // not yet visible: merge-mode batches must be rejected
      assertThrows[IllegalArgumentException] {
        HostedStore.appendBatch(id, Seq.empty, WriteMode.Upsert, Some("o_orderkey"))
      }
      // the client poll (reference: 5 s x 12) sees it after 3 probes
      assert(IndexPoll.ensureUniqueIndex(HostedSinks.active, id, "o_orderkey",
        attempts = 12, intervalMs = 0))
      assert(HostedStore.fieldHasUniqueIndex(id, "o_orderkey"))
    } finally HostedStore.indexCreationPollDelay = 0
  }

  test("unique index: exhausted poll budget fails createTable like the reference") {
    HostedStore.dropByTitle("props_t4")
    HostedStore.indexCreationPollDelay = 50 // > 12-attempt budget
    try {
      // createTable's poll runs with intervalMs=5000 in production; keep
      // the spec fast by driving IndexPoll directly with the same budget.
      val id = HostedStore.create("props_t4", orders.schema)
      assert(!IndexPoll.ensureUniqueIndex(HostedSinks.active, id, "o_orderkey",
        attempts = 12, intervalMs = 0))
      assert(!HostedStore.fieldHasUniqueIndex(id, "o_orderkey"))
    } finally HostedStore.indexCreationPollDelay = 0
  }

  test("createTable with a key provisions a visible unique index end-to-end") {
    HostedStore.dropByTitle("props_t5")
    val id = HostedTables.createTable(orders, "props_t5", Some("o_orderkey"))
      .fold(e => fail(e), identity)
    assert(HostedStore.fieldHasUniqueIndex(id, "o_orderkey"))
    val idx = HostedStore.indexesOf(id)
    assert(idx.size == 1 && idx.head.isUnique && idx.head.field == "o_orderkey")
  }

  test("layer items read through the connector; a published table shadows the layer") {
    import org.apache.spark.sql.functions._
    HostedStore.dropByTitle("layer_t1")
    // POINT feature-layer item: attributes + the geometry struct<x,y>
    // read convention (ap:246-249 returns a spatially enabled frame)
    val layerDf = graft.api.Geometry.withPointGeometry(
      orders.select("o_orderkey", "o_totalprice").limit(100),
      "o_totalprice", "o_orderkey")
    assert(graft.api.Geometry.hasPointGeometry(layerDf.schema))
    val id = HostedStore.createLayer("layer_t1", layerDf.schema)
    assert(HostedStore.kindOf(id) == "layer")
    HostedTables.write(layerDf, id, WriteMode.Append).fold(e => fail(e), identity)
    // the read path the reference half-supports: item.layers[0] — the
    // geometry column round-trips through the connector as a struct
    val layerBack = HostedTables.read(spark, id)
    assert(layerBack.count() == 100)
    assert(graft.api.Geometry.hasPointGeometry(layerBack.schema))
    val probe = layerBack
      .select(col("o_orderkey"), col("o_totalprice"),
        graft.api.Geometry.x(layerBack).as("gx"),
        graft.api.Geometry.y(layerBack).as("gy"))
      .collect()
    assert(probe.nonEmpty && probe.forall(r =>
      r.getDouble(2) == r.getDouble(1) && r.getDouble(3) == r.getLong(0).toDouble))

    // publish a table onto the item: tables[0] now shadows layers[0]
    // (src/agol_pandas.py:239-243) — reads serve the table
    val tableDf = orders.select("o_orderkey", "o_orderstatus").limit(7)
    HostedStore.publishTable(id, tableDf.schema)
    // the published table starts a FRESH dataset: no layer-era indexes and
    // no layer-era replay-protection state (which would silently drop
    // table writes reusing a layer-era batch id)
    assert(HostedStore.indexesOf(id).isEmpty)
    assert(HostedStore.get(id).appliedBatches.isEmpty)
    assert(HostedStore.get(id).committedParts.isEmpty)
    HostedTables.write(tableDf, id, WriteMode.Append).fold(e => fail(e), identity)
    val back = HostedTables.read(spark, id)
    assert(back.columns.toSeq == Seq("o_orderkey", "o_orderstatus"))
    assert(back.count() == 7)
    // the shadowed layer is retained, not destroyed — geometry included
    val shadowed = HostedStore.shadowedLayerOf(id)
    assert(shadowed.exists(_.rows.size == 100))
    assert(shadowed.exists(d => graft.api.Geometry.hasPointGeometry(d.schema)))
    // an item already serving a table cannot be published over again
    intercept[IllegalArgumentException](HostedStore.publishTable(id, tableDf.schema))
  }

  test("SessionLog accumulates cross-call success and failure history") {
    import graft.core.SessionLog
    SessionLog.clear()
    HostedStore.dropByTitle("audit_t1")
    val id = HostedTables.createTable(orders, "audit_t1", Some("o_orderkey"))
      .fold(e => fail(e), identity)
    HostedTables.write(orders, id, WriteMode.Append).fold(e => fail(e), identity)
    // two failures: bad mode contract, then a missing table
    assert(HostedTables.write(orders, id, WriteMode.Upsert).isLeft)
    assert(HostedTables.write(orders, "item_nope", WriteMode.Append).isLeft)
    assert(SessionLog.loggingInfo.size == 2)
    assert(SessionLog.loggingInfo.head.startsWith("createTable"))
    assert(SessionLog.failures == 2)
    assert(SessionLog.failLog.exists(_.contains("requires a key column")))
    assert(SessionLog.failLog.exists(_.contains("no hosted table 'item_nope'")))
    SessionLog.clear()
    assert(SessionLog.failures == 0 && SessionLog.loggingInfo.isEmpty)
  }

  test("stageCsv canonicalizes inferred types to the hosted palette") {
    import org.apache.spark.sql.types._
    val f = java.io.File.createTempFile("stage_spec", ".csv")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath,
      """id,flag,ratio,label,seen,mixed
        |1,true,0.25,alpha,2021-06-01 10:00:00,7
        |2,false,1.5,beta,2021-06-02 11:30:00,x
        |""".stripMargin)
    val staged = HostedTables.stageCsv(spark, f.getAbsolutePath)
      .fold(e => fail(e), identity)
    val types = staged.schema.fields.map(x => x.name -> x.dataType).toMap
    assert(types("id") == LongType)        // int widens to long
    assert(types("flag") == LongType)      // boolean → 0/1 (no bool in palette)
    assert(types("ratio") == DoubleType)
    assert(types("label") == StringType)
    assert(types("seen") == TimestampType)
    assert(types("mixed") == StringType)   // unparseable column stays text
    val r = staged.orderBy("id").collect()
    assert(r(0).getLong(1) == 1L && r(1).getLong(1) == 0L)
    assert(r(0).getDouble(2) == 0.25)

    // staged output feeds the normal create/read round-trip
    HostedStore.dropByTitle("stage_t1")
    val id = HostedTables.save(staged, "stage_t1", Some("id"))
      .fold(e => fail(e), identity)._1
    val back = HostedTables.read(spark, id)
    assert(back.count() == 2)
    assert(back.schema("seen").dataType == TimestampType)
  }
}
