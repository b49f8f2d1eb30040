package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{HostedTables, Tables}
import graft.core.WriteMode
import graft.sinks.HostedStore

/** The reference's implicit contract (SURVEY §5.5): df → sink → scan → df
  * preserves rows, schema, and UTC timestamps. `orders` models the
  * reference-shaped input: unique key, timestamp column, strings, doubles.
  */
class RoundTripSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark

  test("orders round-trips through the hosted sink with timestamps intact") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    HostedStore.dropByTitle("rt_orders")
    val id = HostedTables.createTable(orders, "rt_orders", Some("o_orderkey"))
      .fold(e => fail(e), identity)
    HostedTables.write(orders, id, WriteMode.Append).fold(e => fail(e), identity)
    val back = HostedTables.read(spark, id)

    assert(back.schema == orders.schema) // exact types incl. TimestampType
    val a = orders.orderBy("o_orderkey").collect().toSeq
    val b = back.orderBy("o_orderkey").collect().toSeq
    assert(a == b)
  }

  test("round-trip after each merge mode preserves schema") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    HostedStore.dropByTitle("rt_orders2")
    val id = HostedTables.createTable(orders, "rt_orders2", Some("o_orderkey"))
      .fold(e => fail(e), identity)
    HostedTables.write(orders, id, WriteMode.Append).fold(e => fail(e), identity)
    Seq(WriteMode.Upsert, WriteMode.Update, WriteMode.Insert).foreach { m =>
      HostedTables.write(orders.limit(100), id, m, Some("o_orderkey"))
        .fold(e => fail(e), identity)
      assert(HostedTables.read(spark, id).schema == orders.schema)
      assert(HostedTables.read(spark, id).count() == orders.count())
    }
  }
}
