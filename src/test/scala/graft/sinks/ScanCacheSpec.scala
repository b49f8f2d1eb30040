package graft.sinks

import org.apache.spark.sql.Row
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, In}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.WriteMode

/** Lifecycle of the service double's scan cache ([[HostedStore]]): keyed
  * by (itemId, rows version, normalized filter fingerprint), invalidated
  * eagerly when a mutation rotates the rows vector, array-valued filter
  * payloads normalized so fresh plan instances still hit, and empty
  * tables never occupy a slot. Each behavior here is one of the r13
  * review findings made regression-proof.
  */
class ScanCacheSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType)))

  private def freshTable(title: String, n: Int): String = {
    HostedStore.dropByTitle(title)
    val id = HostedStore.create(title, schema)
    if (n > 0)
      HostedStore.appendBatch(id,
        (0 until n).map(i => Row(i.toLong, s"v$i")), WriteMode.Append, None)
    id
  }

  private def entriesFor(id: String) =
    HostedStore.filterCacheEntries.filter(_._1 == id)

  test("rows rotation invalidates the item's cache entries eagerly") {
    val id = freshTable("cache_rot", 20)
    assert(HostedStore.queryCount(id, Array(GreaterThan("k", 4L))) == 15)
    val before = entriesFor(id)
    assert(before.nonEmpty, "filtered count must populate the cache")
    // an ordinary append BETWEEN scans (version rotation, not drop) must
    // remove the superseded version's entries — not leave them parked in
    // LRU slots pinning the old rows vector
    HostedStore.appendBatch(id, Seq(Row(100L, "new")), WriteMode.Append, None)
    assert(entriesFor(id).isEmpty,
      s"rotation left stale entries: ${entriesFor(id)}")
    // and the re-scan sees the new rows through a fresh entry
    assert(HostedStore.queryCount(id, Array(GreaterThan("k", 4L))) == 16)
    assert(entriesFor(id).map(_._2).distinct.size == 1)
  }

  test("index-only mutation keeps the version and the cached pass") {
    val id = freshTable("cache_idx", 10)
    HostedStore.queryCount(id, Array(GreaterThan("k", 0L)))
    val before = entriesFor(id)
    assert(before.nonEmpty)
    HostedStore.addUniqueIndex(id, "k") // no rows change
    assert(entriesFor(id) == before,
      "an index-only update must not invalidate the scan cache")
  }

  test("array-valued filter payloads hit across fresh plan instances") {
    val id = freshTable("cache_arr", 20)
    // two structurally-equal In filters from DIFFERENT Array instances —
    // reference-compared Arrays would miss and re-filter every page
    def filters() = Array[org.apache.spark.sql.sources.Filter](
      In("k", Array[Any](1L, 2L, 3L)), EqualTo("s", "v2"))
    assert(HostedStore.queryCount(id, filters()) == 1)
    val n1 = entriesFor(id).size
    assert(HostedStore.queryCount(id, filters()) == 1)
    assert(entriesFor(id).size == n1,
      "equal-fingerprint scans must share one slot (the r13 perf fix " +
        "silently not applying)")
  }

  test("empty tables take no cache slot and never alias each other") {
    val a = freshTable("cache_empty_a", 0)
    val b = freshTable("cache_empty_b", 0)
    assert(HostedStore.queryCount(a, Array(GreaterThan("k", 0L))) == 0)
    assert(HostedStore.queryCount(b, Array(EqualTo("s", "x"))) == 0)
    assert(entriesFor(a).isEmpty && entriesFor(b).isEmpty)
  }

  test("drop clears the item's entries wholesale") {
    val id = freshTable("cache_drop", 5)
    HostedStore.queryCount(id, Array(GreaterThan("k", 1L)))
    assert(entriesFor(id).nonEmpty)
    HostedStore.drop(id)
    assert(HostedStore.filterCacheEntries.isEmpty,
      "drop clears the whole 8-slot cache (documented wholesale policy)")
  }
}
