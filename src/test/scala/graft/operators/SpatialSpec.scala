package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Geometry

class SpatialSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  /** Deterministic pseudo-random points spread across many grid cells,
    * including pairs that straddle cell borders (the case a naive
    * same-cell-only join misses).
    */
  private def fixture(n: Int, eps: Double) = {
    val pts = (0 until n).map { i =>
      val x = ((i * 2654435761L) % 1000L).toDouble / 7.0
      val y = ((i * 40503L) % 1000L).toDouble / 7.0
      (i.toLong, x, y)
    }
    val df = Geometry.withPointGeometry(
      pts.toDF("id", "x", "y"), "x", "y").select("id", "geometry")
    (pts, df)
  }

  test("neighborPairs equals the brute-force pair set (border pairs included)") {
    val eps = 9.0
    val (pts, df) = fixture(300, eps)
    val got = Spatial.neighborPairs(df, "id", eps)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, d) => (a, b) -> d }.toMap
    val want = (for {
      (a, ax, ay) <- pts; (b, bx, by) <- pts if a < b
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
      if d2 <= eps * eps
    } yield (a, b) -> d2).toMap
    assert(got.keySet == want.keySet,
      s"missing=${(want.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- want.keySet).take(5)}")
    want.foreach { case (k, d2) => assert(got(k) == d2, s"dist2 drift at $k") }
    // sanity: the fixture actually exercises cross-cell pairs
    val crossCell = want.keys.count { case (a, b) =>
      val pa = pts(a.toInt); val pb = pts(b.toInt)
      math.floor(pa._2 / eps) != math.floor(pb._2 / eps) ||
        math.floor(pa._3 / eps) != math.floor(pb._3 / eps)
    }
    assert(crossCell > 0, "fixture has no border-straddling pairs")
  }

  test("neighborCounts reports zero for isolated points") {
    val df = Geometry.withPointGeometry(
      Seq((1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 500.0, 500.0))
        .toDF("id", "x", "y"), "x", "y")
    val counts = Spatial.neighborCounts(df, "id", eps = 2.0)
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("dbscanClusters: planted blobs cluster, bridges stay border, " +
       "isolates stay noise") {
    // blob A: 4 points within eps of each other around (0,0); blob B: 4
    // around (100,100); a border point within eps of ONE core of A but
    // with too few neighbors to be core itself; an isolated noise point.
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 0.0, 1.0), (4L, 1.0, 1.0),
      (10L, 100.0, 100.0), (11L, 101.0, 100.0), (12L, 100.0, 101.0),
      (13L, 101.0, 101.0),
      (20L, 2.9, 0.0),      // within eps=2 of point 2 only -> border of A
      (30L, 500.0, 500.0))  // noise
    val df = Geometry.withPointGeometry(
      pts.toDF("id", "x", "y"), "x", "y").select("id", "geometry")
    val got = Spatial.dbscanClusters(df, "id", eps = 2.0, minPts = 4)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getString(2))).toMap
    // blob cores: each of 1-4 has 3 neighbors + self = 4 >= minPts
    Seq(1L, 2L, 3L, 4L).foreach(id =>
      assert(got(id) == (Some(1L), "core"), s"$id -> ${got(id)}"))
    Seq(10L, 11L, 12L, 13L).foreach(id =>
      assert(got(id) == (Some(10L), "core"), s"$id -> ${got(id)}"))
    assert(got(20L) == (Some(1L), "border"), s"border -> ${got(20L)}")
    assert(got(30L) == (None, "noise"), s"noise -> ${got(30L)}")
    // a core pair clusters on the min id; a core with NO core neighbor
    // (minPts=1 makes an isolated point core, absent from the edge set)
    // anchors its own cluster instead of dropping out
    val tiny = Geometry.withPointGeometry(
      Seq((5L, 0.0, 0.0), (6L, 1.0, 0.0), (7L, 900.0, 900.0))
        .toDF("id", "x", "y"),
      "x", "y").select("id", "geometry")
    val solo = Spatial.dbscanClusters(tiny, "id", eps = 2.0, minPts = 1)
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(solo == Map(5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("null geometry components are excluded, not crashed on") {
    val df = Seq((1L, Some(0.0), Some(0.0)), (2L, None, Some(1.0)),
        (3L, Some(0.5), Some(0.5)))
      .toDF("id", "x", "y")
      .select(col("id"), struct(col("x"), col("y")).as("geometry"))
    val pairs = Spatial.neighborPairs(df, "id", eps = 2.0)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 3L)))
  }
}
