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

  test("per-cell cap drops a planted degenerate cell's points entirely " +
       "and the census reports exactly those cells") {
    // a degenerate blob: 12 coincident points in one cell, plus a normal
    // neighborhood two cells away (so the cap must surgically remove the
    // blob without touching the healthy pairs)
    val blob = (100L until 112L).map(i => (i, 5.0, 5.0))
    val ok = Seq((1L, 30.0, 5.0), (2L, 31.0, 5.0))
    val df = Geometry.withPointGeometry(
      (blob ++ ok).toDF("id", "x", "y"), "x", "y").select("id", "geometry")
    val capped = Spatial.neighborPairs(df, "id", eps = 10.0,
        maxCellSize = Some(10))
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(capped == Set((1L, 2L)),
      s"blob pairs must be dropped wholesale, healthy pair kept: $capped")
    // uncapped: the blob prices as its pair product (12*11/2) + healthy
    val uncapped = Spatial.neighborPairs(df, "id", eps = 10.0,
        maxCellSize = None).count()
    assert(uncapped == 12L * 11L / 2L + 1L)
    // census: exactly the blob's home cell, with its occupancy
    val census = Spatial.neighborPairsDroppedCells(df, "id", eps = 10.0,
        maxCellSize = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(census == Set((0L, 0L, 12L)), s"census: $census")
    // an over-default-threshold census over healthy data is empty —
    // certifying the miner saw every point
    assert(Spatial.neighborPairsDroppedCells(df, "id", eps = 10.0,
      maxCellSize = 12).isEmpty)
  }

  test("epsJoin equals the brute-force cross-table pair set and caps " +
       "each side independently") {
    val eps = 9.0
    val (lp, ldf) = fixture(200, eps)
    val rp = (0 until 150).map { i =>
      val x = ((i * 1099087573L) % 1000L).toDouble / 7.0
      val y = ((i * 48271L) % 1000L).toDouble / 7.0
      (1000L + i, x, y)
    }
    val rdf = Geometry.withPointGeometry(
      rp.toDF("id", "x", "y"), "x", "y").select("id", "geometry")
    val got = Spatial.epsJoin(ldf, "id", rdf, "id", eps)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, d) => (a, b) -> d }.toMap
    val want = (for {
      (a, ax, ay) <- lp; (b, bx, by) <- rp
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
      if d2 <= eps * eps
    } yield (a, b) -> d2).toMap
    assert(got.keySet == want.keySet,
      s"missing=${(want.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- want.keySet).take(5)}")
    assert(want.nonEmpty, "fixture produced no cross-table pairs")
    want.foreach { case (k, d2) => assert(got(k) == d2, s"dist2 drift at $k") }
    // side-tagged census: plant a degenerate RIGHT cell; left stays clean
    val rblob = Geometry.withPointGeometry(
      ((0 until 20).map(i => (2000L + i, 3.0, 3.0)) ++ rp)
        .toDF("id", "x", "y"), "x", "y").select("id", "geometry")
    val census = Spatial.epsJoinDroppedCells(ldf, "id", rblob, "id", eps,
        maxCellSize = 15)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(census.nonEmpty && census.forall(_._1 == "right"), s"$census")
    // the capped join omits every pair whose RIGHT endpoint shares the
    // blob's over-cap home cell (capping drops points, not pairs) but
    // keeps the rest
    val droppedRight = rp.filter(p =>
      math.floor(p._2 / eps) == 0 && math.floor(p._3 / eps) == 0)
      .map(_._1).toSet
    val capped = Spatial.epsJoin(ldf, "id", rblob, "id", eps,
        maxCellSize = Some(15))
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(capped == want.keySet.filterNot(p => droppedRight(p._2)))
  }

  test("nearestWithinEps: left-join semantics, ties pick min right id") {
    val left = Geometry.withPointGeometry(
      Seq((1L, 0.0, 0.0), (2L, 100.0, 0.0), (3L, 500.0, 500.0))
        .toDF("id", "x", "y"), "x", "y").select("id", "geometry")
    // right 10/11 are EQUIDISTANT from left 1 (tie → min right id);
    // right 12 is nearest to left 2; nothing within eps of left 3
    val right = Geometry.withPointGeometry(
      Seq((11L, 3.0, 0.0), (10L, -3.0, 0.0), (12L, 101.0, 0.0),
          (13L, 120.0, 0.0))
        .toDF("id", "x", "y"), "x", "y").select("id", "geometry")
    val got = Spatial.nearestWithinEps(left, "id", right, "id", eps = 25.0)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
         Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(got(1L) == (Some(10L), Some(9.0)), s"tie must pick min id: ${got(1L)}")
    assert(got(2L) == (Some(12L), Some(1.0)), got(2L).toString)
    assert(got(3L) == (None, None), s"no-neighbor left keeps NULLs: ${got(3L)}")
    assert(got.size == 3, "every left id appears exactly once")
  }

  test("zorderLayout: spatially-coherent buckets whose zone maps prune a " +
       "bbox strictly better than row order") {
    // a 40x40 grid of points: spatial locality exists, row order (id)
    // deliberately interleaves far-apart rows (id strides x first)
    val pts = (0 until 1600).map { i =>
      (i.toLong, (i % 40).toDouble * 10.0, (i / 40).toDouble * 10.0)
    }
    val df = Geometry.withPointGeometry(
      pts.toDF("id", "x", "y"), "x", "y").select("id", "geometry")
    val laid = Spatial.zorderLayout(df)
    val rows = laid.select(col("id"), col("zb")).as[(Long, Long)]
      .collect().toMap
    assert(rows.size == 1600, "all rows kept")
    assert(rows.values.forall(z => z >= 0 && z < 64), "zb in [0, 64)")
    // coherence: adjacent points share a bucket; far corners do not
    assert(rows(0L) == rows(1L), "neighbors share a bucket")
    assert(rows(0L) != rows(1599L), "opposite corners must not")
    // THE LAYOUT'S VALUE, MEASURED (the pruneStats gauge): a corner bbox
    // against 16 z-ordered units vs 16 row-ordered units
    def pruned(units: org.apache.spark.sql.DataFrame) =
      Scale.pruneStats(units, Seq("px", "py"),
          Seq(("px", 0L, 60L), ("py", 0L, 60L)), fileLabel = col("unit"))
        .select(col("prune_px") + col("prune_py"))
        .as[Int].collect().count(_ > 0)
    val zUnits = laid.select(
      graft.api.Geometry.x(laid).as("px"), graft.api.Geometry.y(laid).as("py"),
      (col("zb") / 4).cast("long").as("unit"))
    val rowUnits = df.select(
      graft.api.Geometry.x(df).as("px"), graft.api.Geometry.y(df).as("py"),
      (col("id") / 100).cast("long").as("unit"))
    val (zp, rp) = (pruned(zUnits), pruned(rowUnits))
    assert(zp > rp,
      s"z-layout must out-prune row order: z=$zp row=$rp of 16 units")
    assert(zp >= 12, s"corner bbox should skip most z-units, got $zp/16")
    // degenerate inputs: all-identical coordinates and null geometry
    // land in bucket 0, never crash
    val flat = Geometry.withPointGeometry(
      Seq((1L, 5.0, 5.0), (2L, 5.0, 5.0)).toDF("id", "x", "y"), "x", "y")
    assert(Spatial.zorderLayout(flat).select("zb").as[Long]
      .collect().toSet == Set(0L))
    // a NULL coordinate with healthy bounds buckets its axis to the min
    // edge — Spark's least() skips nulls, so without the explicit
    // coalesce the row would ride into the TOP unit and widen the
    // far-corner zone map (the exact stats the layout exists to tighten)
    val withNull = Seq((1L, Some(0.0), Some(0.0)), (2L, Some(390.0), Some(390.0)),
        (3L, None, Some(0.0)), (4L, None, None))
      .toDF("id", "x", "y")
      .select(col("id"), struct(col("x"), col("y")).as("geometry"))
    val nz = Spatial.zorderLayout(withNull)
      .select(col("id"), col("zb")).as[(Long, Long)].collect().toMap
    assert(nz(3L) == nz(1L),
      s"null x + y at min must co-bucket with the min corner: $nz")
    assert(nz(4L) == 0L, s"fully-null geometry lands in bucket 0: $nz")
    assert(nz(3L) != nz(2L) && nz(4L) != nz(2L),
      s"null coordinates must never land in the far-corner unit: $nz")
  }

  test("nearestNeighbor matches brute force, escalates through empty " +
      "rings, pins ties to min id, and nulls only on an empty right side") {
    val cell = 5.0
    // right side: a near cluster, a tie pair, and one far outpost
    val rightPts = Seq(
      (10L, 0.0, 0.0), (11L, 1.0, 0.0), (12L, 0.0, 1.0),
      (20L, 100.0, 0.0), (21L, 104.0, 0.0), // equidistant from x=102
      (30L, 5000.0, 5000.0))
    // left side: one in the cluster, one exactly between the tie pair,
    // one whose rings 0..9 are EMPTY (nearest is the outpost ~6400 away
    // = 10 doubling rounds at cell 5), one with a null coordinate
    val leftPts = Seq(
      (1L, Some(0.4), Some(0.4)), (2L, Some(102.0), Some(0.0)),
      (3L, Some(-500.0), Some(9000.0)), (4L, None, Some(0.0)))
    import org.apache.spark.sql.functions.{col, struct}
    val right = Geometry.withPointGeometry(
      rightPts.toDF("id", "x", "y"), "x", "y").select("id", "geometry")
    val left = leftPts.toDF("id", "x", "y")
      .select(col("id"), struct(col("x"), col("y")).as("geometry"))
    val got = Spatial.nearestNeighbor(left, "id", right, "id", cell)
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // brute-force expectations
    def d2(ax: Double, ay: Double, bx: Double, by: Double) =
      (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
    assert(got(1L) == ((Some(10L), Some(d2(0.4, 0.4, 0.0, 0.0)))))
    // exact tie (dist2 = 4.0 both sides) pins to the smaller right id
    assert(got(2L) == ((Some(20L), Some(4.0))))
    // empty rings 0..9: resolved at the far outpost, never null
    assert(got(3L) == ((Some(30L), Some(d2(-500.0, 9000.0, 5000.0, 5000.0)))))
    // null-coordinate left: present with left-join nulls
    assert(got(4L) == ((None, None)))
    assert(got.size == 4)
    // empty right side: every left id present, all null
    val emptyRight = right.filter(col("id") < 0)
    val gotEmpty = Spatial.nearestNeighbor(left, "id", emptyRight, "id", cell)
      .as[(Long, Option[Long], Option[Double])].collect()
    assert(gotEmpty.length == 4 && gotEmpty.forall(r => r._2.isEmpty && r._3.isEmpty))
    // the PURE LADDER (finishing pass disabled) answers identically —
    // the budgeted brute pass is cost tuning, never semantics
    val ladder = Spatial.nearestNeighbor(left, "id", right, "id", cell,
        bruteBudget = 0L)
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(ladder == got, s"ladder path diverged: $ladder vs $got")
  }

  test("kNearestNeighbors matches the brute-force rank-<=k set, pins ties, " +
      "caps at the corpus size, and the pure ladder answers identically") {
    val cell = 5.0
    // mixed density: a tight cluster (the k=3 ring resolves round 0),
    // a tie FOR THE K-TH SLOT (two right points equidistant from left 2
    // — rank 3 must pin to the smaller id), and a far outpost forcing
    // multi-round escalation
    val rightPts = Seq(
      (10L, 0.0, 0.0), (11L, 1.0, 0.0), (12L, 0.0, 1.0), (13L, 2.0, 2.0),
      (20L, 100.0, 0.0), (21L, 104.0, 0.0), (22L, 102.0, 7.0),
      (30L, 5000.0, 5000.0))
    val leftPts = Seq(
      (1L, 0.4, 0.4), (2L, 102.0, 0.0), (3L, -500.0, 9000.0))
    val right = Geometry.withPointGeometry(
      rightPts.toDF("id", "x", "y"), "x", "y").select("id", "geometry")
    val left = Geometry.withPointGeometry(
      leftPts.toDF("id", "x", "y"), "x", "y").select("id", "geometry")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b", "dist2", "rank")
        .as[(Long, Option[Long], Option[Double], Option[Int])]
        .collect().toSeq.sortBy(r => (r._1, r._4.getOrElse(0)))
    val got = collect(Spatial.kNearestNeighbors(left, "id", right, "id",
      k = 3, cellSize = cell))
    // brute-force reference: full cross product ranked by (dist2, b)
    val brute = leftPts.flatMap { case (a, ax, ay) =>
      rightPts.map { case (b, bx, by) =>
        (a, Some(b), Some((ax - bx) * (ax - bx) + (ay - by) * (ay - by)))
      }.sortBy(r => (r._3.get, r._2.get)).take(3).zipWithIndex
        .map { case ((a0, b0, d0), i) => (a0, b0, d0, Some(i + 1)) }
    }.sortBy(r => (r._1, r._4.getOrElse(0)))
    assert(got == brute, s"\n got=$got\nwant=$brute")
    // the tie for left 2's 3rd slot: 20 and 21 are both at dist2=4 —
    // rank 2 vs 3 must order by id after the closer 22
    val l2 = got.filter(_._1 == 2L).flatMap(_._2)
    assert(l2 == Seq(20L, 21L, 22L).sortBy(b =>
      (brute.find(r => r._1 == 2L && r._2.contains(b)).get._3.get, b)))
    // k past the corpus: every right point ranked, nothing invented
    val gotAll = collect(Spatial.kNearestNeighbors(left, "id", right, "id",
      k = 50, cellSize = cell))
    assert(gotAll.count(_._1 == 1L) == rightPts.length)
    // empty right: left-join nulls
    val gotEmpty = collect(Spatial.kNearestNeighbors(left, "id",
      right.filter(col("id") < 0), "id", k = 3, cellSize = cell))
    assert(gotEmpty.length == 3 &&
      gotEmpty.forall(r => r._2.isEmpty && r._4.isEmpty))
    // pure ladder (finishing pass disabled) is bit-identical
    val ladder = collect(Spatial.kNearestNeighbors(left, "id", right, "id",
      k = 3, cellSize = cell, bruteBudget = 0L))
    assert(ladder == got)
  }

  test("reliable = true (checkpoint-dir pinning) answers identically to " +
      "the localCheckpoint default on all three iterative operators") {
    // the cluster-semantics escape: localCheckpoint blocks die with an
    // executor; reliable = true persists the same barriers to the
    // checkpoint dir — the OPTION must never change a row
    val ckDir = "/tmp/graft_test_spatial_ck"
    graft.core.ParquetStage.rmRec(ckDir)
    spark.sparkContext.setCheckpointDir(ckDir)
    val (_, df) = fixture(400, 10.0)
    val left = df.limit(120)
    def sorted(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(sorted(Spatial.nearestNeighbor(left, "id", df, "id", 10.0,
        reliable = true)) ==
      sorted(Spatial.nearestNeighbor(left, "id", df, "id", 10.0)))
    assert(sorted(Spatial.kNearestNeighbors(left, "id", df, "id", 3, 10.0,
        reliable = true)) ==
      sorted(Spatial.kNearestNeighbors(left, "id", df, "id", 3, 10.0)))
    // small eps keeps dbscan components short-diameter (this gate is
    // about the pinning option, not pointer-jumping depth)
    assert(sorted(Spatial.dbscanClusters(df, "id", 3.0, 2,
        reliable = true)) ==
      sorted(Spatial.dbscanClusters(df, "id", 3.0, 2)))
  }

  test("nearestNeighbor: a capped degenerate right cell is invisible — " +
      "the nearest comes from the surviving cells") {
    import org.apache.spark.sql.functions.col
    // 30 right points stacked in ONE cell at the origin (over cap=25),
    // plus a lone survivor farther away
    val rightPts = (0 until 30).map(i => (i.toLong, 0.1 * (i % 3), 0.0)) :+
      ((99L, 50.0, 0.0))
    val right = Geometry.withPointGeometry(
      rightPts.toDF("id", "x", "y"), "x", "y").select("id", "geometry")
    val left = Geometry.withPointGeometry(
      Seq((1L, 1.0, 0.0)).toDF("id", "x", "y"), "x", "y")
      .select("id", "geometry")
    val got = Spatial.nearestNeighbor(left, "id", right, "id",
        cellSize = 5.0, maxCellSize = Some(25))
      .as[(Long, Option[Long], Option[Double])].head()
    assert(got._2 == Some(99L),
      s"capped cell must contribute no points: $got")
  }

  test("judged fixtures hold 8x home-cell headroom under the default cap " +
      "(the uncapped DuckDB oracles assume no cell is ever dropped)") {
    // The x_spatial_* oracles brute-force WITHOUT modeling maxCellSize —
    // sound only while no fixture cell approaches the default cap. This
    // gate re-derives the judged geometry formulas (CatalogHelpers.
    // customerPointLayer / supplierPointLayer: x = acctbal, y = key·0.5)
    // at the judged eps=50 straight off parquet and asserts EVERY home
    // cell sits at <= cap/8 via the census operator itself, at every SF
    // present on this machine — a fixture change that nears the cap
    // fails HERE with a pointer to neighborPairsDroppedCells, not as an
    // unexplained cross-engine hash mismatch in CORRECTNESS.
    val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(s => s"/root/testdata/$s")
      .filter(d => new java.io.File(d).exists)
    assert(sfDirs.nonEmpty, "no testdata fixture present")
    val cap = Spatial.DefaultMaxCellSize / 8
    for (dir <- sfDirs) {
      def layer(table: String, key: String, bal: String) = {
        val df = spark.read.parquet(s"$dir/$table.parquet")
          .select(col(key).as("id"), col(bal).as("x"),
            (col(key) * lit(0.5)).as("y"))
        Geometry.withPointGeometry(df, "x", "y").select("id", "geometry")
      }
      for ((t, k, b) <- Seq(("customer", "c_custkey", "c_acctbal"),
                            ("supplier", "s_suppkey", "s_acctbal"))) {
        val over = Spatial.neighborPairsDroppedCells(
          layer(t, k, b), "id", eps = 50.0, maxCellSize = cap).count()
        assert(over == 0L,
          s"$t at $dir has $over home cells above cap/8=$cap at eps=50 — " +
            "the uncapped x_spatial_* oracles no longer model the miner; " +
            "run neighborPairsDroppedCells and re-fixture")
      }
    }
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
