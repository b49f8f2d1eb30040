package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial operators over the connector's point-geometry convention
  * (`geometry: struct<x: double, y: double>` — [[graft.api.Geometry]]).
  * The reference returns spatially-enabled frames but ships no spatial
  * QUERY operators (`/root/reference/src/agol_pandas.py:246-249` reads,
  * the write path skips geometry); this is the natural extension a layer
  * consumer asks for first: "which features are near each other".
  *
  * All arithmetic is plain IEEE double subtract/multiply/add in a fixed
  * order — bit-identical in any engine — so the DuckDB oracle replays
  * pair sets exactly. No trig, no geodesics: planar coordinates in v1,
  * matching the convention column's scope.
  */
object Spatial {

  /** All pairs of points within planar distance `eps` (a < b by id),
    * with the squared distance.
    *
    * Scale shape — grid-bucketed candidate join, never the cross
    * product: each point hashes to its `eps`-sized home grid cell; side
    * A joins on its HOME cell only while side B explodes to its 3×3
    * neighborhood, so every qualifying pair (distance ≤ eps ⇒ cells
    * differ by ≤ 1 in each axis) meets on exactly ONE key — A's home
    * cell — and no `distinct` is needed. The join shuffles each point
    * once (+ the 9-fold neighbor fan-out of compact (cell, id, x, y)
    * rows), candidates are only same-neighborhood points, and the exact
    * `dx² + dy² ≤ eps²` filter runs inside the join projection. Grid
    * occupancy is data-dependent: a pathological cell (all points in one
    * place) degrades to that cell's pair product — cap upstream with a
    * per-cell count gate if the data can collapse, same recipe as
    * [[Dedup]]'s bucket caps.
    */
  def neighborPairs(points: DataFrame, idCol: String, eps: Double): DataFrame = {
    require(eps > 0, s"neighborPairs: eps must be positive, got $eps")
    val base = points.select(col(idCol).as("id"),
        graft.api.Geometry.x(points).as("x"),
        graft.api.Geometry.y(points).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val cx = floor(col("x") / lit(eps)).cast("long")
    val cy = floor(col("y") / lit(eps)).cast("long")
    val a = base.select(col("id").as("a"), col("x").as("ax"), col("y").as("ay"),
      cx.as("cellx"), cy.as("celly"))
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val b = base.select(col("id").as("b"), col("x").as("bx"), col("y").as("by"),
        cx.as("bcx"), cy.as("bcy"), explode(offsets).as("o"))
      .select(col("b"), col("bx"), col("by"),
        (col("bcx") + col("o.dx")).as("cellx"),
        (col("bcy") + col("o.dy")).as("celly"))
    val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    a.join(b, Seq("cellx", "celly"))
      .filter(col("a") < col("b"))
      .withColumn("dist2", d2)
      .filter(col("dist2") <= lit(eps * eps))
      .select("a", "b", "dist2")
  }

  /** DBSCAN clustering over the point layer: core points (≥ `minPts`
    * neighbors within `eps`, INCLUDING the point itself — the standard
    * definition), clusters = connected components of the core-core
    * eps-graph labeled by min core id, border points (non-core within
    * eps of a core) attached to the MINIMUM label among their core
    * neighbors — canonical DBSCAN leaves border assignment
    * scan-order-dependent; min is the deterministic pin, the same
    * convention as every min-id component labeling in this engine —
    * and everything else labeled NULL with role `noise`.
    *
    * Scale shape: ONE grid-bucketed neighbor join ([[neighborPairs]],
    * checkpointed and reused for the degree screen, the core-core edge
    * set, and the border attach), a hash-agg degree count, and
    * pointer-jumping components over CORE-CORE edges only — the
    * density screen prunes the graph BEFORE the iterative stage, so
    * component work scales with the clustered subset, not the corpus.
    * Output: (idCol, label: nullable long, role: core|border|noise).
    */
  def dbscanClusters(points: DataFrame, idCol: String, eps: Double,
                     minPts: Int): DataFrame = {
    require(minPts >= 1, s"dbscanClusters: minPts must be >= 1, got $minPts")
    val pairs = neighborPairs(points, idCol, eps).select("a", "b")
      .localCheckpoint(true)
    val touch = pairs.select(col("a").as("id"))
      .unionAll(pairs.select(col("b").as("id")))
    // degree over ALL spatially-present points (left join, zero-filled):
    // a zero-neighbor point IS core at minPts = 1 but never appears in
    // the pair set — deriving cores from pair touches alone drops it
    val present = points.select(col(idCol).as("id"),
        graft.api.Geometry.x(points).as("__x"),
        graft.api.Geometry.y(points).as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .select("id")
    // checkpointed like `pairs`: the core set feeds FOUR consumers (two
    // semi-joins, the label join, the border anti-join) — without the
    // barrier each re-runs the corpus scan + degree aggregation
    val core = present
      .join(touch.groupBy("id").agg(count(lit(1)).as("__n")), Seq("id"), "left")
      .filter(coalesce(col("__n"), lit(0L)) + lit(1) >= lit(minPts))
      .select("id")
      .localCheckpoint(true)
    val coreEdges = pairs
      .join(core.select(col("id").as("a")), Seq("a"), "left_semi")
      .join(core.select(col("id").as("b")), Seq("b"), "left_semi")
    val cc = Dedup.duplicateClusters(coreEdges)
      .select(col("doc_id").as("id"), col("cluster_id"))
    // a core with no core neighbor anchors its own (possibly 1-core)
    // cluster — it is absent from the edge set, so it labels itself
    val coreLabels = core.join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("label"))
    val adj = pairs.select(col("a").as("cid"), col("b").as("id"))
      .unionAll(pairs.select(col("b").as("cid"), col("a").as("id")))
    val borderLabels = adj
      .join(coreLabels.select(col("id").as("cid"), col("label")), Seq("cid"))
      .join(core, Seq("id"), "left_anti")
      .groupBy("id").agg(min("label").as("label"))
    points.select(col(idCol).as("id"))
      .join(coreLabels.withColumn("role", lit("core"))
        .unionByName(borderLabels.withColumn("role", lit("border"))),
        Seq("id"), "left")
      .select(col("id").as(idCol), col("label"),
        coalesce(col("role"), lit("noise")).as("role"))
  }

  /** Count of neighbors within `eps` per point (density profile — the
    * DBSCAN-style core-point screen). Points with no neighbor report 0.
    */
  def neighborCounts(points: DataFrame, idCol: String, eps: Double): DataFrame = {
    val pairs = neighborPairs(points, idCol, eps)
    val perId = pairs.select(col("a").as("id"))
      .union(pairs.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("n_neighbors"))
    points.select(col(idCol).as("id"))
      .join(perId, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"))
  }
}
