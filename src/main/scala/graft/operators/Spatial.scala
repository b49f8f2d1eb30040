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
