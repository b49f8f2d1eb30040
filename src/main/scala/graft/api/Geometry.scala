package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, struct}
import org.apache.spark.sql.types._

/** Point-geometry read convention for feature-LAYER items — the one
  * reference-visible capability beyond plain relational tables: the
  * reference's reader returns a *spatially enabled* dataframe
  * (`FeatureSet.sdf` from `table.query(...)`,
  * `/root/reference/src/agol_pandas.py:246-249`), whose point layers carry
  * a SHAPE column of x/y coordinates alongside the attributes.
  *
  * v1 scope matches the reference's own posture: POINT geometry only, as
  * a plain `geometry: struct<x: double, y: double>` column — no UDT, no
  * spatial operators. The reference's write path explicitly never touches
  * geometry (`update_geometry=False`, `ap:450-451`), so geometry flows
  * read-only through the connector: a layer item whose schema carries the
  * convention column serves it like any other column (DSv2 row conversion
  * handles nested structs natively — zero connector changes), and writers
  * that round-trip a layer frame carry the struct through untouched.
  *
  * A struct column (not two loose doubles) keeps the spatial payload
  * self-describing and prunable as a unit, and generalizes to richer
  * geometry structs later without renaming user-facing columns.
  */
object Geometry {

  /** The convention column name on layer frames. */
  val GeometryCol = "geometry"

  /** The point-geometry column type: `struct<x: double, y: double>`. */
  val pointType: StructType = StructType(Seq(
    StructField("x", DoubleType, nullable = true),
    StructField("y", DoubleType, nullable = true)))

  /** Build the convention column from coordinate expressions. */
  def point(x: Column, y: Column): Column =
    struct(x.cast(DoubleType).as("x"), y.cast(DoubleType).as("y"))

  /** Append a `geometry` point column built from two coordinate columns. */
  def withPointGeometry(df: DataFrame, xCol: String, yCol: String): DataFrame =
    df.withColumn(GeometryCol, point(col(xCol), col(yCol)))

  /** Whether a schema carries the point-geometry convention column. */
  def hasPointGeometry(schema: StructType): Boolean =
    schema.fields.exists(f => f.name == GeometryCol && (f.dataType match {
      case s: StructType =>
        s.fieldNames.sameElements(Array("x", "y")) &&
          s.fields.forall(_.dataType == DoubleType)
      case _ => false
    }))

  /** Coordinate accessors for layer frames (null-safe: a null geometry
    * yields null coordinates).
    */
  def x(df: DataFrame): Column = df(GeometryCol).getField("x")
  def y(df: DataFrame): Column = df(GeometryCol).getField("y")

  /** Bounding-box predicate over the geometry column — the relational
    * analog of the remote envelope query (`geometryEnvelope` +
    * `spatialRel=esriSpatialRelContains` on `table.query`, the layer-read
    * idiom at `ap:246-249`). The connector pushes the nested-path
    * comparisons into the service scan, so only in-box features page back
    * — rows with null geometry are excluded, matching envelope semantics.
    */
  def inEnvelope(df: DataFrame, xmin: Double, ymin: Double,
                 xmax: Double, ymax: Double): Column =
    x(df) >= xmin && x(df) <= xmax && y(df) >= ymin && y(df) <= ymax
}
