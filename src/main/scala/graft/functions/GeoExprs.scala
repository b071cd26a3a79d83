package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native WKB codec expressions for the geoparquet read/write paths
  * (reference beacon-arrow-geoparquet; output.rs:175-187). These were
  * Scala UDFs — every row on the geoparquet egress path paid the
  * ScalaUDF SerDe round-trip (Catalyst→Scala converters + closure
  * call). As expressions the inputs stay primitive (`double`,
  * `byte[]`) and the whole encode/decode stays inside
  * WholeStageCodegen via a static call into the codec.
  */
object GeoExprs {

  /** (lon, lat) → 21-byte little-endian WKB point */
  case class PointWkb(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_point_wkb"
    override def nullSafeEval(lon: Any, lat: Any): Any =
      graft.sources.GeoParquet.pointWkb(
        lon.asInstanceOf[Double], lat.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (lon, lat) =>
        s"${ev.value} = graft.sources.GeoParquet.pointWkb($lon, $lat);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** WKB → WKT for Point / LineString / Polygon / MultiPolygon */
  case class WkbToWkt(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_wkb_as_wkt"
    override def nullSafeEval(wkb: Any): Any =
      UTF8String.fromString(
        graft.sources.GeoParquet.wkbToWkt(wkb.asInstanceOf[Array[Byte]]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.sources.GeoParquet.wkbToWkt($c));")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  def st_point_wkb(lon: Column, lat: Column): Column =
    ColumnBridge.column(PointWkb(
      ColumnBridge.expression(lon), ColumnBridge.expression(lat)))

  def st_wkb_as_wkt(wkb: Column): Column =
    ColumnBridge.column(WkbToWkt(ColumnBridge.expression(wkb)))

  // ------------------------------------------------------- ST_* suite
  // Planar geometry over WKT (POINT/POLYGON/MULTIPOLYGON) — the
  // minimum viable slice of the reference's geodatafusion suite
  // (beacon-functions/src/lib.rs:32). Codegen'd: one static call per
  // row, WKT parse LRU-cached per executor ([[Geo.parseWktCached]]),
  // so a repeated literal geometry parses once and the per-row work is
  // pure arithmetic.

  /** st_distance(wktA, wktB) → minimum planar distance (0 on overlap) */
  case class StDistance(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_distance"
    override def nullSafeEval(a: Any, b: Any): Any =
      Geo.stDistance(a.asInstanceOf[UTF8String].toString,
        b.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.Geo.stDistance($a.toString(), $b.toString());")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** st_area(wkt) → shoelace polygon area (holes subtracted; points 0) */
  case class StArea(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_area"
    override def nullSafeEval(a: Any): Any =
      Geo.stArea(a.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Geo.stArea($a.toString());")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** st_intersects(wktA, wktB) → boundary-inclusive intersection */
  case class StIntersects(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_intersects"
    override def nullSafeEval(a: Any, b: Any): Any =
      Geo.stIntersects(a.asInstanceOf[UTF8String].toString,
        b.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.Geo.stIntersects($a.toString(), $b.toString());")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** st_contains(wktA, wktB) → boundary-inclusive containment of b in a */
  case class StContains(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_contains"
    override def nullSafeEval(a: Any, b: Any): Any =
      Geo.stContains(a.asInstanceOf[UTF8String].toString,
        b.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.Geo.stContains($a.toString(), $b.toString());")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** st_x/st_y(wkt) → POINT coordinate; kernel yields NaN for
    * non-points, surfaced as SQL NULL via [[nanAsNull]] */
  case class StX(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_x"
    override def nullSafeEval(a: Any): Any =
      Geo.stX(a.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Geo.stX($a.toString());")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  case class StY(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_y"
    override def nullSafeEval(a: Any): Any =
      Geo.stY(a.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Geo.stY($a.toString());")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** st_npoints(wkt) → vertex count (closing vertices included) */
  case class StNPoints(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "st_npoints"
    override def nullSafeEval(a: Any): Any =
      Geo.stNPoints(a.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Geo.stNPoints($a.toString());")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** st_perimeter(wkt) → total ring length; 0 for points */
  case class StPerimeter(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_perimeter"
    override def nullSafeEval(a: Any): Any =
      Geo.stPerimeter(a.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Geo.stPerimeter($a.toString());")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** st_centroid(wkt) → area-weighted centroid as WKT POINT */
  case class StCentroid(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_centroid"
    override def nullSafeEval(a: Any): Any =
      UTF8String.fromString(Geo.stCentroid(a.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.Geo.stCentroid($a.toString()));")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** NaN sentinel → SQL NULL (st_x/st_y of a non-point) */
  private[functions] def nanAsNull(e: Expression): Expression =
    NaNvl(e, Literal(null, DoubleType))

  def st_distance(a: Column, b: Column): Column =
    ColumnBridge.column(StDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def st_area(a: Column): Column =
    ColumnBridge.column(StArea(ColumnBridge.expression(a)))
  def st_intersects(a: Column, b: Column): Column =
    ColumnBridge.column(StIntersects(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def st_contains(a: Column, b: Column): Column =
    ColumnBridge.column(StContains(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def st_x(a: Column): Column =
    ColumnBridge.column(nanAsNull(StX(ColumnBridge.expression(a))))
  def st_y(a: Column): Column =
    ColumnBridge.column(nanAsNull(StY(ColumnBridge.expression(a))))
  def st_npoints(a: Column): Column =
    ColumnBridge.column(StNPoints(ColumnBridge.expression(a)))
  def st_perimeter(a: Column): Column =
    ColumnBridge.column(StPerimeter(ColumnBridge.expression(a)))
  def st_centroid(a: Column): Column =
    ColumnBridge.column(StCentroid(ColumnBridge.expression(a)))
}
