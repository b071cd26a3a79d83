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
}
