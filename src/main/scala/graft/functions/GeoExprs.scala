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

  /** Analysis-time numeric guard: identity pass-through that REJECTS
    * non-numeric children at analysis instead of letting a later
    * `cast(double)` silently null them out under non-ANSI semantics
    * (the loud-error stance the rest of the engine takes). Wrapped
    * around st_dwithin's distance and st_buffer's radius/segments
    * arguments before their numeric cast. */
  case class NumericArg(child: Expression, what: String)
      extends UnaryExpression {
    override def dataType: DataType = child.dataType
    override def prettyName: String = "numeric_arg"
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType.isInstanceOf[NumericType] ||
          child.dataType == NullType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$what requires a numeric argument, got " +
            s"${child.dataType.simpleString} — cast explicitly if intended")
    override protected def nullSafeEval(input: Any): Any = input
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => c)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  private def numericCast(c: Column, what: String, to: DataType): Column =
    ColumnBridge.column(NumericArg(ColumnBridge.expression(c), what)).cast(to)

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

  /** WKT → WKB for the codec's five types (the encode half) */
  case class WktToWkb(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_wkt_as_wkb"
    override def nullSafeEval(wkt: Any): Any =
      graft.sources.GeoParquet.wktToWkb(wkt.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.sources.GeoParquet.wktToWkb($c.toString());")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  def st_point_wkb(lon: Column, lat: Column): Column =
    ColumnBridge.column(PointWkb(
      ColumnBridge.expression(lon), ColumnBridge.expression(lat)))

  def st_wkt_as_wkb(wkt: Column): Column =
    ColumnBridge.column(WktToWkb(ColumnBridge.expression(wkt)))

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

  /** st_dwithin(wktA, wktB, dist) → within planar distance (the
    * cheap form of buffered intersection: distance ≤ r without
    * materializing the buffer) */
  case class StDwithin(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_dwithin"
    override def nullSafeEval(a: Any, b: Any, d: Any): Any =
      Geo.stDwithin(a.asInstanceOf[UTF8String].toString,
        b.asInstanceOf[UTF8String].toString, d.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b, d) =>
        s"${ev.value} = graft.functions.Geo.stDwithin($a.toString(), $b.toString(), $d);")
    override protected def withNewChildrenInternal(a: Expression, b: Expression,
        c: Expression): Expression = copy(a, b, c)
  }

  /** st_envelope(wkt) → bounding box as WKT (POINT when degenerate) */
  case class StEnvelope(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_envelope"
    override def nullSafeEval(a: Any): Any =
      UTF8String.fromString(Geo.stEnvelope(a.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.Geo.stEnvelope($a.toString()));")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** st_buffer(pointWkt, radius, segs) → inscribed segs-gon of the
    * radius circle as WKT POLYGON */
  case class StBuffer(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_buffer"
    override def nullSafeEval(a: Any, r: Any, s: Any): Any =
      UTF8String.fromString(Geo.stBuffer(a.asInstanceOf[UTF8String].toString,
        r.asInstanceOf[Double], s.asInstanceOf[Int]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, r, s) =>
        s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.Geo.stBuffer($a.toString(), $r, $s));")
    override protected def withNewChildrenInternal(a: Expression, b: Expression,
        c: Expression): Expression = copy(a, b, c)
  }

  /** st_intersection_area(subject, convexClip) → overlap area via
    * Sutherland–Hodgman clipping + shoelace */
  case class StIntersectionArea(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_intersection_area"
    override def nullSafeEval(a: Any, b: Any): Any =
      Geo.stIntersectionArea(a.asInstanceOf[UTF8String].toString,
        b.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.Geo.stIntersectionArea($a.toString(), $b.toString());")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** st_convex_hull(wkt) → monotone-chain hull as WKT POLYGON (POINT
    * when the input is a single point) */
  case class StConvexHull(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_convex_hull"
    override def nullSafeEval(a: Any): Any =
      UTF8String.fromString(Geo.stConvexHull(a.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.Geo.stConvexHull($a.toString()));")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** st_transform(wkt, from_srid, to_srid) → WKT reprojected between
    * EPSG:4326 and EPSG:3857 (closed-form spherical Mercator,
    * StrictMath — bit-deterministic across executors); unknown pairs
    * and out-of-range coordinates raise loudly ([[Geo.stTransform]]) */
  case class StTransform(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_transform"
    // Foldable SRIDs that resolve through the RUNTIME registry
    // (Geo.registerCrs rows) are pinned at plan time: the (srid, proj)
    // pairs serialize with the expression, so a dynamically registered
    // CRS reaches every executor inside the plan instead of relying on
    // a driver-local map (the 100 TB posture for register_crs).
    private val pinnedCrs: Array[(Int, Geo.Proj)] =
      Seq(second, third).flatMap { e =>
        if (e.foldable) e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
          match {
            case i: java.lang.Integer =>
              Geo.crsOf(i.intValue()).map(p => (i.intValue(), p))
            case _ => None
          }
        else None
      }.toArray
    override def nullSafeEval(w: Any, f: Any, t: Any): Any =
      UTF8String.fromString(Geo.stTransformPinned(
        w.asInstanceOf[UTF8String].toString,
        f.asInstanceOf[Int], t.asInstanceOf[Int], pinnedCrs))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val pin = ctx.addReferenceObj("stTransformPins", pinnedCrs,
        "scala.Tuple2[]")
      nullSafeCodeGen(ctx, ev, (w, f, t) =>
        s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.Geo.stTransformPinned($w.toString(), $f, $t, $pin));")
    }
    override protected def withNewChildrenInternal(a: Expression,
        b: Expression, c: Expression): Expression = copy(a, b, c)
  }

  /** st_simplify(wkt, tol) → Douglas–Peucker two-anchor ring
    * simplification as WKT */
  case class StSimplify(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_simplify"
    override def nullSafeEval(a: Any, t: Any): Any =
      UTF8String.fromString(Geo.stSimplify(a.asInstanceOf[UTF8String].toString,
        t.asInstanceOf[Double]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, t) =>
        s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.Geo.stSimplify($a.toString(), $t));")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** st_union / st_intersection (r12): general polygon booleans via
    * Greiner–Hormann — concave × concave, multi-component results as
    * MULTIPOLYGON, canonical vertex order. `which` = true for union. */
  case class StBoolean(left: Expression, right: Expression, union: Boolean)
      extends BinaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = if (union) "st_union" else "st_intersection"
    override def nullSafeEval(a: Any, b: Any): Any = UTF8String.fromString(
      if (union) Geo.stUnion(a.asInstanceOf[UTF8String].toString,
        b.asInstanceOf[UTF8String].toString)
      else Geo.stIntersection(a.asInstanceOf[UTF8String].toString,
        b.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = if (union) "stUnion" else "stIntersection"
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.Geo.$fn($a.toString(), $b.toString()));")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** st_difference (r15): A \ B via the Greiner–Hormann trace with
    * subject entry flags inverted ([[Geo.differenceWkt]]) — hole
    * punches, severed MULTIPOLYGONs, C-shapes */
  case class StDifference(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_difference"
    override def nullSafeEval(a: Any, b: Any): Any = UTF8String.fromString(
      Geo.stDifference(a.asInstanceOf[UTF8String].toString,
        b.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.Geo.stDifference($a.toString(), $b.toString()));")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** st_length(wkt) → total path length of a lineal geometry; 0 for
    * points and polygons (the PostGIS lineal/areal measure split —
    * polygon outlines are st_perimeter) */
  case class StLength(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_length"
    override def nullSafeEval(a: Any): Any =
      Geo.stLength(a.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Geo.stLength($a.toString());")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** st_touches / st_crosses / st_overlaps (r14): DE-9IM relate
    * predicates over the POINT/LINESTRING/POLYGON model. `which`:
    * 0 = touches (boundary-only contact), 1 = crosses (interiors meet
    * in lower dimension), 2 = overlaps (same-dimension partial
    * interior sharing). */
  case class StRelate(left: Expression, right: Expression, which: Int)
      extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String =
      Seq("st_touches", "st_crosses", "st_overlaps")(which)
    override def nullSafeEval(a: Any, b: Any): Any = {
      val (sa, sb) = (a.asInstanceOf[UTF8String].toString,
        b.asInstanceOf[UTF8String].toString)
      which match {
        case 0 => Geo.stTouches(sa, sb)
        case 1 => Geo.stCrosses(sa, sb)
        case _ => Geo.stOverlaps(sa, sb)
      }
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = Seq("stTouches", "stCrosses", "stOverlaps")(which)
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.Geo.$fn($a.toString(), $b.toString());")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** st_point(x, y) → WKT POINT constructor (integer-valued doubles
    * render without the trailing .0 — the model's fmt contract) */
  case class StPoint(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_point"
    override def nullSafeEval(x: Any, y: Any): Any =
      UTF8String.fromString(Geo.stPoint(
        x.asInstanceOf[Double], y.asInstanceOf[Double]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) =>
        s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.Geo.stPoint($x, $y));")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** st_within / st_disjoint / st_equals (r14): the remaining relate
    * aliases — within = contains flipped, disjoint = ¬intersects,
    * equals = mutual containment. `which`: 0/1/2 in that order. */
  case class StRelate2(left: Expression, right: Expression, which: Int)
      extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String =
      Seq("st_within", "st_disjoint", "st_equals")(which)
    override def nullSafeEval(a: Any, b: Any): Any = {
      val (sa, sb) = (a.asInstanceOf[UTF8String].toString,
        b.asInstanceOf[UTF8String].toString)
      which match {
        case 0 => Geo.stWithin(sa, sb)
        case 1 => Geo.stDisjoint(sa, sb)
        case _ => Geo.stEquals(sa, sb)
      }
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = Seq("stWithin", "stDisjoint", "stEquals")(which)
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.Geo.$fn($a.toString(), $b.toString());")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** st_geometry_type(wkt) → the WKT tag (POINT / LINESTRING / …) */
  case class StGeometryType(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_geometry_type"
    override def nullSafeEval(a: Any): Any = UTF8String.fromString(
      Geo.stGeometryType(a.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.Geo.stGeometryType($a.toString()));")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** st_dimension(wkt) → 0 points, 1 lines, 2 polygons */
  case class StDimension(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "st_dimension"
    override def nullSafeEval(a: Any): Any =
      Geo.stDimension(a.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Geo.stDimension($a.toString());")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** st_line_interpolate_point(line, fraction) → WKT POINT at the
    * fraction of the line's length (trajectory resampling) */
  case class StLineInterpolate(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_line_interpolate_point"
    override def nullSafeEval(a: Any, f: Any): Any =
      UTF8String.fromString(Geo.stLineInterpolatePointWkt(
        a.asInstanceOf[UTF8String].toString, f.asInstanceOf[Double]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, f) =>
        s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.Geo.stLineInterpolatePointWkt($a.toString(), $f));")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** envelope bound accessors (st_xmin/st_xmax/st_ymin/st_ymax) */
  case class StBound(child: Expression, which: Int) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String =
      Seq("st_xmin", "st_xmax", "st_ymin", "st_ymax")(which)
    override def nullSafeEval(a: Any): Any = {
      val s = a.asInstanceOf[UTF8String].toString
      which match {
        case 0 => Geo.stXmin(s); case 1 => Geo.stXmax(s)
        case 2 => Geo.stYmin(s); case _ => Geo.stYmax(s)
      }
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = Seq("stXmin", "stXmax", "stYmin", "stYmax")(which)
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Geo.$fn($a.toString());")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
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
  def st_dwithin(a: Column, b: Column, d: Column): Column =
    ColumnBridge.column(StDwithin(ColumnBridge.expression(a),
      ColumnBridge.expression(b), ColumnBridge.expression(
        numericCast(d, "st_dwithin distance", DoubleType))))
  def st_envelope(a: Column): Column =
    ColumnBridge.column(StEnvelope(ColumnBridge.expression(a)))
  def st_buffer(a: Column, r: Column, segs: Column): Column =
    ColumnBridge.column(StBuffer(ColumnBridge.expression(a),
      ColumnBridge.expression(numericCast(r, "st_buffer radius", DoubleType)),
      ColumnBridge.expression(
        numericCast(segs, "st_buffer segments", IntegerType))))
  def st_intersection_area(a: Column, b: Column): Column =
    ColumnBridge.column(StIntersectionArea(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def st_union(a: Column, b: Column): Column =
    ColumnBridge.column(StBoolean(
      ColumnBridge.expression(a), ColumnBridge.expression(b), union = true))
  def st_intersection(a: Column, b: Column): Column =
    ColumnBridge.column(StBoolean(
      ColumnBridge.expression(a), ColumnBridge.expression(b), union = false))
  def st_difference(a: Column, b: Column): Column =
    ColumnBridge.column(StDifference(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def st_convex_hull(a: Column): Column =
    ColumnBridge.column(StConvexHull(ColumnBridge.expression(a)))
  def st_transform(a: Column, from: Column, to: Column): Column =
    ColumnBridge.column(StTransform(ColumnBridge.expression(a),
      ColumnBridge.expression(
        numericCast(from, "st_transform from_srid", IntegerType)),
      ColumnBridge.expression(
        numericCast(to, "st_transform to_srid", IntegerType))))
  def st_simplify(a: Column, tol: Column): Column =
    ColumnBridge.column(StSimplify(ColumnBridge.expression(a),
      ColumnBridge.expression(
        numericCast(tol, "st_simplify tolerance", DoubleType))))
  def st_length(a: Column): Column =
    ColumnBridge.column(StLength(ColumnBridge.expression(a)))
  /** st_make_line(ord, x, y) — AGGREGATE trajectory constructor: the
    * group's (x, y) points in `ord` order as one LINESTRING WKT (the
    * Argo-domain shape: points-per-float → trajectory → st_length =
    * distance traveled). Pure composition of built-ins — one
    * collect_list per group, sorted in-row; a trajectory is one
    * float/vehicle/user's bounded history, so the per-group array is
    * memory-safe by the same argument as sessionization. Coordinates
    * render via CAST(_ AS STRING): pass integers (or pre-rounded
    * strings) for byte-stable WKT. */
  def st_make_line(ord: Column, x: Column, y: Column): Column = {
    import org.apache.spark.sql.functions._
    // a null coordinate would silently VANISH from the path (concat
    // nulls the point, array_join skips nulls) — raise instead, the
    // loud-edges stance: a trajectory with holes is a data bug
    def loud(c: Column, what: String): Column =
      when(c.isNull, raise_error(lit(
        s"st_make_line: null $what coordinate — filter or impute the " +
          "point before building the trajectory"))).otherwise(c)
    val pts = array_sort(collect_list(struct(
      when(ord.isNull, raise_error(lit(
        "st_make_line: null ordering value — a point with no position " +
          "in time cannot be placed on the trajectory"))).otherwise(ord).as("o"),
      loud(x, "x").cast("string").as("x"),
      loud(y, "y").cast("string").as("y"))))
    concat(lit("LINESTRING ("),
      array_join(transform(pts,
        p => concat(p.getField("x"), lit(" "), p.getField("y"))), ", "),
      lit(")"))
  }
  def st_touches(a: Column, b: Column): Column =
    ColumnBridge.column(StRelate(ColumnBridge.expression(a),
      ColumnBridge.expression(b), 0))
  def st_crosses(a: Column, b: Column): Column =
    ColumnBridge.column(StRelate(ColumnBridge.expression(a),
      ColumnBridge.expression(b), 1))
  def st_overlaps(a: Column, b: Column): Column =
    ColumnBridge.column(StRelate(ColumnBridge.expression(a),
      ColumnBridge.expression(b), 2))
  def st_point(x: Column, y: Column): Column =
    ColumnBridge.column(StPoint(
      ColumnBridge.expression(x.cast("double")),
      ColumnBridge.expression(y.cast("double"))))
  def st_within(a: Column, b: Column): Column =
    ColumnBridge.column(StRelate2(ColumnBridge.expression(a),
      ColumnBridge.expression(b), 0))
  def st_disjoint(a: Column, b: Column): Column =
    ColumnBridge.column(StRelate2(ColumnBridge.expression(a),
      ColumnBridge.expression(b), 1))
  def st_equals(a: Column, b: Column): Column =
    ColumnBridge.column(StRelate2(ColumnBridge.expression(a),
      ColumnBridge.expression(b), 2))
  def st_geometry_type(a: Column): Column =
    ColumnBridge.column(StGeometryType(ColumnBridge.expression(a)))
  def st_dimension(a: Column): Column =
    ColumnBridge.column(StDimension(ColumnBridge.expression(a)))
  def st_line_interpolate_point(a: Column, f: Column): Column =
    ColumnBridge.column(StLineInterpolate(ColumnBridge.expression(a),
      ColumnBridge.expression(f.cast("double"))))
  def st_xmin(a: Column): Column =
    ColumnBridge.column(StBound(ColumnBridge.expression(a), 0))
  def st_xmax(a: Column): Column =
    ColumnBridge.column(StBound(ColumnBridge.expression(a), 1))
  def st_ymin(a: Column): Column =
    ColumnBridge.column(StBound(ColumnBridge.expression(a), 2))
  def st_ymax(a: Column): Column =
    ColumnBridge.column(StBound(ColumnBridge.expression(a), 3))

  /** ST_Extent-style AGGREGATE: the bounding box of every input
    * geometry as WKT, composed from the codegen'd bound kernels +
    * native min/max — map-side partials, one 4-double row per group
    * crosses the shuffle (the only distributed shape a box union
    * needs; a true polygon union is the GPU/postprocess stage's job).
    * Formatting matches [[Geo.envelopeWkt]]: integral bounds print
    * as integers, a point-degenerate box prints as POINT. */
  def st_extent(wkt: Column): Column = {
    import org.apache.spark.sql.functions._
    val x0 = min(st_xmin(wkt)); val x1 = max(st_xmax(wkt))
    val y0 = min(st_ymin(wkt)); val y1 = max(st_ymax(wkt))
    def f(c: Column) =
      when(c === c.cast("long").cast("double"), c.cast("long").cast("string"))
        .otherwise(c.cast("string"))
    when(x0 === x1 && y0 === y1,
        concat(lit("POINT ("), f(x0), lit(" "), f(y0), lit(")")))
      .otherwise(concat(lit("POLYGON (("),
        f(x0), lit(" "), f(y0), lit(", "), f(x1), lit(" "), f(y0), lit(", "),
        f(x1), lit(" "), f(y1), lit(", "), f(x0), lit(" "), f(y1), lit(", "),
        f(x0), lit(" "), f(y0), lit("))")))
  }
}
