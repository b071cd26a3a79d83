package graft.functions

import scala.collection.mutable

/** Minimal planar geometry for the engine's geo predicates.
  *
  * The reference exposes `st_within_point(wkt, lon, lat)` (point-in-geometry,
  * beacon-functions/src/geo/st_within_point.rs) and `st_geojson_as_wkt`
  * (geo/st_geojson_as_wkt.rs), plus a GeoJSON polygon filter in the JSON DSL
  * (beacon-core/src/query/filter/geo_json.rs). No JVM geometry library is
  * available in this build, so the needed subset — WKT/GeoJSON parsing for
  * POINT/POLYGON/MULTIPOLYGON and even-odd point-in-polygon — is implemented
  * directly. Boundary points count as inside (matching the common
  * `contains`-with-boundary behavior used for observation bounding).
  */
object Geo {

  /** A polygon ring is a closed sequence of (x, y). */
  final case class Ring(xs: Array[Double], ys: Array[Double]) {
    def size: Int = xs.length
  }
  /** outer ring + holes */
  final case class Polygon(outer: Ring, holes: Seq[Ring])

  sealed trait Geom
  final case class PointGeom(x: Double, y: Double) extends Geom
  final case class PolygonGeom(polygon: Polygon) extends Geom
  final case class MultiPolygonGeom(polygons: Seq[Polygon]) extends Geom

  /** Even-odd ray casting; returns true on boundary as well. */
  def ringContains(r: Ring, x: Double, y: Double): Boolean = {
    var inside = false
    val n = r.size
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = r.xs(i); val yi = r.ys(i)
      val xj = r.xs(j); val yj = r.ys(j)
      // boundary check: point on segment (i,j)
      val cross = (xj - xi) * (y - yi) - (yj - yi) * (x - xi)
      if (cross == 0.0 &&
          x >= math.min(xi, xj) && x <= math.max(xi, xj) &&
          y >= math.min(yi, yj) && y <= math.max(yi, yj)) return true
      if ((yi > y) != (yj > y)) {
        val xint = xi + (y - yi) / (yj - yi) * (xj - xi)
        if (x < xint) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  def polygonContains(p: Polygon, x: Double, y: Double): Boolean =
    ringContains(p.outer, x, y) && !p.holes.exists { h =>
      // strictly inside a hole = excluded; hole boundary still counts as inside
      ringContains(h, x, y) && !onRingBoundary(h, x, y)
    }

  private def onRingBoundary(r: Ring, x: Double, y: Double): Boolean = {
    val n = r.size
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = r.xs(i); val yi = r.ys(i)
      val xj = r.xs(j); val yj = r.ys(j)
      val cross = (xj - xi) * (y - yi) - (yj - yi) * (x - xi)
      if (cross == 0.0 &&
          x >= math.min(xi, xj) && x <= math.max(xi, xj) &&
          y >= math.min(yi, yj) && y <= math.max(yi, yj)) return true
      j = i
      i += 1
    }
    false
  }

  def contains(g: Geom, x: Double, y: Double): Boolean = g match {
    case PointGeom(px, py)       => px == x && py == y
    case PolygonGeom(p)          => polygonContains(p, x, y)
    case MultiPolygonGeom(ps)    => ps.exists(polygonContains(_, x, y))
  }

  // ---------------------------------------------------------------- WKT

  /** Parse POINT / POLYGON / MULTIPOLYGON WKT. Throws IllegalArgumentException
    * on anything else (matching a strict reference-style error). */
  def parseWkt(wkt: String): Geom = {
    val s = wkt.trim
    val upper = s.toUpperCase
    if (upper.startsWith("POINT")) {
      val nums = parseNumbers(s.substring(5))
      require(nums.length == 2, s"POINT needs 2 coordinates: $wkt")
      PointGeom(nums(0), nums(1))
    } else if (upper.startsWith("MULTIPOLYGON")) {
      MultiPolygonGeom(parsePolygonList(s.substring("MULTIPOLYGON".length)))
    } else if (upper.startsWith("POLYGON")) {
      PolygonGeom(parsePolygonBody(s.substring("POLYGON".length)))
    } else throw new IllegalArgumentException(s"unsupported WKT geometry: $wkt")
  }

  /** "((x y, x y, ...), (hole...))" → Polygon */
  private def parsePolygonBody(body: String): Polygon = {
    val rings = splitTopLevelGroups(stripOuterParens(body)).map(parseRing)
    require(rings.nonEmpty, "POLYGON with no rings")
    Polygon(rings.head, rings.tail)
  }

  private def parsePolygonList(body: String): Seq[Polygon] =
    splitTopLevelGroups(stripOuterParens(body)).map(g => parsePolygonBody(g))

  private def parseRing(group: String): Ring = {
    val pts = stripOuterParens(group).split(",").map { pair =>
      val nums = parseNumbers(pair)
      require(nums.length == 2, s"ring coordinate needs 2 numbers: $pair")
      (nums(0), nums(1))
    }
    Ring(pts.map(_._1), pts.map(_._2))
  }

  private def parseNumbers(s: String): Array[Double] =
    s.replaceAll("[(),]", " ").trim.split("\\s+").filter(_.nonEmpty).map(_.toDouble)

  private def stripOuterParens(s0: String): String = {
    val s = s0.trim
    require(s.startsWith("(") && s.endsWith(")"), s"expected parenthesized group: $s0")
    s.substring(1, s.length - 1)
  }

  /** Split "(...),(...)" at depth-0 commas. */
  private def splitTopLevelGroups(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i).trim
          start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start).trim
    out.filter(_.nonEmpty).toSeq
  }

  // ------------------------------------------------------------- GeoJSON

  /** GeoJSON geometry document → WKT (Point / Polygon / MultiPolygon). */
  def geoJsonToWkt(json: String): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val ast = JsonMethods.parse(json)
    def coordsOf(v: JValue): JValue = v \ "coordinates"
    def num(v: JValue): Double = v match {
      case JDouble(d)  => d
      case JInt(i)     => i.toDouble
      case JLong(l)    => l.toDouble
      case JDecimal(d) => d.toDouble
      case other => throw new IllegalArgumentException(s"bad coordinate: $other")
    }
    def pt(v: JValue): String = v match {
      case JArray(xs) if xs.length >= 2 => s"${fmt(num(xs(0)))} ${fmt(num(xs(1)))}"
      case other => throw new IllegalArgumentException(s"bad point: $other")
    }
    def ring(v: JValue): String = v match {
      case JArray(pts) => pts.map(pt).mkString("(", ", ", ")")
      case other => throw new IllegalArgumentException(s"bad ring: $other")
    }
    def poly(v: JValue): String = v match {
      case JArray(rings) => rings.map(ring).mkString("(", ", ", ")")
      case other => throw new IllegalArgumentException(s"bad polygon: $other")
    }
    (ast \ "type") match {
      case JString("Point")        => s"POINT (${pt(coordsOf(ast))})"
      case JString("Polygon")      => s"POLYGON ${poly(coordsOf(ast))}"
      case JString("MultiPolygon") => coordsOf(ast) match {
        case JArray(ps) => s"MULTIPOLYGON ${ps.map(poly).mkString("(", ", ", ")")}"
        case other => throw new IllegalArgumentException(s"bad multipolygon: $other")
      }
      case JString("Feature")      => geoJsonToWkt(JsonMethods.compact(JsonMethods.render(ast \ "geometry")))
      case other => throw new IllegalArgumentException(s"unsupported GeoJSON type: $other")
    }
  }

  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  // ----------------------------------------------------- parse cache
  // The reference keeps a 128Ki-entry LRU of parsed WKT per invocation
  // (beacon-functions/src/lib.rs:36-39). Executor-side equivalent: a
  // bounded per-JVM cache; WKT literals in a predicate repeat per row,
  // so hit rate is ~100% and parse cost is paid once per executor.
  private val cacheMax = 4096
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Geom]()

  def parseWktCached(wkt: String): Geom = {
    val hit = cache.get(wkt)
    if (hit != null) hit
    else {
      val g = parseWkt(wkt)
      if (cache.size < cacheMax) cache.put(wkt, g)
      g
    }
  }
}
