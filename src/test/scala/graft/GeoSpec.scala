package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Geo

class GeoSpec extends AnyFunSuite {
  import Geo._

  val square = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
  val withHole = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
  val triangle = "POLYGON ((0 0, 10 0, 5 10, 0 0))"

  test("point in square") {
    val g = parseWkt(square)
    assert(contains(g, 5, 5))
    assert(!contains(g, 15, 5))
    assert(!contains(g, -1, -1))
  }

  test("boundary counts as inside") {
    val g = parseWkt(square)
    assert(contains(g, 0, 5))
    assert(contains(g, 10, 10))
    assert(contains(g, 5, 0))
  }

  test("hole excludes interior but its boundary is inside") {
    val g = parseWkt(withHole)
    assert(contains(g, 2, 2))
    assert(!contains(g, 5, 5))    // inside the hole
    assert(contains(g, 4, 5))     // on hole boundary
  }

  test("non-convex triangle") {
    val g = parseWkt(triangle)
    assert(contains(g, 5, 5))
    assert(!contains(g, 1, 9))
    assert(!contains(g, 9, 9))
  }

  test("multipolygon") {
    val g = parseWkt("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((10 10, 12 10, 12 12, 10 12, 10 10)))")
    assert(contains(g, 1, 1))
    assert(contains(g, 11, 11))
    assert(!contains(g, 5, 5))
  }

  test("point geometry") {
    val g = parseWkt("POINT (3 4)")
    assert(contains(g, 3, 4))
    assert(!contains(g, 3, 5))
  }

  test("unsupported WKT errors") {
    intercept[IllegalArgumentException](parseWkt("LINESTRING (0 0, 1 1)"))
  }

  test("geojson polygon → wkt") {
    val gj = """{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]]]}"""
    assert(geoJsonToWkt(gj) == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
  }

  test("geojson point and multipolygon → wkt") {
    assert(geoJsonToWkt("""{"type":"Point","coordinates":[4.5,-3.25]}""") == "POINT (4.5 -3.25)")
    val mp = """{"type":"MultiPolygon","coordinates":[[[[0,0],[1,0],[1,1],[0,0]]]]}"""
    assert(geoJsonToWkt(mp) == "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))")
  }

  test("geojson feature unwraps to its geometry") {
    val f = """{"type":"Feature","properties":{},"geometry":{"type":"Point","coordinates":[1,2]}}"""
    assert(geoJsonToWkt(f) == "POINT (1 2)")
  }

  test("wkt round-trips through geojson compile to the same containment") {
    val gj = """{"type":"Polygon","coordinates":[[[-10,-10],[10,-10],[0,15],[-10,-10]]]}"""
    val g = parseWkt(geoJsonToWkt(gj))
    assert(contains(g, 0, 0))
    assert(!contains(g, 9, 9))
  }
}
