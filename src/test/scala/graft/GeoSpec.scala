package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Geo, GraftFunctions}

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
    intercept[IllegalArgumentException](
      parseWkt("GEOMETRYCOLLECTION (POINT (1 1))"))
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

  test("WKB codec: point/polygon/multipolygon decode to parseable WKT") {
    import graft.sources.GeoParquet
    val pt = GeoParquet.pointWkb(3.5, -7.25)
    assert(GeoParquet.wkbToWkt(pt) == "POINT (3.5 -7.25)")
    // hand-built little-endian WKB polygon (unit square)
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + 4 + 4 + 5 * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte); bb.putInt(3); bb.putInt(1); bb.putInt(5)
    Seq((0, 0), (10, 0), (10, 10), (0, 10), (0, 0)).foreach { case (x, y) =>
      bb.putDouble(x); bb.putDouble(y)
    }
    val wkt = GeoParquet.wkbToWkt(bb.array())
    val g = parseWkt(wkt)
    assert(contains(g, 5, 5) && !contains(g, 15, 5))
  }

  test("WKB codec: encode half round-trips all five types; geometry egress writes lines (r14)") {
    import graft.sources.GeoParquet
    // .5-valued coords make decode's Double.toString formatting
    // byte-identical to the input WKT, so the round trip pins bytes
    Seq(
      "POINT (3.5 -7.25)",
      "LINESTRING (0.5 0.5, 4.5 0.5, 4.5 4.5)",
      "MULTILINESTRING ((0.5 0.5, 1.5 1.5), (2.5 0.5, 3.5 0.5, 3.5 2.5))",
      "POLYGON ((0.5 0.5, 4.5 0.5, 4.5 4.5, 0.5 4.5, 0.5 0.5), " +
        "(1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5))",
      "MULTIPOLYGON (((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 0.5)), " +
        "((4.5 0.5, 5.5 0.5, 5.5 1.5, 4.5 0.5)))"
    ).foreach { wkt =>
      assert(GeoParquet.wkbToWkt(GeoParquet.wktToWkb(wkt)) == wkt,
        s"round trip: $wkt")
    }
    // trajectory egress: write a LINESTRING column as geoparquet
    // geometry, read it back through the WKT bridge, measure it
    val spark = GraftSession.build("local[2]", 2)
    import spark.implicits._
    val df = Seq((1L, "LINESTRING (0.5 0.5, 3.5 4.5)")).toDF("id", "traj")
    val dir = java.nio.file.Files.createTempDirectory("graft-geotrj")
      .resolve("trj").toString
    GeoParquet.writeGeometry(df, dir, "traj")
    val back = spark.read.parquet(dir)
      .select($"id", GeoParquet.stWkbAsWkt($"geometry").as("wkt"))
      .head()
    assert(back.getString(1) == "LINESTRING (0.5 0.5, 3.5 4.5)")
    assert(stLength(back.getString(1)) == 5.0)
    // SQL surface: both codec directions resolve by name
    spark.sql("SELECT st_wkb_as_wkt(st_wkt_as_wkb('POINT (1.5 2.5)')) AS w")
      .collect().headOption.foreach(r => assert(r.getString(0) == "POINT (1.5 2.5)"))
  }

  test("Greiner–Hormann randomized: inclusion–exclusion holds over 80 convex pairs (r14)") {
    // property: area(A) + area(B) = area(A∪B) + area(A∩B), with the
    // intersection area cross-checked against the independent
    // Sutherland–Hodgman path — the two clipping implementations must
    // agree on every random pair, intersecting or not
    val rnd = new scala.util.Random(20260815L)
    // GENERAL-POSITION fixtures (unsnapped doubles from cos/sin):
    // Greiner–Hormann's contract loudly rejects vertex-on-edge
    // touches, so integer-snapped vertices would trip the reject, not
    // the math; exact coincidence is measure-zero on doubles
    def convexPoly(cx: Int, cy: Int, r: Int, n: Int): String = {
      val pts = (0 until n).map { i =>
        val a = 2 * math.Pi * (i + 0.15 * rnd.nextDouble()) / n
        (cx + r * math.cos(a), cy + r * math.sin(a))
      }
      val ring = pts :+ pts.head
      "POLYGON ((" + ring.map { case (x, y) => s"$x $y" }
        .mkString(", ") + "))"
    }
    var intersecting = 0
    (1 to 80).foreach { trial =>
      val a = convexPoly(rnd.nextInt(20), rnd.nextInt(20),
        4 + rnd.nextInt(8), 3 + rnd.nextInt(5))
      val b = convexPoly(rnd.nextInt(20), rnd.nextInt(20),
        4 + rnd.nextInt(8), 3 + rnd.nextInt(5))
      val (aa, ab) = (stArea(a), stArea(b))
      val ia = stIntersectionArea(a, b) // Sutherland–Hodgman
      val ghI = stArea(stIntersection(a, b)) // Greiner–Hormann
      val ghU = stArea(stUnion(a, b))
      assert(math.abs(ia - ghI) < 1e-6,
        s"trial $trial: SH $ia != GH $ghI\n  a=$a\n  b=$b")
      assert(math.abs((aa + ab) - (ghU + ghI)) < 1e-6,
        s"trial $trial: inclusion-exclusion broke: " +
          s"$aa + $ab != $ghU + $ghI\n  a=$a\n  b=$b")
      if (ghI > 0) intersecting += 1
    }
    // the fixture must actually exercise both regimes
    assert(intersecting > 10 && intersecting < 80,
      s"degenerate fixture: $intersecting/80 intersecting")
    // EMPTY semantics the property run depends on (and the bug it
    // found: the engine previously could not parse its OWN
    // "POLYGON EMPTY" output): area 0, no intersection/containment,
    // booleans short-circuit, loud centroid/distance
    val sq = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    assert(stArea("POLYGON EMPTY") == 0.0)
    assert(stLength("MULTILINESTRING EMPTY") == 0.0)
    assert(stNPoints("MULTIPOLYGON EMPTY") == 0)
    assert(!stIntersects("POLYGON EMPTY", sq))
    assert(!stContains(sq, "POLYGON EMPTY") &&
      !stContains("POLYGON EMPTY", sq))
    assert(!stEquals("POLYGON EMPTY", sq))
    assert(stIntersection("POLYGON EMPTY", sq) == "POLYGON EMPTY")
    assert(stArea(stUnion("POLYGON EMPTY", sq)) == 4.0)
    assert(stUnion("POLYGON EMPTY", "POLYGON EMPTY") == "POLYGON EMPTY")
    assert(stConvexHull("POLYGON EMPTY") == "POLYGON EMPTY")
    assert(stEnvelope("MULTIPOLYGON EMPTY") == "POLYGON EMPTY")
    intercept[IllegalArgumentException] { stCentroid("POLYGON EMPTY") }
    intercept[IllegalArgumentException] { stDistance("POLYGON EMPTY", sq) }
    intercept[IllegalArgumentException] { parseWkt("POINT EMPTY") }
  }

  test("SQL surface: every r14 geo function resolves by name with its arity (r14)") {
    val spark = GraftSession.build("local[2]", 2)
    val row = spark.sql(
      """SELECT
           st_length('LINESTRING (0 0, 3 4)') AS len,
           st_touches('POINT (4 2)', 'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))') AS t,
           st_crosses('LINESTRING (-1 2, 5 2)', 'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))') AS c,
           st_overlaps('LINESTRING (0 0, 4 0)', 'LINESTRING (2 0, 6 0)') AS o,
           st_within('POINT (1 1)', 'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))') AS w,
           st_disjoint('POINT (9 9)', 'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))') AS d,
           st_equals('LINESTRING (0 0, 2 0)', 'LINESTRING (0 0, 1 0, 2 0)') AS e,
           st_geometry_type('MULTILINESTRING ((0 0, 1 1))') AS gt,
           st_dimension('LINESTRING (0 0, 1 1)') AS dim,
           st_line_interpolate_point('LINESTRING (0 0, 4 0)', 0.5) AS ip,
           st_point(3, 4) AS pt""").head()
    assert(row.getDouble(0) == 5.0)
    assert(row.getBoolean(1) && row.getBoolean(2) && row.getBoolean(3) &&
      row.getBoolean(4) && row.getBoolean(5) && row.getBoolean(6))
    assert(row.getString(7) == "MULTILINESTRING" && row.getInt(8) == 1)
    assert(row.getString(9) == "POINT (2 0)" && row.getString(10) == "POINT (3 4)")
  }

  test("geoparquet write → read: point geometry + WKT bridge to geo functions") {
    val spark = GraftSession.build("local[2]", 2)
    import spark.implicits._
    val df = Seq((1L, 5.0, 5.0), (2L, 50.0, 50.0)).toDF("id", "lon", "lat")
    val dir = java.nio.file.Files.createTempDirectory("graft-geopq").resolve("pts").toString
    graft.sources.GeoParquet.write(df, dir, "lon", "lat")
    val back = graft.sources.GeoParquet.read(spark, Seq(dir))
    assert(back.columns.contains("geometry") && back.columns.contains("geometry_wkt"))
    val inSquare = back.filter(
      graft.functions.GraftFunctions.st_within_point(
        org.apache.spark.sql.functions.lit(square), $"lon", $"lat"))
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(inSquare == Set(1L))
    assert(back.filter($"id" === 1).select($"geometry_wkt").collect()(0)
      .getString(0) == "POINT (5.0 5.0)")
    // WKB encode/decode are native expressions: codegen'd, no per-row
    // ScalaUDF SerDe on either the read or the egress projection
    val readPlan = back.queryExecution.executedPlan.toString
    assert(!readPlan.contains("ScalaUDF") && !readPlan.toLowerCase.contains("batchevalpython"),
      s"geoparquet read path must not evaluate a UDF:\n$readPlan")
    val egress = spark.range(100)
      .select(graft.sources.GeoParquet.stPointWkb(
        $"id".cast("double"), ($"id" * 2).cast("double")).as("geometry"))
    val egressPlan = egress.queryExecution.executedPlan.toString
    assert(!egressPlan.contains("ScalaUDF"), s"WKB encode must codegen:\n$egressPlan")
    // "*(n)" marks a WholeStageCodegen stage in the plan string
    assert(egressPlan.contains("*(1) Project [st_point_wkb"),
      s"encode projection stays in codegen:\n$egressPlan")
    // null propagation matches the UDF contract
    val nulls = Seq((Some(1.0), Some(2.0)), (None, Some(2.0))).toDF("lon", "lat")
      .select(graft.sources.GeoParquet.stPointWkb($"lon", $"lat").as("g"))
      .withColumn("wkt", graft.sources.GeoParquet.stWkbAsWkt($"g")).collect()
    assert(nulls(0).getString(1) == "POINT (1.0 2.0)")
    assert(nulls(1).isNullAt(0) && nulls(1).isNullAt(1))
  }

  test("ST_* suite: area/distance/intersects/contains over the WKT subset") {
    import graft.functions.Geo
    def g(w: String) = Geo.parseWkt(w)
    val sq = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val holed = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    val mp = g("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((10 10, 13 10, 13 14, 10 14, 10 10)))")
    // area: shoelace, holes subtract, multipolygon sums
    assert(Geo.area(sq) == 100.0)
    assert(Geo.area(holed) == 96.0)
    assert(Geo.area(mp) == 4.0 + 12.0)
    assert(Geo.area(g("POINT (3 4)")) == 0.0)
    // distance: point-point, point-polygon (inside = 0, outside = edge
    // distance), polygon-polygon (separated boxes: 3-4-5 corner gap)
    assert(Geo.distance(g("POINT (0 0)"), g("POINT (3 4)")) == 5.0)
    assert(Geo.distance(g("POINT (5 5)"), sq) == 0.0)
    assert(Geo.distance(g("POINT (13 10)"), sq) == 3.0)
    val far = g("POLYGON ((13 14, 20 14, 20 20, 13 20, 13 14))")
    assert(Geo.distance(sq, far) == 5.0, "closest corners (10,10)-(13,14)")
    // intersects: overlap, touching edge, touching corner, disjoint;
    // the cross shape (no vertex containment either way) must hit the
    // edge-crossing branch
    assert(Geo.intersects(sq, g("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")))
    assert(Geo.intersects(sq, g("POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))")), "shared edge")
    assert(Geo.intersects(sq, g("POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))")), "corner touch")
    assert(!Geo.intersects(sq, far))
    val wide = g("POLYGON ((-5 4, 15 4, 15 6, -5 6, -5 4))")
    assert(Geo.intersects(sq, wide), "cross overlap with no contained vertices")
    // contains: boundary-inclusive; hole interior excluded, polygon in
    // polygon, straddling fails via proper crossing
    assert(Geo.containsGeom(sq, g("POINT (0 0)")), "boundary point counts")
    assert(!Geo.containsGeom(holed, g("POINT (3 3)")), "hole interior excluded")
    assert(Geo.containsGeom(sq, g("POLYGON ((1 1, 9 1, 9 9, 1 9, 1 1))")))
    assert(!Geo.containsGeom(sq, wide), "straddling polygon is not contained")
    assert(!Geo.containsGeom(holed, g("POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1))")),
      "polygon overlapping a hole is not contained")
    // SQL registration + codegen (no CodegenFallback in the plan)
    val spark = GraftSession.build("local[2]", 2)
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT st_distance('POINT (0 0)', 'POINT (3 4)') AS d,
                st_area('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))') AS a,
                st_intersects('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))', 'POINT (1 1)') AS i,
                st_contains('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))', 'POINT (5 5)') AS c
      """).collect()(0)
    assert(row.getDouble(0) == 5.0 && row.getDouble(1) == 16.0)
    assert(row.getBoolean(2) && !row.getBoolean(3))
    // spark.range (not a local Seq): ConvertToLocalRelation would fold
    // a LocalRelation projection at plan time and hide the codegen
    val plan = spark.range(2)
      .select(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("POINT ("),
        $"id".cast("string"),
        org.apache.spark.sql.functions.lit(" 1)")).as("a"))
      .select(graft.functions.GeoExprs.st_distance(
        $"a", org.apache.spark.sql.functions.lit("POINT (3 5)")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [st_distance"),
      s"st_distance must stay inside WholeStageCodegen:\n$plan")
  }

  test("ST_* accessors/measures: x/y/npoints/perimeter/centroid (r9)") {
    val spark = GraftSession.build("local[2]", 2)
    graft.functions.GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT st_x('POINT (3 4)') AS px, st_y('POINT (3 4)') AS py,
                st_x('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))') AS nx,
                st_npoints('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))') AS np,
                st_perimeter('POLYGON ((0 0, 3 0, 3 4, 0 4, 0 0))') AS pm,
                st_centroid('POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))') AS ct,
                st_centroid('POINT (7 9)') AS pct
      """).collect()(0)
    assert(row.getDouble(0) == 3.0 && row.getDouble(1) == 4.0)
    assert(row.isNullAt(2), "st_x of a polygon must be NULL")
    assert(row.getInt(3) == 5)
    assert(row.getDouble(4) == 14.0)
    assert(row.getString(5) == "POINT (2 1)")
    assert(row.getString(6) == "POINT (7 9)")
    // a polygon with a hole: centroid shifts away from the hole;
    // perimeter counts both rings; npoints counts both rings
    val holed = spark.sql(
      """SELECT st_centroid('POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (4 2, 5 2, 5 3, 4 3, 4 2))') AS c,
                st_perimeter('POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (4 2, 5 2, 5 3, 4 3, 4 2))') AS pm,
                st_npoints('POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (4 2, 5 2, 5 3, 4 3, 4 2))') AS np
      """).collect()(0)
    // exact: (36*3 - 1*4.5)/35 = 103.5/35, (36*3 - 1*2.5)/35 = 105.5/35
    val cx = 103.5 / 35; val cy = 105.5 / 35
    assert(holed.getString(0) == s"POINT ($cx $cy)", holed.getString(0))
    assert(holed.getDouble(1) == 28.0 && holed.getInt(2) == 10)
  }

  test("ST_* widening: dwithin/envelope/buffer/bounds/extent (r11)") {
    val spark = GraftSession.build("local[2]", 2)
    graft.functions.GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT st_dwithin('POINT (0 0)', 'POINT (3 4)', 5.0) AS inr,
                st_dwithin('POINT (0 0)', 'POINT (3 4)', 4.9) AS outr,
                st_dwithin('POINT (1 1)', 'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))', 0.0) AS inpoly,
                st_envelope('POLYGON ((1 1, 5 1, 3 7, 1 1))') AS env,
                st_envelope('POINT (2 3)') AS envp,
                st_npoints(st_buffer('POINT (0 0)', 2.0, 8)) AS bnp,
                st_xmin('POLYGON ((1 1, 5 1, 3 7, 1 1))') AS x0,
                st_xmax('POLYGON ((1 1, 5 1, 3 7, 1 1))') AS x1,
                st_ymax('MULTIPOLYGON (((0 0, 1 0, 1 9, 0 9, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))') AS y1
      """).collect()(0)
    assert(row.getBoolean(0) && !row.getBoolean(1))
    assert(row.getBoolean(2), "distance 0 inside the polygon")
    assert(row.getString(3) == "POLYGON ((1 1, 5 1, 5 7, 1 7, 1 1))")
    assert(row.getString(4) == "POINT (2 3)", "degenerate envelope is the point")
    assert(row.getInt(5) == 9)
    assert(row.getDouble(6) == 1.0 && row.getDouble(7) == 5.0 && row.getDouble(8) == 9.0)
    // buffer: inscribed octagon of r=2 — area 2·√2·r², vertices on circle
    val a = spark.sql("SELECT st_area(st_buffer('POINT (10 20)', 2.0, 8)) AS a")
      .collect()(0).getDouble(0)
    assert(math.abs(a - 2 * math.sqrt(2) * 4) < 1e-9, s"octagon area: $a")
    // r14: polygon buffers are real now — outward expansion with round
    // joins; the unit square at r=1, segs=8 has closed-form area
    // 1 + 4·1 + A₈ (A₈ = 4·sin(π/4)·r²)
    val pa = spark.sql(
      "SELECT st_area(st_buffer('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))', 1.0, 8)) AS a")
      .collect()(0).getDouble(0)
    assert(math.abs(pa - (1 + 4 + 4 * math.sin(math.Pi / 4))) < 1e-9,
      s"square buffer area: $pa")
    // st_extent aggregate: bounding box per group, partial-aggregable
    import spark.implicits._
    val df = Seq((1, 0, 0), (1, 4, 2), (1, 2, 9), (2, 5, 5)).toDF("g", "x", "y")
      .select($"g", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("POINT ("), $"x".cast("string"),
        org.apache.spark.sql.functions.lit(" "), $"y".cast("string"),
        org.apache.spark.sql.functions.lit(")")).as("pt"))
    val ext = df.groupBy($"g")
      .agg(graft.functions.GeoExprs.st_extent($"pt").as("extent"))
      .orderBy($"g").collect()
    assert(ext(0).getString(1) == "POLYGON ((0 0, 4 0, 4 9, 0 9, 0 0))")
    assert(ext(1).getString(1) == "POINT (5 5)",
      "a one-point group degenerates to the point")
  }

  test("geoparquet bbox covering: sidecar metadata + spatial file pruning (r15)") {
    val spark = GraftSession.build("local[2]", 2)
    import spark.implicits._
    import graft.sources.GeoParquet
    val root = java.nio.file.Files.createTempDirectory("graft-geoprune-spec")
    // 3 shards at x bands [0,9], [100,109], [200,209]
    (0 until 3).foreach { i =>
      val pts = (0 until 10).map(j => (i * 10L + j, i * 100.0 + j, j * 1.0))
        .toDF("id", "lon", "lat")
      GeoParquet.write(pts.coalesce(1),
        root.resolve(s"s$i.parquet").toString, "lon", "lat")
    }
    // the sidecar declares the geometry column (no footer KV available
    // from Spark's writer) — geometryColumns resolves through it
    assert(GeoParquet.geometryColumns(spark,
      root.resolve("s0.parquet").toString) == Seq("geometry"))
    val statsDir = root.resolve("stats").toString
    graft.stats.FileStats.write(
      graft.stats.FileStats.collect(spark, "parquet",
        (0 until 3).map(i => root.resolve(s"s$i.parquet").toString)), statsDir)
    val glob = s"$root/s*.parquet/*.parquet"
    // rect over band 1 only → 1 of 3 files
    val (one, k1, t1) = GeoParquet.readPruned(spark, Seq(glob), statsDir,
      100, 0, 110, 20)
    assert(k1 == 1 && t1 == 3 && one.count() == 10)
    // rect spanning bands 0 and 1 → 2 of 3; rows from both
    val (two, k2, _) = GeoParquet.readPruned(spark, Seq(glob), statsDir,
      5, 0, 105, 20)
    assert(k2 == 2 && two.count() == 11, s"k2=$k2 n=${two.count()}")
    // rect away from every band → 0 files, empty frame, schema intact
    val (none, k0, _) = GeoParquet.readPruned(spark, Seq(glob), statsDir,
      500, 0, 600, 20)
    assert(k0 == 0 && none.count() == 0)
    assert(none.schema.fieldNames.contains("bbox_xmin"))
    // degenerate rectangle raises
    intercept[IllegalArgumentException] {
      GeoParquet.readPruned(spark, Seq(glob), statsDir, 10, 0, 0, 20)
    }
    // pruning is never lossy: missing registry keeps all files
    val (all, kAll, _) = GeoParquet.readPruned(spark, Seq(glob),
      root.resolve("nostats").toString, 100, 0, 110, 20)
    assert(kAll == 3 && all.count() == 10,
      "files absent from the registry must be kept; exact filter still applies")
  }

  test("geoparquet writeSorted: Morton layout makes pruning effective on unsharded data (r15)") {
    val spark = GraftSession.build("local[2]", 2)
    import spark.implicits._
    import graft.sources.GeoParquet
    val root = java.nio.file.Files.createTempDirectory("graft-geosort")
    // a deterministic scatter over [0,320)×[0,320) in INTERLEAVED
    // order — without spatial sorting every output file would span the
    // whole extent and nothing could prune
    val pts = (0 until 4096).map { i =>
      (i.toLong, ((i * 37) % 320).toDouble, ((i * 91) % 320).toDouble)
    }.toDF("id", "lon", "lat")
    val dir = root.resolve("pts.parquet").toString
    GeoParquet.writeSorted(pts, dir, "lon", "lat", files = 8)
    val statsDir = root.resolve("stats").toString
    graft.stats.FileStats.write(
      graft.stats.FileStats.collect(spark, "parquet", Seq(dir)), statsDir)
    val (pruned, kept, total) = GeoParquet.readPruned(
      spark, Seq(s"$dir/*.parquet"), statsDir, 0, 0, 40, 40)
    assert(total == 8, s"total=$total")
    assert(kept < total, s"Morton layout must let SOME file prune: kept=$kept")
    // rows identical to the direct filter
    val expected = pts.filter($"lon" <= 40 && $"lat" <= 40).count()
    assert(pruned.count() == expected)
  }

  test("st_difference: notch, hole-punch, sever, disjoint, subset (r15)") {
    import graft.functions.Geo
    def d(a: String, b: String): String =
      Geo.differenceWkt(Geo.parseWkt(a), Geo.parseWkt(b))
    def area(w: String): Double = Geo.stArea(w)
    val A = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    // side notch: B overlaps A's right edge → C-shape, area 16 − 4
    val notch = d(A, "POLYGON ((2 1, 6 1, 6 3, 2 3, 2 1))")
    assert(math.abs(area(notch) - 12.0) < 1e-9, notch)
    assert(notch.startsWith("POLYGON"), notch)
    // hole punch: B strictly inside A → polygon WITH hole
    val holed = d(A, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")
    assert(math.abs(area(holed) - 12.0) < 1e-9, holed)
    assert(holed.count(_ == '(') == 3, s"expected outer+hole rings: $holed")
    // sever: a vertical bar through the middle → two components
    val split = d("POLYGON ((0 0, 6 0, 6 2, 0 2, 0 0))",
      "POLYGON ((2 -1, 4 -1, 4 3, 2 3, 2 -1))")
    assert(split.startsWith("MULTIPOLYGON"), split)
    assert(math.abs(area(split) - 8.0) < 1e-9, split)
    // disjoint → A unchanged; A ⊆ B → EMPTY; B empty → A
    assert(area(d(A, "POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))")) == 16.0)
    assert(d(A, "POLYGON ((-1 -1, 5 -1, 5 5, -1 5, -1 -1))") == "POLYGON EMPTY")
    assert(area(d(A, "POLYGON EMPTY")) == 16.0)
    assert(d("POLYGON EMPTY", A) == "POLYGON EMPTY")
    // difference is not symmetric: B \ A keeps B's outside part
    val ba = d("POLYGON ((2 1, 6 1, 6 3, 2 3, 2 1))", A)
    assert(math.abs(area(ba) - 4.0) < 1e-9, ba)
    // the result set-theoretically checks against union/intersection:
    // area(A\B) = area(A) − area(A∩B) on a concave pair
    val C = "POLYGON ((0 0, 5 0, 5 5, 4 5, 4 1, 1 1, 1 5, 0 5, 0 0))"
    val D = "POLYGON ((-1 2, 2 2, 2 4, -1 4, -1 2))"
    val ix = Geo.stIntersectionArea(C, D)
    assert(math.abs(area(d(C, D)) - (area(C) - ix)) < 1e-9,
      s"${area(d(C, D))} vs ${area(C)} - $ix")
  }

  test("st_difference randomized: area identities vs the independent clipper (r15)") {
    import graft.functions.Geo
    // seeded trials; A on even coordinates, B on odd — edges can only
    // cross transversally (no vertex-on-edge, no collinear overlap),
    // keeping every trial inside the general-position contract
    val rnd = new scala.util.Random(20260816L)
    def rect(x0: Int, y0: Int, x1: Int, y1: Int) =
      s"POLYGON (($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))"
    var crossed = 0
    for (trial <- 0 until 120) {
      val ax0 = 2 * rnd.nextInt(10); val ay0 = 2 * rnd.nextInt(10)
      val ax1 = ax0 + 2 * (1 + rnd.nextInt(8))
      val ay1 = ay0 + 2 * (1 + rnd.nextInt(8))
      val bx0 = 2 * rnd.nextInt(10) + 1; val by0 = 2 * rnd.nextInt(10) + 1
      val bx1 = bx0 + 2 * (1 + rnd.nextInt(8))
      val by1 = by0 + 2 * (1 + rnd.nextInt(8))
      val a = rect(ax0, ay0, ax1, ay1); val b = rect(bx0, by0, bx1, by1)
      val ix = Geo.stIntersectionArea(a, b) // independent Sutherland–Hodgman
      val aArea = Geo.stArea(a); val bArea = Geo.stArea(b)
      val ab = Geo.stArea(Geo.stDifference(a, b))
      val ba = Geo.stArea(Geo.stDifference(b, a))
      assert(math.abs(ab - (aArea - ix)) < 1e-9,
        s"trial $trial: |$a \\ $b| = $ab, want ${aArea - ix}")
      assert(math.abs(ba - (bArea - ix)) < 1e-9,
        s"trial $trial: |$b \\ $a| = $ba, want ${bArea - ix}")
      if (ix > 0 && ab > 0 && ba > 0) crossed += 1
    }
    assert(crossed >= 30, s"want plenty of genuinely-crossing trials: $crossed")
  }

  test("st_buffer negative radius: erosion — shrink, split, vanish (r15)") {
    import graft.functions.Geo
    // rectangle erodes to the inner rectangle, exactly
    val rect = "POLYGON ((0 0, 240 0, 240 100, 0 100, 0 0))"
    assert(Geo.bufferWkt(Geo.parseWkt(rect), -20, 8) ==
      "POLYGON ((20 20, 220 20, 220 80, 20 80, 20 20))")
    // dumbbell (rectangle with a full-height slit of width 2): erosion
    // by 20 severs it into two exact rectangles — the slit-bottom
    // reflex arcs live entirely in the collapsed waist loop the
    // extraction drops, so both components are closed-form
    val dumbbell = "POLYGON ((0 0, 240 0, 240 100, 121 100, 121 20, " +
      "119 20, 119 100, 0 100, 0 0))"
    val split = Geo.bufferWkt(Geo.parseWkt(dumbbell), -20, 8)
    assert(split == "MULTIPOLYGON (((20 20, 99 20, 99 80, 20 80, 20 20)), " +
      "((141 20, 220 20, 220 80, 141 80, 141 20)))", split)
    // over-erosion vanishes
    assert(Geo.bufferWkt(Geo.parseWkt(rect), -60, 8) == "POLYGON EMPTY")
    // multipolygon components erode independently
    val two = "MULTIPOLYGON (((0 0, 100 0, 100 100, 0 100, 0 0)), " +
      "((200 0, 300 0, 300 100, 200 100, 200 0)))"
    assert(Geo.bufferWkt(Geo.parseWkt(two), -10, 8) ==
      "MULTIPOLYGON (((10 10, 90 10, 90 90, 10 90, 10 10)), " +
        "((210 10, 290 10, 290 90, 210 90, 210 10)))")
    // lower-dimensional inputs have no interior: empty
    assert(Geo.bufferWkt(Geo.parseWkt("POINT (5 5)"), -1, 8) == "POLYGON EMPTY")
    assert(Geo.bufferWkt(Geo.parseWkt("LINESTRING (0 0, 10 10)"), -1, 8) ==
      "POLYGON EMPTY")
    // reflex corner erosion keeps the inward arc: L-shape eroded — the
    // reentrant corner at (100,100) rounds with a radius-10 arc whose
    // 4-chord fan (segs=16 → quarter arc in 4 steps) has the closed
    // form 4·(r²/2)·sin(π/8); eroded area = sharp-corner union area
    // + corner square r² − chord-fan area
    val ell = "POLYGON ((0 0, 200 0, 200 100, 100 100, 100 200, 0 200, 0 0))"
    val eroded = Geo.bufferWkt(Geo.parseWkt(ell), -10, 16)
    val a = Geo.stArea(eroded)
    val aSharp = 180.0 * 80 + 80.0 * 100
    val expected = aSharp + 100.0 - 200.0 * StrictMath.sin(StrictMath.PI / 8)
    assert(math.abs(a - expected) < 1e-6,
      s"L-shape eroded area $a vs closed form $expected")
    // r15: HOLES are supported — erode(P) = erode(outer) \ dilate(holes)
    // washer: [0,40]² with hole [16,24]², erode 4 → outer [4,36]² minus
    // the dilated hole (8² + 4·8·4 + full-circle octagon 2√2·r²)
    val washer = "POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0), " +
      "(16 16, 24 16, 24 24, 16 24, 16 16))"
    val ew = Geo.bufferWkt(Geo.parseWkt(washer), -4, 8)
    assert(ew.startsWith("POLYGON ((") && ew.count(_ == '(') == 3,
      s"washer erosion keeps outer+hole: $ew")
    val expWasher = 1024.0 - (64 + 128 + 2 * math.sqrt(2) * 16)
    assert(math.abs(Geo.stArea(ew) - expWasher) < 1e-9,
      s"washer area ${Geo.stArea(ew)} vs $expWasher")
    // wall thinner than r: the dilated hole BREACHES the eroded outer —
    // the difference path produces a hole-free C-shape
    val offCenter = "POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0), " +
      "(6 16, 14 16, 14 24, 6 24, 6 16))"
    val ec = Geo.bufferWkt(Geo.parseWkt(offCenter), -4, 8)
    assert(ec.startsWith("POLYGON") && ec.count(_ == '(') == 2,
      s"breached wall yields a C-shape without holes: $ec")
    // exact identity: area = erode(outer) − (dilated hole ∩ eroded
    // outer) — the clipped intersection computed by the independently
    // oracle-verified Sutherland–Hodgman path
    val dil = Geo.bufferWkt(
      Geo.parseWkt("POLYGON ((6 16, 14 16, 14 24, 6 24, 6 16))"), 4, 8)
    val ix = Geo.stIntersectionArea(dil,
      "POLYGON ((4 4, 36 4, 36 36, 4 36, 4 4))")
    assert(math.abs(Geo.stArea(ec) - (1024.0 - ix)) < 1e-9,
      s"${Geo.stArea(ec)} vs ${1024.0 - ix}")
    // hole dilation swallowing the whole interior → EMPTY
    val thinWasher = "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), " +
      "(6 6, 14 6, 14 14, 6 14, 6 6))"
    assert(Geo.bufferWkt(Geo.parseWkt(thinWasher), -6, 8) == "POLYGON EMPTY")
    // two holes within 2r of each other refuse loudly (their
    // dilations overlap — would need a union)
    val twoClose = "POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0), " +
      "(20 20, 30 20, 30 30, 20 30, 20 20), " +
      "(34 20, 44 20, 44 30, 34 30, 34 20))"
    val e = intercept[IllegalArgumentException] {
      Geo.bufferWkt(Geo.parseWkt(twoClose), -5, 8)
    }
    assert(e.getMessage.contains("2r"), e.getMessage)
    // two well-separated holes both punch through
    val twoFar = "POLYGON ((0 0, 80 0, 80 40, 0 40, 0 0), " +
      "(16 16, 24 16, 24 24, 16 24, 16 16), " +
      "(56 16, 64 16, 64 24, 56 24, 56 16))"
    val e2h = Geo.bufferWkt(Geo.parseWkt(twoFar), -4, 8)
    assert(e2h.count(_ == '(') == 4, s"two holes survive: $e2h")
    val exp2 = 72.0 * 32 - 2 * (64 + 128 + 2 * math.sqrt(2) * 16)
    assert(math.abs(Geo.stArea(e2h) - exp2) < 1e-9, s"${Geo.stArea(e2h)} vs $exp2")
  }

  test("st_transform: 4326↔3857 closed forms, round trip, loud errors (r15)") {
    val spark = GraftSession.build("local[2]", 2)
    graft.functions.GraftFunctions.registerAll(spark)
    import graft.functions.Geo
    // the published closed forms: lat 45° → R·ln(tan(67.5°)), lon 180° → R·π
    val p45 = Geo.stTransform("POINT (0 45)", 4326, 3857)
    val y45 = p45.stripPrefix("POINT (0 ").stripSuffix(")").toDouble
    assert(math.abs(y45 - 5621521.486192066) < 1e-6, p45)
    val pMax = Geo.stTransform("POINT (180 0)", 4326, 3857)
    val xMax = pMax.split("[ ()]")(2).toDouble
    assert(math.abs(xMax - 20037508.342789244) < 1e-6, pMax)
    // NYC reference point
    val nyc = Geo.stTransform("POINT (-73.9857 40.7484)", 4326, 3857)
    val Array(nx, ny) = nyc.stripPrefix("POINT (").stripSuffix(")")
      .split(" ").map(_.toDouble)
    assert(math.abs(nx - -8236050.4499839) < 1e-5 &&
      math.abs(ny - 4975301.253789808) < 1e-5, nyc)
    // round trip over every geometry type, coordinates back to 1e-9°
    for (w <- Seq("POINT (12.5 -33.25)",
        "LINESTRING (0 0, 10 10, 20 -5)",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 2))",
        "MULTIPOLYGON (((0 0, 5 0, 5 5, 0 0)), ((20 20, 25 20, 25 25, 20 20)))",
        "MULTILINESTRING ((0 0, 5 5), (10 10, 15 15))")) {
      val rt = Geo.stTransform(Geo.stTransform(w, 4326, 3857), 3857, 4326)
      val orig = Geo.parseWkt(w); val back = Geo.parseWkt(rt)
      assert(Geo.stNPoints(rt) == Geo.stNPoints(w), s"$w → $rt")
      val d = math.abs(Geo.stArea(rt) - Geo.stArea(w))
      assert(d < 1e-7, s"round-trip area drift $d for $w")
    }
    // same-SRID identity is byte-exact
    assert(Geo.stTransform("POINT (1 2)", 4326, 4326) == "POINT (1 2)")
    // loud: out-of-validity latitude, unknown CRS pair, SQL surface
    val e1 = intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (0 89)", 4326, 3857)
    }
    assert(e1.getMessage.contains("latitude"), e1.getMessage)
    // UTM and Lambert-93 became supported in r15; British National
    // Grid (27700) is the representative still-unsupported pair
    val e2 = intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (0 0)", 4326, 27700)
    }
    assert(e2.getMessage.contains("unsupported CRS pair"), e2.getMessage)
    val viaSql = spark.sql(
      "SELECT round(st_y(st_transform('POINT (0 45)', 4326, 3857)), 3) AS y")
      .collect()(0).getDouble(0)
    assert(viaSql == 5621521.486, s"sql: $viaSql")
  }

  test("st_transform UTM: round-trip closure, meridian pins, hemispheres, loud band (r15)") {
    import graft.functions.Geo
    def pt(lon: Double, lat: Double, from: Int, to: Int): (Double, Double) = {
      val w = Geo.stTransform(s"POINT ($lon $lat)", from, to)
      val a = w.stripPrefix("POINT (").stripSuffix(")").split(" ")
      (a(0).toDouble, a(1).toDouble)
    }
    // central meridian of zone 33 (15°E): easting exactly 500000
    val (e0, n0) = pt(15, 45, 4326, 32633)
    assert(e0 == 500000.0, s"central-meridian easting: $e0")
    // quarter meridian (equator → pole) is the textbook WGS84 constant
    // 10001965.729 m; northing(45°N, central) = k0·M(45°)
    assert(math.abs(n0 / 0.9996 - 4984944.378) < 5.0, s"M(45°): ${n0 / 0.9996}")
    // south-zone false northing symmetry: y_south(−φ) = 1e7 − y_north(φ)
    val (_, nN) = pt(15, 10, 4326, 32633)
    val (_, nS) = pt(15, -10, 4326, 32733)
    assert(math.abs(nS - (10000000.0 - nN)) < 1e-6, s"$nS vs ${10000000 - nN}")
    // round-trip closure over the zone: forward and inverse are
    // INDEPENDENT series — a coefficient typo in either breaks closure
    // by meters; the published pair closes to ~1e-9°
    for (lat <- Seq(-75.0, -40.0, -10.0, 0.0, 23.5, 45.0, 60.0, 80.0);
         dLon <- Seq(-6.0, -3.0, 0.0, 2.5, 6.0)) {
      val lon = 15.0 + dLon
      val (x, y) = pt(lon, lat, 4326, 32633)
      val w = Geo.stTransform(s"POINT ($x $y)", 32633, 4326)
      val a = w.stripPrefix("POINT (").stripSuffix(")").split(" ")
      val (bLon, bLat) = (a(0).toDouble, a(1).toDouble)
      // 5e-6° ≈ 0.5 m: the published series' truncation at the band
      // edges (75°+ at 6° from central) reaches ~1e-6°; a coefficient
      // typo shows as meters-to-kilometers and still fails
      assert(math.abs(bLon - lon) < 5e-6 && math.abs(bLat - lat) < 5e-6,
        s"round trip ($lon, $lat) → ($x, $y) → ($bLon, $bLat)")
    }
    // whole-geometry transform preserves shape counts
    val ls = Geo.stTransform("LINESTRING (12 40, 15 45, 18 50)", 4326, 32633)
    assert(Geo.stNPoints(ls) == 3 && ls.startsWith("LINESTRING"))
    // validity band is loud; unknown CRS pair names both codes
    val e1 = intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (15 89)", 4326, 32633)
    }
    assert(e1.getMessage.contains("UTM"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (0 0)", 3857, 32633)
    }
    assert(e2.getMessage.contains("unsupported CRS pair"), e2.getMessage)
    // r15 review fix: inverse legs validate as loudly as forward ones
    val e3 = intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (1e12 0)", 32633, 4326)
    }
    assert(e3.getMessage.contains("easting"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (500000 NaN)", 32633, 4326)
    }
    assert(e4.getMessage.contains("northing"), e4.getMessage)
    val e5 = intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (0 99999999)", 3857, 4326)
    }
    assert(e5.getMessage.contains("extent"), e5.getMessage)
  }

  test("st_transform Lambert-93 (EPSG:2154): origin pin, round trip, loud extent (r15)") {
    import graft.functions.Geo
    def pt(w: String, from: Int, to: Int): (Double, Double) = {
      val s = Geo.stTransform(w, from, to)
        .stripPrefix("POINT (").stripSuffix(")").split(" ")
      (s(0).toDouble, s(1).toDouble)
    }
    // the projection center maps to the false origin EXACTLY (ρ = ρ0,
    // θ = 0 by construction)
    val (cx, cy) = pt("POINT (3 46.5)", 4326, 2154)
    assert(math.abs(cx - 700000.0) < 1e-6 && math.abs(cy - 6600000.0) < 1e-6,
      s"($cx, $cy)")
    // a standard parallel is distortion-free: 1° of longitude at 44°N
    // must measure a·cos(44°)/√(1−e²sin²44°)·(π/180) along the arc —
    // chord vs arc differ only in O((Δλ)³)
    val (e1x, e1y) = pt("POINT (3 44)", 4326, 2154)
    val (e2x, e2y) = pt("POINT (4 44)", 4326, 2154)
    val chord = StrictMath.hypot(e2x - e1x, e2y - e1y)
    val s44 = StrictMath.sin(StrictMath.toRadians(44))
    val m44 = 6378137.0 * StrictMath.cos(StrictMath.toRadians(44)) /
      StrictMath.sqrt(1 - 0.00669438002290 * s44 * s44)
    val arc = m44 * StrictMath.PI / 180
    assert(math.abs(chord - arc) / arc < 1e-4, s"chord $chord vs arc $arc")
    // round-trip closure over metropolitan France
    for (lat <- Seq(41.5, 44.0, 46.5, 48.85, 51.0);
         lon <- Seq(-4.5, -1.0, 3.0, 6.2, 9.5)) {
      val (x, y) = pt(s"POINT ($lon $lat)", 4326, 2154)
      val (bLon, bLat) = pt(s"POINT ($x $y)", 2154, 4326)
      assert(math.abs(bLon - lon) < 1e-9 && math.abs(bLat - lat) < 1e-9,
        s"round trip ($lon, $lat) → ($x, $y) → ($bLon, $bLat)")
    }
    // loud: band and extent guards
    intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (3 89.5)", 4326, 2154)
    }
    val eExt = intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (99999999 0)", 2154, 4326)
    }
    assert(eExt.getMessage.contains("extent"), eExt.getMessage)
    // a point beyond the cone apex passes the metric box but unwraps
    // to |lon| > 180 — must raise, not emit a meaningless coordinate
    val eApex = intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (701000 15600000)", 2154, 4326)
    }
    assert(eApex.getMessage.contains("apex"), eApex.getMessage)
  }

  test("st_transform ETRS89-LAEA (EPSG:3035): center pin, round trip, EQUAL AREA (r15)") {
    import graft.functions.Geo
    def pt(w: String, from: Int, to: Int): (Double, Double) = {
      val s = Geo.stTransform(w, from, to)
        .stripPrefix("POINT (").stripSuffix(")").split(" ")
      (s(0).toDouble, s(1).toDouble)
    }
    // the projection center maps to the false origin exactly
    val (cx, cy) = pt("POINT (10 52)", 4326, 3035)
    assert(math.abs(cx - 4321000.0) < 1e-6 && math.abs(cy - 3210000.0) < 1e-6,
      s"($cx, $cy)")
    // round-trip closure over Europe
    for (lat <- Seq(35.0, 45.0, 52.0, 60.0, 70.0);
         lon <- Seq(-9.0, 0.0, 10.0, 24.0, 31.0)) {
      val (x, y) = pt(s"POINT ($lon $lat)", 4326, 3035)
      val (bLon, bLat) = pt(s"POINT ($x $y)", 3035, 4326)
      assert(math.abs(bLon - lon) < 1e-9 && math.abs(bLat - lat) < 1e-8,
        s"round trip ($lon, $lat) → ($x, $y) → ($bLon, $bLat)")
    }
    // THE defining property: a projected region's area equals its
    // ellipsoidal (authalic) area. Quad [14°..15°]×[48°..49°],
    // densified 64 points per edge; ellipsoidal area between
    // parallels = (a²Δλ/2)(q(φ₂)−q(φ₁))
    val lats = (0 to 64).map(i => 48.0 + i / 64.0)
    val lons = (0 to 64).map(i => 14.0 + i / 64.0)
    val boundary =
      lons.map(l => (l, 48.0)) ++ lats.map(p => (15.0, p)) ++
        lons.reverse.map(l => (l, 49.0)) ++ lats.reverse.map(p => (14.0, p))
    val proj = boundary.map { case (lo, la) => pt(s"POINT ($lo $la)", 4326, 3035) }
    var area2 = 0.0
    var j = proj.length - 1
    for (i <- proj.indices) {
      area2 += proj(j)._1 * proj(i)._2 - proj(i)._1 * proj(j)._2
      j = i
    }
    val projArea = math.abs(area2) / 2
    val e2 = (1.0 / 298.257222101) * (2 - 1.0 / 298.257222101)
    val e = math.sqrt(e2)
    def q(latDeg: Double): Double = {
      val s = math.sin(math.toRadians(latDeg))
      (1 - e2) * (s / (1 - e2 * s * s) -
        (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    val ellArea = 6378137.0 * 6378137.0 * math.toRadians(1.0) / 2 *
      (q(49) - q(48))
    assert(math.abs(projArea - ellArea) / ellArea < 1e-5,
      s"equal-area: projected $projArea vs ellipsoidal $ellArea")
    // loud guards: metric extent, AND the projected-disc edge (points
    // inside the per-axis box but with ρ > 2Rq would NaN through asin)
    intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (99999999 0)", 3035, 4326)
    }
    val eDisc = intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (17221000 3210000)", 3035, 4326)
    }
    assert(eDisc.getMessage.contains("disc"), eDisc.getMessage)
  }

  test("numeric-arg guard: garbage distance/radius raises at analysis, not NULL (r15)") {
    val spark = GraftSession.build("local[2]", 2)
    graft.functions.GraftFunctions.registerAll(spark)
    // a string column as the distance would silently null-cast under
    // non-ANSI semantics; the guard rejects it at analysis instead
    import spark.implicits._
    val df = Seq(("POINT (0 0)", "oops")).toDF("g", "junk")
    df.createOrReplaceTempView("garbage_args")
    val e1 = intercept[Exception] {
      spark.sql("SELECT st_dwithin(g, g, junk) FROM garbage_args").collect()
    }
    assert(e1.getMessage.contains("numeric"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT st_buffer(g, junk, 8) FROM garbage_args").collect()
    }
    assert(e2.getMessage.contains("numeric"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("SELECT st_simplify(g, junk) FROM garbage_args").collect()
    }
    assert(e3.getMessage.contains("numeric"), e3.getMessage)
    // numeric args of every width still pass (int, decimal literal, double col)
    val ok = spark.sql(
      "SELECT st_dwithin('POINT (0 0)', 'POINT (3 4)', 5) AS a, " +
        "st_npoints(st_buffer('POINT (0 0)', 2, 8)) AS b").collect()(0)
    assert(ok.getBoolean(0) && ok.getInt(1) == 9)
  }

  test("st_intersection_area: Sutherland–Hodgman clipping (r11)") {
    val spark = GraftSession.build("local[2]", 2)
    graft.functions.GraftFunctions.registerAll(spark)
    def area(a: String, b: String): Double = spark.sql(
      s"SELECT st_intersection_area('$a', '$b') AS v").collect()(0).getDouble(0)
    val sq = (x0: Int, y0: Int, x1: Int, y1: Int) =>
      s"POLYGON (($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))"
    // overlapping unit squares, half offset → quarter overlap
    assert(area(sq(0, 0, 1, 1), "POLYGON ((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))")
      == 0.25)
    // triangle clip fully inside the subject square → the triangle's area
    assert(area(sq(0, 0, 2, 2), "POLYGON ((0 0, 2 0, 0 2, 0 0))") == 2.0)
    // rotated diamond clip inside a square → the diamond's area (8)
    assert(area(sq(0, 0, 4, 4), "POLYGON ((2 0, 4 2, 2 4, 0 2, 2 0))") == 8.0)
    // subject HOLE subtracts from the overlap: donut 0..4 with hole
    // 1..3, clipped by 0..2 → 4 − 1
    assert(area("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))",
      sq(0, 0, 2, 2)) == 3.0)
    // disjoint → 0; clip winding (CW vs CCW) must not matter
    assert(area(sq(0, 0, 1, 1), sq(5, 5, 6, 6)) == 0.0)
    assert(area(sq(0, 0, 2, 2), "POLYGON ((0 0, 0 2, 2 2, 2 0, 0 0))") == 4.0)
    // a NON-convex clip takes the general Greiner–Hormann path (r12):
    // a contained concave dart measures its own area
    assert(area(sq(0, 0, 4, 4),
      "POLYGON ((0.5 0.5, 3.5 0.5, 2 1.5, 3.5 3.5, 0.5 3.5, 0.5 0.5))") == 6.75)
    // ...and a crossing concave clip: U-shape ∩ horizontal slab = the
    // two prong cuts, 2 × (1 × 0.6); crossing points carry float error
    assert(math.abs(area("POLYGON ((-1 2, 4 2, 4 2.6, -1 2.6, -1 2))",
      "POLYGON ((0 0, 3 0, 3 3, 2 3, 2 1, 1 1, 1 3, 0 3, 0 0))") - 1.2) < 1e-9)
  }

  val uShape = "POLYGON ((0 0, 3 0, 3 3, 2 3, 2 1, 1 1, 1 3, 0 3, 0 0))"
  val slab = "POLYGON ((-1 2, 4 2, 4 2.6, -1 2.6, -1 2))"

  test("st_union / st_intersection: Greiner–Hormann booleans (r12)") {
    // square ∩/∪ rotated diamond: octagon overlap, closed forms
    val sq04 = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    val diamond = "POLYGON ((2 -1, 5 2, 2 5, -1 2, 2 -1))"
    val ix = stIntersection(sq04, diamond)
    val un = stUnion(sq04, diamond)
    assert(stArea(ix) == 14.0, s"octagon area: $ix")
    assert(stArea(un) == 20.0, s"16 + 18 − 14: $un")

    // concave U ∩ slab → TWO components, canonical multipolygon WKT
    assert(stIntersection(uShape, slab) ==
      "MULTIPOLYGON (((0 2, 1 2, 1 2.6, 0 2.6, 0 2)), " +
        "((2 2, 3 2, 3 2.6, 2 2.6, 2 2)))")
    assert(math.abs(stArea(stUnion(uShape, slab)) - 8.8) < 1e-9) // 7 + 3 − 1.2

    // argument order must not matter for the areas
    assert(math.abs(stArea(stIntersection(slab, uShape)) - 1.2) < 1e-9)
    assert(math.abs(stArea(stUnion(slab, uShape)) - 8.8) < 1e-9)

    // containment and disjoint fast paths
    val small = "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"
    val far = "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))"
    assert(stIntersection(sq04, small) == "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
    assert(stUnion(sq04, small) == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(stIntersection(sq04, far) == "POLYGON EMPTY")
    assert(stUnion(sq04, far) ==
      "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((10 10, 11 10, 11 11, 10 11, 10 10)))")

    // union that CLOSES a ring: C-shape + capping bar → outer with a hole
    val cShape = "POLYGON ((0 0, 5 0, 5 2, 1 2, 1 3, 5 3, 5 5, 0 5, 0 0))"
    val cap = "POLYGON ((4.5 1, 5.5 1, 5.5 4, 4.5 4, 4.5 1))"
    val u = stUnion(cShape, cap)
    assert(u.startsWith("POLYGON ((") && u.contains("), ("),
      s"one outer + one hole ring: $u")
    assert(stArea(u) == 23.0) // 21 + 3 − 1 overlap

    // degenerate inputs stay loud, not silently wrong
    val shared = intercept[IllegalArgumentException] {
      stUnion(sq04, "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))") // shared edge
    }
    assert(shared.getMessage.contains("general-position"))
    // CW winding normalizes before clipping
    assert(stArea(stIntersection(
      "POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))", diamond)) == 14.0)
  }

  test("st_convex_hull: concave, multipolygon, collinear and point inputs (r12)") {
    // concave U → its enclosing square; collinear edge midpoints drop
    assert(stConvexHull(
      "POLYGON ((0 0, 2 0, 3 0, 3 3, 2 3, 2 1, 1 1, 1 3, 0 3, 0 0))") ==
      "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))")
    // hull spans a multipolygon's components; holes contribute nothing
    assert(stConvexHull(
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((4 0, 5 0, 5 1, 4 1, 4 0)))") ==
      "POLYGON ((0 0, 5 0, 5 1, 0 1, 0 0))")
    assert(stConvexHull(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))") ==
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    // rotated triangle unchanged (already convex)
    assert(stConvexHull("POLYGON ((2 0, 4 3, 0 2, 2 0))") ==
      "POLYGON ((0 2, 2 0, 4 3, 0 2))")
    assert(stConvexHull("POINT (3 4)") == "POINT (3 4)")
    // all vertices on one line — since r14 the hull degrades to the
    // LINESTRING between the extreme points (the model has lines now)
    assert(stConvexHull("POLYGON ((0 0, 1 1, 2 2, 0 0))") ==
      "LINESTRING (0 0, 2 2)")
  }

  test("linestring: parse, measures, predicates, centroid, hull, simplify (r14)") {
    val l = "LINESTRING (0 0, 4 0, 4 4)"
    val ml = "MULTILINESTRING ((0 0, 4 0), (0 2, 4 2))"
    // ST_Length is the lineal measure; perimeter/area stay areal
    assert(stLength(l) == 8.0)
    assert(stLength(ml) == 8.0)
    assert(stLength("LINESTRING (0 0, 3 4)") == 5.0)
    assert(stLength(square) == 0.0 && stLength("POINT (1 2)") == 0.0)
    assert(stPerimeter(l) == 0.0 && stArea(l) == 0.0)
    assert(stNPoints(l) == 3 && stNPoints(ml) == 4)
    // point-on-line (boundary-inclusive contains), no closing segment
    val g = parseWkt(l)
    assert(contains(g, 2, 0) && contains(g, 4, 2) && contains(g, 0, 0))
    assert(!contains(g, 0, 4), "no closing segment on an open path")
    assert(!contains(g, 2, 1))
    // intersects: line × line, line × polygon, line × point
    assert(stIntersects(l, "LINESTRING (2 -1, 2 1)"))
    assert(!stIntersects(l, "LINESTRING (0 1, 3 1)"))
    assert(stIntersects(l, square))
    assert(stIntersects("LINESTRING (-2 5, 12 5)", square))
    assert(stIntersects(l, "POINT (4 1)"))
    // distance: point→line and line→line
    assert(stDistance("POINT (2 3)", l) == 2.0) // vertical arm is nearer
    assert(stDistance("POINT (-3 4)", "LINESTRING (0 0, 4 0)") == 5.0)
    assert(stDistance(l, "LINESTRING (6 0, 6 4)") == 2.0)
    assert(stDistance(l, "LINESTRING (2 -1, 2 1)") == 0.0)
    // containment: polygon ⊇ line (with the concave-chord midpoint
    // probe), line ⊇ line, line can never contain a polygon
    assert(stContains(square, l))
    assert(!stContains(l, square))
    assert(stContains(l, "LINESTRING (1 0, 3 0)"))
    assert(!stContains(l, "LINESTRING (0 0, 4 4)"), "bend must reject the chord")
    val ushape = "POLYGON ((0 0, 6 0, 6 6, 4 6, 4 2, 2 2, 2 6, 0 6, 0 0))"
    assert(!stContains(ushape, "LINESTRING (1 6, 5 6)"),
      "a chord across the U's gap is not contained")
    // centroid: length-weighted segment midpoints → (3, 1) for the L
    assert(stCentroid(l) == "POINT (3 1)")
    // hull of a line; collinear line hull stays a line
    assert(stConvexHull(l) == "POLYGON ((0 0, 4 0, 4 4, 0 0))")
    assert(stConvexHull("LINESTRING (0 0, 1 1, 3 3)") == "LINESTRING (0 0, 3 3)")
    // envelope/bounds
    assert(stXmin(l) == 0.0 && stXmax(l) == 4.0 &&
      stYmin(l) == 0.0 && stYmax(l) == 4.0)
    // simplify an open path: bump under tol drops, endpoints pinned
    assert(stSimplify("LINESTRING (0 0, 1 0.2, 2 0, 2 5)", 0.5) ==
      "LINESTRING (0 0, 2 0, 2 5)")
    assert(stSimplify(ml, 0.5) == ml)
    // GeoJSON round-trip
    assert(geoJsonToWkt("""{"type": "LineString",
      "coordinates": [[0, 0], [4, 0], [4, 4]]}""") == l)
    assert(geoJsonToWkt("""{"type": "MultiLineString",
      "coordinates": [[[0, 0], [4, 0]], [[0, 2], [4, 2]]]}""") == ml)
    // st_union/st_intersection stay loudly polygon-only
    val e = intercept[IllegalArgumentException] { stUnion(l, square) }
    assert(e.getMessage.contains("POLYGON"))
    assert(stIntersectionArea(l, square) == 0.0)
  }

  test("relate hardening: concave slots, concave adjacency, degenerate buffer rings") {
    // a line exiting through a slot NARROWER than the probe spacing:
    // all vertices and midpoints sit inside, only the proper-crossing
    // witness sees the exit
    val slotted = "POLYGON ((0 0, 10 0, 10 10, 7.2 10, 7.2 2, 7 2, 7 10, 0 10, 0 0))"
    assert(stCrosses(slotted, "LINESTRING (1 9, 9 9)"),
      "line crossing a narrow concave slot must CROSS")
    // adjacent parcels sharing part of an edge, the neighbor CONCAVE:
    // the clip path refuses general position here; touches must still
    // answer instead of raising
    val sq = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    val concaveNeighbor = "POLYGON ((4 0, 8 0, 8 4, 6 4, 6 2, 4 2, 4 0))"
    assert(stTouches(sq, concaveNeighbor),
      "edge-adjacent concave parcels touch")
    assert(!stOverlaps(sq, concaveNeighbor),
      "boundary contact is not an overlap")
    // genuinely overlapping concave pair still reads as interiors-meet
    val overlapping = "POLYGON ((3 1, 8 1, 8 3, 6 3, 6 2, 3 2, 3 1))"
    assert(stOverlaps(sq, overlapping) && !stTouches(sq, overlapping))
    // a doubled CLOSING vertex strips cleanly (openRing removes every
    // trailing repeat) and buffers to the same ring as the clean input
    val doubled = stBuffer("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0, 0 0))", 1.0, 8)
    assert(doubled == stBuffer("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", 1.0, 8))
    assert(!doubled.contains("NaN"))
    // an INTERIOR repeated vertex dedupes away — same ring, no NaN
    assert(stBuffer("POLYGON ((0 0, 4 0, 4 0, 4 4, 0 4, 0 0))", 1.0, 8) ==
      stBuffer("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", 1.0, 8))
  }

  test("touches / crosses / overlaps: DE-9IM relate triples (r14)") {
    val sq = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    // touches: boundary-only contact, every type pair
    assert(stTouches("POINT (4 2)", sq))
    assert(!stTouches("POINT (2 2)", sq), "interior point is not touch")
    assert(!stTouches("POINT (5 5)", sq))
    assert(stTouches("POINT (0 0)", "LINESTRING (0 0, 4 0, 4 4)"),
      "line endpoint is its boundary")
    assert(!stTouches("POINT (2 0)", "LINESTRING (0 0, 4 0, 4 4)"),
      "mid-line point meets the line's interior")
    assert(stTouches("LINESTRING (-2 0, 0 0)", sq), "corner-poke touch")
    assert(stTouches("LINESTRING (-2 2, 0 2)", sq), "edge-poke touch")
    assert(stTouches("LINESTRING (0 -2, 0 8)", sq),
      "a line running ALONG the boundary touches (no interior reach)")
    assert(!stTouches("LINESTRING (-2 2, 2 2)", sq), "entering line crosses")
    assert(stTouches("LINESTRING (0 0, 4 0)", "LINESTRING (2 0, 2 4)"),
      "T-junction at the vertical's endpoint touches")
    assert(!stTouches("LINESTRING (0 0, 4 0)", "LINESTRING (2 -2, 2 2)"),
      "proper crossing is not a touch")
    assert(stTouches(sq, "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))"),
      "edge-adjacent polygons touch")
    assert(stTouches(sq, "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"),
      "corner-adjacent polygons touch")
    assert(!stTouches(sq, "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"),
      "area overlap is not a touch")
    assert(!stTouches(sq, "POLYGON ((12 0, 14 0, 14 2, 12 2, 12 0))"))
    // crosses: interiors meet in lower dimension
    assert(stCrosses("LINESTRING (0 0, 4 0)", "LINESTRING (2 -2, 2 2)"))
    assert(!stCrosses("LINESTRING (0 0, 4 0)", "LINESTRING (2 0, 6 0)"),
      "collinear sharing overlaps, it doesn't cross")
    assert(stCrosses("LINESTRING (-2 2, 6 2)", sq), "through-line crosses")
    assert(stCrosses(sq, "LINESTRING (-2 2, 6 2)"), "symmetric form")
    assert(!stCrosses("LINESTRING (1 1, 3 3)", sq),
      "a line wholly inside does not cross")
    assert(!stCrosses("LINESTRING (-2 0, 0 0)", sq))
    assert(!stCrosses(sq, "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"),
      "areal pairs never cross")
    // overlaps: same-dimension partial interior sharing
    assert(stOverlaps("LINESTRING (0 0, 4 0)", "LINESTRING (2 0, 6 0)"))
    assert(!stOverlaps("LINESTRING (0 0, 4 0)", "LINESTRING (1 0, 3 0)"),
      "containment is not overlap")
    assert(!stOverlaps("LINESTRING (0 0, 4 0)", "LINESTRING (2 -2, 2 2)"),
      "point contact is not overlap")
    assert(stOverlaps(sq, "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"))
    assert(!stOverlaps(sq, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"),
      "nested polygons don't overlap")
    assert(!stOverlaps(sq, "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))"),
      "edge contact is not overlap")
    assert(!stOverlaps("LINESTRING (-2 2, 6 2)", sq),
      "mixed dimensions never overlap")
    assert(!stOverlaps("POINT (1 1)", "POINT (1 1)"))
    // a repeated-vertex (zero-length) segment shares only a point —
    // it must not fabricate a positive collinear run
    assert(!stOverlaps("LINESTRING (2 0, 2 0, 2 5)", "LINESTRING (0 0, 4 0)"))
    assert(stTouches("LINESTRING (2 0, 2 0, 2 5)", "LINESTRING (0 0, 4 0)"))
  }

  test("relate aliases, type/dimension accessors, line interpolation (r14)") {
    val sq = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    val l = "LINESTRING (0 0, 4 0, 4 4)"
    assert(stPoint(3, 4) == "POINT (3 4)")
    assert(stPoint(1.5, -2.25) == "POINT (1.5 -2.25)")
    assert(stWithin("POINT (2 2)", sq) && !stWithin(sq, "POINT (2 2)"))
    assert(stWithin("LINESTRING (1 0, 3 0)", l))
    assert(stDisjoint(sq, "POINT (9 9)") && !stDisjoint(sq, "POINT (4 4)"))
    // equality ignores redundant collinear vertices; respects geometry
    assert(stEquals(sq, "POLYGON ((0 0, 2 0, 4 0, 4 4, 0 4, 0 0))"))
    assert(stEquals(l, "LINESTRING (0 0, 2 0, 4 0, 4 4)"))
    assert(!stEquals(sq, l) && !stEquals(sq,
      "POLYGON ((0 0, 4 0, 4 4, 0 4.5, 0 0))"))
    assert(stGeometryType(sq) == "POLYGON" && stGeometryType(l) == "LINESTRING")
    assert(stGeometryType("MULTILINESTRING ((0 0, 1 1))") == "MULTILINESTRING")
    assert(stDimension("POINT (1 1)") == 0 && stDimension(l) == 1 &&
      stDimension(sq) == 2)
    // interpolation walks segments; endpoints at f = 0 / 1; mid-vertex
    assert(stLineInterpolatePointWkt(l, 0.0) == "POINT (0 0)")
    assert(stLineInterpolatePointWkt(l, 0.25) == "POINT (2 0)")
    assert(stLineInterpolatePointWkt(l, 0.5) == "POINT (4 0)")
    assert(stLineInterpolatePointWkt(l, 0.75) == "POINT (4 2)")
    assert(stLineInterpolatePointWkt(l, 1.0) == "POINT (4 4)")
    intercept[IllegalArgumentException] { stLineInterpolatePointWkt(l, 1.5) }
    intercept[IllegalArgumentException] { stLineInterpolatePointWkt(sq, 0.5) }
    // holed polygons answer relate predicates instead of throwing
    // (the overlap-area path needs a hole-free clip side; both-holey
    // pairs fall back to strict-interior witnesses)
    val holed = "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (3 3, 5 3, 5 5, 3 5, 3 3))"
    val holed2 = "POLYGON ((6 0, 14 0, 14 8, 6 8, 6 0), (10 3, 12 3, 12 5, 10 5, 10 3))"
    assert(stOverlaps(holed, holed2), "holey polygons sharing area overlap")
    assert(!stTouches(holed, holed2))
    assert(stTouches(holed, "POLYGON ((8 0, 10 0, 10 2, 8 2, 8 0))"),
      "edge contact with a holed polygon is a touch")
    // a polygon nested INSIDE the hole shares no interior: touches at
    // the hole boundary only
    assert(stTouches(holed, "POLYGON ((3 3, 5 3, 5 5, 3 5, 3 3))"))
    assert(!stOverlaps(holed, "POLYGON ((3 3, 5 3, 5 5, 3 5, 3 3))"))
  }

  test("st_simplify: bumps under tol drop, spikes stay, rings can vanish (r12)") {
    // collinear midpoint + 0.2 bump drop at tol 0.5; the true corners stay
    assert(stSimplify(
      "POLYGON ((0 0, 1 0.2, 2 0, 4 0, 4 2, 0 2, 0 0))", 0.5) ==
      "POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))")
    // a 3-unit spike survives the same tolerance
    assert(stSimplify(
      "POLYGON ((0 0, 4 0, 4 2, 2.5 2, 2 5, 1.5 2, 0 2, 0 0))", 0.5) ==
      "POLYGON ((0 0, 4 0, 4 2, 2.5 2, 2 5, 1.5 2, 0 2, 0 0))")
    // tol 0 keeps every non-collinear vertex
    assert(stSimplify("POLYGON ((0 0, 1 0.2, 2 0, 2 2, 0 2, 0 0))", 0.0) ==
      "POLYGON ((0 0, 1 0.2, 2 0, 2 2, 0 2, 0 0))")
    // a hole below tolerance disappears; the outer stays
    assert(stSimplify(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), " +
        "(5 5, 5.2 5, 5.2 5.2, 5 5.2, 5 5))", 0.5) ==
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    // an outer collapsing under tolerance → POLYGON EMPTY
    assert(stSimplify("POLYGON ((0 0, 0.2 0.1, 0.4 0, 0.2 0.05, 0 0))", 0.5) ==
      "POLYGON EMPTY")
    // multipolygon: one component survives, one collapses
    assert(stSimplify(
      "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), " +
        "((8 8, 8.2 8.1, 8.4 8, 8.2 8.05, 8 8)))", 0.5) ==
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(stSimplify("POINT (1 2)", 0.5) == "POINT (1 2)")
  }

  test("st_buffer corridors (r14): closed-form areas, vertex counts, loud domain edges") {
    import graft.functions.Geo.{stBuffer, stArea, stNPoints}
    def aOf(wkt: String, r: Double, m: Int): Double = stArea(stBuffer(wkt, r, m))
    def npOf(wkt: String, r: Double, m: Int): Int = stNPoints(stBuffer(wkt, r, m))
    // regular m-gon on the radius-r circle (caps/joins place vertices
    // ON the circle, so every fixture area is exact up to libm)
    def am(m: Int, r: Double): Double = m / 2.0 * r * r * math.sin(2 * math.Pi / m)
    Seq(4, 8, 12).foreach { m =>
      val r = 2.0
      // CAPSULE: rectangle + two half m-gon caps = 2rL + A_m
      val cap = aOf("LINESTRING (0 0, 10 0)", r, m)
      assert(math.abs(cap - (2 * r * 10 + am(m, r))) < 1e-9, s"capsule m=$m: $cap")
      assert(npOf("LINESTRING (0 0, 10 0)", r, m) == m + 3, s"capsule np m=$m")
      // L-PATH: two rectangles − the inner r² trim square + the outer
      // quarter join + two caps = 4rL − r² + 1.25·A_m
      val ell = aOf("LINESTRING (0 0, 10 0, 10 10)", r, m)
      assert(math.abs(ell - (4 * r * 10 - r * r + 1.25 * am(m, r))) < 1e-9,
        s"ell m=$m: $ell")
      assert(npOf("LINESTRING (0 0, 10 0, 10 10)", r, m) == 5 * m / 4 + 5,
        s"ell np m=$m")
      // SQUARE outward: s² + 4rs + A_m (four quarter joins = one circle)
      val sq = aOf("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", r, m)
      assert(math.abs(sq - (16 + 4 * r * 4 + am(m, r))) < 1e-9, s"square m=$m: $sq")
      assert(npOf("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", r, m) == m + 5,
        s"square np m=$m")
    }
    // CW input ring buffers identically (openCcw normalizes orientation)
    assert(math.abs(aOf("POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))", 2, 8) -
      aOf("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", 2, 8)) < 1e-12)
    // a REFLEX vertex trims: the L-shaped hexagon, r=1 — area =
    // original + perimeter·r + convex-turn arcs − the reflex trim:
    // 5 convex quarter arcs (5·A/4... exactly: sum of turn angles on a
    // simple ring = 2π outward + the reflex backs off) — pin by the
    // Minkowski identity instead: area = A + P·r + π̂r² where π̂r² is
    // the discretized circle (turn angles sum to 2π across ALL
    // vertices, reflex subtracting), MINUS the reflex correction r²·tanless…
    // Too clever: pin the engine value against the directly-computed
    // rectangles-decomposition instead: L-hexagon (0 0,4 0,4 2,2 2,2 4,0 4):
    // A=12, P=16; buffer r=1, m=8: engine area must equal
    // 12 + 16·1 + A₈(1)·(5/4·4/… ) — derived by decomposition below.
    val hexA = aOf("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))", 1, 8)
    // decomposition: edge rectangles cover P·r = 16; five convex
    // corners carry quarter m-gons (5/4·… = 5·A₈/8·2/…); the reflex
    // corner at (2,2) contributes NOTHING outward (trim) and the two
    // adjacent edge rectangles OVERLAP in the r×r square at the notch:
    // subtract r². Total = 12 + 16 + (5/4)·A₈(1)·(4/4) − 1 — with
    // A₈(1) the full 8-gon: five quarters = 1.25·A₈.
    assert(math.abs(hexA - (12 + 16 + 1.25 * am(8, 1) - 1)) < 1e-9,
      s"reflex hexagon: $hexA")
    // --- loud domain edges ---
    // trim longer than the adjacent segment
    val e1 = intercept[IllegalArgumentException] {
      stBuffer("LINESTRING (0 0, 1 0, 1 5)", 2.0, 8) }
    assert(e1.getMessage.contains("shorter than"), e1.getMessage)
    // path reversal
    val e2 = intercept[IllegalArgumentException] {
      stBuffer("LINESTRING (0 0, 5 0, 1 0)", 1.0, 8) }
    assert(e2.getMessage.contains("reverses"), e2.getMessage)
    // hairpin: arms within 2r with no bridging corridor — would trace
    // a ring that EXCLUDES the overlap; must raise, not mis-buffer
    val e3 = intercept[IllegalArgumentException] {
      stBuffer("LINESTRING (0 0, 10 0, 10 3, 0 3)", 2.0, 8) }
    assert(e3.getMessage.contains("within 2r"), e3.getMessage)
    // but a DENSE SMOOTH track (neighbor segments within 2r, bridged by
    // the intermediate corridor — the GPS-trajectory shape) buffers fine
    val arc = (0 to 12).map { i =>
      val a = math.Pi * i / 24
      f"${10 * math.cos(a)}%.6f ${10 * math.sin(a)}%.6f"
    }.mkString("LINESTRING (", ", ", ")")
    assert(aOf(arc, 3.0, 8) > 0.0)
    // holes and multi-geometries reject; empties buffer to empty
    val e4 = intercept[IllegalArgumentException] {
      stBuffer("POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (4 4, 5 4, 5 5, 4 5, 4 4))",
        1.0, 8) }
    assert(e4.getMessage.contains("holes"), e4.getMessage)
    assert(stBuffer("POLYGON EMPTY", 1.0, 8) == "POLYGON EMPTY")
    // the original POINT surface is unchanged (m-gon, np incl. closing)
    assert(npOf("POINT (0 0)", 1.0, 4) == 5)
    assert(math.abs(aOf("POINT (0 0)", 1.0, 4) - am(4, 1)) < 1e-9)
    // MULTILINESTRING: disjoint corridors → MULTIPOLYGON whose area is
    // the sum of the component capsules; overlapping corridors raise
    val two = aOf(
      "MULTILINESTRING ((0 0, 10 0), (0 100, 10 100))", 2, 8)
    assert(math.abs(two - 2 * (2 * 2 * 10 + am(8, 2))) < 1e-9, s"two capsules: $two")
    assert(stBuffer("MULTILINESTRING ((0 0, 10 0), (0 100, 10 100))", 2, 8)
      .startsWith("MULTIPOLYGON"))
    val e5 = intercept[IllegalArgumentException] {
      stBuffer("MULTILINESTRING ((0 0, 10 0), (0 2, 10 2))", 2.0, 8) }
    assert(e5.getMessage.contains("overlap"), e5.getMessage)
  }

  test("st_buffer randomized: containment equals distance-to-path, up to arc sag (40 paths)") {
    import graft.functions.Geo
    val rnd = new scala.util.Random(20260815L)
    val m = 16
    // the discretized boundary dips to r·cos(π/m) between arc vertices;
    // inside that radius must be contained, outside r must not be —
    // the band between is the documented discretization sag
    def distToPath(pts: Seq[(Double, Double)], x: Double, y: Double): Double =
      pts.sliding(2).map { case Seq((ax, ay), (bx, by)) =>
        val vx = bx - ax; val vy = by - ay
        val l2 = vx * vx + vy * vy
        val t = math.max(0.0, math.min(1.0, ((x - ax) * vx + (y - ay) * vy) / l2))
        math.hypot(x - (ax + t * vx), y - (ay + t * vy))
      }.min
    (1 to 40).foreach { trial =>
      // a gentle random zigzag: long segments, turns within ±60°,
      // radius well under segment lengths — inside the tracer's domain
      val r = 1.0 + rnd.nextDouble()
      var (x, y, heading) = (0.0, 0.0, rnd.nextDouble() * 0.6 - 0.3)
      val pts = scala.collection.mutable.ArrayBuffer((x, y))
      (1 to 2 + rnd.nextInt(4)).foreach { _ =>
        val len = 8.0 + 6 * rnd.nextDouble()
        x += len * math.cos(heading); y += len * math.sin(heading)
        pts += ((x, y))
        heading += rnd.nextDouble() * 2.0 - 1.0 // ±~57°
      }
      val wkt = pts.map { case (px, py) => f"$px%.4f $py%.4f" }
        .mkString("LINESTRING (", ", ", ")")
      val buf = try Geo.stBuffer(wkt, r, m) catch {
        case _: IllegalArgumentException => null // out-of-domain raise is fine
      }
      if (buf != null) {
        val g = Geo.parseWkt(buf)
        (1 to 60).foreach { probe =>
          val (cx, cy) = pts(rnd.nextInt(pts.length))
          val px = cx + (rnd.nextDouble() * 4 - 2) * r
          val py = cy + (rnd.nextDouble() * 4 - 2) * r
          val d = distToPath(pts.toSeq, px, py)
          val in = Geo.contains(g, px, py)
          if (d <= r * math.cos(math.Pi / m) - 1e-9)
            assert(in, s"trial $trial probe $probe: d=$d <= sag radius but outside")
          else if (d > r + 1e-9)
            assert(!in, s"trial $trial probe $probe: d=$d > r=$r but inside")
        }
        // every path vertex is strictly interior
        pts.foreach { case (vx, vy) =>
          assert(Geo.contains(g, vx, vy), s"trial $trial: vertex outside buffer")
        }
      }
    }
  }

  test("geoparquet writer stamps the spec's footer 'geo' key (r16): " +
      "external readers see real GeoParquet; rows survive the rewrite") {
    val spark = GraftSession.build("local[2]", 2)
    import spark.implicits._
    import graft.sources.GeoParquet
    val out = java.nio.file.Files.createTempDirectory("gpq_footer").toString
    val df = (1 to 500).map(i =>
      (i.toLong, (i % 36) * 10.0 - 175.0, (i % 17) * 10.0 - 80.0))
      .toDF("id", "lon", "lat")
    GeoParquet.write(df, out, "lon", "lat")
    // every part file's FOOTER carries the geo key — the GeoParquet
    // spec's discovery mechanism, not our sidecar convention
    val parts = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(parts.nonEmpty)
    parts.foreach { f =>
      val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          new org.apache.hadoop.conf.Configuration()))
      val kv = try footer.getFooter.getFileMetaData.getKeyValueMetaData
        finally footer.close()
      val geo = kv.get("geo")
      assert(geo != null && geo.contains("\"primary_column\":\"geometry\"") &&
        geo.contains("covering"), s"footer geo key missing in $f")
      // Spark's own schema KV survives the rewrite
      assert(kv.containsKey("org.apache.spark.sql.parquet.row.metadata"))
      // and the PAGE-INDEX references survive too — the rewrite patches
      // the original thrift rather than rebuilding it, so downstream
      // readers keep page-level pruning
      val footer2 = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          new org.apache.hadoop.conf.Configuration()))
      try {
        val cc = footer2.getFooter.getBlocks.get(0).getColumns.get(0)
        assert(cc.getColumnIndexReference != null,
          s"column-index reference lost by the footer rewrite in $f")
        assert(footer2.readColumnIndex(cc) != null,
          "column index unreadable after rewrite")
      } finally footer2.close()
    }
    // the tail rewrite preserves every row and the column values
    val back = spark.read.parquet(out)
    assert(back.count() == 500)
    assert(back.agg(org.apache.spark.sql.functions.sum($"bbox_xmin"))
      .collect()(0).getDouble(0) ==
      df.agg(org.apache.spark.sql.functions.sum($"lon")).collect()(0).getDouble(0))
    // discovery works from the FOOTER ALONE: delete the sidecar
    assert(new java.io.File(s"$out/_geo.json").delete())
    assert(GeoParquet.geometryColumns(spark,
      parts.head.getAbsolutePath) == Seq("geometry"))
    // and the WKT bridge still reads geometry through the footer path
    val wkt = GeoParquet.read(spark, Seq(out))
    assert(wkt.columns.contains("geometry_wkt") && wkt.count() == 500)
  }

  test("parameterized CRS registry (r16): tmerc/aea rows register, pin " +
      "their false origins, round-trip, and guard their domains loudly") {
    // EPSG:27700 — British National Grid: tmerc, Airy 1830, origin
    // (49°N, 2°W), k0 0.9996012717, false origin (400000, -100000)
    Geo.registerCrs(27700, "tmerc", Map(
      "a" -> 6377563.396, "rf" -> 299.3249646, "lat_0" -> 49.0,
      "lon_0" -> -2.0, "k_0" -> 0.9996012717,
      "x_0" -> 400000.0, "y_0" -> -100000.0))
    // EPSG:5070 — NAD83 / CONUS Albers: aea, GRS80, origin (23°N, 96°W)
    Geo.registerCrs(5070, "aea", Map(
      "a" -> 6378137.0, "rf" -> 298.257222101, "lat_0" -> 23.0,
      "lon_0" -> -96.0, "lat_1" -> 29.5, "lat_2" -> 45.5,
      "x_0" -> 0.0, "y_0" -> 0.0))
    // the projection origin maps EXACTLY onto the false origin
    val o = Geo.parseWkt(Geo.stTransform("POINT (-2 49)", 4326, 27700))
      .asInstanceOf[Geo.PointGeom]
    assert(math.abs(o.x - 400000.0) < 1e-6 && math.abs(o.y + 100000.0) < 1e-6,
      s"(${o.x}, ${o.y})")
    val u = Geo.parseWkt(Geo.stTransform("POINT (-96 23)", 4326, 5070))
      .asInstanceOf[Geo.PointGeom]
    assert(math.abs(u.x) < 1e-6 && math.abs(u.y) < 1e-6, s"(${u.x}, ${u.y})")
    // round-trip closure across each CRS's service area
    for (lon <- -7 to 1; lat <- 50 to 60) {
      val back = Geo.parseWkt(Geo.stTransform(
        Geo.stTransform(s"POINT ($lon $lat)", 4326, 27700), 27700, 4326))
        .asInstanceOf[Geo.PointGeom]
      // Snyder-series truncation closure: <2e-7° even 5° off the
      // meridian on Airy 1830 — pin at 1e-6 (~10 cm)
      assert(math.abs(back.x - lon) < 1e-6 && math.abs(back.y - lat) < 1e-6,
        s"27700 round-trip drifted at ($lon, $lat): (${back.x}, ${back.y})")
    }
    for (lon <- -124 to -68 by 7; lat <- 25 to 49 by 4) {
      val back = Geo.parseWkt(Geo.stTransform(
        Geo.stTransform(s"POINT ($lon $lat)", 4326, 5070), 5070, 4326))
        .asInstanceOf[Geo.PointGeom]
      assert(math.abs(back.x - lon) < 1e-7 && math.abs(back.y - lat) < 1e-7,
        s"5070 round-trip drifted at ($lon, $lat): (${back.x}, ${back.y})")
    }
    // Albers is equal-area: a 1°×1° cell at 45°N projects to ~cos-
    // weighted area; sanity-pin monotonicity instead of exact area —
    // northing increases with latitude along the central meridian
    val y30 = Geo.parseWkt(Geo.stTransform("POINT (-96 30)", 4326, 5070))
      .asInstanceOf[Geo.PointGeom].y
    val y45 = Geo.parseWkt(Geo.stTransform("POINT (-96 45)", 4326, 5070))
      .asInstanceOf[Geo.PointGeom].y
    assert(y30 > 0 && y45 > y30)
    // idempotent re-registration; conflicting redefinition raises
    Geo.registerCrs(27700, "tmerc", Map(
      "a" -> 6377563.396, "rf" -> 299.3249646, "lat_0" -> 49.0,
      "lon_0" -> -2.0, "k_0" -> 0.9996012717,
      "x_0" -> 400000.0, "y_0" -> -100000.0))
    val conflict = intercept[IllegalArgumentException] {
      Geo.registerCrs(27700, "tmerc", Map(
        "a" -> 6377563.396, "rf" -> 299.3249646, "lat_0" -> 49.0,
        "lon_0" -> -2.0, "k_0" -> 1.0, "x_0" -> 0.0, "y_0" -> 0.0))
    }
    assert(conflict.getMessage.contains("conflicting redefinition"))
    // a builtin row cannot be shadowed either
    val shadow = intercept[IllegalArgumentException] {
      Geo.registerCrs(2154, "laea", Map("a" -> 6378137.0,
        "rf" -> 298.257222101, "lat_0" -> 52.0, "lon_0" -> 10.0))
    }
    assert(shadow.getMessage.contains("conflicting redefinition"))
    // unknown family / missing parameter raise with names
    assert(intercept[IllegalArgumentException] {
      Geo.registerCrs(9999, "mercator", Map("a" -> 1.0, "rf" -> 300.0))
    }.getMessage.contains("unknown family"))
    assert(intercept[IllegalArgumentException] {
      Geo.registerCrs(9999, "tmerc", Map("a" -> 6378137.0, "rf" -> 300.0))
    }.getMessage.contains("missing parameter 'lat_0'"))
    // ADVICE r15: the TM forward now guards distance from the central
    // meridian — a point 40° away raises instead of emitting garbage
    val far = intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (38 55)", 4326, 27700)
    }
    assert(far.getMessage.contains("central meridian"), far.getMessage)
    val farUtm = intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (120 10)", 4326, 32633) // zone 33 CM = 15°E
    }
    assert(farUtm.getMessage.contains("central meridian"), farUtm.getMessage)
  }

  test("polar stereographic + ellipsoidal Mercator (r17): EPSG worked " +
      "examples pin both variants; seed rows round-trip incl. the " +
      "antimeridian; parameter validation raises loudly") {
    // EPSG Guidance Note 7-2, Polar Stereographic variant A example:
    // WGS84, k0 0.994 at the N pole, FE=FN=2e6 (the UPS North row) —
    // (73°N, 44°E) → (3320416.75, 632668.43)
    val ups = Geo.parseWkt(Geo.stTransform("POINT (44 73)", 4326, 5041))
      .asInstanceOf[Geo.PointGeom]
    assert(math.abs(ups.x - 3320416.75) < 0.01 &&
      math.abs(ups.y - 632668.43) < 0.01, s"(${ups.x}, ${ups.y})")
    // EPSG GN 7-2 variant B example: WGS84, lat_ts 71°S, lon_0 70°E,
    // FE=FN=6e6 — (75°S, 120°E) → (7255380.79, 7053389.56)
    Geo.registerCrs(999031, "stere", Map(
      "a" -> 6378137.0, "rf" -> 298.257223563, "lat_0" -> -90.0,
      "lon_0" -> 70.0, "lat_ts" -> -71.0,
      "x_0" -> 6000000.0, "y_0" -> 6000000.0))
    val vb = Geo.parseWkt(Geo.stTransform("POINT (120 -75)", 4326, 999031))
      .asInstanceOf[Geo.PointGeom]
    assert(math.abs(vb.x - 7255380.79) < 0.01 &&
      math.abs(vb.y - 7053389.56) < 0.01, s"(${vb.x}, ${vb.y})")
    Geo.unregisterCrs(999031)
    // ellipsoidal Mercator differs from SPHERICAL Web Mercator by the
    // conformal correction (~20 km in y at 45°); x matches exactly on
    // the shared equatorial radius
    val me = Geo.parseWkt(Geo.stTransform("POINT (100 45)", 4326, 3395))
      .asInstanceOf[Geo.PointGeom]
    val ws = Geo.parseWkt(Geo.stTransform("POINT (100 45)", 4326, 3857))
      .asInstanceOf[Geo.PointGeom]
    assert(math.abs(me.x - ws.x) < 1e-6)
    assert(ws.y - me.y > 15000.0 && ws.y - me.y < 35000.0,
      s"conformal correction ${ws.y - me.y}")
    // seed rows round-trip across their service areas — an azimuthal
    // grid accepts EVERY longitude, including both antimeridian sides
    for (srid <- Seq(3031, 3976, 5042); lon <- -177 to 177 by 59;
         lat <- Seq(-89, -75, -60)) {
      val back = Geo.parseWkt(Geo.stTransform(Geo.stTransform(
        s"POINT ($lon $lat)", 4326, srid), srid, 4326))
        .asInstanceOf[Geo.PointGeom]
      assert(math.abs(back.x - lon) < 2e-6 && math.abs(back.y - lat) < 2e-6,
        s"$srid round-trip ($lon, $lat) -> (${back.x}, ${back.y})")
    }
    for (srid <- Seq(3413, 3995, 5041); lon <- -177 to 177 by 59;
         lat <- Seq(89, 75, 60)) {
      val back = Geo.parseWkt(Geo.stTransform(Geo.stTransform(
        s"POINT ($lon $lat)", 4326, srid), srid, 4326))
        .asInstanceOf[Geo.PointGeom]
      assert(math.abs(back.x - lon) < 2e-6 && math.abs(back.y - lat) < 2e-6,
        s"$srid round-trip ($lon, $lat) -> (${back.x}, ${back.y})")
    }
    for (lon <- -170 to 170 by 85; lat <- -80 to 80 by 40) {
      val back = Geo.parseWkt(Geo.stTransform(Geo.stTransform(
        s"POINT ($lon $lat)", 4326, 3395), 3395, 4326))
        .asInstanceOf[Geo.PointGeom]
      assert(math.abs(back.x - lon) < 1e-7 && math.abs(back.y - lat) < 1e-7,
        s"3395 round-trip ($lon, $lat) -> (${back.x}, ${back.y})")
    }
    // the pole itself maps to the false origin and inverts back
    val np = Geo.parseWkt(Geo.stTransform("POINT (0 90)", 4326, 5041))
      .asInstanceOf[Geo.PointGeom]
    assert(math.abs(np.x - 2000000.0) < 1e-6 &&
      math.abs(np.y - 2000000.0) < 1e-6)
    assert(Geo.stTransform("POINT (2000000 2000000)", 5041, 4326) ==
      "POINT (0 90)")
    // loud domains: deep opposite hemisphere, far-out inverse, and
    // parameter validation
    assert(intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (0 60)", 4326, 3031)
    }.getMessage.contains("opposite hemisphere"))
    assert(intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (40000000 0)", 3413, 4326)
    }.getMessage.contains("extent"))
    assert(intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (0 89)", 4326, 3395)
    }.getMessage.contains("validity band"))
    assert(intercept[IllegalArgumentException] {
      Geo.registerCrs(999032, "stere", Map("a" -> 6378137.0,
        "rf" -> 298.257223563, "lat_0" -> 71.0, "lon_0" -> 0.0))
    }.getMessage.contains("lat_0 must be 90 or -90"))
    assert(intercept[IllegalArgumentException] {
      Geo.registerCrs(999032, "stere", Map("a" -> 6378137.0,
        "rf" -> 298.257223563, "lat_0" -> 90.0, "lon_0" -> 0.0,
        "lat_ts" -> 70.0, "k_0" -> 0.994))
    }.getMessage.contains("mutually exclusive"))
    assert(intercept[IllegalArgumentException] {
      Geo.registerCrs(999032, "stere", Map("a" -> 6378137.0,
        "rf" -> 298.257223563, "lat_0" -> 90.0, "lon_0" -> 0.0,
        "lat_ts" -> -70.0))
    }.getMessage.contains("hemisphere"))
  }

  test("eqc family (r17): equidistant cylindrical — meridian-arc northing " +
      "pins, round-trips pole to pole, antimeridian wrap") {
    // EPSG:4087: x = a·λ, y = M(φ) — independent closed-form pins
    val p = Geo.parseWkt(Geo.stTransform("POINT (90 45)", 4326, 4087))
      .asInstanceOf[Geo.PointGeom]
    assert(math.abs(p.x - 10018754.17) < 0.01 &&
      math.abs(p.y - 4984944.38) < 0.01, s"(${p.x}, ${p.y})")
    for (lon <- -177 to 177 by 59; lat <- -89 to 89 by 44) {
      val back = Geo.parseWkt(Geo.stTransform(Geo.stTransform(
        s"POINT ($lon $lat)", 4326, 4087), 4087, 4326))
        .asInstanceOf[Geo.PointGeom]
      assert(math.abs(back.x - lon) < 2e-6 && math.abs(back.y - lat) < 2e-6,
        s"4087 round-trip ($lon, $lat) -> (${back.x}, ${back.y})")
    }
    // a standard-parallel row compresses eastings by ν·cos(lat_ts)/a
    Geo.registerCrs(999183, "eqc", Map("a" -> 6378137.0,
      "rf" -> 298.257223563, "lat_ts" -> 60.0, "lon_0" -> 0.0))
    val q = Geo.parseWkt(Geo.stTransform("POINT (90 45)", 4326, 999183))
      .asInstanceOf[Geo.PointGeom]
    assert(q.x < p.x * 0.52 && q.x > p.x * 0.48, s"${q.x} vs ${p.x}")
    assert(math.abs(q.y - p.y) < 1e-9) // northing is lat-only
    Geo.unregisterCrs(999183)
    // loud extents
    assert(intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (99000000 0)", 4087, 4326)
    }.getMessage.contains("extent"))
  }

  test("sinu family (r17 cont.): MODIS sphere pins closed-form, ellipsoid " +
      "round-trips pole to pole, lens guard loud, rf=0 sphere notation") {
    // MODIS sinusoidal: authalic sphere R = 6371007.181, registered
    // through the rf = 0 sphere notation. Independent closed form:
    // x = R·λ·cosφ, y = R·φ
    Geo.registerCrs(996974, "sinu", Map(
      "a" -> 6371007.181, "rf" -> 0.0, "lon_0" -> 0.0))
    val r = 6371007.181
    val p = Geo.parseWkt(Geo.stTransform("POINT (100 40)", 4326, 996974))
      .asInstanceOf[Geo.PointGeom]
    assert(math.abs(p.x - r * math.toRadians(100) * math.cos(math.toRadians(40))) < 1e-6)
    assert(math.abs(p.y - r * math.toRadians(40)) < 1e-6)
    // the h10v08-style tile corner magnitudes are ~1.1e7 m max
    for (lon <- -177 to 177 by 59; lat <- -89 to 89 by 44) {
      val back = Geo.parseWkt(Geo.stTransform(Geo.stTransform(
        s"POINT ($lon $lat)", 4326, 996974), 996974, 4326))
        .asInstanceOf[Geo.PointGeom]
      assert(math.abs(back.x - lon) < 2e-6 && math.abs(back.y - lat) < 2e-6,
        s"996974 round-trip ($lon, $lat) -> (${back.x}, ${back.y})")
    }
    // ellipsoidal: WGS84, off-zero CM — round-trips incl. near-pole
    Geo.registerCrs(996975, "sinu", Map(
      "a" -> 6378137.0, "rf" -> 298.257223563, "lon_0" -> 20.0,
      "x_0" -> 100000.0, "y_0" -> 200000.0))
    for (lon <- -177 to 177 by 48; lat <- Seq(-89.5, -45.0, 0.0, 30.0, 89.5)) {
      val back = Geo.parseWkt(Geo.stTransform(Geo.stTransform(
        s"POINT ($lon $lat)", 4326, 996975), 996975, 4326))
        .asInstanceOf[Geo.PointGeom]
      assert(math.abs(back.x - lon) < 2e-6 && math.abs(back.y - lat) < 2e-6,
        s"996975 round-trip ($lon, $lat) -> (${back.x}, ${back.y})")
    }
    // the false origin pins exactly at (lon_0, equator)
    val o = Geo.parseWkt(Geo.stTransform("POINT (20 0)", 4326, 996975))
      .asInstanceOf[Geo.PointGeom]
    assert(math.abs(o.x - 100000.0) < 1e-6 && math.abs(o.y - 200000.0) < 1e-6)
    // an easting beyond the sinusoidal lens at high latitude is not a
    // valid projected point — loud, not silently wrapped
    assert(intercept[IllegalArgumentException] {
      Geo.stTransform(s"POINT (${100000.0 + 1.9e7} ${200000.0 + 9.1e6})",
        996975, 4326)
    }.getMessage.contains("sinusoidal"))
    Seq(996974, 996975).foreach(Geo.unregisterCrs(_))
  }

  test("geos family (r17 cont.): sub-satellite/axis pins, sphere sweep " +
      "conjugacy differential, random-row round-trips, horizon loud") {
    // GOES-East-shaped row (sweep x) and a Meteosat-shaped row (sweep y)
    Geo.registerCrs(990075, "geos", Map(
      "a" -> 6378137.0, "rf" -> 298.257222101, "h" -> 35786023.0,
      "lon_0" -> -75.0, "sweep_x" -> 1.0))
    Geo.registerCrs(990000, "geos", Map(
      "a" -> 6378137.0, "rf" -> 298.257223563, "h" -> 35785831.0,
      "lon_0" -> 0.0))
    // the sub-satellite point maps to the grid origin exactly, and the
    // scan axes pin to the central meridian / equator
    val sub = Geo.parseWkt(Geo.stTransform("POINT (-75 0)", 4326, 990075))
      .asInstanceOf[Geo.PointGeom]
    assert(math.abs(sub.x) < 1e-9 && math.abs(sub.y) < 1e-9)
    val onCm = Geo.parseWkt(Geo.stTransform("POINT (-75 30)", 4326, 990075))
      .asInstanceOf[Geo.PointGeom]
    assert(math.abs(onCm.x) < 1e-9 && onCm.y > 0)
    val onEq = Geo.parseWkt(Geo.stTransform("POINT (-50 0)", 4326, 990075))
      .asInstanceOf[Geo.PointGeom]
    assert(math.abs(onEq.y) < 1e-9 && onEq.x > 0)
    // both sweeps round-trip across the visible disc
    for (dlon <- -55 to 55 by 22; lat <- -60 to 60 by 24) {
      val bg = Geo.parseWkt(Geo.stTransform(Geo.stTransform(
        s"POINT (${-75 + dlon} $lat)", 4326, 990075), 990075, 4326))
        .asInstanceOf[Geo.PointGeom]
      assert(math.abs(bg.x - (-75 + dlon)) < 2e-6 && math.abs(bg.y - lat) < 2e-6,
        s"goes ($dlon, $lat) -> (${bg.x}, ${bg.y})")
      val bm = Geo.parseWkt(Geo.stTransform(Geo.stTransform(
        s"POINT ($dlon $lat)", 4326, 990000), 990000, 4326))
        .asInstanceOf[Geo.PointGeom]
      assert(math.abs(bm.x - dlon) < 2e-6 && math.abs(bm.y - lat) < 2e-6,
        s"met ($dlon, $lat) -> (${bm.x}, ${bm.y})")
    }
    // beyond the limb rejects loudly in BOTH directions
    assert(intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (100 0)", 4326, 990075)
    }.getMessage.contains("visible disc"))
    assert(intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (5450000 3200000)", 990075, 4326)
    }.getMessage.contains("visible disc"))
    Seq(990075, 990000).foreach(Geo.unregisterCrs(_))

    // SPHERE sweep-conjugacy differential: on a sphere the view vector
    // is (cosφ cosΔλ, cosφ sinΔλ, sinφ) with |V| = 1, so swapping
    // Vy↔Vz maps the x-sweep image of a point to the y-sweep image of
    // its CONJUGATE point (φ' = asin(cosφ sinΔλ), Δλ' = atan2(sinφ,
    // cosφ cosΔλ)) with the axes exchanged — an independent geometric
    // identity the two code paths must satisfy together
    Geo.registerCrs(990001, "geos", Map("a" -> 6371000.0, "rf" -> 0.0,
      "h" -> 35786000.0, "lon_0" -> 0.0, "sweep_x" -> 1.0))
    Geo.registerCrs(990002, "geos", Map("a" -> 6371000.0, "rf" -> 0.0,
      "h" -> 35786000.0, "lon_0" -> 0.0))
    val rnd = new scala.util.Random(17082026L)
    for (trial <- 1 to 40) {
      val dl = math.toRadians(-50.0 + rnd.nextDouble() * 100.0)
      val phi = math.toRadians(-50.0 + rnd.nextDouble() * 100.0)
      val phiC = math.asin(math.cos(phi) * math.sin(dl))
      val dlC = math.atan2(math.sin(phi), math.cos(phi) * math.cos(dl))
      val a1 = Geo.parseWkt(Geo.stTransform(
        s"POINT (${math.toDegrees(dl)} ${math.toDegrees(phi)})",
        4326, 990001)).asInstanceOf[Geo.PointGeom]
      val a2 = Geo.parseWkt(Geo.stTransform(
        s"POINT (${math.toDegrees(dlC)} ${math.toDegrees(phiC)})",
        4326, 990002)).asInstanceOf[Geo.PointGeom]
      assert(math.abs(a1.x - a2.y) < 1e-6 && math.abs(a1.y - a2.x) < 1e-6,
        s"trial $trial sweep conjugacy (${a1.x}, ${a1.y}) vs (${a2.x}, ${a2.y})")
    }
    Seq(990001, 990002).foreach(Geo.unregisterCrs(_))

    // random parameter rows: ellipsoid, height, lon_0, false origins,
    // both sweeps — round-trips close, origin pins exact
    var srid = 991001
    for (trial <- 1 to 20) {
      val a = 6300000.0 + rnd.nextDouble() * 100000.0
      val rf = if (trial % 5 == 0) 0.0 else 290.0 + rnd.nextDouble() * 20.0
      val h = 3.0e7 + rnd.nextDouble() * 1.2e7
      val lon0 = -179.0 + rnd.nextDouble() * 358.0
      val x0 = rnd.nextInt(1000000).toDouble
      val y0 = rnd.nextInt(1000000).toDouble
      val sweepX = trial % 2 == 0
      Geo.registerCrs(srid, "geos", Map("a" -> a, "rf" -> rf, "h" -> h,
        "lon_0" -> lon0, "x_0" -> x0, "y_0" -> y0) ++
        (if (sweepX) Map("sweep_x" -> 1.0) else Map.empty))
      val o = Geo.parseWkt(Geo.stTransform(
        s"POINT ($lon0 0)", 4326, srid)).asInstanceOf[Geo.PointGeom]
      assert(math.abs(o.x - x0) < 1e-6 && math.abs(o.y - y0) < 1e-6,
        s"trial $trial geos origin (${o.x}, ${o.y}) want ($x0, $y0)")
      for (_ <- 1 to 8) {
        val lon = wrap180(lon0 - 50.0 + rnd.nextDouble() * 100.0)
        val lat = -55.0 + rnd.nextDouble() * 110.0
        val back = Geo.parseWkt(Geo.stTransform(Geo.stTransform(
          s"POINT ($lon $lat)", 4326, srid), srid, 4326))
          .asInstanceOf[Geo.PointGeom]
        assert(math.abs(back.x - lon) < 2e-6 && math.abs(back.y - lat) < 2e-6,
          s"trial $trial geos ($lon, $lat) -> (${back.x}, ${back.y})")
      }
      Geo.unregisterCrs(srid)
      srid += 1
    }
  }

  private def wrap180(d: Double): Double =
    if (d > 180.0) d - 360.0 else if (d < -180.0) d + 360.0 else d

  test("longlat family (r17): geographic↔geographic datum shift — OSGB36 " +
      "offset lands in the published ~50-200 m band, round-trip exact, " +
      "WGS84-compatible alias is the identity") {
    Geo.registerCrs(924277, "longlat", Map(
      "a" -> 6377563.396, "rf" -> 299.3249646,
      "dx" -> 446.448, "dy" -> -125.157, "dz" -> 542.060,
      "rx" -> 0.1502, "ry" -> 0.2470, "rz" -> 0.8421, "ds" -> -20.4894))
    val p = Geo.parseWkt(Geo.stTransform("POINT (-2 52)", 4326, 924277))
      .asInstanceOf[Geo.PointGeom]
    // the OSGB36↔WGS84 datum offset over GB is famously ~100 m
    val dLon = (p.x - (-2.0)) * 111320.0 * math.cos(math.toRadians(52))
    val dLat = (p.y - 52.0) * 111320.0
    val off = math.hypot(dLon, dLat)
    assert(off > 50.0 && off < 200.0, s"datum offset $off m at (-2, 52)")
    val back = Geo.parseWkt(Geo.stTransform(
      Geo.stTransform("POINT (-2 52)", 4326, 924277), 924277, 4326))
      .asInstanceOf[Geo.PointGeom]
    // fixed-count geodetic-latitude iterations truncate at ~1e-8°:
    // pin at 1e-7° (≈1 cm), far under any datum-shift use
    assert(math.abs(back.x + 2.0) < 1e-7 && math.abs(back.y - 52.0) < 1e-7,
      s"(${back.x}, ${back.y})")
    // a GRS80 row WITHOUT towgs84 keys: WGS84-compatible alias —
    // identity passthrough (the ETRS89/NAD83 published stance)
    Geo.registerCrs(924258, "longlat",
      Map("a" -> 6378137.0, "rf" -> 298.257222101))
    assert(Geo.stTransform("POINT (10 52)", 4326, 924258) == "POINT (10 52)")
    // range guards stay loud
    assert(intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (200 10)", 4326, 924277)
    }.getMessage.contains("longitude"))
    Seq(924277, 924258).foreach(Geo.unregisterCrs(_))
  }

  test("antimeridian round-trips (r17, ADVICE r16): every inverse wraps " +
      "the recovered longitude — lon_0 177, lon -179 closes through all " +
      "six families") {
    // tmerc near the antimeridian (the UTM zone-1/60 shape): the fwd
    // leg wraps the delta (r16); the INVERSE must wrap the recovery
    Geo.registerCrs(999177, "tmerc", Map(
      "a" -> 6378137.0, "rf" -> 298.257223563, "lat_0" -> 0.0,
      "lon_0" -> 177.0, "k_0" -> 0.9996, "x_0" -> 500000.0, "y_0" -> 0.0))
    // lcc / aea: Pacific conics straddling the dateline
    Geo.registerCrs(999178, "lcc", Map(
      "a" -> 6378137.0, "rf" -> 298.257223563, "lat_0" -> -40.0,
      "lon_0" -> 177.0, "lat_1" -> -35.0, "lat_2" -> -45.0,
      "x_0" -> 1000000.0, "y_0" -> 2000000.0))
    Geo.registerCrs(999179, "aea", Map(
      "a" -> 6378137.0, "rf" -> 298.257223563, "lat_0" -> -40.0,
      "lon_0" -> 177.0, "lat_1" -> -35.0, "lat_2" -> -45.0,
      "x_0" -> 1000000.0, "y_0" -> 2000000.0))
    Geo.registerCrs(999180, "laea", Map(
      "a" -> 6378137.0, "rf" -> 298.257223563, "lat_0" -> -40.0,
      "lon_0" -> 177.0, "x_0" -> 0.0, "y_0" -> 0.0))
    Geo.registerCrs(999181, "merc", Map(
      "a" -> 6378137.0, "rf" -> 298.257223563, "lon_0" -> 177.0))
    Geo.registerCrs(999182, "stere", Map(
      "a" -> 6378137.0, "rf" -> 298.257223563, "lat_0" -> -90.0,
      "lon_0" -> 177.0, "lat_ts" -> -71.0))
    Geo.registerCrs(999184, "eqc", Map(
      "a" -> 6378137.0, "rf" -> 298.257223563, "lon_0" -> 177.0))
    for ((srid, lat) <- Seq(999177 -> -41, 999178 -> -41, 999179 -> -41,
        999180 -> -41, 999181 -> -41, 999182 -> -75, 999184 -> -41)) {
      val wkt = Geo.stTransform(s"POINT (-179 $lat)", 4326, srid)
      val back = Geo.parseWkt(Geo.stTransform(wkt, srid, 4326))
        .asInstanceOf[Geo.PointGeom]
      // the recovered longitude must land back on -179 (NOT 181)
      assert(math.abs(back.x - (-179.0)) < 2e-5 &&
        math.abs(back.y - lat) < 2e-5,
        s"$srid (-179, $lat) -> (${back.x}, ${back.y})")
    }
    // and the UTM built-ins: zone 1 (CM 177°W) from the east side
    val z1 = Geo.stTransform("POINT (179 10)", 4326, 32601)
    val b1 = Geo.parseWkt(Geo.stTransform(z1, 32601, 4326))
      .asInstanceOf[Geo.PointGeom]
    assert(math.abs(b1.x - 179.0) < 2e-5 && math.abs(b1.y - 10.0) < 2e-5,
      s"(${b1.x}, ${b1.y})")
    // a near-pole northing inside the METRIC extent guards makes the
    // TM series' d/cosφ1 terms explode — the inverse now rejects the
    // meridian-delta blowup loudly instead of emitting a single-wrap
    // garbage longitude (r17 self-review)
    assert(intercept[IllegalArgumentException] {
      Geo.stTransform("POINT (2400000 9990000)", 32631, 4326)
    }.getMessage.contains("not a valid projected point"))
    Seq(999177, 999178, 999179, 999180, 999181, 999182, 999184)
      .foreach(Geo.unregisterCrs(_))
  }

  test("polar/Mercator kernels under RANDOM parameter rows (r17): both " +
      "aspects and both variants round-trip; origin pins exact") {
    val rnd = new scala.util.Random(17031995L)
    var srid = 910001
    for (trial <- 1 to 36) {
      val a = 6300000.0 + rnd.nextDouble() * 100000.0
      val rf = 290.0 + rnd.nextDouble() * 20.0
      val lon0 = -179.0 + rnd.nextDouble() * 358.0
      val x0 = rnd.nextInt(6000000).toDouble
      val y0 = rnd.nextInt(6000000).toDouble
      if (trial % 3 == 2) {
        // cylindricals: alternate ellipsoidal Mercator and equidistant
        // (eqc) — every longitude valid, the parallel origin pins y0
        val fam = if (trial % 6 == 2) "merc" else "eqc"
        val extra = if (fam == "merc")
          Map("k_0" -> (0.99 + rnd.nextDouble() * 0.01))
        else Map("lat_ts" -> (rnd.nextDouble() * 120.0 - 60.0))
        Geo.registerCrs(srid, fam, Map("a" -> a, "rf" -> rf,
          "lon_0" -> lon0, "x_0" -> x0, "y_0" -> y0) ++ extra)
        val o = Geo.parseWkt(Geo.stTransform(
          s"POINT ($lon0 0)", 4326, srid)).asInstanceOf[Geo.PointGeom]
        assert(math.abs(o.x - x0) < 1e-5 && math.abs(o.y - y0) < 1e-5,
          s"trial $trial $fam origin (${o.x}, ${o.y}) want ($x0, $y0)")
        for (_ <- 1 to 8) {
          val lon = -179.9 + rnd.nextDouble() * 359.8
          val lat =
            if (fam == "merc") -79.0 + rnd.nextDouble() * 158.0
            else -89.0 + rnd.nextDouble() * 178.0  // eqc is pole-safe
          val back = Geo.parseWkt(Geo.stTransform(Geo.stTransform(
            s"POINT ($lon $lat)", 4326, srid), srid, 4326))
            .asInstanceOf[Geo.PointGeom]
          assert(math.abs(back.x - lon) < 2e-6 && math.abs(back.y - lat) < 2e-6,
            s"trial $trial $fam ($lon, $lat) -> (${back.x}, ${back.y})")
        }
      } else {
        // polar stereographic: alternate NORTH and SOUTH aspects, and
        // variant B (lat_ts) vs variant A (k_0) — the branch matrix
        val south = trial % 2 == 0
        val sign = if (south) -1.0 else 1.0
        val variantB = trial % 4 < 2
        val extra =
          if (variantB) Map("lat_ts" -> sign * (60.0 + rnd.nextDouble() * 29.0))
          else Map("k_0" -> (0.98 + rnd.nextDouble() * 0.02))
        Geo.registerCrs(srid, "stere", Map("a" -> a, "rf" -> rf,
          "lat_0" -> sign * 90.0, "lon_0" -> lon0,
          "x_0" -> x0, "y_0" -> y0) ++ extra)
        // the pole lands exactly on the false origin
        val o = Geo.parseWkt(Geo.stTransform(
          s"POINT (0 ${sign * 90.0})", 4326, srid)).asInstanceOf[Geo.PointGeom]
        assert(math.abs(o.x - x0) < 1e-5 && math.abs(o.y - y0) < 1e-5,
          s"trial $trial stere pole (${o.x}, ${o.y}) want ($x0, $y0)")
        for (_ <- 1 to 8) {
          // ANY longitude (azimuthal), latitude within 45° of the pole
          val lon = -179.9 + rnd.nextDouble() * 359.8
          val lat = sign * (90.0 - rnd.nextDouble() * 44.0) match {
            case l if math.abs(l) > 89.97 => sign * 89.97
            case l => l
          }
          val back = Geo.parseWkt(Geo.stTransform(Geo.stTransform(
            s"POINT ($lon $lat)", 4326, srid), srid, 4326))
            .asInstanceOf[Geo.PointGeom]
          assert(math.abs(back.x - lon) < 2e-6 && math.abs(back.y - lat) < 2e-6,
            s"trial $trial stere${if (south) "S" else "N"} ($lon, $lat) " +
              s"-> (${back.x}, ${back.y})")
        }
      }
      Geo.unregisterCrs(srid)
      srid += 1
    }
  }

  test("projection kernels under RANDOM parameter rows (r16): 60 synthetic " +
      "CRSs — false-origin pins exact, round-trips close, all families") {
    val rnd = new scala.util.Random(29021609L)
    var srid = 900001
    for (trial <- 1 to 60) {
      // a plausible Earth-like ellipsoid and arbitrary published-style
      // parameters — the space a user's EPSG row lives in
      val a = 6300000.0 + rnd.nextDouble() * 100000.0
      val rf = 290.0 + rnd.nextDouble() * 20.0
      val lon0 = -170.0 + rnd.nextDouble() * 340.0
      val x0 = rnd.nextInt(2000000).toDouble
      val y0 = rnd.nextInt(2000000).toDouble - 1000000.0
      val family = Seq("tmerc", "lcc", "laea", "aea")(trial % 4)
      val (lat0, extra) = family match {
        case "tmerc" => (-60.0 + rnd.nextDouble() * 120.0,
          Map("k_0" -> (0.9996 + rnd.nextDouble() * 0.0006)))
        case "laea" => (-70.0 + rnd.nextDouble() * 140.0,
          Map.empty[String, Double])
        case _ => // conics: parallels straddle the origin, same sign
          val base = 15.0 + rnd.nextDouble() * 40.0
          val sign = if (rnd.nextBoolean()) 1.0 else -1.0
          (sign * (base + 5.0), Map("lat_1" -> sign * base,
            "lat_2" -> sign * (base + 12.0)))
      }
      Geo.registerCrs(srid, family, Map("a" -> a, "rf" -> rf,
        "lat_0" -> lat0, "lon_0" -> lon0, "x_0" -> x0, "y_0" -> y0) ++ extra)
      // 1. the projection origin lands exactly on the false origin
      val o = Geo.parseWkt(Geo.stTransform(
        s"POINT ($lon0 $lat0)", 4326, srid)).asInstanceOf[Geo.PointGeom]
      assert(math.abs(o.x - x0) < 1e-5 && math.abs(o.y - y0) < 1e-5,
        s"trial $trial $family: origin -> (${o.x}, ${o.y}), want ($x0, $y0)")
      // 2. round-trip closure across the service area
      for (_ <- 1 to 8) {
        val dLon = (rnd.nextDouble() * 2 - 1) *
          (if (family == "tmerc") 10.0 else 25.0)
        val dLat = (rnd.nextDouble() * 2 - 1) * 12.0
        val lon = math.max(-179.9, math.min(179.9, lon0 + dLon))
        val lat = math.max(-79.0, math.min(79.0, lat0 + dLat))
        val back = Geo.parseWkt(Geo.stTransform(Geo.stTransform(
          s"POINT ($lon $lat)", 4326, srid), srid, 4326))
          .asInstanceOf[Geo.PointGeom]
        // closure bound: the conic/azimuthal inverses iterate to
        // double precision (2e-6° ≈ 20 cm); the TM Snyder series
        // truncates — ~1e-5° (≈1 m) at the ±10° edge of its domain
        val tol = if (family == "tmerc") 2e-5 else 2e-6
        assert(math.abs(back.x - lon) < tol && math.abs(back.y - lat) < tol,
          s"trial $trial $family ($lon, $lat) -> (${back.x}, ${back.y})")
      }
      Geo.unregisterCrs(srid)
      srid += 1
    }
  }

  test("Helmert datum shift (r16): towgs84 rows project datum-correctly; " +
      "exact inverse; identity and translation pins") {
    // exact inverse: random 7-parameter rows round-trip geocentric
    // coordinates to sub-mm (the forward small-angle matrix is
    // inverted exactly, not approximated by negating the parameters)
    val rnd = new scala.util.Random(9606L)
    for (_ <- 1 to 40) {
      val h = Geo.Helmert(rnd.nextDouble() * 1000 - 500,
        rnd.nextDouble() * 1000 - 500, rnd.nextDouble() * 1000 - 500,
        rnd.nextDouble() * 10 - 5, rnd.nextDouble() * 10 - 5,
        rnd.nextDouble() * 10 - 5, rnd.nextDouble() * 60 - 30)
      val (x, y, z) = (rnd.nextDouble() * 4e6, rnd.nextDouble() * 4e6,
        rnd.nextDouble() * 4e6)
      val (wx, wy, wz) = h.toWgs(x, y, z)
      val (bx, by, bz) = h.fromWgs(wx, wy, wz)
      assert(math.abs(bx - x) < 1e-4 && math.abs(by - y) < 1e-4 &&
        math.abs(bz - z) < 1e-4, s"$h: ($x,$y,$z) -> ($bx,$by,$bz)")
    }
    // pure translation moves geocentric coordinates verbatim
    val t = Geo.Helmert(100.0, -50.0, 25.0, 0, 0, 0, 0)
    assert(t.toWgs(1e6, 2e6, 3e6) == ((1e6 + 100.0, 2e6 - 50.0, 3e6 + 25.0)))
    // a zero-parameter towgs84 row on the WGS84 ellipsoid itself is a
    // true identity pipeline (geocentric unchanged AND same ellipsoid);
    // on a DIFFERENT ellipsoid even a zero shift re-interprets the
    // geodetic coordinates — the correct datum behavior, tested below
    val wgsTm = Map("a" -> 6378137.0, "rf" -> 298.257223563,
      "lat_0" -> 0.0, "lon_0" -> -3.0, "k_0" -> 0.9996,
      "x_0" -> 500000.0, "y_0" -> 0.0)
    Geo.registerCrs(900811, "tmerc", wgsTm)
    Geo.registerCrs(900812, "tmerc", wgsTm + ("dx" -> 0.0))
    val bareW = Geo.parseWkt(Geo.stTransform("POINT (-1.5 52.0)", 4326, 900811))
      .asInstanceOf[Geo.PointGeom]
    val zeroW = Geo.parseWkt(Geo.stTransform("POINT (-1.5 52.0)", 4326, 900812))
      .asInstanceOf[Geo.PointGeom]
    assert(math.abs(bareW.x - zeroW.x) < 1e-6 &&
      math.abs(bareW.y - zeroW.y) < 1e-6,
      s"(${bareW.x},${bareW.y}) vs (${zeroW.x},${zeroW.y})")
    val osgbParams = Map("a" -> 6377563.396, "rf" -> 299.3249646,
      "lat_0" -> 49.0, "lon_0" -> -2.0, "k_0" -> 0.9996012717,
      "x_0" -> 400000.0, "y_0" -> -100000.0)
    Geo.registerCrs(900801, "tmerc", osgbParams)
    // the REAL OSGB36 parameters (EPSG 1314 / PROJ towgs84): the
    // datum-correct grid point sits the documented ~50–200 m from the
    // datum-naive one over GB, and the full pipeline round-trips
    Geo.registerCrs(900803, "tmerc", osgbParams ++ Map(
      "dx" -> 446.448, "dy" -> -125.157, "dz" -> 542.060,
      "rx" -> 0.1502, "ry" -> 0.2470, "rz" -> 0.8421, "ds" -> -20.4894))
    for ((lon, lat) <- Seq((-1.5, 52.0), (-4.0, 56.5), (0.5, 51.2))) {
      val naive = Geo.parseWkt(Geo.stTransform(
        s"POINT ($lon $lat)", 4326, 900801)).asInstanceOf[Geo.PointGeom]
      val datum = Geo.parseWkt(Geo.stTransform(
        s"POINT ($lon $lat)", 4326, 900803)).asInstanceOf[Geo.PointGeom]
      val off = StrictMath.hypot(datum.x - naive.x, datum.y - naive.y)
      assert(off > 50.0 && off < 200.0,
        s"OSGB36 datum offset at ($lon, $lat) is $off m — expected 50–200")
      val back = Geo.parseWkt(Geo.stTransform(Geo.stTransform(
        s"POINT ($lon $lat)", 4326, 900803), 900803, 4326))
        .asInstanceOf[Geo.PointGeom]
      assert(math.abs(back.x - lon) < 1e-7 && math.abs(back.y - lat) < 1e-7,
        s"datum round-trip drifted: (${back.x}, ${back.y})")
    }
    // SHOW-CRS-visible family marks the datum pipeline
    assert(Geo.familyOf(Geo.crsOf(900803).get) == "tmerc+towgs84")
    Seq(900801, 900803, 900811, 900812).foreach(Geo.unregisterCrs(_))
  }

  test("CREATE CRS / SHOW CRS: the parameter-row registry on the SQL " +
      "surface (r16)") {
    val spark = GraftSession.build("local[2]", 2)
    val wh = java.nio.file.Files.createTempDirectory("graft-crs-wh").toString
    val engine = GraftEngine(spark, wh)
    // EPSG:3347 (Statistics Canada Lambert, NAD83/GRS80) from its
    // published parameters — a CRS in no named registry
    engine.sql("""CREATE CRS 3347 (FAMILY 'lcc', A 6378137.0,
      RF 298.257222101, LAT_0 63.390675, LON_0 -91.866667,
      LAT_1 49.0, LAT_2 77.0, X_0 6200000, Y_0 3000000)""")
    // the projection origin lands exactly on the false origin
    val row = engine.sql("""SELECT
        st_x(st_transform('POINT (-91.866667 63.390675)', 4326, 3347)) AS x,
        st_y(st_transform('POINT (-91.866667 63.390675)', 4326, 3347)) AS y""")
      .collect()(0)
    assert(math.abs(row.getDouble(0) - 6200000.0) < 1e-5, row)
    assert(math.abs(row.getDouble(1) - 3000000.0) < 1e-5, row)
    // SHOW CRS lists builtins and the registration
    val listed = engine.sql("SHOW CRS").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(listed.contains((2154, "lcc", "builtin")))
    assert(listed.contains((3035, "laea", "builtin")))
    assert(listed.contains((3347, "lcc", "registered")))
    // idempotent re-create; malformed parameter raises with the text
    engine.sql("""CREATE CRS 3347 (FAMILY 'lcc', A 6378137.0,
      RF 298.257222101, LAT_0 63.390675, LON_0 -91.866667,
      LAT_1 49.0, LAT_2 77.0, X_0 6200000, Y_0 3000000)""")
    val bad = intercept[IllegalArgumentException] {
      engine.sql("CREATE CRS 9998 (FAMILY 'lcc', A pi)")
    }
    assert(bad.getMessage.contains("bad CRS parameter"), bad.getMessage)
    val noFam = intercept[IllegalArgumentException] {
      engine.sql("CREATE CRS 9998 (A 6378137.0, RF 300.0)")
    }
    assert(noFam.getMessage.contains("needs FAMILY"), noFam.getMessage)
    // PERSISTENT rows survive the session: persist one, wipe it from
    // the JVM-global registry (the test seam), rebuild a catalog on
    // the same warehouse — the row re-registers from _crs.json
    engine.sql("""CREATE PERSISTENT CRS 29902 (FAMILY 'tmerc',
      A 6377340.189, RF 299.3249646, LAT_0 53.5, LON_0 -8.0,
      K_0 1.000035, X_0 200000, Y_0 250000)""")
    assert(Geo.crsOf(29902).isDefined)
    Geo.unregisterCrs(29902)
    assert(Geo.crsOf(29902).isEmpty)
    val engine2 = GraftEngine(spark, wh) // fresh catalog, same warehouse
    assert(Geo.crsOf(29902).isDefined, "persisted CRS must reload")
    val back = engine2.sql(
      """SELECT st_x(st_transform('POINT (-8.0 53.5)', 4326, 29902)) AS x""")
      .collect()(0).getDouble(0)
    assert(math.abs(back - 200000.0) < 1e-5, back)
    val listed2 = engine2.sql("SHOW CRS").collect()
      .map(r => (r.getInt(0), r.getString(2)))
    assert(listed2.contains((29902, "persistent")))
    assert(listed2.contains((3347, "registered"))) // temp row stays temp
    // DROP CRS removes dynamic rows (and their persisted record);
    // builtins refuse; IF EXISTS tolerates absence
    engine2.sql("DROP CRS 3347")
    assert(Geo.crsOf(3347).isEmpty)
    engine2.sql("DROP CRS 29902")
    assert(Geo.crsOf(29902).isEmpty)
    val engine3 = GraftEngine(spark, wh)
    assert(Geo.crsOf(29902).isEmpty, "dropped persistent row must not reload")
    val notRow = intercept[IllegalArgumentException] {
      engine3.sql("DROP CRS 2154")
    }
    assert(notRow.getMessage.contains("not a registered parameter row"))
    engine3.sql("DROP CRS IF EXISTS 4242") // no-op, no error
  }

  test("st_within_point is codegen-native (r16): generated == interpreted, " +
      "literal geometry parsed once, plan stays in WholeStageCodegen") {
    val spark = GraftSession.build("local[2]", 2)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (for { x <- -2 to 12; y <- -2 to 12 }
      yield (x.toDouble + 0.5, y.toDouble + 0.5, s"POLYGON ((0 0, $x 0, $x $y, 0 0))"))
      .toDF("px", "py", "wkt")
    for (poly <- Seq(square, withHole, triangle)) {
      // literal-WKT shape (the gate shape): codegen on
      val cg = df.filter(GraftFunctions.st_within_point(lit(poly), $"px", $"py"))
        .select($"px", $"py").collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
      // interpreted oracle: the raw kernel over collected rows
      val g = Geo.parseWkt(poly)
      val exp = df.select($"px", $"py").collect()
        .map(r => (r.getDouble(0), r.getDouble(1)))
        .filter { case (x, y) => Geo.contains(g, x, y) }.toSet
      assert(cg == exp, s"codegen mismatch for $poly")
    }
    // column-WKT shape routes through the cached-parse kernel
    val colWkt = df.filter(GraftFunctions.st_within_point($"wkt", lit(3.5), lit(1.5)))
      .count()
    val expCol = df.collect().count { r =>
      val gg = Geo.parseWkt(r.getString(2)); Geo.contains(gg, 3.5, 1.5) }
    assert(colWkt == expCol)
    // plan pin: the filter stays inside WholeStageCodegen — no
    // CodegenFallback interpreter hop for the hot predicate (read from
    // parquet so ConvertToLocalRelation can't pre-evaluate the filter)
    val pq = java.nio.file.Files.createTempDirectory("stwp").toString
    df.write.mode("overwrite").parquet(pq)
    val plan = spark.read.parquet(pq)
      .filter(GraftFunctions.st_within_point(lit(square), $"px", $"py"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen member — a
    // CodegenFallback expression would leave the Filter bare
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Filter st_within_point.*"), plan)
    // and integer/long coordinates still codegen (the cast table)
    val ints = Seq((1, 2L), (11, 2L)).toDF("ix", "iy")
      .filter(GraftFunctions.st_within_point(lit(square), col("ix"), col("iy")))
      .count()
    assert(ints == 1L)
  }
}
