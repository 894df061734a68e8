package graft.core.geo

import org.scalatest.funsuite.AnyFunSuite

class GeometrySpec extends AnyFunSuite {

  private val samples = Seq(
    "POINT(1 2)",
    "POINT(-3.5 40.25)",
    "LINESTRING(0 0,1 1,2 0)",
    "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))",
    "MULTIPOINT((0 0),(1 1))",
    "MULTILINESTRING((0 0,1 1),(2 2,3 3))",
    "MULTIPOLYGON(((0 0,1 0,1 1,0 0)),((5 5,6 5,6 6,5 5)))",
    "GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1))")

  test("WKT round trip") {
    samples.foreach { wkt =>
      val g = Geometry.fromWkt(wkt).get
      assert(Geometry.toWkt(g) == wkt)
    }
  }

  test("EWKB round trip preserves geometry and srid") {
    samples.foreach { wkt =>
      val g = Geometry.fromWkt(wkt).get
      val bytes = Geometry.toEwkb(g, 4326)
      val (g2, srid) = Geometry.fromEwkb(bytes).get
      assert(g2 == g)
      assert(srid.contains(4326))
    }
  }

  test("GeoJSON parse and emit") {
    val g = Geometry.fromGeoJson("""{"type":"Point","coordinates":[-3.0,40.5]}""").get
    assert(g == Point(Coord(-3.0, 40.5)))
    assert(Geometry.toGeoJson(g, 2) == """{"type":"Point","coordinates":[-3,40.5]}""")
    // Feature wrapper
    val f = Geometry.fromGeoJson(
      """{"type":"Feature","properties":{},"geometry":{"type":"Point","coordinates":[1,2]}}""").get
    assert(f == Point(Coord(1, 2)))
    // malformed → None (silent skip, importer.rb:282-284)
    assert(Geometry.fromGeoJson("{not json").isEmpty)
    assert(Geometry.fromGeoJson("""{"type":"Nope","coordinates":[]}""").isEmpty)
  }

  test("GeoJSON precision 0 matches the reference golden shape (import_spec.rb:413-416)") {
    val g = Geometry.fromGeoJson(
      """{"type":"MultiPolygon","coordinates":[[[[-3.4,40.6],[-3.2,40.5],[-3.3,40.1],[-3.4,40.6]]]]}""").get
    assert(Geometry.toGeoJson(g, 0) ==
      """{"type":"MultiPolygon","coordinates":[[[[-3,41],[-3,41],[-3,40],[-3,41]]]]}""")
  }

  test("force2D drops Z") {
    val g = Geometry.fromWkt("POINT Z (1 2 3)").get
    assert(g == Point(Coord(1, 2, 3)))
    assert(g.force2D == Point(Coord(1, 2)))
    assert(Geometry.toWkt(g.force2D) == "POINT(1 2)")
  }

  test("web mercator inverse (forward round trip)") {
    // forward spherical Mercator (public formula), then invert
    val (lon, lat) = (-3.7038, 40.4168)
    val r = 6378137.0
    val x = r * math.toRadians(lon)
    val y = r * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))
    val c = Projection.toWgs84(Coord(x, y), 3857)
    assert(math.abs(c.x - lon) < 1e-9)
    assert(math.abs(c.y - lat) < 1e-9)
  }

  test("UTM inverse (WGS84 zone 30N)") {
    // EPSG:32630 easting 440000, northing 4474000 ≈ lon -3.7º, lat 40.4º
    val c = Projection.toWgs84(Coord(440000, 4474000), 32630)
    assert(math.abs(c.x - -3.707) < 0.01)
    assert(math.abs(c.y - 40.417) < 0.01)
  }

  test("unknown srid passes through (importer.rb:383-385 swallow semantics)") {
    val g = Point(Coord(10, 20))
    assert(Projection.transformTo4326(g, 999999) == g)
  }

  test("zorder cell matches a reference Morton interleave and clusters neighbors") {
    val spark = graft.SparkTestBase.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def refMorton(lon: Double, lat: Double, bits: Int): Long = {
      val n = 1L << bits
      val x = math.min(math.floor((lon + 180.0) / 360.0 * n).toLong, n - 1)
      val y = math.min(math.floor((lat + 90.0) / 180.0 * n).toLong, n - 1)
      (0 until bits).map(b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))).sum
    }
    val pts = Seq((0.5, 0.25), (-179.9, -89.9), (179.9, 89.9), (0.6, 0.26))
    val got = pts.toDF("lon", "lat")
      .select(graft.functions.GeoFunctions.zorder_cell(col("lon"), col("lat"), 15).as("c"))
      .collect().map(_.getLong(0))
    pts.zip(got).foreach { case ((lon, lat), c) =>
      assert(c == refMorton(lon, lat, 15), s"($lon,$lat)")
    }
    // locality: two points ~0.1° apart share a long cell prefix; the
    // antipodal corners do not
    assert((got(0) >> 12) == (got(3) >> 12))
    assert((got(1) >> 12) != (got(2) >> 12))
  }
}
