package graft.core.geo

/**
 * Table-driven reprojection to WGS84 (EPSG:4326) — the only transform the
 * reference ever performs: `ST_Transform(the_geom, 4326)` when a shapefile's
 * detected SRID ≠ 4326 (importer.rb:375-386).
 *
 * In-JVM, zero-dependency implementation (no proj4/GDAL — SURVEY.md §7.4):
 * spherical Mercator + ellipsoidal transverse Mercator (standard public
 * formulas, USGS Professional Paper 1395 "Map Projections — A Working
 * Manual", Snyder 1987). Datum shifts for non-WGS84 ellipsoids are
 * approximated as zero (documented divergence; the reference delegated this
 * to PostGIS — misc/shp_normalizer.py only ever *detects* the EPSG code).
 *
 * Unknown SRIDs pass through unchanged and are reported via the import log,
 * matching the reference's swallow-reprojection-errors behavior
 * (importer.rb:383-385).
 */
object Projection {

  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    val e2: Double = f * (2 - f)
  }
  val WGS84 = Ellipsoid(6378137.0, 298.257223563)
  val GRS80 = Ellipsoid(6378137.0, 298.257222101)
  val Intl1924 = Ellipsoid(6378388.0, 297.0) // ED50 (European fixtures)
  val Clarke1866 = Ellipsoid(6378206.4, 294.978698214) // NAD27

  sealed trait Crs
  case object LatLon extends Crs // geographic degrees; treated as 4326
  case object WebMercator extends Crs // EPSG:3857 spherical Mercator
  /** UTM: zone, northern hemisphere flag, ellipsoid. */
  final case class Utm(zone: Int, north: Boolean, ell: Ellipsoid) extends Crs

  /** EPSG → CRS. Covers the code families the reference's SRID detection
    * can produce (misc/shp_normalizer.py — any EPSG via osr): geographic
    * CRSs (4326/4269/4267/4258/4230), web mercator (3857/900913), and the
    * UTM ranges for WGS84 / NAD83 / ED50 / NAD27. */
  def forEpsg(epsg: Int): Option[Crs] = epsg match {
    case 4326 | 4269 | 4267 | 4258 | 4230 => Some(LatLon)
    case 3857 | 900913 | 3785 => Some(WebMercator)
    case z if z >= 32601 && z <= 32660 => Some(Utm(z - 32600, north = true, WGS84))
    case z if z >= 32701 && z <= 32760 => Some(Utm(z - 32700, north = false, WGS84))
    case z if z >= 26901 && z <= 26923 => Some(Utm(z - 26900, north = true, GRS80))
    case z if z >= 26701 && z <= 26722 => Some(Utm(z - 26700, north = true, Clarke1866))
    case z if z >= 23028 && z <= 23038 => Some(Utm(z - 23000, north = true, Intl1924))
    case z if z >= 25828 && z <= 25838 => Some(Utm(z - 25800, north = true, GRS80))
    case _ => None
  }

  /** Can `transform(_, srid)` do real work for this SRID? */
  def supported(epsg: Int): Boolean = forEpsg(epsg).isDefined

  /** Transform one coordinate from `epsg` to WGS84 lon/lat degrees. */
  def toWgs84(c: Coord, epsg: Int): Coord = forEpsg(epsg) match {
    case Some(LatLon) | None => c
    case Some(WebMercator) => webMercatorInverse(c)
    case Some(Utm(zone, north, ell)) => utmInverse(c, zone, north, ell)
  }

  /** Transform a geometry to SRID 4326 (coords + tag). Unknown source SRIDs
    * pass through with only the tag rewritten. */
  def transformTo4326(g: Geometry, sourceEpsg: Int): Geometry =
    if (sourceEpsg == 4326 || sourceEpsg == 0) g
    else g.mapCoords(toWgs84(_, sourceEpsg))

  private val R = 6378137.0 // WGS84 semi-major, spherical Mercator radius

  private def webMercatorInverse(c: Coord): Coord = {
    val lon = math.toDegrees(c.x / R)
    val lat = math.toDegrees(2 * math.atan(math.exp(c.y / R)) - math.Pi / 2)
    Coord(lon, lat, c.z)
  }

  /** Ellipsoidal transverse Mercator inverse (Snyder 1987, eqs. 8-17..8-25,
    * series form), UTM parameterization: k0=0.9996, FE=500000,
    * FN=10000000 in the southern hemisphere. */
  private def utmInverse(c: Coord, zone: Int, north: Boolean, ell: Ellipsoid): Coord = {
    val k0 = 0.9996
    val a = ell.a
    val e2 = ell.e2
    val ep2 = e2 / (1 - e2)
    val x = c.x - 500000.0
    val y = if (north) c.y else c.y - 10000000.0
    val lon0 = math.toRadians((zone - 1) * 6 - 180 + 3)

    val m = y / k0
    val mu = m / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
    val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    val phi1 = mu +
      (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)

    val sinPhi1 = math.sin(phi1); val cosPhi1 = math.cos(phi1); val tanPhi1 = math.tan(phi1)
    val c1 = ep2 * cosPhi1 * cosPhi1
    val t1 = tanPhi1 * tanPhi1
    val n1 = a / math.sqrt(1 - e2 * sinPhi1 * sinPhi1)
    val r1 = a * (1 - e2) / math.pow(1 - e2 * sinPhi1 * sinPhi1, 1.5)
    val d = x / (n1 * k0)

    val lat = phi1 - (n1 * tanPhi1 / r1) * (
      d * d / 2 -
      (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * math.pow(d, 4) / 24 +
      (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) * math.pow(d, 6) / 720)
    val lon = lon0 + (
      d -
      (1 + 2 * t1 + c1) * math.pow(d, 3) / 6 +
      (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) * math.pow(d, 5) / 120) / cosPhi1

    Coord(math.toDegrees(lon), math.toDegrees(lat), c.z)
  }
}
