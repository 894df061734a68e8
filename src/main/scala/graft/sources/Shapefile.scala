package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.Charset

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.geo.{Coord, Geometry, LineString, MultiLineString, MultiPoint, MultiPolygon, Point => GPoint, Polygon => GPolygon}

/**
 * ESRI Shapefile source (SURVEY.md §2.1 S8/S9): .shp geometry records +
 * .dbf attributes zipped by record number, .prj → SRID. Replaces the
 * reference's `shp2pgsql | psql` pipe (importer.rb:348-373) with an
 * in-JVM parser; DBF field decoding follows the public Xbase layout the
 * reference's misc/dbfUtils.py:3-56 implements (N→long/decimal, D→date,
 * L→bool with '?'→null, C→char), deleted records skipped (P4).
 *
 * Scale shape: one shapefile parses as one task (the format is not
 * byte-splittable without the .shx side file), but a directory of
 * shapefiles — the real bulk-import case — fans out via Spark's
 * binaryFile source, one file per task. Geometry lands as EWKB with the
 * detected SRID so Q-reproject can run downstream.
 */
object Shapefile {

  // ----------------------------------------------------------------- DBF

  final case class DbfField(name: String, ftype: Char, length: Int, decimals: Int)

  final case class Dbf(fields: IndexedSeq[DbfField], records: IndexedSeq[IndexedSeq[Any]])

  /** Parse a DBF payload (layout per the public Xbase spec). */
  def parseDbf(bytes: Array[Byte], charset: Charset): Dbf = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.get() // version
    buf.position(4)
    val numRec = buf.getInt
    val headerLen = buf.getShort & 0xFFFF
    val recordLen = buf.getShort & 0xFFFF
    // field descriptors: 32 bytes each from offset 32 until 0x0D
    val fields = IndexedSeq.newBuilder[DbfField]
    var off = 32
    while (off < headerLen - 1 && bytes(off) != 0x0D) {
      val nameBytes = java.util.Arrays.copyOfRange(bytes, off, off + 11)
      val name = new String(nameBytes.takeWhile(_ != 0), StandardCharsetsAscii)
      val ftype = bytes(off + 11).toChar
      val length = bytes(off + 16) & 0xFF
      val decimals = bytes(off + 17) & 0xFF
      fields += DbfField(name, ftype, length, decimals)
      off += 32
    }
    val fs = fields.result()
    val records = IndexedSeq.newBuilder[IndexedSeq[Any]]
    var pos = headerLen
    var rec = 0
    while (rec < numRec && pos + recordLen <= bytes.length) {
      val deleted = bytes(pos) != ' '.toByte // P4: deletion-flag filter
      if (!deleted) {
        var fpos = pos + 1
        val vals = IndexedSeq.newBuilder[Any]
        fs.foreach { f =>
          val raw = new String(bytes, fpos, f.length, charset).trim
          vals += decodeField(f, raw)
          fpos += f.length
        }
        records += vals.result()
      }
      pos += recordLen
      rec += 1
    }
    Dbf(fs, records.result())
  }

  private val StandardCharsetsAscii = Charset.forName("ISO-8859-1")

  /** Field decode per misc/dbfUtils.py:42-54. */
  private def decodeField(f: DbfField, raw: String): Any = f.ftype match {
    case 'N' | 'F' =>
      if (raw.isEmpty || raw == "?") null
      else if (f.decimals > 0 || raw.contains('.'))
        try BigDecimal(raw).underlying() catch { case _: Exception => null }
      else try java.lang.Long.valueOf(raw.replace("+", ""))
      catch { case _: Exception => null }
    case 'D' =>
      if (raw.length < 8 || !raw.forall(_.isDigit)) null
      else try java.sql.Date.valueOf(
        s"${raw.substring(0, 4)}-${raw.substring(4, 6)}-${raw.substring(6, 8)}")
      catch { case _: Exception => null }
    case 'L' => raw.headOption match {
      case Some(c) if "TtYy".indexOf(c) >= 0 => java.lang.Boolean.TRUE
      case Some(c) if "FfNn".indexOf(c) >= 0 => java.lang.Boolean.FALSE
      case _ => null // '?' unknown
    }
    case _ => raw // 'C' and anything else: text
  }

  def sparkTypeOf(f: DbfField): DataType = f.ftype match {
    case 'N' | 'F' =>
      if (f.decimals > 0) DecimalType(math.min(f.length, 38), f.decimals)
      else LongType
    case 'D' => DateType
    case 'L' => BooleanType
    case _ => StringType
  }

  // ----------------------------------------------------------------- SHP

  /** Parse the .shp payload into per-record geometries (None = null shape).
    * Layout per the public ESRI Shapefile Technical Description (1998). */
  def parseShp(bytes: Array[Byte]): IndexedSeq[Option[Geometry]] = {
    val buf = ByteBuffer.wrap(bytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt(0) == 9994, "not a shapefile (bad magic)")
    val fileLenBytes = buf.getInt(24) * 2
    var pos = 100
    val out = IndexedSeq.newBuilder[Option[Geometry]]
    while (pos + 8 <= math.min(fileLenBytes, bytes.length)) {
      val contentLen = ByteBuffer.wrap(bytes, pos + 4, 4).order(ByteOrder.BIG_ENDIAN).getInt * 2
      val rec = ByteBuffer.wrap(bytes, pos + 8, contentLen).order(ByteOrder.LITTLE_ENDIAN)
      out += parseShape(rec)
      pos += 8 + contentLen
    }
    out.result()
  }

  private def parseShape(b: ByteBuffer): Option[Geometry] = {
    val shapeType = b.getInt
    def pt(): Coord = Coord(b.getDouble, b.getDouble)
    shapeType match {
      case 0 => None
      case 1 | 21 => Some(GPoint(pt())) // point / pointM (M ignored)
      case 11 => // pointZ
        val c = Coord(b.getDouble, b.getDouble, { val z = b.getDouble; z })
        Some(GPoint(c))
      case 8 | 18 | 28 => // multipoint (Z/M data after XY block ignored)
        b.position(b.position() + 32) // bbox
        val n = b.getInt
        Some(MultiPoint(IndexedSeq.fill(n)(GPoint(pt()))))
      case 3 | 13 | 23 => Some(polyline(b))
      case 5 | 15 | 25 => Some(polygon(b))
      case _ => None
    }
  }

  private def readParts(b: ByteBuffer): IndexedSeq[IndexedSeq[Coord]] = {
    b.position(b.position() + 32) // bbox
    val numParts = b.getInt
    val numPoints = b.getInt
    val parts = IndexedSeq.fill(numParts)(b.getInt)
    val pts = IndexedSeq.fill(numPoints)(Coord(b.getDouble, b.getDouble))
    (0 until numParts).map { i =>
      val start = parts(i)
      val end = if (i + 1 < numParts) parts(i + 1) else numPoints
      pts.slice(start, end)
    }
  }

  private def polyline(b: ByteBuffer): Geometry = {
    val parts = readParts(b)
    if (parts.length == 1) LineString(parts.head)
    else MultiLineString(parts.map(LineString(_)))
  }

  /** Polygon rings → MULTIPOLYGON: clockwise rings open a new polygon,
    * counter-clockwise rings are holes of the current one (ESRI winding
    * convention) — matches shp2pgsql's output shape for the reference's
    * world-borders fixture. */
  private def polygon(b: ByteBuffer): Geometry = {
    val rings = readParts(b)
    val polys = IndexedSeq.newBuilder[GPolygon]
    var current: List[IndexedSeq[Coord]] = Nil
    rings.foreach { ring =>
      if (signedArea(ring) <= 0) { // clockwise in screen coords = outer
        if (current.nonEmpty) polys += GPolygon(current.reverse.toIndexedSeq)
        current = List(ring)
      } else if (current.nonEmpty) current = ring :: current
      else current = List(ring) // malformed: CCW first ring — treat as outer
    }
    if (current.nonEmpty) polys += GPolygon(current.reverse.toIndexedSeq)
    val ps = polys.result()
    MultiPolygon(ps)
  }

  private def signedArea(ring: IndexedSeq[Coord]): Double = {
    var a = 0.0
    var i = 0
    while (i < ring.length - 1) {
      a += ring(i).x * ring(i + 1).y - ring(i + 1).x * ring(i).y
      i += 1
    }
    a / 2
  }

  // ----------------------------------------------------------------- PRJ

  /** ESRI-WKT → EPSG lookup (F19) — table-driven, no network (the
    * reference's prj2epsg.org web fallback is impossible offline;
    * documented divergence SURVEY.md §7.4). Default 4326. */
  def epsgFromPrj(prj: String): Int = {
    val p = prj.toUpperCase
    val utmZone = "UTM_ZONE_(\\d+)([NS])?".r.findFirstMatchIn(p)
    if (p.contains("WEB_MERCATOR") || p.contains("PSEUDO_MERCATOR")) 3857
    else utmZone match {
      case Some(m) =>
        val zone = m.group(1).toInt
        val south = m.group(2) == "S"
        if (p.contains("ED_1950") || p.contains("ED50")) 23000 + zone
        else if (p.contains("NAD_1983") || p.contains("NAD83")) 26900 + zone
        else if (p.contains("NAD_1927") || p.contains("NAD27")) 26700 + zone
        else if (p.contains("ETRS")) 25800 + zone
        else if (south) 32700 + zone
        else 32600 + zone
      case None => 4326 // geographic or unknown → assume WGS84
    }
  }

  // ------------------------------------------------------------- assemble

  final case class ShapefileSet(
      shp: Array[Byte], dbf: Option[Array[Byte]], prj: Option[String])

  /** Build a DataFrame from one parsed shapefile set. Attribute columns
    * keep DBF names (callers sanitize via GeoPipeline.sanitizeColumns);
    * geometry lands in `the_geom` as EWKB tagged with the .prj SRID. */
  def toDataFrame(spark: SparkSession, set: ShapefileSet,
      encoding: String = "ISO-8859-1"): DataFrame = {
    val srid = set.prj.map(epsgFromPrj).getOrElse(4326)
    val geoms = parseShp(set.shp)
    val dbf = set.dbf.map(parseDbf(_, Charset.forName(encoding)))
      .getOrElse(Dbf(IndexedSeq.empty, IndexedSeq.fill(geoms.length)(IndexedSeq.empty)))
    val fields = dbf.fields.map(f => StructField(f.name, sparkTypeOf(f), nullable = true)) :+
      StructField("the_geom", BinaryType, nullable = true)
    val schema = StructType(fields)
    val n = math.min(geoms.length, dbf.records.length max geoms.length)
    val rows = (0 until n).map { i =>
      val attrs = if (i < dbf.records.length) dbf.records(i) else IndexedSeq.fill(dbf.fields.length)(null)
      val geom = if (i < geoms.length) geoms(i).map(g => Geometry.toEwkb(g, srid)).orNull else null
      Row.fromSeq(attrs :+ geom)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, math.max(1, rows.length / 10000)),
      schema)
  }

  /** Read one .shp path (with .dbf/.prj siblings if present). */
  def read(spark: SparkSession, shpPath: String): DataFrame = {
    val base = shpPath.stripSuffix(".shp")
    def opt(p: String): Option[Array[Byte]] = {
      val f = new java.io.File(p)
      if (f.exists) Some(java.nio.file.Files.readAllBytes(f.toPath)) else None
    }
    // sibling lookup tolerates case variants (.DBF etc.)
    def sibling(ext: String): Option[Array[Byte]] =
      opt(base + ext).orElse(opt(base + ext.toUpperCase))
    val shp = java.nio.file.Files.readAllBytes(Paths(shpPath))
    val dbfBytes = sibling(".dbf")
    val enc = dbfBytes.map(b => CsvImport.detectEncoding(b.take(64 * 1024)))
      .map(e => if (e == "UTF-8") "UTF-8" else "ISO-8859-1").getOrElse("ISO-8859-1")
    val prj = sibling(".prj").map(new String(_, StandardCharsetsAscii))
    toDataFrame(spark, ShapefileSet(shp, dbfBytes, prj), enc)
  }

  private def Paths(p: String) = java.nio.file.Paths.get(p)
}
