package graft.core.geo

import java.nio.{ByteBuffer, ByteOrder}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/**
 * Minimal 2D/3D geometry ADT + codecs (WKT, GeoJSON, EWKB) for the engine's
 * `the_geom` column (reference data model: SURVEY.md §1.1 — geometry is 2D
 * SRID 4326 after import; construction paths at importer.rb:267-331).
 *
 * Column representation is EWKB bytes (PostGIS's public wire format:
 * WKB with an SRID flag bit), carried in a Spark `BinaryType` column —
 * compact, splittable, and directly insertable into PostGIS via JDBC.
 */
sealed trait Geometry {
  def typeName: String
  /** Drop Z ordinates — ST_Force_2D (importer.rb:380). */
  def force2D: Geometry
  def mapCoords(f: Coord => Coord): Geometry
}

final case class Coord(x: Double, y: Double, z: Double = Double.NaN) {
  def is3D: Boolean = !z.isNaN
  def to2D: Coord = if (is3D) Coord(x, y) else this
  // bit-level equality so the NaN "no z" sentinel compares equal to itself
  override def equals(o: Any): Boolean = o match {
    case Coord(ox, oy, oz) =>
      java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(ox) &&
      java.lang.Double.doubleToLongBits(y) == java.lang.Double.doubleToLongBits(oy) &&
      java.lang.Double.doubleToLongBits(z) == java.lang.Double.doubleToLongBits(oz)
    case _ => false
  }
  override def hashCode: Int =
    java.util.Arrays.hashCode(Array(
      java.lang.Double.doubleToLongBits(x),
      java.lang.Double.doubleToLongBits(y),
      java.lang.Double.doubleToLongBits(z)))
}

final case class Point(c: Coord) extends Geometry {
  def typeName = "POINT"
  def force2D: Point = Point(c.to2D)
  def mapCoords(f: Coord => Coord): Point = Point(f(c))
}
final case class LineString(cs: IndexedSeq[Coord]) extends Geometry {
  def typeName = "LINESTRING"
  def force2D: LineString = LineString(cs.map(_.to2D))
  def mapCoords(f: Coord => Coord): LineString = LineString(cs.map(f))
}
final case class Polygon(rings: IndexedSeq[IndexedSeq[Coord]]) extends Geometry {
  def typeName = "POLYGON"
  def force2D: Polygon = Polygon(rings.map(_.map(_.to2D)))
  def mapCoords(f: Coord => Coord): Polygon = Polygon(rings.map(_.map(f)))
}
final case class MultiPoint(ps: IndexedSeq[Point]) extends Geometry {
  def typeName = "MULTIPOINT"
  def force2D: MultiPoint = MultiPoint(ps.map(_.force2D))
  def mapCoords(f: Coord => Coord): MultiPoint = MultiPoint(ps.map(_.mapCoords(f)))
}
final case class MultiLineString(ls: IndexedSeq[LineString]) extends Geometry {
  def typeName = "MULTILINESTRING"
  def force2D: MultiLineString = MultiLineString(ls.map(_.force2D))
  def mapCoords(f: Coord => Coord): MultiLineString = MultiLineString(ls.map(_.mapCoords(f)))
}
final case class MultiPolygon(ps: IndexedSeq[Polygon]) extends Geometry {
  def typeName = "MULTIPOLYGON"
  def force2D: MultiPolygon = MultiPolygon(ps.map(_.force2D))
  def mapCoords(f: Coord => Coord): MultiPolygon = MultiPolygon(ps.map(_.mapCoords(f)))
}
final case class GeometryCollection(gs: IndexedSeq[Geometry]) extends Geometry {
  def typeName = "GEOMETRYCOLLECTION"
  def force2D: GeometryCollection = GeometryCollection(gs.map(_.force2D))
  def mapCoords(f: Coord => Coord): GeometryCollection =
    GeometryCollection(gs.map(_.mapCoords(f)))
}

object Geometry {

  // ---------------------------------------------------------------- GeoJSON

  private val mapper = new ObjectMapper()

  /** Parse GeoJSON text → (geometry, detected type). Returns None on any
    * parse failure — the reference silently skips bad rows
    * (importer.rb:282-284). Accepts bare geometries and Feature objects. */
  def fromGeoJson(text: String): Option[Geometry] =
    try {
      val node = mapper.readTree(text)
      if (node == null || !node.isObject) None else fromGeoJsonNode(node)
    } catch { case _: Exception => None }

  private def fromGeoJsonNode(node: JsonNode): Option[Geometry] = {
    val t = Option(node.get("type")).map(_.asText("")).getOrElse("")
    def coords: JsonNode = node.get("coordinates")
    def pos(n: JsonNode): Coord =
      if (n.size() >= 3) Coord(n.get(0).asDouble, n.get(1).asDouble, n.get(2).asDouble)
      else Coord(n.get(0).asDouble, n.get(1).asDouble)
    def posList(n: JsonNode): IndexedSeq[Coord] =
      (0 until n.size()).map(i => pos(n.get(i)))
    def rings(n: JsonNode): IndexedSeq[IndexedSeq[Coord]] =
      (0 until n.size()).map(i => posList(n.get(i)))
    try {
      t match {
        case "Point"      => Some(Point(pos(coords)))
        case "LineString" => Some(LineString(posList(coords)))
        case "Polygon"    => Some(Polygon(rings(coords)))
        case "MultiPoint" => Some(MultiPoint(posList(coords).map(Point(_))))
        case "MultiLineString" =>
          Some(MultiLineString(rings(coords).map(LineString(_))))
        case "MultiPolygon" =>
          Some(MultiPolygon((0 until coords.size())
            .map(i => Polygon(rings(coords.get(i))))))
        case "GeometryCollection" =>
          val gs = node.get("geometries")
          val parsed = (0 until gs.size()).map(i => fromGeoJsonNode(gs.get(i)))
          if (parsed.exists(_.isEmpty)) None
          else Some(GeometryCollection(parsed.flatten.toIndexedSeq))
        case "Feature" =>
          Option(node.get("geometry")).flatMap(fromGeoJsonNode)
        case _ => None
      }
    } catch { case _: Exception => None }
  }

  /** ST_AsGeoJSON with max decimal digits (spec oracle at
    * import_spec.rb:413-416 uses precision 0). */
  def toGeoJson(g: Geometry, precision: Int = 15): String = {
    val sb = new StringBuilder
    def num(d: Double): String = {
      val bd = BigDecimal(d).setScale(precision, BigDecimal.RoundingMode.HALF_UP)
      val s = bd.bigDecimal.stripTrailingZeros.toPlainString
      if (s == "-0") "0" else s
    }
    def coord(c: Coord): Unit = {
      sb.append('[').append(num(c.x)).append(',').append(num(c.y))
      if (c.is3D) sb.append(',').append(num(c.z))
      sb.append(']')
    }
    def seq[A](xs: Iterable[A])(f: A => Unit): Unit = {
      sb.append('[')
      var first = true
      xs.foreach { x => if (!first) sb.append(','); first = false; f(x) }
      sb.append(']')
    }
    def body(g: Geometry): Unit = g match {
      case Point(c)        => sb.append("\"coordinates\":"); coord(c)
      case LineString(cs)  => sb.append("\"coordinates\":"); seq(cs)(coord)
      case Polygon(rs)     => sb.append("\"coordinates\":"); seq(rs)(r => seq(r)(coord))
      case MultiPoint(ps)  => sb.append("\"coordinates\":"); seq(ps)(p => coord(p.c))
      case MultiLineString(ls) =>
        sb.append("\"coordinates\":"); seq(ls)(l => seq(l.cs)(coord))
      case MultiPolygon(ps) =>
        sb.append("\"coordinates\":"); seq(ps)(p => seq(p.rings)(r => seq(r)(coord)))
      case GeometryCollection(gs) =>
        sb.append("\"geometries\":")
        seq(gs) { sub =>
          sb.append("{\"type\":\"").append(jsonType(sub)).append("\",")
          body(sub); sb.append('}')
        }
    }
    sb.append("{\"type\":\"").append(jsonType(g)).append("\",")
    body(g)
    sb.append('}').toString
  }

  private def jsonType(g: Geometry): String = g match {
    case _: Point => "Point"
    case _: LineString => "LineString"
    case _: Polygon => "Polygon"
    case _: MultiPoint => "MultiPoint"
    case _: MultiLineString => "MultiLineString"
    case _: MultiPolygon => "MultiPolygon"
    case _: GeometryCollection => "GeometryCollection"
  }

  // -------------------------------------------------------------------- WKT

  /** WKT writer (ST_AsText). */
  def toWkt(g: Geometry): String = {
    val sb = new StringBuilder
    def num(d: Double): String =
      if (d == d.toLong.toDouble && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    def coord(c: Coord): Unit = {
      sb.append(num(c.x)).append(' ').append(num(c.y))
      if (c.is3D) sb.append(' ').append(num(c.z))
    }
    def seq[A](xs: Iterable[A], parens: Boolean = true)(f: A => Unit): Unit = {
      if (parens) sb.append('(')
      var first = true
      xs.foreach { x => if (!first) sb.append(','); first = false; f(x) }
      if (parens) sb.append(')')
    }
    def body(g: Geometry): Unit = g match {
      case Point(c)       => sb.append('('); coord(c); sb.append(')')
      case LineString(cs) => seq(cs)(coord)
      case Polygon(rs)    => seq(rs)(r => seq(r)(coord))
      case MultiPoint(ps) => seq(ps)(p => { sb.append('('); coord(p.c); sb.append(')') })
      case MultiLineString(ls) => seq(ls)(l => seq(l.cs)(coord))
      case MultiPolygon(ps)    => seq(ps)(p => seq(p.rings)(r => seq(r)(coord)))
      case GeometryCollection(gs) => seq(gs) { sub =>
        sb.append(sub.typeName); if (isEmptyGeom(sub)) sb.append(" EMPTY") else body(sub)
      }
    }
    sb.append(g.typeName)
    if (isEmptyGeom(g)) sb.append(" EMPTY") else body(g)
    sb.toString
  }

  private def isEmptyGeom(g: Geometry): Boolean = g match {
    case LineString(cs) => cs.isEmpty
    case Polygon(rs) => rs.isEmpty
    case MultiPoint(ps) => ps.isEmpty
    case MultiLineString(ls) => ls.isEmpty
    case MultiPolygon(ps) => ps.isEmpty
    case GeometryCollection(gs) => gs.isEmpty
    case _ => false
  }

  /** WKT parser (ST_GeomFromText). None on malformed input. */
  def fromWkt(wkt: String): Option[Geometry] =
    try Some(new WktParser(wkt).parse()) catch { case _: Exception => None }

  private final class WktParser(s: String) {
    private var i = 0
    private def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      skipWs()
      if (i >= s.length || s.charAt(i) != c) throw new IllegalArgumentException(s"expected $c at $i")
      i += 1
    }
    private def peek(): Char = { skipWs(); if (i < s.length) s.charAt(i) else ' ' }
    private def word(): String = {
      skipWs(); val start = i
      while (i < s.length && (s.charAt(i).isLetter)) i += 1
      s.substring(start, i).toUpperCase
    }
    private def number(): Double = {
      skipWs(); val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      s.substring(start, i).toDouble
    }
    private def coord(dims: Int): Coord = {
      val x = number(); val y = number()
      if (dims >= 3 && "+-0123456789.".indexOf(peek()) >= 0) Coord(x, y, number())
      else Coord(x, y)
    }
    private def coordSeq(dims: Int): IndexedSeq[Coord] = {
      expect('(')
      val b = IndexedSeq.newBuilder[Coord]
      b += coord(dims)
      while (peek() == ',') { i += 1; b += coord(dims) }
      expect(')')
      b.result()
    }
    private def ringSeq(dims: Int): IndexedSeq[IndexedSeq[Coord]] = {
      expect('(')
      val b = IndexedSeq.newBuilder[IndexedSeq[Coord]]
      b += coordSeq(dims)
      while (peek() == ',') { i += 1; b += coordSeq(dims) }
      expect(')')
      b.result()
    }
    def parse(): Geometry = {
      val g = parseGeom()
      skipWs()
      if (i != s.length) throw new IllegalArgumentException("trailing garbage")
      g
    }
    private def parseGeom(): Geometry = {
      val t = word()
      val modifier = { val save = i; val w = word(); if (w == "Z" || w == "ZM" || w == "M") w else { i = save; "" } }
      val dims = if (modifier.startsWith("Z")) 3 else 2
      val saveEmpty = i
      if (word() == "EMPTY") {
        t match {
          case "LINESTRING" => return LineString(Vector.empty)
          case "POLYGON" => return Polygon(Vector.empty)
          case "MULTIPOINT" => return MultiPoint(Vector.empty)
          case "MULTILINESTRING" => return MultiLineString(Vector.empty)
          case "MULTIPOLYGON" => return MultiPolygon(Vector.empty)
          case "GEOMETRYCOLLECTION" => return GeometryCollection(Vector.empty)
          case _ => throw new IllegalArgumentException("EMPTY " + t)
        }
      } else i = saveEmpty
      t match {
        case "POINT" => expect('('); val c = coord(dims); expect(')'); Point(c)
        case "LINESTRING" => LineString(coordSeq(dims))
        case "POLYGON" => Polygon(ringSeq(dims))
        case "MULTIPOINT" =>
          expect('(')
          val b = IndexedSeq.newBuilder[Point]
          def one(): Unit =
            if (peek() == '(') { i += 1; b += Point(coord(dims)); expect(')') }
            else b += Point(coord(dims))
          one()
          while (peek() == ',') { i += 1; one() }
          expect(')')
          MultiPoint(b.result())
        case "MULTILINESTRING" =>
          expect('(')
          val b = IndexedSeq.newBuilder[LineString]
          b += LineString(coordSeq(dims))
          while (peek() == ',') { i += 1; b += LineString(coordSeq(dims)) }
          expect(')')
          MultiLineString(b.result())
        case "MULTIPOLYGON" =>
          expect('(')
          val b = IndexedSeq.newBuilder[Polygon]
          b += Polygon(ringSeq(dims))
          while (peek() == ',') { i += 1; b += Polygon(ringSeq(dims)) }
          expect(')')
          MultiPolygon(b.result())
        case "GEOMETRYCOLLECTION" =>
          expect('(')
          val b = IndexedSeq.newBuilder[Geometry]
          b += parseGeom()
          while (peek() == ',') { i += 1; b += parseGeom() }
          expect(')')
          GeometryCollection(b.result())
        case other => throw new IllegalArgumentException("unknown type " + other)
      }
    }
  }

  // ------------------------------------------------------------------- EWKB

  private val SridFlag = 0x20000000
  private val ZFlag = 0x80000000

  private def wkbTypeCode(g: Geometry): Int = g match {
    case _: Point => 1
    case _: LineString => 2
    case _: Polygon => 3
    case _: MultiPoint => 4
    case _: MultiLineString => 5
    case _: MultiPolygon => 6
    case _: GeometryCollection => 7
  }

  private def has3D(g: Geometry): Boolean = g match {
    case Point(c) => c.is3D
    case LineString(cs) => cs.exists(_.is3D)
    case Polygon(rs) => rs.exists(_.exists(_.is3D))
    case MultiPoint(ps) => ps.exists(p => p.c.is3D)
    case MultiLineString(ls) => ls.exists(l => l.cs.exists(_.is3D))
    case MultiPolygon(ps) => ps.exists(p => p.rings.exists(_.exists(_.is3D)))
    case GeometryCollection(gs) => gs.exists(has3D)
  }

  private def ewkbSize(g: Geometry, topLevel: Boolean): Int = {
    val z = has3D(g)
    val coordSz = if (z) 24 else 16
    val hdr = 5 + (if (topLevel) 4 else 0) // byte order + type + (srid)
    hdr + (g match {
      case Point(_) => coordSz
      case LineString(cs) => 4 + cs.length * coordSz
      case Polygon(rs) => 4 + rs.map(r => 4 + r.length * coordSz).sum
      case MultiPoint(ps) => 4 + ps.map(p => ewkbSize(p, topLevel = false)).sum
      case MultiLineString(ls) => 4 + ls.map(l => ewkbSize(l, topLevel = false)).sum
      case MultiPolygon(ps) => 4 + ps.map(p => ewkbSize(p, topLevel = false)).sum
      case GeometryCollection(gs) => 4 + gs.map(x => ewkbSize(x, topLevel = false)).sum
    })
  }

  /** Serialize to little-endian EWKB with embedded SRID on the top-level
    * geometry (PostGIS format). */
  def toEwkb(g: Geometry, srid: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(ewkbSize(g, topLevel = true))
      .order(ByteOrder.LITTLE_ENDIAN)
    write(buf, g, Some(srid))
    buf.array()
  }

  private def write(buf: ByteBuffer, g: Geometry, srid: Option[Int]): Unit = {
    val z = has3D(g)
    buf.put(1.toByte) // little-endian
    var tc = wkbTypeCode(g)
    if (z) tc |= ZFlag
    if (srid.isDefined) tc |= SridFlag
    buf.putInt(tc)
    srid.foreach(buf.putInt)
    def putC(c: Coord): Unit = {
      buf.putDouble(c.x); buf.putDouble(c.y)
      if (z) buf.putDouble(if (c.is3D) c.z else 0.0)
    }
    g match {
      case Point(c) => putC(c)
      case LineString(cs) => buf.putInt(cs.length); cs.foreach(putC)
      case Polygon(rs) =>
        buf.putInt(rs.length)
        rs.foreach { r => buf.putInt(r.length); r.foreach(putC) }
      case MultiPoint(ps) => buf.putInt(ps.length); ps.foreach(write(buf, _, None))
      case MultiLineString(ls) => buf.putInt(ls.length); ls.foreach(write(buf, _, None))
      case MultiPolygon(ps) => buf.putInt(ps.length); ps.foreach(write(buf, _, None))
      case GeometryCollection(gs) => buf.putInt(gs.length); gs.foreach(write(buf, _, None))
    }
  }

  /** Parse (E)WKB, big- or little-endian → (geometry, srid if present). */
  def fromEwkb(bytes: Array[Byte]): Option[(Geometry, Option[Int])] =
    try {
      val buf = ByteBuffer.wrap(bytes)
      Some(read(buf))
    } catch { case _: Exception => None }

  private def read(buf: ByteBuffer): (Geometry, Option[Int]) = {
    buf.order(if (buf.get() == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val tc = buf.getInt
    val hasZ = (tc & ZFlag) != 0
    val srid = if ((tc & SridFlag) != 0) Some(buf.getInt) else None
    def getC(): Coord =
      if (hasZ) Coord(buf.getDouble, buf.getDouble, buf.getDouble)
      else Coord(buf.getDouble, buf.getDouble)
    def getCs(): IndexedSeq[Coord] = IndexedSeq.fill(buf.getInt)(getC())
    val g = (tc & 0xFF) match {
      case 1 => Point(getC())
      case 2 => LineString(getCs())
      case 3 => Polygon(IndexedSeq.fill(buf.getInt)(getCs()))
      case 4 => MultiPoint(IndexedSeq.fill(buf.getInt)(read(buf)._1.asInstanceOf[Point]))
      case 5 => MultiLineString(IndexedSeq.fill(buf.getInt)(read(buf)._1.asInstanceOf[LineString]))
      case 6 => MultiPolygon(IndexedSeq.fill(buf.getInt)(read(buf)._1.asInstanceOf[Polygon]))
      case 7 => GeometryCollection(IndexedSeq.fill(buf.getInt)(read(buf)._1))
      case other => throw new IllegalArgumentException("wkb type " + other)
    }
    (g, srid)
  }

  /** SRID stored in an EWKB blob, defaulting to 0 (PostGIS "unknown"). */
  def sridOf(bytes: Array[Byte]): Int =
    fromEwkb(bytes).flatMap(_._2).getOrElse(0)
}
