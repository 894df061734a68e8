package graft.sinks

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import graft.core.geo._

/**
 * ESRI Shapefile writer (.shp + .shx) — SURVEY.md §2.1 S13's core. Layout
 * per the public ESRI Shapefile Technical Description; supports Point,
 * MultiPoint, LineString/MultiLineString (polyline), Polygon/MultiPolygon
 * (rings flattened, outer rings clockwise per convention).
 */
object ShpWriter {

  final case class ShpPair(shp: Array[Byte], shx: Array[Byte])

  def shapeTypeOf(g: Geometry): Int = g match {
    case _: Point => 1
    case _: MultiPoint => 8
    case _: LineString | _: MultiLineString => 3
    case _: Polygon | _: MultiPolygon => 5
    case _ => 0
  }

  /** Record content bytes WITHOUT the 8-byte record header (null shape
    * for None) — the unit a distributed exporter serializes on executors;
    * the driver prepends headers, which need the global record number. */
  def recordContent(gOpt: Option[Geometry]): Array[Byte] =
    gOpt.map(shapeContent).getOrElse {
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(0); b.array() // null shape
    }

  /** Fold a geometry's coords into a running (minX,minY,maxX,maxY). */
  def accumBBox(g: Geometry, acc: Array[Double]): Unit =
    foreachCoord(g) { c =>
      acc(0) = math.min(acc(0), c.x); acc(1) = math.min(acc(1), c.y)
      acc(2) = math.max(acc(2), c.x); acc(3) = math.max(acc(3), c.y)
    }

  /** 100-byte .shp/.shx file header (public layout, both files share it). */
  def fileHeader(shapeType: Int, bbox: (Double, Double, Double, Double),
      fileLenWords: Int): Array[Byte] = {
    val h = ByteBuffer.allocate(100)
    h.order(ByteOrder.BIG_ENDIAN)
    h.putInt(9994); h.put(new Array[Byte](20)); h.putInt(fileLenWords)
    h.order(ByteOrder.LITTLE_ENDIAN)
    h.putInt(1000); h.putInt(shapeType)
    h.putDouble(bbox._1).putDouble(bbox._2).putDouble(bbox._3).putDouble(bbox._4)
    h.putDouble(0).putDouble(0).putDouble(0).putDouble(0) // Z/M ranges
    h.array()
  }

  def write(geoms: Seq[Option[Geometry]]): ShpPair = {
    val shapeType = geoms.flatten.headOption.map(shapeTypeOf).getOrElse(0)
    val records = new ByteArrayOutputStream()
    val index = new ByteArrayOutputStream()
    var offsetWords = 50 // header = 100 bytes = 50 words
    val box = Array(Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)

    geoms.zipWithIndex.foreach { case (gOpt, i) =>
      val content = recordContent(gOpt)
      gOpt.foreach(accumBBox(_, box))
      val recHdr = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
      recHdr.putInt(i + 1).putInt(content.length / 2)
      records.write(recHdr.array())
      records.write(content)
      val idx = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
      idx.putInt(offsetWords).putInt(content.length / 2)
      index.write(idx.array())
      offsetWords += 4 + content.length / 2
    }
    if (geoms.flatten.isEmpty) { box(0) = 0; box(1) = 0; box(2) = 0; box(3) = 0 }

    val shpBody = records.toByteArray
    val shxBody = index.toByteArray
    val bbox = (box(0), box(1), box(2), box(3))
    ShpPair(
      fileHeader(shapeType, bbox, 50 + shpBody.length / 2) ++ shpBody,
      fileHeader(shapeType, bbox, 50 + shxBody.length / 2) ++ shxBody)
  }

  private def foreachCoord(g: Geometry)(f: Coord => Unit): Unit = g match {
    case Point(c) => f(c)
    case LineString(cs) => cs.foreach(f)
    case Polygon(rs) => rs.foreach(_.foreach(f))
    case MultiPoint(ps) => ps.foreach(p => f(p.c))
    case MultiLineString(ls) => ls.foreach(_.cs.foreach(f))
    case MultiPolygon(ps) => ps.foreach(_.rings.foreach(_.foreach(f)))
    case GeometryCollection(gs) => gs.foreach(foreachCoord(_)(f))
  }

  private def bbox(g: Geometry): (Double, Double, Double, Double) = {
    var (a, b, c, d) = (Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)
    foreachCoord(g) { p =>
      a = math.min(a, p.x); b = math.min(b, p.y)
      c = math.max(c, p.x); d = math.max(d, p.y)
    }
    (a, b, c, d)
  }

  private def shapeContent(g: Geometry): Array[Byte] = g match {
    case Point(c) =>
      val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1).putDouble(c.x).putDouble(c.y); b.array()
    case MultiPoint(ps) =>
      val b = ByteBuffer.allocate(4 + 32 + 4 + ps.length * 16).order(ByteOrder.LITTLE_ENDIAN)
      val (x0, y0, x1, y1) = bbox(g)
      b.putInt(8).putDouble(x0).putDouble(y0).putDouble(x1).putDouble(y1)
      b.putInt(ps.length)
      ps.foreach(p => b.putDouble(p.c.x).putDouble(p.c.y))
      b.array()
    case _ => // polyline / polygon share the parts layout
      val (stype, parts) = g match {
        case LineString(cs) => (3, IndexedSeq(cs))
        case MultiLineString(ls) => (3, ls.map(_.cs))
        case Polygon(rs) => (5, rs)
        case MultiPolygon(ps) => (5, ps.flatMap(_.rings))
        case other => throw new IllegalArgumentException("unsupported: " + other.typeName)
      }
      val npts = parts.map(_.length).sum
      val b = ByteBuffer.allocate(4 + 32 + 8 + parts.length * 4 + npts * 16)
        .order(ByteOrder.LITTLE_ENDIAN)
      val (x0, y0, x1, y1) = bbox(g)
      b.putInt(stype).putDouble(x0).putDouble(y0).putDouble(x1).putDouble(y1)
      b.putInt(parts.length).putInt(npts)
      var acc = 0
      parts.foreach { p => b.putInt(acc); acc += p.length }
      parts.foreach(_.foreach(c => b.putDouble(c.x).putDouble(c.y)))
      b.array()
  }
}
