package graft.sources

import java.io.StringReader
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.geo.{Coord, Geometry, GeometryCollection, LineString, MultiPolygon, Point => GPoint, Polygon => GPolygon}

/**
 * KML source (SURVEY.md §2.1 S6): one row per `<Placemark>` — `name`,
 * `description`, `<SchemaData>/<ExtendedData>` fields as string columns,
 * geometry (Point/LineString/Polygon/MultiGeometry) → `the_geom` EWKB in
 * 4326 (KML is always WGS84 per the OGC spec). Replaces the reference's
 * ogr2ogr KML→SHP detour (importer.rb:175-190).
 *
 * StAX streaming parse — constant memory; per-file driver parse for the
 * single-file import path (KML is a single-document format; bulk corpora
 * fan out file-per-task upstream of this call).
 */
object KmlImport {

  final case class Placemark(
      name: Option[String], description: Option[String],
      data: Map[String, String], geom: Option[Geometry])

  def parse(xml: String): Seq[Placemark] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(new StringReader(xml))
    val out = Seq.newBuilder[Placemark]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Placemark")
        out += parsePlacemark(r)
    }
    r.close()
    out.result()
  }

  private def parsePlacemark(r: XMLStreamReader): Placemark = {
    var name: Option[String] = None
    var desc: Option[String] = None
    val data = Map.newBuilder[String, String]
    val geoms = Seq.newBuilder[Geometry]
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "name" => name = Some(collectText(r, "name"))
            case "description" => desc = Some(collectText(r, "description"))
            case "SimpleData" =>
              val key = Option(r.getAttributeValue(null, "name")).getOrElse("data")
              data += key -> collectText(r, "SimpleData")
            case "Data" => // <Data name=..><value>text</value></Data>
              val key = Option(r.getAttributeValue(null, "name")).getOrElse("data")
              data += key -> collectText(r, "Data")
            case "Point" => geoms ++= parseGeom(r, "Point")
            case "LineString" => geoms ++= parseGeom(r, "LineString")
            case "Polygon" => geoms ++= parseGeom(r, "Polygon")
            case _ => depth += 1; depth -= 1 // plain descend
          }
        case XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "Placemark") depth = 0
        case _ =>
      }
    }
    val gs = geoms.result()
    val geom = gs.length match {
      case 0 => None
      case 1 => Some(gs.head)
      case _ =>
        // MultiGeometry of same-type polygons → MultiPolygon (common case)
        if (gs.forall(_.isInstanceOf[GPolygon]))
          Some(MultiPolygon(gs.map(_.asInstanceOf[GPolygon]).toIndexedSeq))
        else Some(GeometryCollection(gs.toIndexedSeq))
    }
    Placemark(name, desc, data.result(), geom)
  }

  /** Gather character/CDATA content until the matching END of `tag`,
    * tolerating nested markup (e.g. `<Data><value>…</value></Data>`,
    * HTML-ish descriptions). */
  private def collectText(r: XMLStreamReader, tag: String): String = {
    val sb = new StringBuilder
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          sb.append(r.getText)
        case XMLStreamConstants.START_ELEMENT => depth += 1
        case XMLStreamConstants.END_ELEMENT => depth -= 1 // balanced XML:
          // depth 0 is necessarily the matching close of `tag`
        case _ =>
      }
    }
    sb.toString.trim
  }

  /** Parse a geometry element until its END, reading `<coordinates>`. */
  private def parseGeom(r: XMLStreamReader, kind: String): Option[Geometry] = {
    val rings = Seq.newBuilder[IndexedSeq[Coord]]
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (r.getLocalName == "coordinates") rings += parseCoords(r.getElementText)
          else depth += 0
        case XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == kind) depth = 0
        case _ =>
      }
    }
    val rs = rings.result()
    if (rs.isEmpty) None
    else kind match {
      case "Point" => rs.head.headOption.map(GPoint(_))
      case "LineString" => Some(LineString(rs.head))
      case "Polygon" => Some(GPolygon(rs.toIndexedSeq))
    }
  }

  /** KML coordinate text: whitespace-separated `lon,lat[,alt]` tuples. */
  def parseCoords(text: String): IndexedSeq[Coord] =
    text.trim.split("\\s+").toIndexedSeq.filter(_.nonEmpty).flatMap { tuple =>
      val parts = tuple.split(",")
      if (parts.length >= 2)
        try Some(Coord(parts(0).toDouble, parts(1).toDouble)) // force 2D
        catch { case _: Exception => None }
      else None
    }

  def read(spark: SparkSession, path: String): DataFrame = {
    val xml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
    val pms = parse(xml)
    // column set = name, description, union of data keys (document order)
    val dataKeys = pms.flatMap(_.data.keys).distinct
    val schema = StructType(
      Seq(StructField("name", StringType), StructField("description", StringType)) ++
      dataKeys.map(k => StructField(k, StringType)) :+
      StructField("the_geom", BinaryType))
    val rows = pms.map { p =>
      Row.fromSeq(
        Seq(p.name.orNull, p.description.orNull) ++
        dataKeys.map(k => p.data.get(k).orNull) :+
        p.geom.map(g => Geometry.toEwkb(g.force2D, 4326)).orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 10000)), schema)
  }
}
