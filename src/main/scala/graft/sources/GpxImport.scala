package graft.sources

import java.io.StringReader
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.geo.{Coord, Geometry, Point => GPoint}

/**
 * GPX source (SURVEY.md §2.1 S5): flattens `<trkpt>` track points to a
 * point table, mirroring the reference's ogr2ogr `track_points` layer
 * selection (importer.rb:145-173): columns track_fid / track_seg_id /
 * track_seg_point_id / ele / time + `the_geom`. Timestamps stay STRING —
 * the reference forces `-fieldTypeToString DateTime` (F14).
 */
object GpxImport {

  final case class TrackPoint(
      trackFid: Int, segId: Int, pointId: Int,
      lat: Double, lon: Double, ele: Option[Double], time: Option[String])

  def parse(xml: String): Seq[TrackPoint] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(new StringReader(xml))
    val out = Seq.newBuilder[TrackPoint]
    var trk = -1; var seg = -1; var pt = -1
    var lat = 0.0; var lon = 0.0
    var ele: Option[Double] = None; var time: Option[String] = None
    var inTrkpt = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "trk" => trk += 1; seg = -1
          case "trkseg" => seg += 1; pt = -1
          case "trkpt" =>
            inTrkpt = true; pt += 1
            lat = r.getAttributeValue(null, "lat").toDouble
            lon = r.getAttributeValue(null, "lon").toDouble
            ele = None; time = None
          case "ele" if inTrkpt =>
            ele = try Some(r.getElementText.toDouble) catch { case _: Exception => None }
          case "time" if inTrkpt => time = Some(r.getElementText)
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "trkpt" =>
          inTrkpt = false
          out += TrackPoint(trk, seg, pt, lat, lon, ele, time)
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val xml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
    val pts = parse(xml)
    val schema = StructType(Seq(
      StructField("track_fid", IntegerType),
      StructField("track_seg_id", IntegerType),
      StructField("track_seg_point_id", IntegerType),
      StructField("ele", DoubleType),
      StructField("time", StringType), // F14: datetimes coerced to string
      StructField("the_geom", BinaryType)))
    val rows = pts.map { p =>
      Row(p.trackFid, p.segId, p.pointId,
        p.ele.map(Double.box).orNull, p.time.orNull,
        Geometry.toEwkb(GPoint(Coord(p.lon, p.lat)), 4326))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 10000)), schema)
  }
}
