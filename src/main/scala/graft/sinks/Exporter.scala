package graft.sinks

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.geo.{Geometry, LineString, MultiLineString, MultiPoint, MultiPolygon, Point => GPoint, Polygon => GPolygon, GeometryCollection}

/**
 * Export sinks (SURVEY.md §2.1 S11-S13, reference exporter.rb:43-161):
 * table → zipped CSV, `.kmz` (doc.kml), or zipped shapefile set. Result
 * record mirrors the reference's {name, import_type, path}
 * (exporter.rb:67-71,88-92,155-159).
 *
 * Scale note: the reference's export contract is "one archive file", so
 * the row stream is funneled through the driver (toLocalIterator — bounded
 * memory, not collect). Multi-file distributed export is just
 * `df.write.csv(dir)`; these sinks exist for reference parity.
 */
object Exporter {

  final case class ExportResult(name: String, importType: String, path: String)

  private def outPath(dir: String, name: String): String = {
    new File(dir).mkdirs()
    s"$dir/exporting_${java.util.UUID.randomUUID().toString.take(8)}_$name"
  }

  /** S11: CSV zip — archive holds `<name>.csv` (exporter.rb:53-73). */
  def exportCsv(df: DataFrame, name: String,
      dir: String = System.getProperty("java.io.tmpdir")): ExportResult = {
    val path = outPath(dir, name)
    val zipFile = s"$path.zip"
    val zos = new ZipOutputStream(new FileOutputStream(zipFile))
    try {
      zos.putNextEntry(new ZipEntry(s"$name.csv"))
      val w = new java.io.PrintWriter(new java.io.OutputStreamWriter(zos, StandardCharsets.UTF_8))
      w.println(df.columns.map(csvCell).mkString(","))
      df.toLocalIterator().forEachRemaining { row =>
        w.println(df.columns.indices.map { i =>
          val v = row.get(i)
          if (v == null) "" else csvCell(v.toString)
        }.mkString(","))
      }
      w.flush()
      zos.closeEntry()
    } finally zos.close()
    ExportResult(name, ".csv", zipFile)
  }

  private def csvCell(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /**
   * Distributed variant of the CSV export: EXECUTORS serialize the rows
   * (`df.write.csv` part files, RFC-4180 doubled-quote style to match
   * `csvCell`), and the driver only streams the part files' raw bytes
   * into the single-archive contract — it never decodes a row. The zip
   * itself is inherently a sequential artifact, so O(bytes) must pass
   * through one node either way; this removes the per-row
   * serialize-on-driver cost that `exportCsv`'s toLocalIterator funnel
   * pays (the remaining driver work is a buffer copy). Same
   * one-`<name>.csv`-entry archive as `exportCsv`.
   */
  def exportCsvDistributed(df: DataFrame, name: String,
      dir: String = System.getProperty("java.io.tmpdir")): ExportResult = {
    val path = outPath(dir, name)
    val partsDir = s"${path}_parts"
    df.write
      .option("header", "false")
      .option("emptyValue", "")
      .option("escape", "\"") // doubled-quote escaping, like csvCell
      .csv(partsDir)
    val zipFile = s"$path.zip"
    val zos = new ZipOutputStream(new FileOutputStream(zipFile))
    try {
      zos.putNextEntry(new ZipEntry(s"$name.csv"))
      val header = (df.columns.map(csvCell).mkString(",") + "\n")
        .getBytes(StandardCharsets.UTF_8)
      zos.write(header)
      val parts = Option(new File(partsDir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
        .sortBy(_.getName)
      val buf = new Array[Byte](1 << 16)
      parts.foreach { p =>
        val in = new java.io.FileInputStream(p)
        try {
          var n = in.read(buf)
          while (n > 0) { zos.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
      }
      zos.closeEntry()
    } finally zos.close()
    Option(new File(partsDir).listFiles()).foreach(_.foreach(_.delete()))
    new File(partsDir).delete()
    ExportResult(name, ".csv", zipFile)
  }

  /** S12: KML/KMZ — `<Placemark>` per row with ExtendedData, zipped as
    * `doc.kml` inside a `.kmz` (exporter.rb:74-94). */
  def exportKml(df: DataFrame, name: String, geomCol: String = "the_geom",
      dir: String = System.getProperty("java.io.tmpdir")): ExportResult = {
    val path = outPath(dir, name)
    val kmzFile = s"$path.kmz"
    val attrCols = df.columns.filterNot(_ == geomCol)
    val hasGeom = df.columns.contains(geomCol)
    val zos = new ZipOutputStream(new FileOutputStream(kmzFile))
    try {
      zos.putNextEntry(new ZipEntry("doc.kml"))
      val w = new java.io.PrintWriter(new java.io.OutputStreamWriter(zos, StandardCharsets.UTF_8))
      w.println("""<?xml version="1.0" encoding="UTF-8"?>""")
      w.println("""<kml xmlns="http://www.opengis.net/kml/2.2"><Document>""")
      w.println(s"<name>${xmlEscape(name)}</name>")
      df.toLocalIterator().forEachRemaining { row =>
        w.println("<Placemark>")
        if (attrCols.nonEmpty) {
          w.println("<ExtendedData>")
          attrCols.foreach { c =>
            val v = row.getAs[Any](c)
            if (v != null)
              w.println(s"""<Data name="${xmlEscape(c)}"><value>${xmlEscape(v.toString)}</value></Data>""")
          }
          w.println("</ExtendedData>")
        }
        if (hasGeom) {
          Option(row.getAs[Array[Byte]](geomCol))
            .flatMap(Geometry.fromEwkb).map(_._1)
            .foreach(g => w.println(kmlGeometry(g)))
        }
        w.println("</Placemark>")
      }
      w.println("</Document></kml>")
      w.flush()
      zos.closeEntry()
    } finally zos.close()
    ExportResult(name, ".kml", kmzFile)
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def coordText(cs: Seq[graft.core.geo.Coord]): String =
    cs.map(c => s"${c.x},${c.y}").mkString(" ")

  def kmlGeometry(g: Geometry): String = g match {
    case GPoint(c) => s"<Point><coordinates>${c.x},${c.y}</coordinates></Point>"
    case LineString(cs) =>
      s"<LineString><coordinates>${coordText(cs)}</coordinates></LineString>"
    case GPolygon(rings) =>
      val outer = rings.headOption.map(r =>
        s"<outerBoundaryIs><LinearRing><coordinates>${coordText(r)}</coordinates></LinearRing></outerBoundaryIs>").getOrElse("")
      val inner = rings.drop(1).map(r =>
        s"<innerBoundaryIs><LinearRing><coordinates>${coordText(r)}</coordinates></LinearRing></innerBoundaryIs>").mkString
      s"<Polygon>$outer$inner</Polygon>"
    case MultiPoint(ps) =>
      s"<MultiGeometry>${ps.map(kmlGeometry).mkString}</MultiGeometry>"
    case MultiLineString(ls) =>
      s"<MultiGeometry>${ls.map(kmlGeometry).mkString}</MultiGeometry>"
    case MultiPolygon(ps) =>
      s"<MultiGeometry>${ps.map(kmlGeometry).mkString}</MultiGeometry>"
    case GeometryCollection(gs) =>
      s"<MultiGeometry>${gs.map(kmlGeometry).mkString}</MultiGeometry>"
  }

  /** S13: zipped shapefile set `.shp .shx .dbf .prj` (exporter.rb:95-161;
    * the reference also lists `.sbn`, a spatial-index side file its own
    * toolchain never produces — mirrored by omission). */
  def exportShp(df: DataFrame, name: String, geomCol: String = "the_geom",
      dir: String = System.getProperty("java.io.tmpdir")): ExportResult = {
    val path = outPath(dir, name)
    val zipFile = s"$path.zip"
    val attrFields = df.schema.fields.filterNot(_.name == geomCol)
    val specs = attrFields.map(f => f.dataType match {
      case LongType | IntegerType | ShortType => DbfWriter.FieldSpec(f.name, 'N', 18, 0)
      case DoubleType | FloatType => DbfWriter.FieldSpec(f.name, 'N', 24, 6)
      case d: DecimalType => DbfWriter.FieldSpec(f.name, 'N', math.min(d.precision + 2, 24), d.scale)
      case DateType => DbfWriter.FieldSpec(f.name, 'D', 8, 0)
      case BooleanType => DbfWriter.FieldSpec(f.name, 'L', 1, 0)
      case _ => DbfWriter.FieldSpec(f.name, 'C', 254, 0)
    }).toIndexedSeq
    val geoms = IndexedSeq.newBuilder[Option[Geometry]]
    val recs = IndexedSeq.newBuilder[Seq[Any]]
    val hasGeom = df.columns.contains(geomCol)
    df.toLocalIterator().forEachRemaining { row =>
      geoms += (if (hasGeom) Option(row.getAs[Array[Byte]](geomCol))
        .flatMap(Geometry.fromEwkb).map(_._1) else None)
      recs += attrFields.map(f => row.getAs[Any](f.name)).toSeq
    }
    val pair = ShpWriter.write(geoms.result())
    val dbf = DbfWriter.write(specs, recs.result())
    val prj = Wgs84Prj
    val zos = new ZipOutputStream(new FileOutputStream(zipFile))
    try {
      def entry(ext: String, bytes: Array[Byte]): Unit = {
        zos.putNextEntry(new ZipEntry(s"$name$ext")); zos.write(bytes); zos.closeEntry()
      }
      entry(".shp", pair.shp)
      entry(".shx", pair.shx)
      entry(".dbf", dbf)
      entry(".prj", prj.getBytes(StandardCharsets.US_ASCII))
    } finally zos.close()
    ExportResult(name, ".shp", zipFile)
  }

  /** ESRI WKT for EPSG:4326 (public well-known text). */
  val Wgs84Prj: String =
    """GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["Degree",0.017453292519943295]]"""
}
