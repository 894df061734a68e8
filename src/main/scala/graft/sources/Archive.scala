package graft.sources

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

/**
 * ZIP/KMZ acquire stage (SURVEY.md §2.1 S3, §2.2 P2): extract entries to a
 * temp dir, skip `.`/`__MACOSX` junk, pick the first entry with a
 * supported extension as the payload (importer.rb:98-115).
 */
object Archive {

  /** Supported payload extensions, lowercase with dot (importer.rb:13). */
  val SupportedFormats: Seq[String] = Seq(
    ".csv", ".shp", ".ods", ".xls", ".xlsx", ".tif", ".tiff",
    ".kml", ".kmz", ".js", ".json", ".geojson", ".gpx")

  final case class Extracted(payload: File, all: Seq[File], dir: File)

  private val JunkEntry = "^(\\.|_{2})".r

  /** Unzip `zipPath`, return the chosen payload + every extracted file.
    * Throws if no supported payload is present. */
  def extract(zipPath: String): Extracted = {
    val dir = Files.createTempDirectory("graft_unzip_").toFile
    val zf = new ZipFile(zipPath)
    val files = try {
      zf.entries().asScala.filterNot(_.isDirectory).flatMap { e =>
        val name = new File(e.getName).getName // flatten paths
        val pathParts = e.getName.split("/")
        // junk filter applies to any path segment (.__MACOSX/._foo …)
        if (pathParts.exists(p => JunkEntry.findFirstIn(p).isDefined)) None
        else {
          val out = new File(dir, name)
          val os = new FileOutputStream(out)
          try zf.getInputStream(e).transferTo(os) finally os.close()
          Some(out)
        }
      }.toSeq
    } finally zf.close()
    val payload = files.find(f => SupportedFormats.exists(ext =>
      f.getName.toLowerCase.endsWith(ext)))
      .getOrElse(throw new IllegalArgumentException(
        s"no supported payload in $zipPath (entries: ${files.map(_.getName).mkString(", ")})"))
    Extracted(payload, files, dir)
  }

  /** Best-effort recursive cleanup (D7). */
  def cleanup(dir: File): Unit = {
    Option(dir.listFiles()).foreach(_.foreach(_.delete()))
    dir.delete()
  }
}
