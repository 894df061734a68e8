package graft.sources

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * OpenDocument Spreadsheet source (SURVEY.md §2.1 S4, the `.ods` half of
 * the reference's roo-based spreadsheet path, importer.rb:124-140): an
 * ODS file is a ZIP whose `content.xml` holds the sheet; cells are
 * `table:table-cell` elements with text content and an optional
 * `table:number-columns-repeated` run-length. Same "via CSV" semantics as
 * XLSX: all cells read as strings, then the A3 lattice types them.
 */
object OdsImport {

  def parseOds(path: String): Seq[IndexedSeq[String]] = {
    val zf = new ZipFile(path)
    try {
      val entry = Option(zf.getEntry("content.xml"))
        .getOrElse(throw new IllegalArgumentException(s"no content.xml in $path"))
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
      val r = f.createXMLStreamReader(zf.getInputStream(entry))
      val rows = Seq.newBuilder[IndexedSeq[String]]
      var row: scala.collection.mutable.ArrayBuffer[String] = null
      var cellRepeat = 1
      var cellText: StringBuilder = null
      var inFirstTable = true
      var tableSeen = false
      while (r.hasNext && inFirstTable) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "table" =>
              if (tableSeen) inFirstTable = false else tableSeen = true
            case "table-row" if tableSeen =>
              row = scala.collection.mutable.ArrayBuffer.empty[String]
            case "table-cell" | "covered-table-cell" if row != null =>
              cellRepeat = Option(r.getAttributeValue(null, "number-columns-repeated"))
                .map(_.toInt).getOrElse(1)
              cellText = new StringBuilder
            case "p" if cellText != null =>
              // text:p content; may occur multiple times (multiline cells)
              if (cellText.nonEmpty) cellText.append('\n')
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS if cellText != null =>
            cellText.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "table-cell" | "covered-table-cell" if row != null =>
              val v = cellText.toString
              // huge repeat counts pad to the row's default width; cap to
              // avoid materializing the 16k-column ODS default
              val rep = math.min(cellRepeat, 2048)
              (0 until rep).foreach(_ => row += v)
              cellText = null
            case "table-row" if row != null =>
              // trim trailing empty cells (ODS pads rows to table width)
              val trimmed = row.reverse.dropWhile(_.isEmpty).reverse
              if (trimmed.nonEmpty) rows += trimmed.toIndexedSeq
              row = null
            case "table" => inFirstTable = false
            case _ =>
          }
          case _ =>
        }
      }
      r.close()
      rows.result()
    } finally zf.close()
  }

  def read(spark: SparkSession, path: String, inferTypes: Boolean = true): DataFrame =
    SpreadsheetRows.toDataFrame(spark, parseOds(path), path, inferTypes)
}
