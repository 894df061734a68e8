package graft.sources

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Spreadsheet source (SURVEY.md §2.1 S4): XLSX (OOXML, a ZIP of XML parts —
 * parsed with StAX, no POI needed offline). The reference converts sheets
 * to CSV text first and re-enters the CSV path (importer.rb:124-140,
 * "via CSV" semantics: every cell is a string, then the type lattice runs);
 * reproduced by the shared SpreadsheetRows tail. Legacy binary .xls is
 * handled by XlsImport, ODS by OdsImport — same contract.
 */
object XlsxImport {

  /** Parse sheet1 of an .xlsx into rows of strings (header row included). */
  def parseXlsx(path: String): Seq[IndexedSeq[String]] = {
    val zf = new ZipFile(path)
    try {
      val shared = Option(zf.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zf.getInputStream(e))).getOrElse(IndexedSeq.empty)
      val sheetEntry = Option(zf.getEntry("xl/worksheets/sheet1.xml"))
        .getOrElse(throw new IllegalArgumentException(s"no sheet1 in $path"))
      parseSheet(zf.getInputStream(sheetEntry), shared)
    } finally zf.close()
  }

  private def newReader(in: InputStream) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(in)
  }

  private def parseSharedStrings(in: InputStream): IndexedSeq[String] = {
    val r = newReader(in)
    val out = IndexedSeq.newBuilder[String]
    var current: StringBuilder = null
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
          current = new StringBuilder
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "t" && current != null =>
          current.append(r.getElementText)
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
          out += current.toString; current = null
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  /** A1-style column reference → 0-based index ("A"→0, "AB"→27). */
  def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def parseSheet(in: InputStream, shared: IndexedSeq[String]): Seq[IndexedSeq[String]] = {
    val r = newReader(in)
    val rows = Seq.newBuilder[IndexedSeq[String]]
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cellCol = 0
    var cellType = ""
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row = scala.collection.mutable.ArrayBuffer.empty[String]
          case "c" if row != null =>
            cellCol = Option(r.getAttributeValue(null, "r"))
              .map(colIndex).getOrElse(row.length)
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
          case "v" if row != null =>
            val raw = r.getElementText
            val v = if (cellType == "s")
              shared.lift(raw.toInt).getOrElse(raw) else raw
            while (row.length < cellCol) row += "" // fill skipped blanks
            row += v
          case "t" if row != null && cellType == "inlineStr" =>
            while (row.length < cellCol) row += ""
            row += r.getElementText
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "row" && row != null =>
          rows += row.toIndexedSeq; row = null
        case _ =>
      }
    }
    r.close()
    rows.result()
  }

  /** XLSX → typed DataFrame via the CSV-path semantics. */
  def read(spark: SparkSession, path: String, inferTypes: Boolean = true): DataFrame =
    SpreadsheetRows.toDataFrame(spark, parseXlsx(path), path, inferTypes)
}
