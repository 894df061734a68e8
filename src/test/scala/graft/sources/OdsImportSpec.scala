package graft.sources

import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class OdsImportSpec extends AnyFunSuite with SparkTestBase {

  private def makeOds(): String = {
    val content =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<office:document-content
        |  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
        |  xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"
        |  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
        | <office:body><office:spreadsheet>
        |  <table:table table:name="Sheet1">
        |   <table:table-row>
        |    <table:table-cell><text:p>ID</text:p></table:table-cell>
        |    <table:table-cell><text:p>Name City</text:p></table:table-cell>
        |    <table:table-cell><text:p>Price</text:p></table:table-cell>
        |   </table:table-row>
        |   <table:table-row>
        |    <table:table-cell office:value-type="float" office:value="1"><text:p>1</text:p></table:table-cell>
        |    <table:table-cell><text:p>Madrid</text:p></table:table-cell>
        |    <table:table-cell><text:p>3,14</text:p></table:table-cell>
        |   </table:table-row>
        |   <table:table-row>
        |    <table:table-cell><text:p>2</text:p></table:table-cell>
        |    <table:table-cell table:number-columns-repeated="2"><text:p>x</text:p></table:table-cell>
        |    <table:table-cell table:number-columns-repeated="1000"/>
        |   </table:table-row>
        |  </table:table>
        |  <table:table table:name="Sheet2">
        |   <table:table-row><table:table-cell><text:p>ignored</text:p></table:table-cell></table:table-row>
        |  </table:table>
        | </office:spreadsheet></office:body>
        |</office:document-content>""".stripMargin
    val f = java.nio.file.Files.createTempFile("graft_test_", ".ods")
    val zos = new ZipOutputStream(java.nio.file.Files.newOutputStream(f))
    zos.putNextEntry(new ZipEntry("mimetype"))
    zos.write("application/vnd.oasis.opendocument.spreadsheet".getBytes)
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("content.xml"))
    zos.write(content.getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    f.toString
  }

  test("ODS via-CSV semantics: header sanitize + lattice typing + repeats") {
    val r = Importer.importFile(spark, Importer.ImportRequest(
      importFromFile = Some(makeOds())))
    assert(r.importType == ".ods")
    assert(r.rowsImported == 2)
    assert(r.df.columns.toSeq == Seq("id", "name_city", "price"))
    assert(r.df.schema("id").dataType.typeName == "long")      // all-int
    // "3,14" first → float, which is STICKY in the reference lattice
    // (importer.rb has no demotion branch for float) — "x" casts to null
    assert(r.df.schema("price").dataType.typeName == "double")
    val rows = r.df.orderBy(col("id")).collect()
    assert(rows(0).getString(1) == "Madrid")
    assert(rows(0).getDouble(2) == 3.14) // comma decimal normalized
    assert(rows(1).getString(1) == "x" && rows(1).isNullAt(2))
  }

  private val Importer = graft.Importer
}
