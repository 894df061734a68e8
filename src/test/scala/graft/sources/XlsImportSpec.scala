package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import XlsFixture.{FormulaNum, FormulaStr, Inline, MulBlank, MulRk}

class XlsImportSpec extends AnyFunSuite with SparkTestBase {

  test("small .xls (mini-stream CFB): every cell record family round-trips") {
    val path = XlsFixture.write(Seq(
      Seq("id", "name", "price", "active", "note"),
      Seq(1, "Madrid", 3.25, true, Inline("inline text")),
      Seq(2, "Bogotá", 10.0, false, null),
      Seq(MulRk(Seq(3, 30)), "x", FormulaNum(7.5)),
      Seq(4, FormulaStr("calc"), MulBlank(2))))
    val rows = XlsImport.parseXls(path)
    assert(rows == Seq(
      IndexedSeq("id", "name", "price", "active", "note"),
      IndexedSeq("1", "Madrid", "3.25", "true", "inline text"),
      IndexedSeq("2", "Bogotá", "10", "false", ""),
      IndexedSeq("3", "30", "x", "7.5"),
      IndexedSeq("4", "calc", "", "")))
  }

  test("large .xls (regular-FAT CFB, SST CONTINUE between and mid-string)") {
    // ~120 unique 80-char strings ≈ 10 KB of SST: the 512-byte fragment
    // limit forces many CONTINUE records; midSplit also cuts inside
    // strings with the restated flag byte. Stream > 4096 bytes → regular
    // FAT chain, not the mini stream. A wide (UTF-16) string rides along.
    val longs = (0 until 120).map(i => s"row$i " + ("lorem ipsum dolor sit amet " * 3))
    val rows = Seq(Seq("k", "v", "w")) ++
      longs.zipWithIndex.map { case (s, i) => Seq(i, s, s"wide—$i") }
    for (midSplit <- Seq(false, true)) {
      val path = XlsFixture.write(rows, sstFragLimit = 512, midSplit = midSplit)
      assert(java.nio.file.Files.size(java.nio.file.Paths.get(path)) > 4096)
      val got = XlsImport.parseXls(path)
      assert(got.length == 121, s"midSplit=$midSplit")
      got.tail.zipWithIndex.foreach { case (r, i) =>
        assert(r == IndexedSeq(i.toString, longs(i), s"wide—$i"),
          s"midSplit=$midSplit row $i")
      }
    }
  }

  test(".xls through the Importer: via-CSV semantics, lattice typing") {
    val path = XlsFixture.write(Seq(
      Seq("ID", "Name City", "Price"),
      Seq(1, "Madrid", 3.25),
      Seq(2, "Paris", 4.0),
      Seq(3, "Lima", 7)))
    val r = graft.Importer.importFile(spark,
      graft.Importer.ImportRequest(importFromFile = Some(path)))
    assert(r.importType == ".xls")
    assert(r.rowsImported == 3)
    assert(r.df.columns.toSeq == Seq("id", "name_city", "price"))
    assert(r.df.schema("id").dataType.typeName == "long")
    // 3.25 makes the column float; float is sticky in the reference lattice
    assert(r.df.schema("price").dataType.typeName == "double")
    val rows = r.df.orderBy(col("id")).collect()
    assert(rows(0).getString(1) == "Madrid" && rows(0).getDouble(2) == 3.25)
    assert(rows(2).getDouble(2) == 7.0)
  }

  test("RK decode: int, int/100, float, float/100") {
    assert(XlsImport.decodeRk((42 << 2) | 2) == 42.0)
    assert(XlsImport.decodeRk((425 << 2) | 3) == 4.25) // int, div-100
    val bits = java.lang.Double.doubleToLongBits(1.5)
    assert(XlsImport.decodeRk(((bits >>> 32).toInt & 0xFFFFFFFC)) == 1.5)
    assert(XlsImport.decodeRk(((bits >>> 32).toInt & 0xFFFFFFFC) | 1) == 0.015)
  }

  test("number rendering matches CSV-path expectations") {
    assert(XlsImport.renderNumber(3.0) == "3")
    assert(XlsImport.renderNumber(-17.0) == "-17")
    assert(XlsImport.renderNumber(3.25) == "3.25")
    assert(XlsImport.renderNumber(1.0e20) == "1.0E20")
  }

  test("non-OLE2 bytes are rejected with a clear error") {
    val f = java.nio.file.Files.createTempFile("graft_test_", ".xls")
    java.nio.file.Files.write(f, "not a spreadsheet".getBytes)
    val e = intercept[IllegalArgumentException](XlsImport.parseXls(f.toString))
    assert(e.getMessage.contains("OLE2"))
  }
}
