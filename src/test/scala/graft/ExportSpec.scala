package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Exporter

/**
 * Export parity suite: replays the reference's import-then-export round
 * trips (reference: spec/export_spec.rb:8-59 — asserts name + type per
 * format; we additionally re-import our own exports, which the reference
 * could not do without a second database).
 */
class ExportSpec extends AnyFunSuite with SparkTestBase {

  private def fx(name: String): String =
    java.nio.file.Paths.get(getClass.getResource(s"/fixtures/$name").toURI).toString

  private lazy val imported = Importer.importFile(spark, Importer.ImportRequest(
    importFromFile = Some(fx("TM_WORLD_BORDERS_SIMPL-0.3.zip")))).df.cache()

  private def tmp = java.nio.file.Files.createTempDirectory("graft_exp_spec_").toString

  test("import then export csv (export_spec.rb:8-22)") {
    val r = Exporter.exportCsv(imported.drop("the_geom"), "tm_world_borders", tmp)
    assert(r.name == "tm_world_borders")
    assert(r.importType == ".csv")
    assert(new java.io.File(r.path).length() > 0)
  }

  test("distributed csv export == driver-funnel export, byte-compatible archive") {
    import org.apache.spark.sql.functions.col
    val df = imported.drop("the_geom")
    val d1 = tmp
    val funnel = Exporter.exportCsv(df, "borders", d1)
    val dist = Exporter.exportCsvDistributed(df, "borders", d1)
    def rowsOf(zipPath: String): Seq[String] = {
      val zf = new java.util.zip.ZipFile(zipPath)
      try {
        val e = zf.entries().nextElement()
        assert(e.getName == "borders.csv")
        scala.io.Source.fromInputStream(zf.getInputStream(e), "UTF-8")
          .getLines().toList
      } finally zf.close()
    }
    val a = rowsOf(funnel.path)
    val b = rowsOf(dist.path)
    assert(a.head == b.head) // identical header
    // same row multiset (partition order may differ from iterator order)
    assert(a.tail.sorted == b.tail.sorted)
    assert(a.length.toLong - 1 == df.count())
    // and it re-imports cleanly through the CSV path
    val back = Importer.importFile(spark, Importer.ImportRequest(
      importFromFile = Some(dist.path)))
    assert(back.rowsImported == df.count())
  }

  test("import then export kml (export_spec.rb:24-40)") {
    val r = Exporter.exportKml(imported, "tm_world_borders", dir = tmp)
    assert(r.name == "tm_world_borders")
    assert(r.importType == ".kml")
    assert(r.path.endsWith(".kmz"))
  }

  test("import then export shp, then reimport (export_spec.rb:42-58)") {
    val r = Exporter.exportShp(imported, "tm_world_borders", dir = tmp)
    assert(r.name == "tm_world_borders")
    assert(r.importType == ".shp")
    // full cycle: our zip of .shp/.shx/.dbf/.prj imports like any other
    val back = Importer.importFile(spark,
      Importer.ImportRequest(importFromFile = Some(r.path)))
    assert(back.rowsImported == 246)
    assert(back.importType == ".shp")
  }

  test("raster import produces the tiled table shape (S10)") {
    val px = Array.fill[Byte](360 * 200)(7)
    val tif = graft.sources.GeoTiff.writeTiff(360, 200, px, epsg = 4326)
    val f = java.nio.file.Files.createTempFile("graft_raster_", ".tif")
    java.nio.file.Files.write(f, tif)
    val r = Importer.importFile(spark,
      Importer.ImportRequest(importFromFile = Some(f.toString)))
    assert(r.importType == ".tif")
    assert(r.rowsImported == 4) // 2×2 tiles of 180
    assert(r.df.columns.toSet ==
      Set("tile_x", "tile_y", "band", "width", "height", "srid", "values"))
  }
}
