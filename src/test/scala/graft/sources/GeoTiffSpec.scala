package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class GeoTiffSpec extends AnyFunSuite with SparkTestBase {

  // 400×370 gradient raster → with 180-tiles: 3×3 grid like the
  // reference's 1500-tile golden shape (import_spec.rb:287-290) in miniature
  private val w = 400
  private val h = 370
  private lazy val tiffBytes = {
    val px = new Array[Byte](w * h)
    var i = 0
    while (i < px.length) { px(i) = ((i % w + i / w) % 256).toByte; i += 1 }
    GeoTiff.writeTiff(w, h, px, epsg = 3857)
  }

  test("parse round trip: dimensions, srid, pixel values") {
    val r = GeoTiff.parse(tiffBytes)
    assert(r.info.width == w && r.info.height == h)
    assert(r.info.epsg == 3857)
    assert(r.pixels(0) == 0.0)
    assert(r.pixels(5 * w + 7) == 12.0) // (x=7, y=5) → 12
  }

  test("tiling matches raster2pgsql 180x180 block semantics (importer.rb:426)") {
    val df = GeoTiff.toTiledDataFrame(spark, GeoTiff.parse(tiffBytes))
    val tiles = df.collect()
    assert(tiles.length == 9) // ceil(400/180)=3 × ceil(370/180)=3
    val bySize = tiles.map(r => ((r.getInt(0), r.getInt(1)),
      (r.getInt(3), r.getInt(4)))).toMap
    assert(bySize((0, 0)) == (180, 180))
    assert(bySize((2, 0)) == (40, 180)) // right edge
    assert(bySize((0, 2)) == (180, 10)) // bottom edge
    assert(bySize((2, 2)) == (40, 10))
    assert(tiles.forall(_.getInt(5) == 3857))
    // pixel content of an inner tile cell: global (x=200, y=10) = (200+10)%256
    val t10 = tiles.find(r => r.getInt(0) == 1 && r.getInt(1) == 0).get
    val vals = t10.getSeq[Double](6)
    assert(vals(10 * t10.getInt(3) + 20) == 210.0) // local (20,10) → global (200,10) → (200+10)%256
  }

  test("tile count formula holds at the reference's golden scale") {
    // reference golden: 1500 tiles @180×180 (import_spec.rb:287-290) —
    // consistent with e.g. a 10800×4500 raster: 60×25=1500
    val tilesX = (10800 + 179) / 180
    val tilesY = (4500 + 179) / 180
    assert(tilesX * tilesY == 1500)
  }
}
