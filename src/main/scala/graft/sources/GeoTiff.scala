package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * GeoTIFF raster source (SURVEY.md §2.1 S10): replaces the reference's
 * `raster2pgsql -k 180x180` pipeline (importer.rb:406-458) with an in-JVM
 * baseline-TIFF parser + tiler. Data model mirrors the reference's tiled
 * raster table: one row per 180×180 block, `(tile_x, tile_y, band, width,
 * height, values)`, partitioned by tile key for locality.
 *
 * Scope: baseline TIFF — uncompressed strips, 8/16/32-bit unsigned or
 * 32/64-bit float samples, single band (the shape raster2pgsql's `-t`
 * path consumes). SRID via the GeoKey directory (tag 34735: keys 3072
 * projected / 2048 geographic — misc/srid_from_gdal.py's contract, F20).
 */
object GeoTiff {

  final case class TiffInfo(
      width: Int, height: Int, bitsPerSample: Int, sampleFormat: Int,
      stripOffsets: IndexedSeq[Long], stripByteCounts: IndexedSeq[Long],
      rowsPerStrip: Int, epsg: Int)

  final case class Raster(info: TiffInfo, pixels: Array[Double])

  def parse(bytes: Array[Byte]): Raster = {
    val order = (bytes(0), bytes(1)) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case _ => throw new IllegalArgumentException("not a TIFF")
    }
    val buf = ByteBuffer.wrap(bytes).order(order)
    require(buf.getShort(2) == 42, "bad TIFF magic")
    val ifdOff = buf.getInt(4)
    val n = buf.getShort(ifdOff) & 0xFFFF
    var tags = Map.empty[Int, (Int, Int, Long)] // tag -> (type, count, valueOffset)
    (0 until n).foreach { i =>
      val e = ifdOff + 2 + i * 12
      val tag = buf.getShort(e) & 0xFFFF
      val tpe = buf.getShort(e + 2) & 0xFFFF
      val count = buf.getInt(e + 4)
      tags += tag -> (tpe, count, e + 8L)
    }
    def values(tag: Int): IndexedSeq[Long] = tags.get(tag) match {
      case None => IndexedSeq.empty
      case Some((tpe, count, at)) =>
        val size = tpe match { case 1 => 1; case 3 => 2; case 4 => 4; case _ => 4 }
        val inline = size * count <= 4
        val base = if (inline) at else buf.getInt(at.toInt).toLong
        (0 until count).map { i =>
          val off = (base + i.toLong * size).toInt
          tpe match {
            case 1 => (bytes(off) & 0xFF).toLong
            case 3 => (buf.getShort(off) & 0xFFFF).toLong
            case _ => buf.getInt(off).toLong & 0xFFFFFFFFL
          }
        }
    }
    def one(tag: Int, default: Long = 0): Long = values(tag).headOption.getOrElse(default)

    val width = one(256).toInt
    val height = one(257).toInt
    val bps = one(258, 8).toInt
    require(one(259, 1) == 1, "only uncompressed TIFF supported")
    val sampleFormat = one(339, 1).toInt
    val rowsPerStrip = one(278, height.toLong).toInt
    val stripOffsets = values(273)
    val stripCounts = values(279)

    // GeoKey directory: shorts in groups of four (keyId, loc, count, value)
    val geoKeys = values(34735)
    val epsg = geoKeys.grouped(4).collectFirst {
      case IndexedSeq(3072L, _, _, v) => v.toInt // ProjectedCSTypeGeoKey
    }.orElse(geoKeys.grouped(4).collectFirst {
      case IndexedSeq(2048L, _, _, v) => v.toInt // GeographicTypeGeoKey
    }).getOrElse(4326) // srid_from_gdal.py default posture

    val px = new Array[Double](width * height)
    val bytesPerSample = bps / 8
    var row = 0
    stripOffsets.zip(stripCounts).foreach { case (off, cnt) =>
      val rows = math.min(rowsPerStrip, height - row)
      var i = 0
      val total = math.min((cnt / bytesPerSample).toInt, rows * width)
      while (i < total) {
        val p = (off + i.toLong * bytesPerSample).toInt
        px(row * width + i) = (bps, sampleFormat) match {
          case (8, _) => (bytes(p) & 0xFF).toDouble
          case (16, _) => (buf.getShort(p) & 0xFFFF).toDouble
          case (32, 3) => buf.getFloat(p).toDouble
          case (64, 3) => buf.getDouble(p)
          case (32, _) => (buf.getInt(p).toLong & 0xFFFFFFFFL).toDouble
          case other => throw new IllegalArgumentException(s"unsupported sample $other")
        }
        i += 1
      }
      row += rows
    }
    Raster(TiffInfo(width, height, bps, sampleFormat, stripOffsets,
      stripCounts, rowsPerStrip, epsg), px)
  }

  /** Tile into `tileSize`² blocks (reference blocksize 180×180,
    * importer.rb:426): one row per tile, repartitioned by tile key. */
  def toTiledDataFrame(spark: SparkSession, raster: Raster,
      tileSize: Int = 180): DataFrame = {
    val info = raster.info
    val tilesX = (info.width + tileSize - 1) / tileSize
    val tilesY = (info.height + tileSize - 1) / tileSize
    val schema = StructType(Seq(
      StructField("tile_x", IntegerType, nullable = false),
      StructField("tile_y", IntegerType, nullable = false),
      StructField("band", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("srid", IntegerType, nullable = false),
      StructField("values", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val rows = for {
      ty <- 0 until tilesY
      tx <- 0 until tilesX
    } yield {
      val w = math.min(tileSize, info.width - tx * tileSize)
      val h = math.min(tileSize, info.height - ty * tileSize)
      val vals = new Array[Double](w * h)
      var r = 0
      while (r < h) {
        System.arraycopy(raster.pixels, (ty * tileSize + r) * info.width + tx * tileSize,
          vals, r * w, w)
        r += 1
      }
      Row(tx, ty, 1, w, h, info.epsg, vals.toIndexedSeq)
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, math.max(1, rows.length / 64)), schema)
      .repartition(col("tile_x"), col("tile_y"))
  }

  def read(spark: SparkSession, path: String, tileSize: Int = 180): DataFrame =
    toTiledDataFrame(spark,
      parse(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))), tileSize)

  /** Minimal baseline-TIFF writer (grayscale 8-bit, one strip, GeoKeys) —
    * test oracle + export counterpart of the parser. */
  def writeTiff(width: Int, height: Int, pixels: Array[Byte], epsg: Int): Array[Byte] = {
    val nTags = 9
    val ifdOff = 8
    val geoKeysOff = ifdOff + 2 + nTags * 12 + 4
    val geoKeys = Array[Int](1, 1, 0, 1, 3072, 0, 1, epsg) // header + 1 key
    val dataOff = geoKeysOff + geoKeys.length * 2
    val out = ByteBuffer.allocate(dataOff + pixels.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    out.putShort(nTags.toShort)
    def tag(id: Int, tpe: Int, count: Int, value: Int): Unit =
      out.putShort(id.toShort).putShort(tpe.toShort).putInt(count).putInt(value)
    tag(256, 3, 1, width)
    tag(257, 3, 1, height)
    tag(258, 3, 1, 8)
    tag(259, 3, 1, 1) // uncompressed
    tag(273, 4, 1, dataOff) // strip offset
    tag(277, 3, 1, 1)
    tag(278, 3, 1, height)
    tag(279, 4, 1, pixels.length)
    tag(34735, 3, geoKeys.length, geoKeysOff)
    out.putInt(0) // next IFD
    geoKeys.foreach(k => out.putShort(k.toShort))
    out.put(pixels)
    out.array()
  }
}
