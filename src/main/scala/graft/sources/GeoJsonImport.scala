package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{GeoFunctions => G}

/**
 * GeoJSON source (SURVEY.md §2.1 S6): FeatureCollection → one row per
 * feature, properties flattened to columns, geometry → `the_geom` EWKB.
 * Declarative: `spark.read.json` + `explode(features)` — schema inference,
 * pushdown and parallelism come from Spark's JSON source (the reference
 * shells out to ogr2ogr here, importer.rb:175-190).
 */
object GeoJsonImport {

  def read(spark: SparkSession, path: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    // real-world GeoJSON is sometimes Latin-1 (the reference UTF-8-forces
    // downloads, importer.rb:68); sniff the head like the CSV path does
    val head = {
      val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
      try in.readNBytes(64 * 1024) finally in.close()
    }
    val enc = CsvImport.detectEncoding(head)
    val root = spark.read
      .option("multiLine", "true").option("encoding", enc).json(path)
    if (!root.columns.contains("features"))
      throw new IllegalArgumentException(s"$path has no FeatureCollection 'features'")
    val feats = root.select(explode(col("features")).as("f"))
    val propCols: Seq[org.apache.spark.sql.Column] =
      feats.select(col("f.properties.*")).columns.toIndexedSeq
        .map(c => col(s"f.properties.`$c`").as(c))
    feats.select(propCols :+
      G.st_geomfromgeojson(to_json(col("f.geometry"))).as("the_geom"): _*)
  }
}
