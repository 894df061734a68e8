package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Spatial radius join at scale: "every (l, r) pair within `radiusMeters`".
 * The reference has no query engine, but it builds a GiST index on every
 * imported geometry column (lib/cartodb-importer/importer.rb:274,332,382)
 * precisely so the downstream database can answer this class of proximity
 * query — the grid bucketing below is the Spark-native analog of that
 * index's role.
 * A naive formulation is a cross join with a distance filter — |L|·|R|
 * comparisons. This one grid-buckets both sides by a cell sized to the
 * radius and joins each left cell to its 3×3 neighborhood, so candidate
 * pairs are bounded by local density, the join is a plain equi-join on the
 * cell key (hash-partitionable, AQE-skew-splittable), and the exact
 * haversine test runs only inside neighborhoods. The 3×3 probe guarantees
 * no candidate within the radius is missed as long as the cell edge ≥
 * radius (longitude cells shrink toward the poles, so the cell size uses
 * the worst-case latitude of the data; |lat| ≤ 85 keeps it finite).
 */
object GeoJoin {

  private val EarthRadiusM = 6371000.0

  /** Great-circle distance in meters (haversine). */
  def haversineMeters(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusM) * asin(sqrt(a))
  }

  /**
   * All pairs within `radiusMeters`. Both inputs need `lonCol`/`latCol`
   * double columns; ids are carried as `l_<idCol>` / `r_<idCol>`.
   * `maxAbsLat` bounds the data's latitude so the longitude cell width is
   * safe at the worst-case parallel.
   */
  def withinRadius(left: DataFrame, right: DataFrame,
      idCol: String, lonCol: String, latCol: String,
      radiusMeters: Double, maxAbsLat: Double = 85.0): DataFrame = {
    // degrees per meter: 1 deg lat ≈ 111,320 m; lon shrinks by cos(lat)
    val latCellDeg = radiusMeters / 111320.0
    val lonCellDeg = latCellDeg / math.cos(math.toRadians(maxAbsLat))
    // longitude wraps: index cells from -180 and probe MODULO the cell
    // count, otherwise a pair straddling the antimeridian (lon ±180) sits
    // in distant cells and is silently missed (haversine itself is
    // wrap-correct, so the miss would be the grid's fault alone)
    val nLonCells = math.max(1, math.ceil(360.0 / lonCellDeg).toInt)
    def cells(df: DataFrame, probe: Boolean): DataFrame = {
      val base = df.select(col(idCol), col(lonCol).as("__lon"), col(latCol).as("__lat"))
        .withColumn("__cx",
          pmod(floor((col("__lon") + 180.0) / lonCellDeg), lit(nLonCells)))
        .withColumn("__cy", floor(col("__lat") / latCellDeg))
      if (!probe) base
      else base
        .withColumn("__dx", explode(sequence(lit(-1), lit(1))))
        .withColumn("__dy", explode(sequence(lit(-1), lit(1))))
        .withColumn("__cx", pmod(col("__cx") + col("__dx"), lit(nLonCells)))
        .withColumn("__cy", col("__cy") + col("__dy"))
        .drop("__dx", "__dy")
    }
    val l = cells(left, probe = true)
      .select(col(idCol).as(s"l_$idCol"), col("__lon").as("__llon"),
        col("__lat").as("__llat"), col("__cx"), col("__cy"))
    val r = cells(right, probe = false)
      .select(col(idCol).as(s"r_$idCol"), col("__lon").as("__rlon"),
        col("__lat").as("__rlat"), col("__cx"), col("__cy"))
    l.join(r, Seq("__cx", "__cy"))
      .withColumn("dist_m",
        haversineMeters(col("__llon"), col("__llat"), col("__rlon"), col("__rlat")))
      .filter(col("dist_m") <= radiusMeters)
      .select(col(s"l_$idCol"), col(s"r_$idCol"), col("dist_m"))
  }
}
