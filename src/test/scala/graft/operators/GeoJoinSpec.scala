package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class GeoJoinSpec extends AnyFunSuite with SparkTestBase {

  test("grid-bucketed radius join equals brute force (pruning loses nothing)") {
    import spark.implicits._
    // includes high-latitude points where lon degrees shrink
    val pts = (1 to 60).map { i =>
      (i.toLong, (i % 12).toDouble * 0.3 - 1.8, (i % 30).toDouble * 5.0 - 72.5)
    }
    val l = pts.toDF("id", "lon", "lat")
    val r = pts.map { case (i, lon, lat) => (i + 1000, lon, lat) }
      .toDF("id", "lon", "lat")
    val grid = GeoJoin.withinRadius(l, r, "id", "lon", "lat", 60000.0)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val brute = l.crossJoin(r.select(col("id").as("rid"), col("lon").as("rlon"),
        col("lat").as("rlat")))
      .withColumn("d", GeoJoin.haversineMeters(col("lon"), col("lat"),
        col("rlon"), col("rlat")))
      .filter(col("d") <= 60000.0)
      .select("id", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(grid == brute)
    assert(brute.nonEmpty) // at least the co-located pairs
  }

  test("radius join finds pairs straddling the antimeridian") {
    import spark.implicits._
    val l = Seq((1L, 179.8, 10.0)).toDF("id", "lon", "lat")
    val r = Seq((2L, -179.8, 10.0), (3L, 170.0, 10.0)).toDF("id", "lon", "lat")
    // 0.4 deg lon at lat 10 ≈ 43.8 km < 60 km; id 3 is ~1000 km away
    val got = GeoJoin.withinRadius(l, r, "id", "lon", "lat", 60000.0)
      .select("r_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L))
  }

  test("haversine: known distance sanity (1 deg lon at equator ~111 km)") {
    import spark.implicits._
    val d = Seq((0.0, 0.0, 1.0, 0.0)).toDF("lon1", "lat1", "lon2", "lat2")
      .select(GeoJoin.haversineMeters(col("lon1"), col("lat1"),
        col("lon2"), col("lat2")).as("d"))
      .head().getDouble(0)
    assert(math.abs(d - 111195.0) < 200.0, s"got $d")
  }
}
