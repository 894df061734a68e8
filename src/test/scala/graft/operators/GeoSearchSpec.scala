package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * The geo search family over the index docvals (VERDICT r19 #2):
 * `geo_distance` query + aggregation, `geo_bounding_box`, and the
 * `geohash_grid` Morton-cell bucketing — semantics on hand-built
 * corpora plus a brute-force cross-check proving the bounding-box
 * prefilter never costs correctness.
 */
class GeoSearchSpec extends AnyFunSuite with SparkTestBase {

  /** The engine's own distance: haversine on R = 6371 km, rounded. */
  private def hav(lat1: Double, lon1: Double, lat2: Double,
      lon2: Double): Long = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    math.round(2 * 6371000.0 * math.asin(math.sqrt(a)))
  }

  private def build(rows: Seq[(Long, String, Double, Double)]): String = {
    import spark.implicits._
    val root = Files.createTempDirectory("geo_idx").toString
    TextAnalysis.writeBm25Index(
      rows.toDF("doc_id", "text", "lat", "lon"),
      "doc_id", "text", root, nBuckets = 4,
      docValueCols = Seq("lat", "lon"))
    root
  }

  test("geo_distance query: nearest-first within radius; unmatched text never enters") {
    val root = build(Seq(
      (1L, "hit here", 0.0, 0.0), // 0 m
      (2L, "hit north", 1.0, 0.0), // ~111 km
      (3L, "hit east", 0.0, 1.0), // ~111 km, doc_id tie-break after 2
      (4L, "hit far", 10.0, 10.0), // ~1565 km — outside
      (5L, "miss near", 0.1, 0.0))) // inside but unmatched
    val got = TextAnalysis.bm25GeoDistanceTopK(spark, root, "hit",
      "lat", "lon", originLat = 0.0, originLon = 0.0,
      radiusMeters = 200000L, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 0L),
      (2L, hav(0, 0, 1, 0)), (3L, hav(0, 0, 0, 1))))
    // k cuts the nearest prefix
    assert(TextAnalysis.bm25GeoDistanceTopK(spark, root, "hit",
      "lat", "lon", 0.0, 0.0, 200000L, k = 1)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("bbox prefilter is conservative: grid boundary docs match a brute-force haversine exactly") {
    // 25×25 one-degree grid; radius ~13.5° puts many docs right at the
    // ball's edge — where a sloppy box or a wrong secant clips members
    val rows = for {
      la <- -12 to 12; lo <- -12 to 12
    } yield ((la + 12) * 25L + (lo + 12) + 1L, "hit grid",
      la.toDouble, lo.toDouble)
    val root = build(rows)
    val r = 1500000L
    val expect = rows
      .map(t => (t._1, hav(0, 0, t._3, t._4)))
      .filter(_._2 <= r).sortBy(t => (t._2, t._1))
    val got = TextAnalysis.bm25GeoDistanceTopK(spark, root, "hit",
      "lat", "lon", 0.0, 0.0, r, k = rows.size)
      .collect().map(rr => (rr.getLong(0), rr.getLong(1))).toSeq
    assert(got == expect,
      s"bbox clipped true members: ${expect.size} expected, ${got.size} got")
    assert(got.size > 100, "degenerate fixture — radius covers too little")
  }

  test("near-pole origin drops the lon bound but stays exact") {
    val rows = Seq(
      (1L, "hit pole a", 89.6, 0.0),
      (2L, "hit pole b", 89.6, 180.0), // over the pole from origin's lon
      (3L, "hit pole c", 88.0, 90.0),
      (4L, "hit equator", 0.0, 0.0))
    val root = build(rows)
    val r = 200000L
    val expect = rows.map(t => (t._1, hav(89.5, 0.0, t._3, t._4)))
      .filter(_._2 <= r).sortBy(t => (t._2, t._1))
    val got = TextAnalysis.bm25GeoDistanceTopK(spark, root, "hit",
      "lat", "lon", originLat = 89.5, originLon = 0.0, r, k = 10)
      .collect().map(rr => (rr.getLong(0), rr.getLong(1))).toSeq
    assert(got == expect)
    assert(got.map(_._1).contains(2L),
      "the over-the-pole doc is within 200 km and must survive")
  }

  test("antimeridian: the bbox window wraps at ±180 — far-side docs within radius survive") {
    val rows = Seq(
      (1L, "hit west", 0.0, 179.8), // ~22 km east over the seam
      (2L, "hit east", 0.0, -179.8), // ~55 km west over the seam
      (3L, "hit same", 0.0, 179.0), // ~56 km, same side
      (4L, "hit far", 0.0, 170.0)) // ~1056 km — outside
    val root = build(rows)
    val expect = rows.map(t => (t._1, hav(0.0, 179.6, t._3, t._4)))
      .filter(_._2 <= 200000L).sortBy(t => (t._2, t._1))
    val got = TextAnalysis.bm25GeoDistanceTopK(spark, root, "hit",
      "lat", "lon", originLat = 0.0, originLon = 179.6,
      radiusMeters = 200000L, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
    assert(got.map(_._1).contains(2L),
      "the far-side doc is 55 km away and must survive the bbox")
    // and mirrored from the west side of the seam
    val got2 = TextAnalysis.bm25GeoDistanceTopK(spark, root, "hit",
      "lat", "lon", originLat = 0.0, originLon = -179.9,
      radiusMeters = 200000L, k = 10)
      .collect().map(_.getLong(0)).toSet
    // doc 3 (179.0) is 1.1° wrapped ≈ 122 km — inside too
    assert(got2 == Set(1L, 2L, 3L),
      s"west-seam origin must see across the seam, got $got2")
  }

  test("geo_distance agg emits EVERY ring, zeros included; geo_bounding_box filters the scored serve") {
    val root = build(Seq(
      (1L, "hit a", 0.0, 0.0), // ring [0, 1000 km)
      (2L, "hit b", 0.5, 0.0), // ring [0, 1000 km)
      (3L, "hit c", 30.0, 0.0), // ~3336 km → ring [3000 km, ∞)
      (4L, "miss d", 0.0, 0.5)))
    val rings = TextAnalysis.bm25GeoDistanceAgg(spark, root, "hit",
      "lat", "lon", 0.0, 0.0, edges = Seq(1000000L, 3000000L))
      .orderBy(col("ring_from")).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
      .toSeq
    assert(rings == Seq(
      (0L, Some(1000000L), 2L),
      (1000000L, Some(3000000L), 0L), // EMPTY middle ring still emits
      (3000000L, None, 1L)))
    // bbox: the box keeps docs 1-2, cuts doc 3; doc 4 never matches
    val boxed = TextAnalysis.bm25GeoBoundingBoxTopK(spark, root, "hit",
      "lat", "lon", latLo = -1.0, latHi = 1.0, lonLo = -1.0, lonHi = 1.0,
      k = 10).collect().map(_.getLong(0)).toSet
    assert(boxed == Set(1L, 2L))
  }

  test("geo_centroid: exact micro-degree mean; negative sums use the shared trunc-toward-zero division") {
    val root = build(Seq(
      (1L, "hit a", 0.25, 10.5),
      (2L, "hit b", 0.25, 20.5),
      (3L, "hit c", -1.0, -30.0),
      (4L, "miss d", 50.0, 50.0)))
    val r = TextAnalysis.bm25GeoCentroidAgg(spark, root, "hit",
      "lat", "lon").head()
    // lat sum e6 = 250000 + 250000 − 1000000 = −500000; n = 3 →
    // trunc(−166666.67) = −166666 — truncation toward zero is the
    // semantic ALL THREE engines share (Spark div, DuckDB //, BigInt);
    // a floor spelling desyncs the oracle at negative remainders
    assert(r.getLong(0) == -166666L, s"shared trunc semantics lost: $r")
    // lon sum e6 = 10500000 + 20500000 − 30000000 = 1000000 → 333333
    assert(r.getLong(1) == 333333L)
    assert(r.getLong(2) == 3L)
    // empty match → empty frame
    assert(TextAnalysis.bm25GeoCentroidAgg(spark, root, "zzznomatch",
      "lat", "lon").count() == 0L)
  }

  test("geohash_grid: Morton cells partition the match set; topN by (count desc, cell)") {
    // bits=1 → 2×2 grid: cell = (lon ≥ 0 ? 1 : 0) + (lat ≥ 0 ? 2 : 0)
    val root = build(Seq(
      (1L, "hit a", 10.0, 10.0), // NE → cell 3
      (2L, "hit b", 20.0, 20.0), // NE → cell 3
      (3L, "hit c", -10.0, 10.0), // SE → cell 1
      (4L, "hit d", 10.0, -10.0), // NW → cell 2
      (5L, "miss e", 15.0, 15.0)))
    val got = TextAnalysis.bm25GeohashGridAgg(spark, root, "hit",
      "lat", "lon", bits = 1, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((3L, 2L), (1L, 1L), (2L, 1L)))
    // topN cuts after the (count desc, cell asc) order
    assert(TextAnalysis.bm25GeohashGridAgg(spark, root, "hit",
      "lat", "lon", bits = 1, topN = 1)
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("geo_distance plan: bbox predicate pushes to the docvals scan; top-k fuses; no corpus read") {
    val root = build((1L to 200L).map(i =>
      (i, "hit blob", (i % 160 - 80).toDouble + 0.25,
        (i % 360 - 180).toDouble + 0.5)))
    val df = TextAnalysis.bm25GeoDistanceTopK(spark, root, "hit",
      "lat", "lon", 20.25, 10.5, 3000000L, k = 15)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), "top-k not fused")
    assert(p.contains("GreaterThanOrEqual(lat") ||
      p.contains("PushedFilters: [IsNotNull(lat"),
      s"bbox must push down to the docvals parquet scan:\n$p")
    assert(df.inputFiles.exists(_.contains("/docvals/")),
      "distance must read the docvals sidecar")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "no cartesian")
  }
}
