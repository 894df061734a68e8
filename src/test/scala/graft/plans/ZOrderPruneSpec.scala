package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sinks.CatalogTableSink

/**
 * Measures the D5 claim (SURVEY §2.10): Z-order clustering is the
 * Parquet-side substitute for the reference's GiST index
 * (importer.rb:274,332,382). Writes the SAME point set in a Morton-
 * clustered layout and a round-robin layout, runs the SAME bounding-box
 * predicate over both, and reads the scan's own metrics: with
 * record-level parquet filtering off (Spark's default), the scan's
 * numOutputRows is exactly the rows materialized from row groups that
 * SURVIVED min/max-stats pruning — so clustered ≪ unclustered is the
 * index effect, not filter arithmetic.
 */
class ZOrderPruneSpec extends AnyFunSuite with SparkTestBase {

  /** Rows the parquet reader actually materialized (post row-group
    * pruning, pre Spark-side Filter). */
  private def scannedRows(df: DataFrame): Long = {
    df.collect() // execute; metrics populate on the executed plan
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("bbox predicate scans strictly fewer rows on the z-ordered layout") {
    val s = spark
    // 400k deterministic pseudo-random points over the full lon/lat globe
    val pts = s.range(400000L)
      .withColumn("h", abs(xxhash64(col("id"))))
      .withColumn("lon", (col("h") % 360000L).cast("double") / 1000.0 - 180.0)
      .withColumn("lat", ((col("h") / 360000L) % 180000L).cast("double") / 1000.0 - 90.0)
      .drop("h")
    val base = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    val clusteredPath = s"$base/clustered"
    val shuffledPath = s"$base/shuffled"
    CatalogTableSink.writeZOrdered(pts, clusteredPath, "lon", "lat", numFiles = 32)
    pts.repartition(32).write.parquet(shuffledPath)

    // ~1% of the globe: a 20° × 10° box
    def query(path: String): DataFrame =
      s.read.parquet(path)
        .filter(col("lon") > 10.0 && col("lon") < 30.0 &&
          col("lat") > 20.0 && col("lat") < 30.0)

    val nClustered = query(clusteredPath)
    val nShuffled = query(shuffledPath)
    // both layouts agree on the answer
    val a = nClustered.agg(count(lit(1)), sum(col("id"))).head()
    val b = nShuffled.agg(count(lit(1)), sum(col("id"))).head()
    assert(a == b)
    assert(a.getLong(0) > 0)

    val scannedClustered = scannedRows(query(clusteredPath))
    val scannedShuffled = scannedRows(query(shuffledPath))
    info(s"scanned rows: clustered=$scannedClustered shuffled=$scannedShuffled " +
      f"ratio=${scannedShuffled.toDouble / scannedClustered}%.1fx " +
      s"(result rows=${a.getLong(0)}, total=400000)")
    // the shuffled layout has every file spanning the whole globe: nothing
    // prunes and the scan reads all 400k rows
    assert(scannedShuffled == 400000L)
    // the clustered layout must prune most row groups — require ≥4x fewer
    // rows read (measured ~10-30x; the bound is loose so file-count or
    // stats-granularity changes don't flake the suite)
    assert(scannedClustered * 4 <= scannedShuffled,
      s"z-order pruning ineffective: $scannedClustered vs $scannedShuffled")
  }

  test("zorder write preserves the row multiset exactly") {
    val s = spark
    val pts = s.range(5000L)
      .withColumn("lon", (col("id") % 360L).cast("double") - 180.0)
      .withColumn("lat", ((col("id") / 360L) % 180L).cast("double") - 90.0)
    val p = java.nio.file.Files.createTempDirectory("graft_zorder_rt_").toString + "/t"
    CatalogTableSink.writeZOrdered(pts, p, "lon", "lat", numFiles = 8)
    val back = s.read.parquet(p)
    assert(back.count() == 5000L)
    assert(back.columns.sorted.toSeq == Seq("id", "lat", "lon"))
    // integer sums only: double sums are addition-order-sensitive and the
    // layouts differ in exactly that
    assert(back.agg(sum(col("id")), sum(col("lon").cast("long")), sum(col("lat").cast("long"))).head() ==
      pts.agg(sum(col("id")), sum(col("lon").cast("long")), sum(col("lat").cast("long"))).head())
  }
}
