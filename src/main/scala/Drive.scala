package graftdrive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SchemaInference

/** Scratch measurement driver (never committed): inference cost, full fold
  * vs sampled paths, sf0.1 vs sf1. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeIt[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"$label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      val li = graft.operators.Par.ensureParallelism(
        spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"),
            col("l_shipdate")))
      li.count() // warm the file cache so measurements compare folds, not IO
      // rep 1 then rep 2 (min-of-2 convention)
      for (rep <- 1 to 2) {
        timeIt(s"$dir full rep$rep") { SchemaInference.inferTypes(li) }
        timeIt(s"$dir sampled100k rep$rep") { SchemaInference.inferTypesSampled(li) }
        timeIt(s"$dir hash5pct rep$rep") {
          SchemaInference.inferTypesHashSampled(li, col("l_orderkey"), 0.05) }
        timeIt(s"$dir withFallback rep$rep") {
          SchemaInference.inferTypesWithFallback(li) }
      }
    }
    spark.stop()
  }
}
