package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JVM/codegen/parquet-reader init otherwise lands entirely on
    // whichever query the Map iterates first, distorting its number
    try {
      spark.range(1 << 20).selectExpr("sum(id)").collect()
      Seq("lineitem", "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").count()
      }
    } catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY=q1_agg,vocab_top — iterate on a subset while tuning
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators cache internal tables (signature/tf projections); drop
      // them so memory stays flat across the suite and no query's timing
      // depends on an earlier query's leftovers
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // n_queries/sec_per_query: the suite GREW 35 → 50 queries in round 2,
    // so the comparable round-over-round number is per-query, not total
    val perQ = if (results.nonEmpty) total / results.size else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"sec_per_query":$perQ,"queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // sbt decorates stdout with an "[info] " prefix that can defeat a
    // line-oriented JSON parser — leave the raw line as a file artifact too
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LAST.json"), json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
