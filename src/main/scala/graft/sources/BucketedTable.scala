package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table writer for co-located joins — the third leg of the
 * engine's join-at-scale toolkit (broadcast for small dims, salting/AQE
 * for skew, bucketing for repeated big-big joins). Writing both sides
 * bucketed by the join key into the same bucket count makes every later
 * equi-join on that key SHUFFLE-FREE: each task reads bucket i of both
 * tables, so the exchange that dominates a 100 TB sort-merge join
 * disappears from the plan entirely (PlanAuditSpec pins the
 * Exchange-free plan). The write itself pays one hash-shuffle — amortized
 * over every subsequent join, which is the point: bucket the fact tables
 * once at ingest, join them for free forever after.
 *
 * Tables are EXTERNAL (caller-provided path) so the warehouse never
 * lands in the process working directory; `sortBy` on the bucket key
 * additionally lets Spark skip the per-task sort when both sides agree.
 */
object BucketedTable {

  /** Write `df` as a bucketed external table, replacing any previous
    * registration of `table`. Returns the table name for chaining. */
  def write(spark: SparkSession, df: DataFrame, table: String,
      bucketCol: String, buckets: Int, path: String): String = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
    table
  }

  /** Bucket-once-at-ingest: write only when `table` is not already
    * registered in this session's catalog, else serve the existing
    * bucketed layout. The caller owns naming — embed the corpus identity
    * in `table` (as the ANN TrainedIndex keys do), so a different input
    * never silently reuses another corpus's buckets. */
  def ensure(spark: SparkSession, df: => DataFrame, table: String,
      bucketCol: String, buckets: Int, path: => String): String =
    if (spark.catalog.tableExists(table)) table
    else write(spark, df, table, bucketCol, buckets, path)
}
