package graft.operators

import org.apache.spark.sql.DataFrame

/** Partitioning guards shared by the CPU-heavy operators. */
object Par {

  /** Small-input guard for CPU-heavy per-row work: a sub-core-count
    * partition count (one small parquet file ⇒ one task) serializes
    * expression evaluation on a single thread. At real scale the input
    * already carries ≥ cores partitions and this is a no-op, so no shuffle
    * is added on the 100 TB path. */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
