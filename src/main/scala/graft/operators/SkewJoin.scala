package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-tolerant equi-join via key salting (scale toolbox; complements
 * AQE's runtime skew splitting for the cases AQE can't fix, e.g. a
 * single hot key feeding a non-splittable downstream aggregation).
 *
 * Left (large, skewed) rows get a random salt in [0, factor); right
 * (smaller) rows are replicated across all salts. The join key becomes
 * (key, salt), spreading each hot key over `factor` reducers. Correctness
 * is unchanged — every left row still meets every matching right row
 * exactly once.
 */
object SkewJoin {

  def saltedJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      factor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(factor > 0)
    val salted = left.withColumn("__salt",
      (rand(seed = 42) * factor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    val joined = salted.join(replicated,
      salted(leftKey) === replicated(rightKey) &&
        salted("__salt") === replicated("__salt"),
      joinType)
    joined.drop("__salt")
  }

  /** Top-N heaviest keys of `df` on `key` — the diagnostic used to decide
    * whether salting is worth it (one aggregate, no collect of data). */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)
}
