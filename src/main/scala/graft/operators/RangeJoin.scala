package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bounded temporal band join: pair rows whose timestamps lie within a
 * fixed interval of each other — the "events near events" primitive the
 * reference's single-table pipeline never needed but any event-log
 * workload does (reference-absent; natural extension of its
 * time-flattened GPX track model, lib/cartodb-importer/importer.rb:145-173).
 *
 * Scale plan: a naive θ-join on |ts_l − ts_r| ≤ band is a cross product
 * per key group (Spark executes it as BroadcastNestedLoopJoin when the
 * key is omitted — O(|L|·|R|)). Instead both sides are bucketed by
 * ⌊ts/band⌋; any within-band pair differs by at most one bucket, so the
 * LEFT side explodes its bucket ±1 and the join becomes a plain equi-join
 * on (keys…, bucket) — shuffle volume 3·|L| + |R|, never |L|·|R|, and
 * Catalyst picks sort-merge/hash like any other equi-join. Each
 * qualifying pair shares exactly ONE right-bucket cell, so no dedup pass
 * is needed afterwards.
 */
object RangeJoin {

  /**
   * All (left, right) pairs with equal `keyCols` and
   * |µs(left.tsCol) − µs(right.tsCol)| ≤ bandMicros.
   *
   * Returns left.* plus each `rightPayload` column as `r_<name>`, plus
   * `r_us` (the right row's epoch-µs) for downstream arithmetic.
   * Timestamps compare at exact µs precision (unix_micros), matching the
   * engine-wide convention for the ns-sourced events table.
   */
  def timeBand(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, bandMicros: Long,
      rightPayload: Seq[String]): DataFrame = {
    require(bandMicros > 0, "bandMicros must be positive")
    val l = left
      .withColumn("__l_us", unix_micros(col(tsCol)))
      .withColumn("__b0", floor(col("__l_us") / bandMicros))
      .withColumn("__bucket",
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val r0 = right.select(
      (keyCols.map(col) :+ unix_micros(col(tsCol)).as("r_us")) ++
        rightPayload.map(c => col(c).as(s"r_$c")): _*)
    val r = r0.withColumn("__bucket", floor(col("r_us") / bandMicros))
    l.join(r, keyCols :+ "__bucket")
      .filter(abs(col("r_us") - col("__l_us")) <= bandMicros)
      .drop("__bucket", "__l_us")
  }

  /** Reference semantics twin for testing: per-key nested-loop band join
    * (correct by construction, quadratic — small inputs only). */
  private[graft] def timeBandNaive(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, bandMicros: Long,
      rightPayload: Seq[String]): DataFrame = {
    val l = left.withColumn("__l_us", unix_micros(col(tsCol)))
    val r = right.select(
      (keyCols.map(col) :+ unix_micros(col(tsCol)).as("r_us")) ++
        rightPayload.map(c => col(c).as(s"r_$c")): _*)
    l.join(r, keyCols)
      .filter(abs(col("r_us") - col("__l_us")) <= bandMicros)
      .drop("__l_us")
  }
}
