package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/**
 * Zero-cost pipeline observability via `Dataset.observe` (Spark's
 * CollectMetrics operator): data-quality counters computed INSIDE an
 * existing pass, not by a second scan. At 100 TB a separate
 * "count the nulls" job re-reads the table; an observation rides the
 * plan the pipeline already runs — the executors accumulate the metric
 * expressions per task and the driver folds them at job end.
 *
 * Shape rules the helpers enforce:
 *  - metric expressions are AGGREGATES over the observed node's output
 *    (count/sum/min/max) — cheap accumulator state per task, no shuffle;
 *  - reading the [[Observation]] blocks until the FIRST action on the
 *    observed frame completes, so callers attach it to the pass whose
 *    health they audit (a gate, a dedup, a write);
 *  - under Structured Streaming, [[Observation]].get does not complete
 *    (Spark's batch-only contract) — read each micro-batch's metrics
 *    from `StreamingQueryProgress.observedMetrics` instead (same
 *    CollectMetrics node; EventStreamsSpec pins it);
 *  - do NOT global-sort directly above an observed node: a sort's
 *    range-partitioner SAMPLING pass re-evaluates the child, so the
 *    metrics would accumulate twice (measured: n_rows doubles). Put the
 *    observation above the sort, or sort the un-observed input.
 */
object Observe {

  /** Attach row-count + per-column null-count observation to a pass.
    * Returns the observed frame (plan-identical semantics) and the
    * handle to read after the next action. */
  def qualityObservation(df: DataFrame, cols: Seq[String]): (DataFrame, Observation) = {
    require(cols.nonEmpty, "observe at least one column")
    val obs = Observation()
    val metrics = count(lit(1)).cast("long").as("n_rows") +: cols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Gate-health observation: how many rows a boolean `keptCol` passes
    * and drops, plus the total — the audit every filter stage should
    * publish without a second scan. */
  def gateObservation(df: DataFrame, keptCol: String): (DataFrame, Observation) = {
    val obs = Observation()
    (df.observe(obs,
      count(lit(1)).cast("long").as("n_rows"),
      sum(when(col(keptCol), 1L).otherwise(0L)).as("n_kept"),
      sum(when(!col(keptCol), 1L).otherwise(0L)).as("n_dropped")), obs)
  }
}
