package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: attach to each left row the most recent right row with
 * `right.ts <= left.ts` per key (the standard time-series "last known
 * value" join; reference has nothing like it — north-star operator).
 *
 * Built by COMPOSITION, per the custom-operator preference order: tag and
 * union both sides, then carry the right side's payload forward with a
 * `last(..., ignoreNulls)` running window. That is ONE shuffle on
 * (key, time) — a range join would explode to |L|·|R| comparisons per key
 * before pruning, and a custom physical operator would buy nothing over
 * the window plan Spark already generates (WindowExec streams each key's
 * partition in time order with O(1) state for `last`).
 *
 * Tie rule: a right row AT the left row's timestamp matches (right sorts
 * before left on equal ts); equal-ts right rows break by `tieCol` so the
 * result is deterministic and SQL-replayable.
 */
object AsOfJoin {

  /**
   * @param left      rows to enrich
   * @param right     rows providing the carried payload
   * @param keyCols   equi-join keys
   * @param tsCol     event-time column (both sides)
   * @param tieCol    unique right-side column breaking equal-ts ties
   * @param payload   right-side columns to carry (renamed `asof_<name>`)
   */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__tie", col(tieCol))
    val lAligned = payload.foldLeft(l)((df, p) =>
      df.withColumn(s"asof_$p", lit(null).cast(right.schema(p).dataType)))
    val r0 = right
      .withColumn("__side", lit(0))
      .withColumn("__tie", col(tieCol))
    val rAligned = leftCols.foldLeft(
      payload.foldLeft(r0)((df, p) => df.withColumn(s"asof_$p", col(p))))(
      (df, c) => if (right.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select((leftCols.toIndexedSeq ++ Seq("__side", "__tie") ++ payload.map(p => s"asof_$p"))
        .map(col): _*)
    val u = lAligned
      .select((leftCols.toIndexedSeq ++ Seq("__side", "__tie") ++ payload.map(p => s"asof_$p"))
        .map(col): _*)
      .unionByName(rAligned)
    // right rows (side 0) sort before left rows at equal ts → "at or before"
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(u)((df, p) =>
      df.withColumn(s"asof_$p", last(col(s"asof_$p"), ignoreNulls = true).over(w)))
    carried.filter(col("__side") === 1).drop("__side", "__tie")
  }
}
