package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.{Lease, Versioned}

/**
 * Incremental rollup maintenance — the OLAP twin of the ANN index's
 * build-once/append-forever path: a MATERIALIZED aggregate over a keyed
 * grain (the classic hourly/daily cube) that new batches refresh by
 * ASSOCIATIVE MERGE instead of a history rescan.
 *
 * The state columns are chosen to merge associatively: `n` (count) and
 * `s_<col>` (sums) — any mergeable finisher (avg = s/n, rates, ...) is a
 * serve-side projection. A refresh aggregates ONLY the batch at the
 * grain, unions it with the live rollup, and re-sums per key: cost is
 * |rollup grain| + |batch|, never the 100-TB history. Publishes go
 * through `Versioned`, so readers always see a complete rollup (the
 * pointer swap is the commit), a crashed refresh leaves the previous
 * rollup live, and retained versions give rollup time travel /
 * rebuild audits for free.
 *
 * Grain-cardinality posture: the merged rewrite is |grain| rows. OLAP
 * grains (hour × enum dims) stay tiny relative to facts at any scale;
 * a grain that approaches fact cardinality is not a rollup — use the
 * bucketed layouts for those.
 */
object Rollup {

  /** Aggregate `df` to the rollup grain: `dims` keys, `n`, and one
    * `s_<col>` per sum column — the associative state. */
  def aggregate(df: DataFrame, dims: Seq[String], sums: Seq[String]): DataFrame =
    df.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sums.map(c => sum(col(c)).as(s"s_$c")): _*)

  /** Materialize the initial rollup as a versioned dataset. */
  def publish(df: DataFrame, dims: Seq[String], sums: Seq[String],
      root: String): String =
    Versioned.writeVersioned(aggregate(df, dims, sums), root)

  /** The frame `refresh` executes: live rollup ∪ batch grain aggregate,
    * re-summed per key. Package-private so RollupSpec pins the ACTUAL
    * refresh plan's scanned files (not a hand-rebuilt copy). */
  private[graft] def mergedFrame(batch: DataFrame, dims: Seq[String],
      sums: Seq[String], root: String): DataFrame =
    Versioned.read(batch.sparkSession, root)
      .unionByName(aggregate(batch, dims, sums))
      .groupBy(dims.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sums.map(c => sum(col(s"s_$c")).as(s"s_$c")): _*)

  /** Fold one batch into the live rollup: aggregate the batch at the
    * grain, merge by key (counts and sums add), publish as the next
    * version. Never reads any fact row outside `batch`.
    *
    * MAINTENANCE WRITE (lease audit, VERDICT r16 #7): every refresh is a
    * read-live → merge → publish; two unserialized refreshes both read
    * v_n and one batch's fold is silently lost. The whole family
    * (refresh / refreshExactlyOnce / refreshDeltaExactlyOnce /
    * refreshState) therefore runs under the root's maintenance lease —
    * the batch-id fence only dedups REPLAYS of one stream, it cannot
    * serialize two distinct writers. */
  def refresh(batch: DataFrame, dims: Seq[String], sums: Seq[String],
      root: String): String = Lease.withLease(batch.sparkSession, root) {
    Versioned.writeVersioned(mergedFrame(batch, dims, sums, root), root)
  }

  /** Read the live rollup. */
  def serve(spark: SparkSession, root: String): DataFrame =
    Versioned.read(spark, root)

  /** Marker inside each version dir recording the highest streaming
    * batch id folded into that version (absent on batch-path versions). */
  private val BatchIdFile = "_batchid"

  /** The batch id the LIVE version has absorbed, if any. */
  def lastBatchId(spark: SparkSession, root: String): Option[Long] =
    Versioned.readSmallText(spark,
      new org.apache.hadoop.fs.Path(Versioned.resolve(spark, root), BatchIdFile))
      .flatMap(_.trim.toLongOption)

  /**
   * EXACTLY-ONCE streaming refresh: `foreachBatch` redelivers a
   * micro-batch after a crash (its contract is at-least-once into
   * arbitrary sinks), and a plain `refresh` would fold the replayed rows
   * in TWICE. This variant records the batch id INSIDE the new version
   * dir before the pointer commit — the id and the merged data become
   * visible atomically together — and skips any batch id ≤ the live
   * version's. Replay of the committed batch: skipped. Crash BEFORE the
   * pointer commit: the orphan version is invisible, the live id is
   * unchanged, and the redelivered batch applies cleanly — either way
   * each batch folds in exactly once. Ids must be monotone per rollup
   * (Structured Streaming's batchId is). Returns true iff applied.
   */
  def refreshExactlyOnce(batch: DataFrame, dims: Seq[String],
      sums: Seq[String], root: String, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    Lease.withLease(spark, root) {
    // fence check under the lease (see refresh's contract note)
    if (lastBatchId(spark, root).exists(_ >= batchId)) false
    else {
      val frame = mergedFrame(batch, dims, sums, root)
      Versioned.publish(spark, root) { dir =>
        frame.write.parquet(dir)
        val p = new org.apache.hadoop.fs.Path(dir, BatchIdFile)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        val out = fs.create(p, true)
        try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
      }
      true
    }
    }
  }

  /** Aggregate a SIGNED delta frame (MergeTable.versionDelta's output:
    * data columns + `__weight` of ±k) to the rollup grain: n = Σ weight,
    * s_<col> = Σ col·weight — the retract/add algebra that lets a rollup
    * follow a keyed table through UPSERTS and DELETES, not just appends
    * (a replaced row subtracts its old contribution and adds the new). */
  def aggregateDelta(delta: DataFrame, dims: Seq[String],
      sums: Seq[String], weightCol: String = "__weight"): DataFrame =
    delta.groupBy(dims.map(col): _*)
      .agg(sum(col(weightCol)).as("n"),
        sums.map(c => sum(col(c) * col(weightCol)).as(s"s_$c")): _*)

  /**
   * EXACTLY-ONCE delta refresh — the rollup half of the CDC→merge→rollup
   * composition (VERDICT r13 next #6). Same batch-id fence as
   * refreshExactlyOnce; the batch is a signed delta (versionDelta), so
   * the fold is a retraction-aware union + re-sum. Keys whose count
   * reaches zero leave the rollup (their integer sums are exactly zero
   * with them). Returns true iff applied.
   */
  def refreshDeltaExactlyOnce(delta: DataFrame, dims: Seq[String],
      sums: Seq[String], root: String, batchId: Long): Boolean = {
    val spark = delta.sparkSession
    Lease.withLease(spark, root) {
    // fence check under the lease (see refresh's contract note)
    if (lastBatchId(spark, root).exists(_ >= batchId)) false
    else {
      val frame = Versioned.read(spark, root)
        .unionByName(aggregateDelta(delta, dims, sums))
        .groupBy(dims.map(col): _*)
        .agg(sum(col("n")).as("n"),
          sums.map(c => sum(col(s"s_$c")).as(s"s_$c")): _*)
        .filter(col("n") =!= 0)
      Versioned.publish(spark, root) { dir =>
        frame.write.parquet(dir)
        val p = new org.apache.hadoop.fs.Path(dir, BatchIdFile)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        val out = fs.create(p, true)
        try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
      }
      true
    }
    }
  }

  /** Materialize an arbitrary MERGEABLE state frame (HLL registers,
    * count-min cells, bloom bits — any sketch whose merge is a per-key
    * aggregate) as a versioned rollup. */
  def publishState(state: DataFrame, root: String): String =
    Versioned.writeVersioned(state, root)

  /** Fold a batch's state into the live state rollup: union, group by
    * `keys`, and apply each column's merge aggregate (`max` for HLL
    * rho / bloom bits, `sum` for CMS cells, ...). The distinct-count
    * cube: publishState(hllRegisters(base, ...)) then per batch
    * refreshState(hllRegisters(batch, ...), Seq("grp", "bucket"),
    * Seq("max_rho" -> max)) — register max-merge is exact (integer,
    * order-free), so incremental == one-shot bit-for-bit. */
  def refreshState(batchState: DataFrame, keys: Seq[String],
      merges: Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)],
      root: String): String = {
    require(merges.nonEmpty, "at least one merge column")
    // the groupBy projection KEEPS ONLY keys + merge columns: any other
    // state column would silently vanish from the published version, so
    // an incomplete merge list is an error, not a quiet data loss
    val declared = (keys ++ merges.map(_._1)).toSet
    val extra = batchState.columns.toSet.diff(declared)
    require(extra.isEmpty,
      s"state columns $extra have no merge aggregate — a refresh would drop them")
    val spark = batchState.sparkSession
    Lease.withLease(spark, root) {
      val aggs = merges.map { case (name, f) => f(col(name)).as(name) }
      val merged = Versioned.read(spark, root)
        .unionByName(batchState)
        .groupBy(keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
      Versioned.writeVersioned(merged, root)
    }
  }
}
