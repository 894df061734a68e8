package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph algorithms over edge DataFrames (corpus-curation
 * support: link-graph centrality is a standard web-corpus quality signal
 * — CommonCrawl-style pipelines rank hosts by harmonic/PageRank
 * centrality before sampling).
 *
 * Everything is INTEGER fixed-point so a SQL oracle replays ranks
 * bit-for-bit: mass is expressed in units of 1e-12 of the total (M =
 * 1e12), per-edge contributions use truncating long division (== DuckDB
 * `//` for the non-negative values that occur here), and the damping
 * factor is a pair of integer multiplications. No float ever enters the
 * dataflow, so sum order cannot perturb results.
 */
object Graph {

  /** Total integer mass (1e12 "picos" of probability). */
  val MassUnits: Long = 1000000000000L

  /**
   * PageRank with a fixed iteration count. `edges` must be directed
   * (src, dst) pairs; pass `symmetrize = true` for random-walk symmetry
   * (the reverse edges are added after the cache boundary, one pass).
   * Every node must have out-degree ≥ 1 — a LOAD-BEARING contract, not
   * just advice: the degree table's key set is used as the node set
   * (dangling-mass redistribution is deliberately out of scope so the
   * oracle stays a pure join/group replay; symmetrized graphs satisfy
   * the contract by construction).
   *
   * Scale shape: the edge list is hash-partitioned by src ONCE and the
   * degree table joined into it; from there every per-round operation is
   * narrow except the single reduceByKey that aggregates messages by
   * dst — one |E|-linear shuffle per round. Each round's ranks are
   * persisted and the previous unpersisted, so lineage never exceeds one
   * round and iteration count can grow freely.
   *
   * Returns (node, rank) with Σrank ≤ MassUnits (truncation loses at
   * most one unit per edge per round).
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, dampPct: Int = 85, symmetrize: Boolean = false): DataFrame = {
    require(iters >= 1 && dampPct >= 0 && dampPct <= 100)
    import org.apache.spark.HashPartitioner
    import org.apache.spark.storage.StorageLevel
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = edges.sparkSession
    // iterative message passing is the second genuine RDD case in this
    // engine (the first: duplicateClusters' min-label loop): a DataFrame
    // loop builds a NEW plan per round and pays Janino codegen each time
    // (measured 18 s first-run at sf0.1, 6 s warm), while co-partitioned
    // RDD joins make every round narrow except ONE reduceByKey shuffle
    // (~4 s cold). The DataFrame cache boundary below keeps the rdd
    // conversion from recomputing the caller's edge-derivation join under
    // the non-AQE plan.
    // `symmetrize` reverses edges HERE, after the cache boundary — a
    // caller-side `e0.unionAll(e0.reversed)` plants the edge-derivation
    // subtree twice in one plan and computes it twice (measured ~2× the
    // derivation join at sf0.1); the flatMap pays one cached pass
    val eDf = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).cache()
    val nEdges = eDf.count() * (if (symmetrize) 2 else 1)
    // shuffle width sized to the graph, not the cluster default
    val width = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      nEdges / 100000L + 1L)).toInt
    val part = new HashPartitioner(width)
    val raw = eDf.rdd.map(r => (r.getLong(0), r.getLong(1)))
    val e = (if (symmetrize) raw.flatMap { case (a, b) => Iterator((a, b), (b, a)) }
             else raw)
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    // out-degree ≥ 1 for every node (the documented contract) means the
    // degree table's key set IS the node set — no separate distinct pass,
    // and `deg` doubles as the rank-row skeleton. Local jobs are
    // overhead-bound at this scale, so fewer actions matter as much as
    // fewer shuffles.
    val deg = e.mapValues(_ => 1L).reduceByKey(part, _ + _)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = deg.count()
    val init = MassUnits / n
    val base = (init * (100 - dampPct)) / 100
    // degree joined INTO the partitioned edge list once — each round's
    // contribution map is then a narrow pass over (src, (dst, deg))
    val ed = e.join(deg).persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = deg.mapValues(_ => init)
    for (_ <- 0 until iters) {
      val contrib = ed.join(ranks) // co-partitioned: narrow
        .map { case (_, ((dst, d), r)) => (dst, r / d) }
        .reduceByKey(part, _ + _) // the round's one shuffle
      val next = deg.leftOuterJoin(contrib) // co-partitioned: narrow
        .mapValues { case (_, s) => base + s.getOrElse(0L) * dampPct / 100 }
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      ranks.unpersist(false)
      ranks = next
    }
    ed.unpersist(false)
    deg.unpersist(false)
    e.unpersist(false)
    eDf.unpersist(false)
    spark.createDataFrame(
      ranks.map { case (node, rank) => Row(node, rank) },
      StructType(Seq(StructField("node", LongType, nullable = false),
        StructField("rank", LongType, nullable = false))))
  }
}
