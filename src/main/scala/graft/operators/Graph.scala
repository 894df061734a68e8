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
   * (src, dst) pairs; callers wanting random-walk symmetry union the
   * reverse edges first. Every node must have out-degree ≥ 1 (true for
   * symmetrized graphs — dangling-mass redistribution is deliberately
   * out of scope so the oracle stays a pure join/group replay).
   *
   * Scale shape: one narrow groupBy for degrees, then per iteration one
   * equi-join ranks⋈edges (both keyed on the node id) and one groupBy on
   * dst — the classic message-passing shuffle pair, linear in |E| per
   * round. Degrees are joined INTO the edge list once, up front, so each
   * iteration moves only (src, dst, deg)+rank — no growing payload. Each
   * iteration's ranks are persisted and the previous unpersisted: the
   * plan never accumulates more than one round of lineage, so iteration
   * count can grow without the driver re-optimizing an ever-deeper tree.
   *
   * Returns (node, rank) with Σrank ≤ MassUnits (truncation loses at
   * most one unit per edge per round).
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, dampPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampPct >= 0 && dampPct <= 100)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count()
    val init = MassUnits / n
    val base = (init * (100 - dampPct)) / 100
    // degree rides on the edge row: contribution = rank / deg computes
    // edge-side, so the per-iteration shuffle carries one long per edge
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, "src").cache()
    ed.count() // materialize once; iterations reuse
    var ranks = nodes.select(col("node"), lit(init).as("rank")).cache()
    for (_ <- 0 until iters) {
      // `div`, not `/`: Spark's `/` on longs is DOUBLE division — the
      // integral `div` matches Java's truncating long division (and
      // DuckDB `//` for these non-negative values)
      val contrib = ed.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      val next = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          expr(s"${base}L + (coalesce(s, 0L) * $dampPct) div 100").as("rank"))
        .cache()
      next.count()
      ranks.unpersist(false)
      ranks = next
    }
    ed.unpersist(false)
    nodes.unpersist(false)
    ranks
  }
}
