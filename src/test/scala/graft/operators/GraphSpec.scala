package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class GraphSpec extends AnyFunSuite with SparkTestBase {

  /** Driver-side reference: same integer fixed-point spec, including the
    * dangling-mass redistribution (share = Σ sink ranks // n). */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val init = Graph.MassUnits / nodes.size
    val base = init * 15 / 100
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val sinks = nodes.filterNot(deg.contains)
    var rank = nodes.map(_ -> init).toMap
    for (_ <- 0 until iters) {
      val s = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (a, b) => s(b) += rank(a) / deg(a) }
      val share = if (sinks.isEmpty) 0L else sinks.map(rank).sum / nodes.size
      rank = nodes.map(nd => nd -> (base + (s(nd) + share) * 85 / 100)).toMap
    }
    rank
  }

  test("pagerank: star graph, one round, exact hand-computed integers") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = Graph.pageRank(e, "src", "dst", iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // init = 1e12/3 = 333333333333; base = init*15/100 = 49999999999
    // hub: 2*333333333333*85/100 + base; leaves: (init/2)*85/100 + base
    assert(got(1L) == 616666666665L)
    assert(got(2L) == 191666666665L)
    assert(got(3L) == 191666666665L)
    // symmetrize flag == explicit reverse-union (star has no mutual pairs)
    val viaFlag = Graph.pageRank(Seq((1L, 2L), (1L, 3L)).toDF("src", "dst"),
      "src", "dst", iters = 1, symmetrize = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaFlag == got)
  }

  test("pagerank == driver reference on a deterministic graph; mass conserved") {
    import spark.implicits._
    // ring + chords, symmetrized — every node has out-degree >= 1
    val base = (0L until 40L).flatMap(i => Seq(
      (i, (i + 1) % 40), (i, (i * 7 + 3) % 40)))
    val edges = (base ++ base.map(_.swap)).distinct
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPageRank(edges, 3))
    val total = got.values.sum
    assert(total <= Graph.MassUnits)
    // truncation losses are bounded: one unit per edge+node per round
    assert(total > Graph.MassUnits - 3L * (edges.size + 40 + 100))
    // gate proof: the distributed RDD loop (forced via driverMaxEdges=0)
    // produces the identical integer ranks as the driver path
    val distributed = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
      iters = 3, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == got)
  }

  test("pagerank: sink nodes hold rank, dangling mass is redistributed, mass conserved") {
    import spark.implicits._
    // cycle feeding sink 4, plus an isolated edge into sink 6
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (5L, 6L))
    val df = edges.toDF("src", "dst")
    val got = Graph.pageRank(df, "src", "dst", iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every node — including the sinks — appears with a rank
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(got == refPageRank(edges, 3))
    // sinks receive mass (strictly more than the undamped floor)
    val init = Graph.MassUnits / 6
    val floor = init * 15 / 100
    assert(got(4L) > floor && got(6L) > floor)
    // mass conservation: redistribution keeps the total near MassUnits
    // instead of leaking every sink's inflow each round
    val total = got.values.sum
    assert(total <= Graph.MassUnits)
    assert(total > Graph.MassUnits - 3L * (edges.size + 6 + 100).toLong)
    // distributed path agrees across the gate on the sink-bearing graph
    val distributed = Graph.pageRank(df, "src", "dst", iters = 3,
      driverMaxEdges = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == got)
  }

  test("pagerank: randomized sink-bearing graphs match the reference on both paths") {
    import spark.implicits._
    for (seed <- Seq(3L, 11L)) {
      // ~25% of nodes are pure sinks (targets above the src range)
      val edges = (0L until 300L).map { i =>
        val a = (i * seed) % 40
        val b = (i * (seed + 4) + 1) % 55 // 40..54 never appear as src → sinks
        (a, b)
      }.distinct.filter { case (a, b) => a != b }
      val df = edges.toDF("src", "dst")
      val want = refPageRank(edges, 3)
      val driver = Graph.pageRank(df, "src", "dst", iters = 3).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(driver == want, s"driver path diverged, seed=$seed")
      val dist = Graph.pageRank(df, "src", "dst", iters = 3, driverMaxEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == want, s"distributed path diverged, seed=$seed")
      val total = driver.values.sum
      assert(total <= Graph.MassUnits &&
        total > Graph.MassUnits - 3L * (edges.size + 60 + 100))
    }
  }

  test("pagerank: empty edge input returns an empty frame, no exception") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val res = Graph.pageRank(empty, "src", "dst", iters = 3)
    assert(res.columns.toSeq == Seq("node", "rank"))
    assert(res.count() == 0)
  }
}
