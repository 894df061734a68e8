package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ObserveSpec extends AnyFunSuite with SparkTestBase {

  test("qualityObservation: metrics ride the pass — exact counts, no second scan") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(10L)), (2L, None, Some(20L)),
      (3L, Some("c"), None), (4L, None, None))
      .toDF("id", "s", "v")
    val (observed, obs) = Observe.qualityObservation(df, Seq("s", "v"))
    // the observation must not change the data. NOTE: the action is a
    // plain collect, not an orderBy — a global sort's range-partitioner
    // SAMPLING pass re-evaluates the child, so CollectMetrics would
    // accumulate twice (observe above the sort, or avoid sorting the
    // observed node; the operator scaladoc documents this)
    assert(observed.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    val m = obs.get
    assert(m("n_rows") == 4L)
    assert(m("s_nulls") == 2L)
    assert(m("v_nulls") == 2L)
    // the metrics are computed by a CollectMetrics node inside the plan,
    // not a separate job
    assert(observed.queryExecution.analyzed.toString.contains("CollectMetrics"),
      "observation must be a plan node, not a second scan")
  }

  test("gateObservation: kept/dropped audit on a real gate over the corpus") {
    val docs = spark.read.parquet(sf("documents"))
    val gated = TextAnalysis.blocklistFilter(docs, "doc_id", "text",
      Seq("dup", "badword"))
    val (observed, obs) = Observe.gateObservation(gated, "kept")
    val survivors = observed.filter(col("kept")).count()
    val m = obs.get
    assert(m("n_rows").asInstanceOf[Long] ==
      m("n_kept").asInstanceOf[Long] + m("n_dropped").asInstanceOf[Long])
    assert(m("n_kept") == survivors)
    // cross-check against an independent recount
    assert(m("n_dropped") == gated.filter(!col("kept")).count())
  }
}
