package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * ES `nested` queries over the flattened child-table representation —
 * score modes, the same-object matching contract that motivates
 * nesting in the first place, and the must_not exclusion form.
 */
class NestedSpec extends AnyFunSuite with SparkTestBase {

  private def parents: DataFrame = {
    import spark.implicits._
    Seq(1L, 2L, 3L, 4L).toDF("pid")
  }

  // children: (parent, category, qty) — parent 3's rows match the
  // two-field predicate only ACROSS rows, never within one
  private def children: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "a", 10L), (1L, "a", 30L), (1L, "b", 5L),
      (2L, "a", 20L),
      (3L, "a", 1L), (3L, "b", 50L)
      // parent 4 has no children at all
    ).toDF("pid", "cat", "qty")
  }

  private def topk(mode: String, pred: String = "cat = 'a'")
      : Seq[(Long, Long, Long)] =
    Nested.nestedTopK(parents, "pid", children, "pid",
      pred, "qty", mode, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq

  test("score modes: max/sum/min/avg1000/count/none over matching children only") {
    // cat='a' matches: p1 {10,30}, p2 {20}, p3 {1}; p4 drops (no match)
    assert(topk("max") == Seq((1L, 30L, 2L), (2L, 20L, 1L), (3L, 1L, 1L)))
    assert(topk("sum") == Seq((1L, 40L, 2L), (2L, 20L, 1L), (3L, 1L, 1L)))
    assert(topk("min").toSet ==
      Set((1L, 10L, 2L), (2L, 20L, 1L), (3L, 1L, 1L)))
    assert(topk("avg1000").toSet ==
      Set((1L, 20000L, 2L), (2L, 20000L, 1L), (3L, 1000L, 1L)))
    assert(topk("count").toSet ==
      Set((1L, 2L, 2L), (2L, 1L, 1L), (3L, 1L, 1L)))
    // none: the clause filters, scores 0 — parents still tie-break by id
    assert(topk("none") == Seq((1L, 0L, 2L), (2L, 0L, 1L), (3L, 0L, 1L)))
    assertThrows[IllegalArgumentException](topk("median"))
  }

  test("same-object contract: a two-field predicate never cross-matches children") {
    // cat='b' AND qty>=50: parent 3 has (b,50) in ONE row — matches;
    // parent 1 has cat='b' (qty 5) and qty>=50 nowhere — a flattened
    // parent-level AND of field predicates would wrongly... match
    // nothing here, but the classic failure is the OTHER direction:
    // parent 1 holds cat='b' in one child and qty=30 in another, so
    // flattening to parent-level arrays would match cat='b' AND
    // qty>=30 — the row-level predicate correctly refuses it
    assert(topk("max", "cat = 'b' AND qty >= 50") == Seq((3L, 50L, 1L)))
    assert(topk("max", "cat = 'b' AND qty >= 30") == Seq((3L, 50L, 1L)),
      "parent 1 cross-matched fields from different children")
  }

  test("must_not: parents with no matching child, childless parents included") {
    val got = Nested.nestedMustNot(parents, "pid", children, "pid",
      "cat = 'a' AND qty >= 20")
      .collect().map(_.getLong(0)).toSeq.sorted
    // matching children: (1,a,30), (2,a,20) → excluded; 3 and 4 stay
    assert(got == Seq(3L, 4L))
    // a predicate matching nothing keeps every parent
    assert(Nested.nestedMustNot(parents, "pid", children, "pid",
      "qty > 1000").count() == 4L)
  }

  test("has_child: min/max_children bound the MATCHING-child count; score modes as nested") {
    // cat='a' matches: p1 {10,30} (2 children), p2 {20} (1), p3 {1} (1)
    def hc(minC: Int, maxC: Int): Seq[(Long, Long, Long)] =
      Nested.hasChildTopK(parents, "pid", children, "pid",
        "cat = 'a'", "qty", "max", k = 10,
        minChildren = minC, maxChildren = maxC)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
    // default-ish band [1, many]: all three parents as nested would
    assert(hc(1, 99) == Seq((1L, 30L, 2L), (2L, 20L, 1L), (3L, 1L, 1L)))
    // min_children=2: only parent 1 qualifies
    assert(hc(2, 99) == Seq((1L, 30L, 2L)))
    // max_children=1: parents 2 and 3
    assert(hc(1, 1) == Seq((2L, 20L, 1L), (3L, 1L, 1L)))
    // the band counts MATCHING children, not all children: parent 1
    // has 3 rows but only 2 match cat='a' — max_children=2 keeps it
    assert(hc(2, 2) == Seq((1L, 30L, 2L)))
    assertThrows[IllegalArgumentException](hc(0, 5))
    assertThrows[IllegalArgumentException](hc(3, 2))
  }

  test("has_parent: children inherit the matching parent's propagated score; non-matching parents drop") {
    import spark.implicits._
    val ps = Seq((1L, "open", 100L), (2L, "closed", 900L),
      (3L, "open", 50L)).toDF("pid", "status", "weight")
    val got = Nested.hasParentTopK(children, "pid", Seq("pid", "qty"),
      ps, "pid", "status = 'open'", "weight * 10", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    // parents 1 (w 1000) and 3 (w 500) match; parent 2's child drops;
    // children order: score desc, then (pid, qty)
    assert(got == Seq(
      (1L, 5L, 1000L), (1L, 10L, 1000L), (1L, 30L, 1000L),
      (3L, 1L, 500L), (3L, 50L, 500L)))
    // k cuts inside a score tie deterministically (child-col order)
    assert(Nested.hasParentTopK(children, "pid", Seq("pid", "qty"),
      ps, "pid", "status = 'open'", "weight * 10", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 5L), (1L, 10L)))
  }

  test("top-k is a distributed TakeOrdered, never a global window; one shuffle for the agg") {
    val df = Nested.nestedTopK(parents, "pid", children, "pid",
      "cat = 'a'", "qty", "sum", k = 2)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"nested top-k must be TakeOrdered:\n$p")
    val unpartitioned = allPlanNodes(df.queryExecution.executedPlan)
      .collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
    assert(unpartitioned.isEmpty)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }
}
