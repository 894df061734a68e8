package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * ES `nested` documents/queries (VERDICT r18 #7) — the last ES
 * data-model concept without a counterpart here: documents holding
 * ARRAYS of sub-objects, where a query must match fields of the SAME
 * sub-object (Lucene indexes each nested object as its own hidden
 * child document in the parent's block; a query on the flattened
 * parent would cross-match fields from different children).
 *
 * This engine's representation is the relational flattening the survey
 * prescribes: child rows live in their own table keyed by the parent
 * id (a docvals-style sidecar — one row per nested object, so
 * same-object predicates are plain row predicates, the whole point of
 * nested). A `nested` query is then:
 *
 *   1. the child predicate over the CHILD table (pushed to its scan),
 *   2. per-child integer scores from `childScoreExpr`,
 *   3. one parent-keyed aggregate applying `score_mode`
 *      (max/sum/min/avg/count/none — ES's vocabulary; avg is avg1000,
 *      the engine's integer-ratio discipline),
 *   4. an inner join to parents (the semi-join that drops parents with
 *      no matching child — ES returns only parents whose nested query
 *      matches) and a distributed top-k.
 *
 * Scale shape: the child filter + partial aggregation run map-side
 * before the ONE shuffle on the parent key; the aggregated frame is
 * ≤ |parents with a matching child| rows joining parents on their own
 * key (AQE picks broadcast when it fits); top-k is
 * TakeOrderedAndProject. No window, no cartesian, no driver loop —
 * the plan survives a lineitem-scale child table.
 */
object Nested {

  val ScoreModes: Set[String] =
    Set("max", "sum", "min", "avg1000", "count", "none")

  /**
   * Top-k parents by nested-child match. `childPred` and
   * `childScoreExpr` are SQL expressions over the child table's
   * columns (integer-valued score — the engine's exact-replay
   * contract). Output: (parentIdCol, score, n_children) where
   * n_children counts the matching children (ES inner_hits' total),
   * ordered by (score desc, parent id) and cut to `k`.
   */
  def nestedTopK(parents: DataFrame, parentIdCol: String,
      children: DataFrame, childParentCol: String,
      childPred: String, childScoreExpr: String,
      scoreMode: String, k: Int): DataFrame =
    // nested IS has_child without the count band (review r20 #3: one
    // scoreMode/agg/join implementation, two ES query shapes) — the
    // default [1, ∞) band filters nothing because the aggregate only
    // emits parents with ≥ 1 matching child
    hasChildTopK(parents, parentIdCol, children, childParentCol,
      childPred, childScoreExpr, scoreMode, k)

  /**
   * The negative form ES expresses as `bool.must_not(nested(...))`:
   * parents with NO child matching the predicate — an anti-join, the
   * exclusion shape (a flattened-parent NOT would wrongly drop parents
   * where the fields match across DIFFERENT children; here the
   * same-object contract holds by construction).
   */
  def nestedMustNot(parents: DataFrame, parentIdCol: String,
      children: DataFrame, childParentCol: String,
      childPred: String): DataFrame = {
    val matched = children.filter(expr(childPred))
      .select(col(childParentCol).as("__pid"))
    parents.join(matched,
      parents(parentIdCol) === col("__pid"), "left_anti")
  }

  // ——— the JOIN-FIELD model (`has_child` / `has_parent`, VERDICT r19
  // #3): unlike `nested` (children frozen inside the parent's Lucene
  // block — reindex the parent to touch one child), the join field
  // keeps parent and child INDEPENDENTLY UPDATABLE documents. The
  // relational twin is exactly two tables joined on the parent key,
  // so the engine gets independent updates for free and only the
  // query shapes need defining.

  /**
   * ES `has_child`: parents having between `minChildren` and
   * `maxChildren` children matching `childPred` (ES's min_children/
   * max_children — the contract `nested` does NOT have), scored by
   * `scoreMode` over the per-child integer `childScoreExpr`
   * (score_mode=none ⇒ pure existence filter, score 0 — the ES
   * default). Output (parentIdCol, score, n_children), (score desc,
   * id) top-k.
   *
   * Scale shape = [[nestedTopK]]'s: child filter + partial agg
   * map-side before ONE shuffle on the parent key; the count bounds
   * apply to the AGGREGATED frame (a post-agg filter, never a window);
   * the parent join is key-on-key (AQE broadcasts the aggregated side
   * when it fits); top-k fuses to TakeOrderedAndProject.
   */
  def hasChildTopK(parents: DataFrame, parentIdCol: String,
      children: DataFrame, childParentCol: String,
      childPred: String, childScoreExpr: String, scoreMode: String,
      k: Int, minChildren: Int = 1,
      maxChildren: Int = Int.MaxValue): DataFrame = {
    require(ScoreModes.contains(scoreMode),
      s"score_mode '$scoreMode' not in ${ScoreModes.toSeq.sorted.mkString("{", ",", "}")}")
    require(k >= 1, s"k must be positive, got $k")
    require(minChildren >= 1 && maxChildren >= minChildren,
      s"need 1 <= min_children <= max_children, got " +
        s"$minChildren..$maxChildren")
    val matched = children.filter(expr(childPred))
      .select(col(childParentCol).as("__pid"),
        expr(childScoreExpr).cast("long").as("__cscore"))
    val score = scoreMode match {
      case "max" => max(col("__cscore"))
      case "min" => min(col("__cscore"))
      case "sum" => sum(col("__cscore"))
      case "avg1000" => expr("(sum(__cscore) * 1000) div count(__cscore)")
      case "count" => count(lit(1))
      case "none" => lit(0L)
    }
    val perParent = matched.groupBy(col("__pid"))
      .agg(score.cast("long").as("score"),
        count(lit(1)).cast("long").as("n_children"))
      .filter(col("n_children") >= minChildren &&
        col("n_children") <= maxChildren)
    parents.select(col(parentIdCol))
      .join(perParent, col(parentIdCol) === col("__pid"))
      .select(col(parentIdCol), col("score"), col("n_children"))
      .orderBy(col("score").desc, col(parentIdCol))
      .limit(k)
  }

  /**
   * ES `has_parent`: CHILD documents whose parent matches
   * `parentPred`, each child carrying its parent's integer
   * `parentScoreExpr` (ES `score=true` propagation; pass a literal
   * `0` for the score=false default). `childCols` are the child
   * columns to return. Output (childCols…, score), (score desc,
   * childCols asc) top-k.
   *
   * The inverse join shape: the PARENT side is filtered first (its
   * predicate pushes to the parent scan), then joined key-on-key into
   * the children — one parent row fans out to its children, never a
   * cartesian; AQE broadcasts the filtered parent frame when it fits
   * (the common case: a selective parent predicate over the smaller
   * table). Top-k fuses to TakeOrderedAndProject.
   */
  def hasParentTopK(children: DataFrame, childParentCol: String,
      childCols: Seq[String], parents: DataFrame, parentIdCol: String,
      parentPred: String, parentScoreExpr: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(childCols.nonEmpty, "need at least one child column")
    val matched = parents.filter(expr(parentPred))
      .select(col(parentIdCol).as("__pid"),
        expr(parentScoreExpr).cast("long").as("score"))
    children
      .join(matched, col(childParentCol) === col("__pid"))
      .select((childCols.map(col) :+ col("score")): _*)
      .orderBy(col("score").desc +: childCols.map(col): _*)
      .limit(k)
  }
}
