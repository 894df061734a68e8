package graft.plans

import org.apache.spark.sql.SparkSession, org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.geo.{Coord, Projection}
import graft.functions.GeoFunctions._

/**
 * Catalyst optimizer rule for the geometry expression algebra
 * (SURVEY.md §4 "optional transform-folding rule", grown into the
 * fusions that matter): chains like
 * `st_x(st_force2d(st_transform(st_setsrid(st_point(x,y), s), 4326)))`
 * — the Q-georef/Q-reproject hot path — build and parse an EWKB blob at
 * every step. The rule rewrites them into direct double arithmetic
 * (`TransformPointCoord`), eliminating every intermediate allocation.
 *
 * Also folds the no-ops the import pipeline generates mechanically:
 * force2d of an already-2D point, setsrid-of-setsrid, coordinate and
 * type extraction from a fresh point constructor.
 *
 * Scope note (observed on the real query plans): fusion applies when the
 * chain sits inside ONE projection. When a geometry column is built in one
 * `withColumn` and consumed by several extractors downstream,
 * CollapseProject correctly declines to inline the non-cheap constructor
 * into multiple consumers — the shared EWKB intermediate is then built
 * once and parsed per consumer, which is the better trade; the rule
 * deliberately does not undo that.
 */
object GeoRules {

  /** Direct lon/lat of (x, y, srcSrid) reprojected to WGS84 — the fusion
    * target; no EWKB is ever materialized. */
  case class TransformPointCoord(
      first: Expression, second: Expression, third: Expression, isY: Boolean)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String =
      if (isY) "transform_point_y" else "transform_point_x"
    override def nullSafeEval(x: Any, y: Any, srid: Any): Any = {
      val c = Projection.toWgs84(
        Coord(x.asInstanceOf[Double], y.asInstanceOf[Double]),
        srid.asInstanceOf[Int])
      if (isY) c.y else c.x
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(f, s, t, isY)
  }

  object GeoSimplifyRule extends Rule[LogicalPlan] {

    private def lit4326(e: Expression): Boolean = e match {
      case Literal(v: Int, IntegerType) => v == 4326
      case _ => false
    }

    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        // point constructors are 2D by construction
        case StForce2D(p: StPoint) => p
        // retag-of-retag keeps only the outer srid
        case StSetSrid(StSetSrid(g, _), s) => StSetSrid(g, s)
        // extraction from a fresh point: no EWKB round trip
        case StX(StPoint(x, _)) => x
        case StY(StPoint(_, y)) => y
        case GeometryTypeExpr(_: StPoint) => Literal(UTF8String.fromString("POINT"), StringType)
        // srid of a fresh/retagged construction is statically known
        case StSrid(_: StPoint) => Literal(4326, IntegerType)
        case StSrid(StSetSrid(_, s)) => s
        // transform-of-transform keeps only the outer target (SURVEY §4's
        // fold): both routes pass through geographic coordinates, so the
        // composition is the direct projection — and skipping the
        // intermediate representation also skips its rounding error
        case StTransform(StTransform(g, _), t) => StTransform(g, t)
        // THE hot fusion: reprojected-point coordinate chains → direct math
        case StX(StForce2D(StTransform(StSetSrid(StPoint(x, y), s), t))) if lit4326(t) =>
          TransformPointCoord(x, y, s, isY = false)
        case StY(StForce2D(StTransform(StSetSrid(StPoint(x, y), s), t))) if lit4326(t) =>
          TransformPointCoord(x, y, s, isY = true)
        case StX(StTransform(StSetSrid(StPoint(x, y), s), t)) if lit4326(t) =>
          TransformPointCoord(x, y, s, isY = false)
        case StY(StTransform(StSetSrid(StPoint(x, y), s), t)) if lit4326(t) =>
          TransformPointCoord(x, y, s, isY = true)
      }
  }

  /** Runtime injection for an existing session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_ eq GeoSimplifyRule))
      spark.experimental.extraOptimizations = existing :+ GeoSimplifyRule
  }
}

/**
 * Session-extensions entry point: lets any deployment enable the engine
 * with `--conf spark.sql.extensions=graft.plans.GraftSparkExtensions`
 * (rule + SQL function registration, no code changes).
 */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => GeoRules.GeoSimplifyRule)
  }
}
