package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.{GeoFunctions => G}

class GeoRulesSpec extends AnyFunSuite with SparkTestBase {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("reproject coordinate chain fuses to direct math") {
    val df = spark.range(3).toDF("i")
      .withColumn("x", col("i").cast("double") * 100000)
      .withColumn("y", col("i").cast("double") * 50000)
      .select(
        G.st_x(G.st_force2d(G.st_transform(
          G.st_setsrid(G.st_point(col("x"), col("y")), 3857), 4326))).as("lon"),
        G.st_y(G.st_transform(
          G.st_setsrid(G.st_point(col("x"), col("y")), 3857), 4326)).as("lat"))
    val plan = planOf(df)
    assert(plan.contains("transform_point_x"), plan)
    assert(plan.contains("transform_point_y"), plan)
    assert(!plan.contains("st_point"), plan) // constructor fused away
    // values identical to the unfused EWKB path
    val rows = df.collect()
    val c = graft.core.geo.Projection.toWgs84(graft.core.geo.Coord(200000, 100000), 3857)
    assert(math.abs(rows(2).getDouble(0) - c.x) < 1e-12)
    assert(math.abs(rows(2).getDouble(1) - c.y) < 1e-12)
  }

  test("point extraction and no-op folds") {
    val df = spark.range(1).toDF("i")
      .select(
        G.st_x(G.st_point(lit(3.0), lit(4.0))).as("x"),
        G.geometry_type(G.st_point(lit(1.0), lit(2.0))).as("gt"),
        G.st_srid(G.st_setsrid(G.st_point(lit(1.0), lit(2.0)), 3857)).as("srid"))
    val plan = planOf(df)
    assert(!plan.contains("st_point"), plan)
    val r = df.head()
    assert(r.getDouble(0) == 3.0)
    assert(r.getString(1) == "POINT")
    assert(r.getInt(2) == 3857)
  }

  test("rule is semantics-preserving on the reproject query") {
    // same query with and without the rule installed → identical results
    val dir = "/root/testdata/sf0.001"
    val withRule = graft.SparkEntry.queries("reproject_points")(spark, dir).collect()
    val cleared = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq.empty
    try {
      val withoutRule = graft.SparkEntry.queries("reproject_points")(spark, dir).collect()
      assert(withRule.map(_.toString).sameElements(withoutRule.map(_.toString)))
    } finally spark.experimental.extraOptimizations = cleared
  }

  test("transform-of-transform folds to the outer target") {
    val df = spark.range(3).toDF("i")
      .withColumn("x", col("i").cast("double") + 1.0)
      .withColumn("y", col("i").cast("double") + 2.0)
      .withColumn("g", G.st_setsrid(G.st_point(col("x"), col("y")), 4326))
      .select(G.st_astext(
        G.st_transform(G.st_transform(col("g"), 3857), 4326)).as("wkt"))
    val plan = planOf(df)
    // exactly one st_transform survives (the outer one)
    assert("st_transform".r.findAllIn(plan).length == 1, plan)
    // and the fold makes the round trip EXACT: 4326→3857→4326 without the
    // rule can only be approximately identity; with it, bit-identical
    val direct = spark.range(3).toDF("i")
      .withColumn("x", col("i").cast("double") + 1.0)
      .withColumn("y", col("i").cast("double") + 2.0)
      .select(G.st_astext(
        G.st_setsrid(G.st_point(col("x"), col("y")), 4326)).as("wkt"))
      .collect().map(_.getString(0))
    assert(df.collect().map(_.getString(0)).sameElements(direct))
  }
}
