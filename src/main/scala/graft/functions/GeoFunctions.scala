package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.{call_function, floor, least, lit, shiftleft, shiftright}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.geo.{Coord, Geometry, Point, Projection}

/**
 * Geometry scalar functions (SURVEY.md §2.8 F7-F12) as native Catalyst
 * expressions — `CodegenFallback` for now, null-safe, no UDF/serde overhead
 * beyond the EWKB bytes themselves.
 *
 * Geometry columns are `BinaryType` carrying little-endian EWKB (embedded
 * SRID), directly compatible with PostGIS for the JDBC sink.
 *
 * Reference semantics each expression reproduces:
 *  - st_geomfromgeojson: GeoJSON text → geometry, null on parse failure
 *    (silent-skip semantics, importer.rb:282-284).
 *  - st_geomfromtext(wkt, srid): importer.rb:281,320-331.
 *  - st_point(lon, lat): POINT constructor half of Q-georef
 *    (importer.rb:320-331); range validation lives in the caller (P3).
 *  - st_asgeojson(geom, maxdecimaldigits): spec oracle, import_spec.rb:413-416.
 *  - geometrytype: importer.rb:378.
 *  - st_force2d + st_transform(geom, 4326): importer.rb:380.
 */
object GeoFunctions {

  private def geomArg(v: Any): Option[Geometry] =
    Geometry.fromEwkb(v.asInstanceOf[Array[Byte]]).map(_._1)

  case class StGeomFromGeoJson(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "st_geomfromgeojson"
    override def nullSafeEval(v: Any): Any =
      Geometry.fromGeoJson(v.toString).map(Geometry.toEwkb(_, 4326)).orNull
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  case class StGeomFromText(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "st_geomfromtext"
    override def nullSafeEval(wkt: Any, srid: Any): Any =
      Geometry.fromWkt(wkt.toString)
        .map(Geometry.toEwkb(_, srid.asInstanceOf[Int])).orNull
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  case class StPoint(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_point"
    override def nullSafeEval(lon: Any, lat: Any): Any =
      Geometry.toEwkb(
        Point(Coord(lon.asInstanceOf[Double], lat.asInstanceOf[Double])), 4326)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  case class StAsGeoJson(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "st_asgeojson"
    override def nullSafeEval(g: Any, precision: Any): Any =
      geomArg(g).map(geom =>
        UTF8String.fromString(
          Geometry.toGeoJson(geom, precision.asInstanceOf[Int]))).orNull
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  case class StAsText(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "st_astext"
    override def nullSafeEval(g: Any): Any =
      geomArg(g).map(geom => UTF8String.fromString(Geometry.toWkt(geom))).orNull
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** PostGIS `GeometryType` — "POINT", "MULTIPOLYGON", … (importer.rb:378). */
  case class GeometryTypeExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "geometrytype"
    override def nullSafeEval(g: Any): Any =
      geomArg(g).map(geom => UTF8String.fromString(geom.typeName)).orNull
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  case class StForce2D(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "st_force2d"
    override def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[Array[Byte]]
      Geometry.fromEwkb(bytes).map { case (g, srid) =>
        Geometry.toEwkb(g.force2D, srid.getOrElse(0))
      }.orNull
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** ST_Transform to EPSG:4326 (the only target the reference uses). The
    * source SRID is read from the EWKB header; unsupported SRIDs pass
    * through (reference swallows reprojection errors, importer.rb:383-385). */
  case class StTransform(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "st_transform"
    override def nullSafeEval(v: Any, target: Any): Any = {
      val bytes = v.asInstanceOf[Array[Byte]]
      val tgt = target.asInstanceOf[Int]
      Geometry.fromEwkb(bytes).map { case (g, sridOpt) =>
        val src = sridOpt.getOrElse(0)
        if (tgt != 4326 || src == 4326 || src == 0)
          Geometry.toEwkb(g, tgt)
        else Geometry.toEwkb(Projection.transformTo4326(g, src), 4326)
      }.orNull
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  case class StSetSrid(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "st_setsrid"
    override def nullSafeEval(v: Any, srid: Any): Any =
      Geometry.fromEwkb(v.asInstanceOf[Array[Byte]])
        .map { case (g, _) => Geometry.toEwkb(g, srid.asInstanceOf[Int]) }.orNull
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  case class StSrid(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "st_srid"
    override def nullSafeEval(v: Any): Any =
      Geometry.sridOf(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  case class StX(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "st_x"
    override def nullSafeEval(v: Any): Any = geomArg(v) match {
      case Some(Point(c)) => c.x
      case _ => null
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  case class StY(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "st_y"
    override def nullSafeEval(v: Any): Any = geomArg(v) match {
      case Some(Point(c)) => c.y
      case _ => null
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Register every geometry function in the session's FunctionRegistry so
    * they are callable from SQL and via `call_function`. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def one(name: String, arity: Int)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, es => {
        require(es.length == arity, s"$name expects $arity args, got ${es.length}")
        builder(es)
      }, "built-in")
    one("st_geomfromgeojson", 1)(es => StGeomFromGeoJson(es.head))
    one("st_geomfromtext", 2)(es => StGeomFromText(es(0), es(1)))
    one("st_point", 2)(es => StPoint(es(0), es(1)))
    one("st_asgeojson", 2)(es => StAsGeoJson(es(0), es(1)))
    one("st_astext", 1)(es => StAsText(es.head))
    one("geometrytype", 1)(es => GeometryTypeExpr(es.head))
    one("st_force2d", 1)(es => StForce2D(es.head))
    one("st_transform", 2)(es => StTransform(es(0), es(1)))
    one("st_setsrid", 2)(es => StSetSrid(es(0), es(1)))
    one("st_srid", 1)(es => StSrid(es.head))
    one("st_x", 1)(es => StX(es.head))
    one("st_y", 1)(es => StY(es.head))
  }

  // ------------------------------------------------- Column-level API (F7-F12)

  def st_geomfromgeojson(c: Column): Column = call_function("st_geomfromgeojson", c)
  def st_geomfromtext(c: Column, srid: Int = 4326): Column =
    call_function("st_geomfromtext", c, lit(srid))
  def st_point(lon: Column, lat: Column): Column =
    call_function("st_point", lon.cast(DoubleType), lat.cast(DoubleType))
  def st_asgeojson(c: Column, precision: Int = 15): Column =
    call_function("st_asgeojson", c, lit(precision))
  def st_astext(c: Column): Column = call_function("st_astext", c)
  def geometry_type(c: Column): Column = call_function("geometrytype", c)
  def st_force2d(c: Column): Column = call_function("st_force2d", c)
  def st_transform(c: Column, targetSrid: Int): Column =
    call_function("st_transform", c, lit(targetSrid))
  def st_setsrid(c: Column, srid: Int): Column = call_function("st_setsrid", c, lit(srid))
  def st_srid(c: Column): Column = call_function("st_srid", c)
  def st_x(c: Column): Column = call_function("st_x", c)
  def st_y(c: Column): Column = call_function("st_y", c)

  /**
   * Z-order (Morton) cell of a lon/lat point at `bits` bits per axis —
   * the scale substitute for the reference's per-table GiST index
   * (importer.rb:274,332,382): sorting/partitioning parquet by this key
   * clusters spatially-near rows into the same files and row groups, so
   * a spatial predicate prunes at the file level (D5 in SURVEY §2.10).
   * Built entirely from codegen'd integer built-ins (unrolled interleave,
   * no custom expression, no UDF); exact same bit arithmetic replays in
   * the DuckDB oracle.
   */
  def zorder_cell(lon: Column, lat: Column, bits: Int = 15): Column = {
    require(bits > 0 && bits <= 31, "bits per axis must be in 1..31")
    val n = 1L << bits
    val x = least(floor((lon + 180.0) / 360.0 * n), lit(n - 1)).cast("long")
    val y = least(floor((lat + 90.0) / 180.0 * n), lit(n - 1)).cast("long")
    (0 until bits).map { b =>
      val xb = shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b)
      val yb = shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
      (xb + yb): Column
    }.reduce(_ + _)
  }
}
