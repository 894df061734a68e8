package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{GeoFunctions => G}
import graft.functions.TextFunctions._
import graft.operators.{GeoPipeline, SchemaInference}

/**
 * Driver contract (see SURVEY.md §7): one `queries` entry per implemented
 * operator from the §2 inventory, with a DuckDB-equivalent oracle in
 * `oracleSql` wherever the operator is SQL-expressible.
 *
 * Determinism rules used throughout (the driver hash-compares values):
 *  - every query ends in a total ORDER BY;
 *  - double aggregates are rounded (sums to 2dp — double error ≪ 0.01 at
 *    these magnitudes); ratio-like outputs are kept as exact integers to
 *    dodge HALF_UP (Spark) vs HALF_EVEN (DuckDB) coin flips;
 *  - column names are aliased identically on both sides.
 */
object SparkEntry {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(s)
    s.read.parquet(s"$dir/$n.parquet")
  }

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects ([PARQUET_TYPE_ILLEGAL]); read nanos as long and convert to a
    * microsecond TimestampType column (truncation is harmless for the
    * windowing this table exists to exercise). */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      t(s, dir, "events")
        // integer div: epoch-nanos exceed 2^53, double division would lose µs
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } finally s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
  }

  /** Flagship: the reference's signature import dataflow (Q-georef,
    * SURVEY.md §2.11) — synthesize lat/lon, validate with P3 regexes,
    * build `the_geom` points, return georeferenced rows. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val withCoords = t(spark, dir, "customer")
      .withColumn("longitude", concat((col("c_custkey") % 360 - 180).cast("string"), lit(".5")))
      .withColumn("latitude", concat((col("c_custkey") % 180 - 90).cast("string"), lit(".25")))
    GeoPipeline.georeference(withCoords)
      .filter(col("the_geom").isNotNull)
      .select(col("c_custkey"), G.st_astext(col("the_geom")).as("wkt"))
  }

  // ------------------------------------------------------------------ queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.4 hash aggregation (TPC-H Q1 shape: partial agg + tiny shuffle)
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // §2.3 joins: fact-fact shuffle join + broadcast dims (nation is tiny)
    "q2_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    // §2.6 top-k: agg + TakeOrderedAndProject (no global sort materialized)
    "q3_topk" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // §2.5 window functions: row_number + running sum per customer
    "q4_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("run_total",
          round(sum(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("rn"), col("run_total"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // §2.7 set operations: INTERSECT + EXCEPT on dimension keys
    "q5_setops" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
      cn.intersect(sn).select(lit("both").as("tag"), col("nationkey"))
        .unionAll(cn.except(sn).select(lit("cust_only").as("tag"), col("nationkey")))
        .orderBy(col("tag"), col("nationkey"))
    }),

    // §2.2 filters/predicate pushdown: selective scan, exact row values
    "q6_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") < 0.02 &&
          col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // §2.4 distinct aggregation
    "q7_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("d_parts"),
        countDistinct(col("l_suppkey")).as("d_supps"),
        count(lit(1)).as("n_rows"))
    }),

    // §2.4 grouping sets (rollup)
    "q8_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("sum_qty"), col("cnt"))
        .orderBy(col("rflag"), col("lstatus"))
    }),

    // §2.3 semi/anti joins (EXISTS / NOT EXISTS)
    "q9_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("with_orders"))
      val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("without_orders"))
      semi.join(anti, Seq("c_nationkey"), "full_outer")
        .na.fill(0, Seq("with_orders", "without_orders"))
        .orderBy(col("c_nationkey"))
    }),

    // §2.6 global sort + limit
    "q10_sort" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // §2.9 (batch analog of the streaming hourly window over events)
    "q11_events_hourly" -> ((s, dir) => {
      events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // §2.8 F2 sanitize as a data function over dirty synthesized labels
    "sanitize_cols" -> ((s, dir) => {
      t(s, dir, "part")
        .withColumn("dirty", concat(lit("<b>"), col("p_brand"), lit("</b> "),
          col("p_type"), lit(" &#xe1; "), col("p_size").cast("string")))
        .select(col("p_partkey"), sanitize_identifier(col("dirty")).as("clean"))
        .orderBy(col("p_partkey"))
    }),

    // §2.11 Q-georef: synonym detection + P3 validity regexes + st_point
    "georef_points" -> ((s, dir) => {
      val withCoords = t(s, dir, "customer")
        .withColumn("longitude",
          concat((col("c_custkey") % 360 - 180).cast("string"), lit(".5")))
        .withColumn("latitude",
          concat((col("c_custkey") % 180 - 90).cast("string"), lit(".25")))
      GeoPipeline.georeference(withCoords)
        .select(col("c_custkey"), G.st_astext(col("the_geom")).as("wkt"))
        .orderBy(col("c_custkey"))
    }),

    // §2.11 Q-geojson: embedded GeoJSON decode, null on parse failure
    "geojson_decode" -> ((s, dir) => {
      val gj = t(s, dir, "customer")
        .withColumn("the_geom",
          when(col("c_custkey") % 7 === 0, lit("{oops"))
            .otherwise(concat(lit("{\"type\":\"Point\",\"coordinates\":["),
              (col("c_custkey") % 300 - 150).cast("string"), lit(","),
              (col("c_custkey") % 160 - 80).cast("string"), lit("]}"))))
      GeoPipeline.decodeGeoJson(gj)
        .select(col("c_custkey"), G.st_astext(col("the_geom")).as("wkt"),
          G.geometry_type(col("the_geom")).as("gtype"))
        .orderBy(col("c_custkey"))
    }),

    // §2.11 Q-reproject: web-mercator coords → ST_Transform(…, 4326)
    "reproject_points" -> ((s, dir) => {
      val pts = t(s, dir, "orders")
        .withColumn("x", (col("o_orderkey") % 360 - 180) * lit(100000.0))
        .withColumn("y", (col("o_orderkey") % 170 - 85) * lit(100000.0))
        .withColumn("the_geom", G.st_setsrid(G.st_point(col("x"), col("y")), 3857))
      GeoPipeline.reprojectTo4326(pts)
        .select(col("o_orderkey"),
          round(G.st_x(col("the_geom")), 6).as("lon"),
          round(G.st_y(col("the_geom")), 6).as("lat"))
        .orderBy(col("o_orderkey"))
    }),

    // §2.4 A3: distributed type-lattice inference (one-pass aggregate)
    "type_infer" -> ((s, dir) => {
      val src = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"),
          col("l_shipdate"))
      val types = SchemaInference.inferTypes(src)
      import s.implicits._
      types.toSeq.sortBy(_._1).toDF("col_name", "lattice_type")
        .orderBy(col("col_name"))
    })
  )

  // ---------------------------------------------------------------- oracles

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_join" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q3_topk" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q4_window" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,

    "q5_setops" ->
      """SELECT 'both' AS tag, nationkey FROM (
        |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |  INTERSECT
        |  SELECT DISTINCT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'cust_only' AS tag, nationkey FROM (
        |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |  EXCEPT
        |  SELECT DISTINCT s_nationkey FROM supplier)
        |ORDER BY tag, nationkey""".stripMargin,

    "q6_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_discount < 0.02 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q7_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS d_parts,
        |  count(DISTINCT l_suppkey) AS d_supps,
        |  count(*) AS n_rows
        |FROM lineitem""".stripMargin,

    "q8_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |  coalesce(l_linestatus, 'ALL') AS lstatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS cnt
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin,

    "q9_semi_anti" ->
      """SELECT c_nationkey,
        |  count(*) FILTER (WHERE has_o) AS with_orders,
        |  count(*) FILTER (WHERE NOT has_o) AS without_orders
        |FROM (
        |  SELECT c_custkey, c_nationkey,
        |    EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_o
        |  FROM customer)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "q10_sort" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q11_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin,

    "sanitize_cols" ->
      """SELECT p_partkey,
        |  replace(replace(trim(replace(
        |    regexp_replace(regexp_replace(trim(
        |      regexp_replace(
        |        regexp_replace(
        |          lower(regexp_replace('<b>' || p_brand || '</b> ' || p_type || ' &#xe1; ' || CAST(p_size AS VARCHAR), '<[^>]+>', '', 'g')),
        |          '&.+?;', '-', 'g'),
        |        '[^a-z0-9 _-]', '-', 'g')),
        |      '\s+', '-', 'g'), '-+', '-', 'g'),
        |    '-', ' ')), ' ', '-'), '-', '_') AS clean
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "georef_points" ->
      """SELECT c_custkey,
        |  CASE WHEN regexp_matches(lon_s, '^(([-+]?(([0-9]|[1-9][0-9]|1[0-7][0-9])(\.[0-9]+)?))|[-+]?180)$')
        |        AND regexp_matches(lat_s, '^(([-+]?(([0-9]|[1-8][0-9])(\.[0-9]+)?))|[-+]?90)$')
        |       THEN 'POINT(' || lon_s || ' ' || lat_s || ')' END AS wkt
        |FROM (
        |  SELECT c_custkey,
        |    CAST(c_custkey % 360 - 180 AS VARCHAR) || '.5' AS lon_s,
        |    CAST(c_custkey % 180 - 90 AS VARCHAR) || '.25' AS lat_s
        |  FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "geojson_decode" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 7 = 0 THEN NULL
        |       ELSE 'POINT(' || CAST(c_custkey % 300 - 150 AS VARCHAR) || ' ' || CAST(c_custkey % 160 - 80 AS VARCHAR) || ')' END AS wkt,
        |  CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE 'POINT' END AS gtype
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "reproject_points" ->
      """SELECT o_orderkey,
        |  round(degrees((CAST(o_orderkey % 360 - 180 AS DOUBLE) * 100000.0) / 6378137.0), 6) AS lon,
        |  round(degrees(2 * atan(exp((CAST(o_orderkey % 170 - 85 AS DOUBLE) * 100000.0) / 6378137.0)) - pi() / 2), 6) AS lat
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "type_infer" ->
      """SELECT col_name, lattice_type FROM (
        |  SELECT 'l_orderkey' AS col_name,
        |    CASE WHEN bool_and(regexp_full_match(CAST(l_orderkey AS VARCHAR), '^[0-9]+$'))
        |          AND max(l_orderkey) <= 2147483647 THEN 'integer'
        |         WHEN bool_and(regexp_full_match(CAST(l_orderkey AS VARCHAR), '^-?[0-9]+[.|,][0-9]+$')) THEN 'float'
        |         ELSE 'varchar' END AS lattice_type FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity',
        |    CASE WHEN bool_and(regexp_full_match(CAST(l_quantity AS VARCHAR), '^[0-9]+$')) THEN 'integer'
        |         WHEN bool_and(regexp_full_match(CAST(l_quantity AS VARCHAR), '^-?[0-9]+[.|,][0-9]+$')) THEN 'float'
        |         ELSE 'varchar' END FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag',
        |    CASE WHEN bool_and(regexp_full_match(l_returnflag, '^[0-9]+$')) THEN 'integer'
        |         WHEN bool_and(regexp_full_match(l_returnflag, '^-?[0-9]+[.|,][0-9]+$')) THEN 'float'
        |         ELSE 'varchar' END FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate',
        |    CASE WHEN bool_and(regexp_full_match(CAST(l_shipdate AS VARCHAR), '^[0-9]+$')) THEN 'integer'
        |         WHEN bool_and(regexp_full_match(CAST(l_shipdate AS VARCHAR), '^-?[0-9]+[.|,][0-9]+$')) THEN 'float'
        |         ELSE 'varchar' END FROM lineitem)
        |ORDER BY col_name""".stripMargin
  )
}
