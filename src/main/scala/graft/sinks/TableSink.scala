package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Identifier

/**
 * Transactional table sink (SURVEY.md §2.10 D1/D2/D6): write to a staging
 * table `importing_<runid>_<name>`, then atomically rename to the final
 * name; on failure drop the staging table so a broken import is never
 * visible (reference: importer.rb:355,389,460-468). Collision resolution
 * suffixes `_1,_2,…` against the live catalog (importer.rb:562-575).
 */
object CatalogTableSink {

  final case class SinkResult(table: String, rows: Long)

  def existingTables(spark: SparkSession): Set[String] =
    spark.catalog.listTables().collect().map(_.name).toSet

  def write(spark: SparkSession, df: DataFrame, suggestedName: String,
      format: String = "parquet"): SinkResult = {
    val name = Identifier.resolveCollision(suggestedName, existingTables(spark))
    val staging = s"importing_${java.util.UUID.randomUUID().toString.take(8)}_$name"
    try {
      df.write.format(format).saveAsTable(staging)
      spark.sql(s"ALTER TABLE `$staging` RENAME TO `$name`")
      val rows = spark.table(name).count()
      SinkResult(name, rows)
    } catch {
      case e: Throwable =>
        // D6: rollback — failed imports leave no table behind
        try spark.sql(s"DROP TABLE IF EXISTS `$staging`") catch { case _: Throwable => }
        throw e
    }
  }

  /** §2.7 `append_to_table` parity (parsed but unused in the reference,
    * importer.rb:46-50; documented in README.md:46): UNION ALL into an
    * existing table. */
  def append(spark: SparkSession, df: DataFrame, table: String): SinkResult = {
    df.write.mode("append").saveAsTable(table)
    SinkResult(table, spark.table(table).count())
  }

  /**
   * Bucketed variant for co-located joins at scale: two tables bucketed
   * by their join key with the same bucket count join with NO exchange on
   * either side — the shuffle is paid once at write time instead of per
   * query. The staging/rename/rollback protocol is identical to `write`.
   */
  def writeBucketed(spark: SparkSession, df: DataFrame, suggestedName: String,
      bucketCol: String, buckets: Int,
      sortCol: Option[String] = None): SinkResult = {
    val name = Identifier.resolveCollision(suggestedName, existingTables(spark))
    val staging = s"importing_${java.util.UUID.randomUUID().toString.take(8)}_$name"
    try {
      val w0 = df.write.format("parquet").bucketBy(buckets, bucketCol)
      val w = sortCol.map(w0.sortBy(_)).getOrElse(w0)
      w.saveAsTable(staging)
      spark.sql(s"ALTER TABLE `$staging` RENAME TO `$name`")
      SinkResult(name, spark.table(name).count())
    } catch {
      case e: Throwable =>
        try spark.sql(s"DROP TABLE IF EXISTS `$staging`") catch { case _: Throwable => }
        throw e
    }
  }

  /**
   * Z-order-clustered parquet layout — the Parquet-side substitute for the
   * reference's per-table GiST index (importer.rb:274,332,382; D5 in
   * SURVEY §2.10). Range-partitions rows by their Morton cell and sorts
   * within partitions, so each file (= row group at these sizes) covers a
   * compact lon/lat rectangle; parquet min/max column stats then let a
   * bounding-box predicate skip whole row groups at scan time.
   * ZOrderPruneSpec measures the effect (scan-metric rows read, clustered
   * vs round-robin layout); the measured ratio is recorded in BASELINE.md.
   */
  def writeZOrdered(df: DataFrame, path: String, lonCol: String, latCol: String,
      numFiles: Int, bits: Int = 15): Unit = {
    import org.apache.spark.sql.functions.col
    val cell = graft.functions.GeoFunctions.zorder_cell(col(lonCol), col(latCol), bits)
    df.withColumn("__zcell", cell)
      .repartitionByRange(numFiles, col("__zcell"))
      .sortWithinPartitions("__zcell")
      .drop("__zcell")
      .write.mode("overwrite").parquet(path)
  }
}

/**
 * PostgreSQL/PostGIS sink (the reference's actual target; BASELINE.json
 * `spark_approach` = "JDBC write to Postgres via DataFrame"). Statement
 * generation is separated from execution behind `SqlExecutor` so the
 * DDL/flow logic is unit-testable without a live server (none exists in
 * this environment) and swappable for a pooled JDBC connection in
 * production.
 *
 * Geometry columns ride as EWKB hex: PostGIS casts
 * `'0101…'::geometry` natively, so `df.write.jdbc` of the hex string into
 * a geometry column round-trips without a driver-side geometry type.
 */
object PostgresSink {

  trait SqlExecutor {
    def execute(sql: String): Unit
    def tableNames(prefix: String): Seq[String]
  }

  def sparkToPgType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => "bigint"
      case IntegerType | ShortType => "integer"
      case DoubleType | FloatType => "double precision"
      case BooleanType => "boolean"
      case DateType => "date"
      case TimestampType => "timestamp"
      case d: DecimalType => s"numeric(${d.precision},${d.scale})"
      case BinaryType => "bytea"
      case _ => "text"
    }
  }

  /** DDL + maintenance statement plan for one import (D1-D6 sequence).
    * `geomCols` become PostGIS `geometry` columns with a GiST index
    * (importer.rb:273-274,332,382). */
  def plan(df: DataFrame, name: String, existing: Set[String],
      runId: String): Seq[String] = {
    val finalName = Identifier.resolveCollision(name, existing)
    val staging = s"importing_${runId}_$finalName"
    val cols = df.schema.fields.map { f =>
      val pgType =
        if (f.name == "the_geom") "geometry(Geometry,4326)"
        else sparkToPgType(f.dataType)
      s""""${f.name}" $pgType"""
    }
    val create = s"""CREATE TABLE "$staging" (${cols.mkString(", ")})"""
    val rename = s"""ALTER TABLE "$staging" RENAME TO "$finalName""""
    val gist =
      if (df.columns.contains("the_geom"))
        Seq(s"""CREATE INDEX "${finalName}_the_geom_gist" ON "$finalName" USING GIST (the_geom)""")
      else Seq.empty
    Seq(create, rename) ++ gist
  }

  /** Execute the plan around a data-load callback; rollback on failure. */
  def write(df: DataFrame, name: String, exec: SqlExecutor,
      load: String => Unit,
      runId: String = java.util.UUID.randomUUID().toString.take(8)): String = {
    val existing = exec.tableNames(name).toSet
    val stmts = plan(df, name, existing, runId)
    val staging = stmts.head.split("\"")(1)
    try {
      exec.execute(stmts.head) // CREATE staging
      load(staging)            // df.write.jdbc(..., staging, ...)
      stmts.tail.foreach(exec.execute) // RENAME + GiST
      stmts(1).split("\"")(3)  // final name
    } catch {
      case e: Throwable =>
        try exec.execute(s"""DROP TABLE IF EXISTS "$staging"""") catch { case _: Throwable => }
        throw e
    }
  }
}
