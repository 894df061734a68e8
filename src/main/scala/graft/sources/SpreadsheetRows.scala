package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.Identifier
import graft.operators.SchemaInference

/**
 * Shared tail of every spreadsheet source (XLSX/ODS/XLS): the reference
 * converts sheets to CSV and re-enters the CSV path
 * (importer.rb:124-140), so all three readers materialize an all-strings
 * DataFrame — first row is the header, empty cells become null — and
 * run the same A3 type-lattice inference a CSV import would.
 */
object SpreadsheetRows {

  def toDataFrame(spark: SparkSession, all: Seq[IndexedSeq[String]],
      path: String, inferTypes: Boolean): DataFrame = {
    if (all.isEmpty) throw new IllegalArgumentException(s"empty spreadsheet: $path")
    val header = Identifier.sanitizeHeader(all.head)
    val width = header.length
    val data = all.tail.map(r =>
      Row.fromSeq((0 until width).map(i => r.lift(i).filter(_.nonEmpty).orNull)))
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data, math.max(1, data.length / 10000)), schema)
    if (!inferTypes) df
    else SchemaInference.applyInferredTypes(df, SchemaInference.inferTypes(df))
  }
}
