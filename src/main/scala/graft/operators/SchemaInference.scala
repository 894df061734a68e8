package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}

import graft.core.TypeLattice.{State, TFloat, TInteger, TVarchar}

/**
 * Distributed CSV type inference (SURVEY.md §2.4 A3): the reference's
 * per-column lattice fold (importer.rb:518-550) as ONE Spark `Aggregator`
 * carrying the state of every column at once — a single pass over the data,
 * map-side partial states per partition, tiny driver-side final merge.
 * No shuffle of the data itself (partial aggregation reduces each partition
 * to one Array[State]).
 *
 * Scale note: the reference scans every row; at 100 TB one samples.
 * `inferTypes(df, sampleRows = Some(n))` caps the scan (documented
 * divergence, SURVEY.md §4).
 */
object SchemaInference {

  /** All-columns lattice fold: Row of N string cells → N States. */
  class AllColumnsAgg(n: Int) extends Aggregator[Row, Array[State], String] {
    def zero: Array[State] = Array.fill(n)(State.empty)
    def reduce(b: Array[State], row: Row): Array[State] = {
      var i = 0
      while (i < n) {
        b(i) = b(i).update(if (row.isNullAt(i)) null else row.getString(i))
        i += 1
      }
      b
    }
    def merge(l: Array[State], r: Array[State]): Array[State] = {
      var i = 0
      while (i < n) { l(i) = l(i).merge(r(i)); i += 1 }
      l
    }
    // comma-joined so the output rides a plain STRING encoder
    def finish(s: Array[State]): String = s.map(_.result match {
      case TInteger => "integer"
      case TFloat   => "float"
      case TVarchar => "varchar"
    }).mkString(",")
    def bufferEncoder: Encoder[Array[State]] = Encoders.kryo[Array[State]]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Infer the reference-lattice type of every column in one pass.
    * Returns columnName → "integer" | "float" | "varchar". */
  def inferTypes(df: DataFrame, sampleRows: Option[Long] = None): Map[String, String] = {
    val src0 = sampleRows.map(n => df.limit(n.toInt)).getOrElse(df)
    val cols = src0.columns
    val src = src0.select(cols.map(c => col(c).cast(StringType).as(c)).toIndexedSeq: _*)
    val names = cols.toIndexedSeq
    val agg = udaf(new AllColumnsAgg(names.length), Encoders.row(src.schema))
    val joined = src.select(agg(names.map(col): _*).as("types")).head().getString(0)
    names.zip(joined.split(",", -1).toIndexedSeq).toMap
  }

  /** Spark DataType for a reference-lattice type name (SURVEY.md §1.4). */
  def toSparkType(latticeName: String): DataType = latticeName match {
    case "integer" => LongType
    case "float"   => DoubleType
    case _         => StringType
  }

  /** Cast string columns of `df` per the inferred lattice (comma/pipe
    * decimal separators normalized to '.' before the double cast, matching
    * the float regex that admitted them — importer.rb:528). */
  def applyInferredTypes(df: DataFrame, types: Map[String, String]): DataFrame = {
    val cols = df.columns.map { c =>
      types.getOrElse(c, "varchar") match {
        case "integer" => col(c).cast(LongType).as(c)
        case "float"   => translate(col(c), ",|", "..").cast(DoubleType).as(c)
        case _         => col(c).as(c)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
