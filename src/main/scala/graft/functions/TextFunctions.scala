package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Identifier

/**
 * Identifier/text kernels exposed as data-side Catalyst expressions
 * (SURVEY.md §2.8 F1-F3). The same pure-Scala kernel that sanitizes schema
 * identifiers (driver side) is usable over row data — e.g. cleaning a
 * column of raw labels the way the reference cleans headers.
 */
object TextFunctions {

  /** F1: diacritic transliteration (string.rb:22-73, quirks included). */
  case class NormalizeTranslit(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "normalize_translit"
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(Identifier.normalize(v.toString))
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** F2: full sanitize chain (string.rb:75-80); blank → null. */
  case class SanitizeIdentifier(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "sanitize_identifier"
    override def nullSafeEval(v: Any): Any =
      Option(Identifier.sanitize(v.toString)).map(UTF8String.fromString).orNull
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** F3: sanitize + reserved-word/leading-char prefix (string.rb:82-89). */
  case class SanitizeColumnNameExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "sanitize_column_name"
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(Identifier.sanitizeColumnName(v.toString))
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("normalize_translit",
      es => NormalizeTranslit(es.head), "built-in")
    reg.createOrReplaceTempFunction("sanitize_identifier",
      es => SanitizeIdentifier(es.head), "built-in")
    reg.createOrReplaceTempFunction("sanitize_column_name",
      es => SanitizeColumnNameExpr(es.head), "built-in")
  }

  def normalize_translit(c: Column): Column = call_function("normalize_translit", c)
  def sanitize_identifier(c: Column): Column = call_function("sanitize_identifier", c)
  def sanitize_column_name(c: Column): Column = call_function("sanitize_column_name", c)
}
