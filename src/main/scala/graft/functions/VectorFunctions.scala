package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/**
 * Embedding-vector expressions for similarity search / near-dup detection
 * (north-star operators). Operate on `array<double>` (callers cast
 * `array<float>` up once); tight primitive loops, no boxing.
 */
object VectorFunctions {

  private def toDoubles(a: Any): Array[Double] =
    a.asInstanceOf[ArrayData].toDoubleArray()

  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = toDoubles(l); val b = toDoubles(r)
      val n = math.min(a.length, b.length)
      var s = 0.0; var i = 0
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "vec_cosine"
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = toDoubles(l); val b = toDoubles(r)
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) null else dot / denom
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  case class VecNorm(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_norm"
    override def nullSafeEval(v: Any): Any = {
      val a = toDoubles(v)
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * a(i); i += 1 }
      math.sqrt(s)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /**
   * Signed-random-projection LSH signature: `numPlanes` sign bits of dots
   * with Rademacher (±1) hyperplanes (Charikar, STOC'02). Parallel vectors
   * always share a bucket, so scaling-invariant near-dup recall is exact.
   * The ±1 entry for (plane j, dim i) is the parity of
   * ((j·4096 + i + 1 + seed)·2654435761 mod 1000000007) — plain
   * non-overflowing int64 arithmetic so the DuckDB oracle replays the
   * exact buckets in SQL (dims ≥ 4096 would reuse weights across planes;
   * embedding dims here are ≪ that).
   */
  case class HyperplaneSig(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "vec_lsh_bucket"
    override def nullSafeEval(v: Any, planes: Any, seed: Any): Any = {
      val a = toDoubles(v)
      val p = planes.asInstanceOf[Int]
      // accept INT or BIGINT seed literals (raw-SQL callers write plain 42)
      val s = seed.asInstanceOf[Number].longValue()
      var sig = 0
      var j = 0
      while (j < p) {
        var dot = 0.0
        var i = 0
        while (i < a.length) {
          val w = ((j * 4096 + i + 1).toLong + s) * 2654435761L % 1000000007L
          dot += (if ((w & 1L) == 1L) a(i) else -a(i))
          i += 1
        }
        if (dot >= 0) sig |= (1 << j)
        j += 1
      }
      sig
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine",
      es => CosineSim(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm",
      es => VecNorm(es.head), "built-in")
    reg.createOrReplaceTempFunction("vec_lsh_bucket",
      es => HyperplaneSig(es(0), es(1), es(2)), "built-in")
  }

  private val D = ArrayType(DoubleType)
  def vec_dot(a: Column, b: Column): Column =
    call_function("vec_dot", a.cast(D), b.cast(D))
  def vec_cosine(a: Column, b: Column): Column =
    call_function("vec_cosine", a.cast(D), b.cast(D))
  def vec_norm(a: Column): Column = call_function("vec_norm", a.cast(D))
  def vec_lsh_bucket(a: Column, planes: Int = 8, seed: Long = 42L): Column =
    call_function("vec_lsh_bucket", a.cast(D), lit(planes), lit(seed))
}
