package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}



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

  /**
   * All-columns lattice fold: Row of N string cells → N packed states.
   * The per-column state (first kind / first-as-breaker / break kind —
   * see TypeLattice.State) packs into ONE byte, so the aggregation buffer
   * is a plain N-byte array riding the BINARY encoder — no kryo, no
   * object graph per partial merge (the kryo version dominated the
   * type_infer benchmark).
   *
   * Byte layout: bits 0-1 first (0 unseen/1 int/2 float/3 varchar),
   * bits 2-3 firstAsBreaker (0 none/2 float/3 varchar),
   * bits 4-5 break_ (same coding).
   */
  class AllColumnsAgg(n: Int) extends Aggregator[Row, Array[Byte], String] {
    import graft.core.TypeLattice.{isFloatLooking, isIntLooking, overflowsInt32}
    import graft.core.Identifier.isBlank

    def zero: Array[Byte] = new Array[Byte](n)

    def reduce(b: Array[Byte], row: Row): Array[Byte] = {
      var i = 0
      while (i < n) {
        val v = if (row.isNullAt(i)) null else row.getString(i)
        if (v != null && !isBlank(v)) {
          val s = b(i)
          val first = s & 0x3
          val brk = (s >> 4) & 0x3
          if (first == 0) {
            // classify once: kind + breaker-if-nonfirst
            val (k, breaker) =
              if (isFloatLooking(v)) (2, 2)
              else if (isIntLooking(v)) (1, if (overflowsInt32(v)) 2 else 0)
              else (3, 3)
            b(i) = (k | (breaker << 2)).toByte
          } else if (first == 1 && brk == 0) {
            val breaker =
              if (isFloatLooking(v)) 2
              else if (isIntLooking(v)) { if (overflowsInt32(v)) 2 else 0 }
              else 3
            if (breaker != 0) b(i) = (s | (breaker << 4)).toByte
          } // float/varchar first, or already broken: sticky, nothing to do
        }
        i += 1
      }
      b
    }

    def merge(l: Array[Byte], r: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < n) {
        val a = l(i); val b = r(i)
        if ((a & 0x3) == 0) l(i) = b // left empty → take right wholesale
        else if ((a & 0x3) == 1 && ((a >> 4) & 0x3) == 0) {
          // left is unbroken integer: right's first-as-breaker, else its break
          val rb = { val fb = (b >> 2) & 0x3; if (fb != 0) fb else (b >> 4) & 0x3 }
          if (rb != 0) l(i) = (a | (rb << 4)).toByte
        }
        i += 1
      }
      l
    }

    // comma-joined so the output rides a plain STRING encoder
    def finish(s: Array[Byte]): String = s.map { b =>
      (b & 0x3) match {
        case 0 | 3 => "varchar"
        case 2     => "float"
        case 1     => ((b >> 4) & 0x3) match {
          case 0 => "integer"
          case 2 => "float"
          case _ => "varchar"
        }
      }
    }.mkString(",")

    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Infer the reference-lattice type of every column in one pass.
    * Returns columnName → "integer" | "float" | "varchar".
    *
    * TYPED-COLUMN ALGEBRA (r22, guide §2.3 "narrower types" applied to
    * the scan itself): the lattice is defined on each cell's STRING
    * rendering, but for a column whose Spark type pins that rendering,
    * the fold's outcome is a function of cheap numeric facts — no cast
    * to string, no regex/scanner, sometimes no read at all:
    *  - date/timestamp/boolean render with '-', ':' or letters in every
    *    row → every cell is varchar-looking → varchar, CONSTANT (the
    *    column prunes out of the scan entirely);
    *  - integral types render `-?[0-9]+`: all nulls → varchar; min ≥ 0
    *    and max ≤ 2^31−1 → integer (no breaker exists in any order);
    *    min < 0 and max ≤ 2^31−1 → varchar (the first value is either
    *    varchar-looking itself or an unbroken-int later broken by the
    *    first negative; float-looking renderings don't exist) — each
    *    verdict ORDER-INDEPENDENT, so one min/max/count aggregate
    *    decides; the one order-dependent corner (an overflow value that
    *    may or may not be the column's FIRST value, importer.rb:544 vs
    *    :527) falls back to the exact string fold;
    *  - double/float render via Java toString: plain `-?d+.d+` exactly
    *    when the value is 0 or 1e-3 ≤ |v| < 1e7 and finite (else
    *    scientific/NaN/Infinity → varchar-looking). All-safe → every
    *    cell float-looking → float (sticky from the first value in any
    *    order); any unsafe value → fall back;
    *  - decimal(p, s): s = 0 renders like integral (digits only, minus
    *    sign) → the integral rule incl. the overflow corner; 1 ≤ s ≤ 6
    *    renders plain with a '.' in every row (BigDecimal.toString goes
    *    scientific only when the adjusted exponent < −6, impossible at
    *    s ≤ 6) → float if any non-null else varchar; s ≥ 7 falls back;
    *  - string (the CSV import path) and anything else: the exact
    *    byte-state fold, unchanged.
    * The numeric gates and the string-column fold run as TWO OVERLAPPED
    * jobs, not one combined aggregate: mixing the Scala Aggregator with
    * declarative min/max in one aggregate drops the whole row path out
    * of codegen (measured 1.08 s combined vs 0.31 + 0.40 split at
    * sf0.1), each job scans only its own columns (columnar parquet —
    * no duplicate IO), and they are independent, so they overlap on a
    * two-thread pool (guide §2.6) — wall ≈ max, not sum. CSV-import
    * frames (all string) take exactly the old single-job fold.
    * SchemaInferenceSpec pins algebra ≡ fold per type on adversarial
    * values (overflows, negatives, NaN/Inf, tiny/huge doubles,
    * all-null).
    */
  def inferTypes(df: DataFrame, sampleRows: Option[Long] = None): Map[String, String] = {
    import org.apache.spark.sql.types._
    // clamp: limit takes an Int; a >2^31 cap means "effectively unbounded"
    val src0 = sampleRows.map(n => df.limit(math.min(n, Int.MaxValue.toLong).toInt)).getOrElse(df)
    val fields = src0.schema.fields.toIndexedSeq

    sealed trait Plan
    case object ConstVarchar extends Plan            // no read needed
    case object IntegralGate extends Plan            // count/min/max
    case object FloatingGate extends Plan            // count/unsafe flag
    case object DecimalFloatGate extends Plan        // count only
    case object StringFold extends Plan              // exact UDAF fold

    val plans: Map[String, Plan] = fields.map { f =>
      f.name -> (f.dataType match {
        case DateType | TimestampType | TimestampNTZType | BooleanType =>
          ConstVarchar
        case ByteType | ShortType | IntegerType | LongType => IntegralGate
        case d: DecimalType if d.scale == 0 => IntegralGate
        case d: DecimalType if d.scale >= 1 && d.scale <= 6 =>
          DecimalFloatGate
        case DoubleType | FloatType => FloatingGate
        case _ => StringFold
      })
    }.toMap

    val stringCols = fields.map(_.name).filter(plans(_) == StringFold)
    val gateAggs: Seq[org.apache.spark.sql.Column] = fields.flatMap { f =>
      val c = col(f.name)
      plans(f.name) match {
        case IntegralGate => Seq(
          count(c).as(s"__n_${f.name}"),
          min(c).cast("decimal(38,0)").as(s"__mn_${f.name}"),
          max(c).cast("decimal(38,0)").as(s"__mx_${f.name}"))
        case DecimalFloatGate => Seq(count(c).as(s"__n_${f.name}"))
        case FloatingGate => Seq(
          count(c).as(s"__n_${f.name}"),
          max(when(c.isNotNull &&
              (isnan(c) || abs(c) === Double.PositiveInfinity ||
                (c =!= 0.0 && (abs(c) < 1e-3 || abs(c) >= 1e7))), 1L)
            .otherwise(0L)).as(s"__unsafe_${f.name}"))
        case _ => Nil
      }
    }
    def foldOver(colNames: Seq[String]): Map[String, String] = {
      val strSrc = colNames.map(c => col(c).cast(StringType).as(c))
      val schema = StructType(colNames.map(c => StructField(c, StringType)))
      val agg = udaf(new AllColumnsAgg(colNames.length), Encoders.row(schema))
      val joined = src0.select(strSrc.toIndexedSeq: _*)
        .select(agg(colNames.map(col).toIndexedSeq: _*).as("__types"))
        .head().getString(0)
      colNames.zip(joined.split(",", -1)).toMap
    }

    val verdicts = scala.collection.mutable.Map[String, String]()
    fields.foreach(f =>
      if (plans(f.name) == ConstVarchar) verdicts(f.name) = "varchar")

    // the two independent jobs, overlapped when both exist (§2.6):
    // string fold on its own thread, gates on this one
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val foldF: Option[Future[Map[String, String]]] =
      if (stringCols.isEmpty) None
      else if (gateAggs.isEmpty) Some(Future.successful(foldOver(stringCols)))
      else Some(Future(foldOver(stringCols))(
        scala.concurrent.ExecutionContext.global))

    if (gateAggs.nonEmpty) {
      val row = src0.select(gateAggs.toIndexedSeq: _*).head()
      val int32Max = java.math.BigDecimal.valueOf(Int.MaxValue.toLong)
      val fallbackCols = fields.map(_.name).filter { c =>
        plans(c) match {
          case IntegralGate =>
            if (row.getLong(row.fieldIndex(s"__n_$c")) == 0L) {
              verdicts(c) = "varchar"; false
            } else {
              val mn = row.getDecimal(row.fieldIndex(s"__mn_$c"))
              val mx = row.getDecimal(row.fieldIndex(s"__mx_$c"))
              if (mx.compareTo(int32Max) <= 0) {
                verdicts(c) =
                  if (mn.signum() >= 0) "integer" else "varchar"
                false
              } else true // overflow present: order-dependent corner
            }
          case DecimalFloatGate =>
            verdicts(c) =
              if (row.getLong(row.fieldIndex(s"__n_$c")) > 0L) "float"
              else "varchar"
            false
          case FloatingGate =>
            if (row.getLong(row.fieldIndex(s"__n_$c")) == 0L) {
              verdicts(c) = "varchar"; false
            } else if (row.getLong(row.fieldIndex(s"__unsafe_$c")) == 0L) {
              verdicts(c) = "float"; false
            } else true // sci/NaN/Inf rendering possible: exact fold
          case _ => false
        }
      }
      // rare second pass: the exact fold over just the corner columns
      if (fallbackCols.nonEmpty) verdicts ++= foldOver(fallbackCols)
    }
    foldF.foreach(f => verdicts ++= Await.result(f, Duration.Inf))
    fields.map(f => f.name -> verdicts(f.name)).toMap
  }

  /** Default row cap for import-path inference (SURVEY.md §4 documented
    * divergence: the reference full-scans at 2k rows, importer.rb:518-550;
    * at 100 TB a full regex fold per import is the wrong plan). 100k rows
    * classify any realistic column distribution; the cap makes inference
    * cost flat in input size (`limit` stops the scan early). */
  val DefaultImportSampleRows = 100000L

  /** Sampled inference for the import path: fold over the first
    * `sampleRows` rows only. `limit(n)` executes incrementally over file
    * splits (CollectLimit), so a 100 TB table costs the same as a 100 MB
    * one. Head-of-file biased by construction — use
    * [[inferTypesHashSampled]] when the input is known to be
    * order-correlated (e.g. sorted by the very column being inferred). */
  def inferTypesSampled(df: DataFrame,
      sampleRows: Long = DefaultImportSampleRows): Map[String, String] =
    inferTypes(df, Some(sampleRows))

  /** Deterministic unbiased sampled inference: keeps rows whose mod-P
    * multiplicative hash of `rowKey` falls below `fraction`·P (the exact
    * sampling spec of [[graft.operators.Sampling.hashUniform]], so any
    * engine replays the same subset bit-for-bit). One full scan, but the
    * regex fold — the actual cost at scale — runs on only ~fraction of
    * rows; the rest short-circuit on the codegen'd hash compare. */
  def inferTypesHashSampled(df: DataFrame, rowKey: org.apache.spark.sql.Column,
      fraction: Double): Map[String, String] =
    inferTypes(df.filter(
      Sampling.hashUniform(rowKey, salt = 0L) <
        lit((fraction * graft.functions.HashFunctions.P).toLong)))

  /** Sampled inference with full-data validation and full-scan fallback
    * ("sample N rows + fall back", SURVEY.md §4). Strategy:
    *  1. fold the lattice over `sampleRows` rows (flat cost);
    *  2. validate the verdicts against ALL rows with one regex-free
    *     codegen'd pass — count non-blank cells that `try_cast` refuses
    *     under the sampled type (cheap: a cast attempt, not four regex
    *     matches per cell);
    *  3. if any column miscasts, fall back to the exact full fold.
    * Returns (types, fellBack). The common case (sample was right) costs
    * one cheap scan instead of the regex fold; the worst case costs the
    * reference's full fold plus the two cheaper passes. */
  def inferTypesWithFallback(df: DataFrame,
      sampleRows: Long = DefaultImportSampleRows): (Map[String, String], Boolean) = {
    val sampled = inferTypesSampled(df, sampleRows)
    val checked = sampled.toSeq.filter(_._2 != "varchar")
    if (checked.isEmpty) return (sampled, false)
    val miscastCols = checked.map { case (c, tpe) =>
      val cell = col(c).cast(StringType)
      val castOk = tpe match {
        case "integer" => expr(s"try_cast(cast(`$c` AS STRING) AS BIGINT)").isNotNull
        case _ =>
          expr(s"try_cast(translate(cast(`$c` AS STRING), ',|', '..') AS DOUBLE)").isNotNull
      }
      // blank cells are lattice-invisible (Identifier.isBlank = no char
      // passes Character.isWhitespace) — match that exactly with
      // \p{javaWhitespace} (regex \s is ASCII-only: a U+3000-only cell
      // would count as a miscast and force a spurious full-fold fallback;
      // trim() was worse still, stripping only spaces)
      sum(when(cell.isNotNull && cell.rlike("[^\\p{javaWhitespace}]") && !castOk, 1L)
        .otherwise(0L)).as(c)
    }
    val miscasts = df.select(miscastCols.toIndexedSeq: _*).head()
    val anyMiscast = (0 until miscasts.length).exists(i => miscasts.getLong(i) > 0L)
    if (anyMiscast) (inferTypes(df), true) else (sampled, false)
  }

  /** Spark DataType for a reference-lattice type name (SURVEY.md §1.4). */
  def toSparkType(latticeName: String): DataType = latticeName match {
    case "integer" => LongType
    case "float"   => DoubleType
    case _         => StringType
  }

  /** Cast string columns of `df` per the inferred lattice (comma/pipe
    * decimal separators normalized to '.' before the double cast, matching
    * the float regex that admitted them — importer.rb:528).
    *
    * try_cast, not cast: the lattice's sticky states admit later values
    * that don't parse (float never demotes; a first-value bigint stays
    * "integer"), and under Spark 4's default ANSI mode a plain cast would
    * THROW on them mid-import. The reference's semantics are null-on-
    * failure, which try_cast restores. */
  def applyInferredTypes(df: DataFrame, types: Map[String, String]): DataFrame = {
    val cols = df.columns.map { c =>
      types.getOrElse(c, "varchar") match {
        case "integer" => expr(s"try_cast(`$c` AS BIGINT)").as(c)
        case "float" =>
          expr(s"try_cast(translate(`$c`, ',|', '..') AS DOUBLE)").as(c)
        case _ => col(c).as(c)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
