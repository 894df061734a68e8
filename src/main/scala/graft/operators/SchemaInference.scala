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
    * Returns columnName → "integer" | "float" | "varchar". */
  def inferTypes(df: DataFrame, sampleRows: Option[Long] = None): Map[String, String] = {
    // clamp: limit takes an Int; a >2^31 cap means "effectively unbounded"
    val src0 = sampleRows.map(n => df.limit(math.min(n, Int.MaxValue.toLong).toInt)).getOrElse(df)
    val cols = src0.columns
    val src = src0.select(cols.map(c => col(c).cast(StringType).as(c)).toIndexedSeq: _*)
    val names = cols.toIndexedSeq
    val agg = udaf(new AllColumnsAgg(names.length), Encoders.row(src.schema))
    val joined = src.select(agg(names.map(col): _*).as("types")).head().getString(0)
    names.zip(joined.split(",", -1).toIndexedSeq).toMap
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
