package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.functions.HashFunctions

/**
 * Probabilistic sketch operators for corpus-scale approximate analytics
 * (north-star extensions; the reference's fixed ETL dataflow has nothing
 * approximate). Both sketches follow the engine-wide mod-P hash spec
 * (HashFunctions scaladoc): every intermediate is non-overflowing int64,
 * so the DuckDB oracle recomputes the exact sketch state bit-for-bit —
 * the *approximation* is audited by ScalaTest against exact counts, the
 * *state* is hash-exact cross-engine.
 *
 * Scale shape: both are one scan + partial-aggregated shuffles whose
 * width is the SKETCH size (d·w cells / m registers per group), never the
 * data size — the whole point of sketching 100 TB.
 */
object Sketches {

  private val P = HashFunctions.P

  /** h_j(x) = (A_j·x + B_j) mod P as Column arithmetic, j a column.
    * Bounds: (j+1)·2654435761 ≲ 1e10, reduced mod P < 1e9, times h < 1e9
    * → < 1e18 < Long.Max. */
  private def mixJ(j: Column, h: Column): Column =
    (((j + 1) * lit(2654435761L)) % P * h + (j * 40503L + 17L) % P) % P

  /**
   * Count-min sketch over whitespace-free alnum tokens: d hash rows of w
   * buckets; the estimate for a token is min over rows of its bucket sum
   * (Cormode & Muthukrishnan, J. Algorithms '05 — always ≥ the true
   * count). Returns (token, n, est) for the `topK` tokens by exact count:
   * exact vs estimate side by side, integers only.
   *
   * The sketch is built from the (token, count) table — equivalent to
   * hashing the raw stream, but the shuffle carries one row per DISTINCT
   * token, then d·w cells; at 100 TB the cell table (d·w ≈ 4k rows)
   * broadcasts into the probe join.
   */
  def cmsTokenEstimates(df: DataFrame, textCol: String,
      d: Int = 4, w: Int = 1024, topK: Int = 20): DataFrame = {
    val toks = Par.ensureParallelism(df)
      .select(explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("token"))
      .filter(col("token") =!= "")
    // cache: th feeds BOTH the sketch build and the probe top-k, and
    // ReuseExchange does not fire across the two consumers (verified on
    // the executed plan: without the boundary the scan+explode+aggregate
    // lineage runs twice) — same trap as tfidfTop's tf table
    val th = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .withColumn("h", HashFunctions.modp_hash16(col("token")))
      .cache()
    val sketch = th
      .select(col("n"), col("h"),
        explode(sequence(lit(0L), lit(d - 1L))).as("j"))
      .withColumn("bucket", mixJ(col("j"), col("h")) % w)
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("n")).as("bn"))
    val probes = th.orderBy(col("n").desc, col("token")).limit(topK)
    probes
      .select(col("token"), col("n"), col("h"),
        explode(sequence(lit(0L), lit(d - 1L))).as("j"))
      .withColumn("bucket", mixJ(col("j"), col("h")) % w)
      .join(sketch, Seq("j", "bucket"))
      .groupBy(col("token"), col("n"))
      .agg(min(col("bn")).as("est"))
  }

  /** HLL hash: affine mix then a SQUARE mod P. The affine map alone is
    * linear in the key, so sequential ids produce structured low bits and
    * a ~70% biased estimate (measured); squaring (g < P ⇒ g² < 1e18, no
    * overflow) breaks the linearity while staying replayable in SQL. */
  private val HllA = (2L * 2654435761L) % P // hashA(1)
  private val HllB = (40503L + 17L) % P     // hashB(1)
  private def hllHash(x: Column): Column = {
    val g = (pmod(x.cast("long"), lit(P)) * HllA + HllB) % P
    (g * g) % P
  }

  /** Key normalization shared by the HLL/Bloom sketches: numeric keys
    * reduce mod P directly; STRING keys route through the mod-P token
    * fold first — a bare cast("long") would silently null non-numeric
    * strings, making Bloom report false negatives for true members and
    * HLL drop every value. Dispatch is on the column's schema type, so
    * the sketch spec stays SQL-replayable for both key families. */
  private def keyToLong(df: DataFrame, keyCol: String)(c: Column): Column =
    df.schema(keyCol).dataType match {
      case StringType => HashFunctions.modp_hash16(c)
      case _ => c.cast("long")
    }

  /**
   * HyperLogLog-style registers (Flajolet et al., AofA '07): bucket =
   * h mod m, rho = 1 + trailing zeros of ⌊h/m⌋ (0 → capped 25: h < P <
   * 2³⁰ leaves ~24 usable bits). Returns one row per (group, bucket)
   * with the max rho — the mergeable sketch state. Shuffle width:
   * ≤ m rows per group, regardless of input size.
   */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
      m: Int = 64): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, "m must be a power of two")
    df.select(col(groupCol).as("grp"),
        hllHash(keyToLong(df, valueCol)(col(valueCol))).as("h"))
      .withColumn("bucket", col("h") % m)
      .withColumn("q", expr("h div " + m))
      .withColumn("rho",
        when(col("q") === 0, 25)
          .otherwise(expr("bit_count((q & -q) - 1) + 1")))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("max_rho"))
  }

  /**
   * One-pass approximate table profile — the 100 TB shape of
   * `profile_table` (VERDICT r8 next #5: four exact `countDistinct`s in
   * one aggregate is four full distinct shuffles for a profiling query).
   * The columns are STACKED into (col_name, v) rows — a width-for-height
   * trade inside one scan, no extra pass per column — then aggregated in
   * two levels keyed by (col_name, HLL bucket): level 1 carries the
   * count/null/min/max partials NEXT TO the register max-rho, level 2
   * folds registers per column. Shuffle width is ≤ |cols|·(m+1) rows per
   * map partition; nothing anywhere is proportional to the distinct
   * count. Distinct cardinality is reported as HLL register STATE
   * (n_buckets, sum_max_rho) — integers, hash-exact cross-engine, same
   * contract as `hllRegisters` — with the float estimate left to
   * `hllEstimate` on the driver.
   */
  def approxProfile(df: DataFrame, cols: Seq[String], m: Int = 64): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, "m must be a power of two")
    // non-numeric columns route through the mod-P token fold (same
    // dispatch as keyToLong): a bare CAST(string AS BIGINT) silently
    // nulls every non-numeric value, which would report a populated
    // column as all-null with zero distincts. Hashed columns profile
    // count/null/distinct only — their min_v/max_v are NULL (a hash
    // min/max would masquerade as a value range).
    val stackArgs = cols.map { c =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.StringType =>
          s"'$c', modp_hash16(`$c`), true"
        case _ => s"'$c', CAST(`$c` AS BIGINT), false"
      }
    }.mkString(", ")
    graft.functions.GraftFunctions.registerAll(df.sparkSession)
    val stacked = df.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, v, hashed)")
    val lvl1 = stacked
      .withColumn("h", hllHash(col("v")))
      // null values hash to null — pin them to bucket -1 so the level-1
      // key never drops rows and the null count stays in-band
      .withColumn("bucket",
        when(col("v").isNull, lit(-1L)).otherwise(col("h") % m))
      .withColumn("q", expr("h div " + m))
      .withColumn("rho",
        when(col("q") === 0, 25)
          .otherwise(expr("bit_count((q & -q) - 1) + 1")))
      .groupBy(col("col_name"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("nulls"),
        min(when(!col("hashed"), col("v"))).as("mn"),
        max(when(!col("hashed"), col("v"))).as("mx"),
        max(col("rho")).as("max_rho"))
    lvl1.groupBy(col("col_name"))
      .agg(sum(col("n")).cast("long").as("n_rows"),
        sum(col("nulls")).cast("long").as("n_nulls"),
        min(col("mn")).as("min_v"), max(col("mx")).as("max_v"),
        sum(when(col("bucket") >= 0, 1L).otherwise(0L)).cast("long").as("n_buckets"),
        coalesce(sum(when(col("bucket") >= 0, col("max_rho"))), lit(0L))
          .cast("long").as("sum_max_rho"))
  }

  /**
   * Equi-width histogram over an integral column — the numeric
   * distribution-profiling pass (profile_table reports bounds; this
   * reports SHAPE). Two jobs: a 2-value bounds aggregate (at 100 TB,
   * enable `spark.sql.parquet.aggregatePushdown` and the min/max come
   * from parquet footers without touching data pages), then one
   * hash-aggregate over computed bucket ids — map-side partials first,
   * so the one shuffle carries ≤ `buckets` rows per map partition,
   * never the data. All arithmetic is int64 (callers with float
   * columns scale to integers first — a DOUBLE→BIGINT cast truncates
   * on Spark and rounds on DuckDB, so float bucketing is NOT
   * cross-engine exact): width = (max−min) div buckets + 1, bucket =
   * (v−min) div width ∈ [0, buckets). Empty buckets are absent (the
   * output is sparse, like every groupBy profile).
   */
  def histogram(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val v = col(valueCol).cast("long")
    val bounds = df.agg(min(v).as("mn"), max(v).as("mx")).head()
    if (bounds.isNullAt(0)) // all-null or empty input: no buckets
      return df.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          "bucket BIGINT, lo BIGINT, hi BIGINT, n BIGINT"))
    val mn = bounds.getLong(0)
    val mx = bounds.getLong(1)
    val w = (mx - mn) / buckets + 1 // ≥ 1; guarantees bucket ≤ buckets−1
    df.filter(v.isNotNull)
      .select(expr(s"(CAST(`$valueCol` AS BIGINT) - $mn) div $w").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (col("bucket") * w + mn).as("lo"),
        (col("bucket") * w + mn + (w - 1)).as("hi"),
        col("n"))
  }

  /**
   * Per-group approximate percentiles over the equi-width bucket grid —
   * the order-statistic estimator that rounds out the sketch family
   * (CMS = frequency, HLL = cardinality, Bloom = membership, histogram
   * = shape, this = quantiles). One GLOBAL grid (bounds aggregate, like
   * `histogram`) shared by every group, so group sketches are mergeable
   * by construction; estimate for percentile p = the LO edge of the
   * first bucket whose running count reaches ⌈n·p/100⌉ — pure integer
   * selection, bit-identical cross-engine, error bounded by the bucket
   * width. Plan: one partial-aggregated shuffle of ≤ |groups|·buckets
   * rows, then a window cumsum over that bounded grid — nothing scales
   * with the data. Unlike `approx_percentile`'s GK sketch this is
   * deterministic and SQL-replayable, which is the whole point here.
   */
  def approxQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      buckets: Int, percentiles: Seq[Int]): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100),
      "percentiles must be in [1, 100]")
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("long")
    val bounds = df.agg(min(v).as("mn"), max(v).as("mx")).head()
    if (bounds.isNullAt(0))
      return df.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          "g STRING, pct INT, n BIGINT, est BIGINT"))
    val mn = bounds.getLong(0)
    val w = (bounds.getLong(1) - mn) / buckets + 1
    val grid = df.filter(v.isNotNull)
      .groupBy(col(groupCol).cast("string").as("g"),
        expr(s"(CAST(`$valueCol` AS BIGINT) - $mn) div $w").as("bucket"))
      .agg(count(lit(1)).as("bn"))
    val win = Window.partitionBy(col("g")).orderBy(col("bucket"))
    val cum = grid
      .withColumn("cum", sum(col("bn")).over(win))
      .withColumn("n", sum(col("bn")).over(Window.partitionBy(col("g"))))
    // rank = ⌈n·p/100⌉ as integer cross-multiplication: smallest r with
    // r·100 ≥ n·p, i.e. (n·p + 99) div 100 — no float anywhere
    val structs = percentiles
      .map(p => s"struct($p AS pct, (n * $p + 99) div 100 AS rank)")
      .mkString(", ")
    cum.select(col("g"), col("bucket"), col("cum"), col("n"),
        expr(s"explode(array($structs))").as("pr"))
      .select(col("g"), col("pr.pct").as("pct"), col("pr.rank").as("rank"),
        col("bucket"), col("cum"), col("n"))
      .filter(col("cum") >= col("rank"))
      .groupBy(col("g"), col("pct"), col("n"))
      .agg(min(col("bucket")).as("b"))
      .select(col("g"), col("pct").cast("int").as("pct"), col("n"),
        (col("b") * w + mn).as("est"))
  }

  /**
   * Bloom filter as a (j, bit) row table — the membership sketch that
   * completes the family (CMS = frequency, HLL = cardinality, Bloom =
   * membership; Bloom, CACM '70). d hash functions over 2^16 bits; the
   * same affine-then-square key mix as HLL feeds the per-row affine
   * spreads. The bit table is bounded by d·|distinct build keys| rows and
   * broadcasts into the probe join — the shape of a runtime join-pruning
   * filter: probe rows whose d bits aren't all set CANNOT match the build
   * side, no false negatives, and the shuffle they'd have joined through
   * never sees them.
   */
  val BloomBits = 65536

  private def bloomBitCol(j: Column, key: Column): Column =
    mixJ(j, hllHash(key)) % BloomBits

  /** Distinct (j, bit) rows set by `keys` — the filter's state. */
  def bloomBuild(df: DataFrame, keyCol: String, d: Int = 4): DataFrame =
    df.select(col(keyCol).as("k")).distinct()
      .select(col("k"), explode(sequence(lit(0L), lit(d - 1L))).as("j"))
      .select(col("j"), bloomBitCol(col("j"), keyToLong(df, keyCol)(col("k"))).as("bit"))
      .distinct()

  /** Adds `might_contain` (1/0) to `probes`: 1 iff all d bits are set.
    * Guaranteed 1 for true members — the hit count is taken over DISTINCT
    * probe keys (a key probed k times would otherwise accumulate k·d hits
    * and fail the === d test, turning every duplicated true member into a
    * false negative); the final left join fans the verdict back out to
    * every copy of a duplicated probe row. False-positive rate governed
    * by d·n/m (audited in SketchesSpec). */
  def bloomMightContain(bits: DataFrame, probes: DataFrame, keyCol: String,
      d: Int = 4): DataFrame = {
    val p = probes.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(sequence(lit(0L), lit(d - 1L))).as("j"))
      .select(col(keyCol), col("j"),
        bloomBitCol(col("j"), keyToLong(probes, keyCol)(col(keyCol))).as("bit"))
    val hits = p.join(broadcast(bits), Seq("j", "bit"))
      .groupBy(col(keyCol)).agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === d)
      .select(col(keyCol), lit(1).as("might_contain"))
    probes.join(hits, Seq(keyCol), "left")
      .na.fill(0, Seq("might_contain"))
  }

  /** Driver-side estimate from one group's registers — for audits/specs.
    * Standard HLL bias-corrected harmonic mean + linear counting at the
    * low end. */
  def hllEstimate(registers: Map[Long, Int], m: Int = 64): Double = {
    val alpha = 0.7213 / (1 + 1.079 / m)
    val z = (0 until m).map(i => math.pow(2.0, -registers.getOrElse(i.toLong, 0))).sum
    val raw = alpha * m * m / z
    val zeros = m - registers.count(_._2 > 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }
}
