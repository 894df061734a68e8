package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

  /** Native codegen (not CodegenFallback): these sit in the hot loop of
    * the ANN cross joins — a fallback leaf would box every row pair and
    * split the whole-stage-codegen span around the join. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = toDoubles(l); val b = toDoubles(r)
      val n = math.min(a.length, b.length)
      var s = 0.0; var i = 0
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $l.getDouble($i) * $r.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
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
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        val denom = ctx.freshName("denom")
        s"""
           |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = $l.getDouble($i);
           |  double $y = $r.getDouble($i);
           |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
           |if ($denom == 0.0) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $dot / $denom;
           |}
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** Integer dot product over array<long> (the int8-quantized path) —
    * native codegen for the same reason as vec_dot: it runs per candidate
    * pair inside the ANN join's whole-stage span. Exact int64 arithmetic,
    * so results stay bit-identical to the zip_with/aggregate HOF spelling
    * it replaces (which evaluated interpreted, per pair). */
  case class DotProductLong(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "vec_doti"
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var s = 0L; var i = 0
      while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $l.getLong($i) * $r.getLong($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
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

  /**
   * IVF cell assignment: top-`nProbe` centroid ids by (cosine desc, id asc)
   * for a vector, against a centroid table passed as foldable array
   * literals — so assignment is ONE pass over the corpus with no shuffle
   * (the crossJoin + row_number formulation moved every vector through an
   * exchange; this is the plan a coarse quantizer wants at 100 TB: the
   * centroid set is broadcast-sized by construction, like any real IVF
   * nlist). Cosine math is kept bit-identical to `vec_cosine` so the SQL
   * oracle's row_number replay agrees exactly.
   */
  case class IvfCells(first: Expression, second: Expression,
      third: Expression, fourth: Expression)
      extends QuaternaryExpression with CodegenFallback {
    // children: vec, centroid vectors array<array<double>>, centroid ids, nProbe
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "vec_ivf_cells"
    @transient private lazy val cents: Array[Array[Double]] = {
      val ad = second.eval(null).asInstanceOf[ArrayData]
      Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
    }
    @transient private lazy val cids: Array[Long] =
      third.eval(null).asInstanceOf[ArrayData].toLongArray()
    @transient private lazy val centNorms: Array[Double] = cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }
    override def nullSafeEval(v: Any, c2: Any, c3: Any, np: Any): Any = {
      val a = v.asInstanceOf[ArrayData].toDoubleArray()
      val n = math.min(np.asInstanceOf[Int], cents.length)
      var na = 0.0
      var i = 0
      while (i < a.length) { na += a(i) * a(i); i += 1 }
      val sqna = math.sqrt(na)
      val topCos = Array.fill(n)(Double.NegativeInfinity)
      val topCid = new Array[Long](n)
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)
        val m = math.min(a.length, cv.length)
        var dot = 0.0
        i = 0
        while (i < m) { dot += a(i) * cv(i); i += 1 }
        val denom = sqna * centNorms(c)
        if (denom != 0.0) {
          val cos = dot / denom
          // insertion by (cos desc, cid asc); centroids scanned cid-asc so
          // strict > keeps the earlier (smaller) id on ties
          var p = n
          while (p > 0 && cos > topCos(p - 1)) p -= 1
          if (p < n) {
            var q = n - 1
            while (q > p) { topCos(q) = topCos(q - 1); topCid(q) = topCid(q - 1); q -= 1 }
            topCos(p) = cos; topCid(p) = cids(c)
          }
        }
        c += 1
      }
      var filled = 0
      while (filled < n && topCos(filled) != Double.NegativeInfinity) filled += 1
      new GenericArrayData(java.util.Arrays.copyOf(topCid, filled))
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression, q: Expression): Expression =
      copy(f, s, t, q)
  }

  /**
   * Product-quantization encoder over INTEGER (int8-quantized) vectors
   * (Jégou et al., TPAMI 2011 — here with a training-free deterministic
   * codebook so the codes are SQL-replayable): the vector splits into m
   * subvectors; code[j] = index of the codebook entry (j·ksub + c
   * flattened layout) with minimal integer sub-L2², ties to the smaller
   * index. Integer arithmetic end-to-end ⇒ argmin is bit-exact across
   * engines, unlike float k-means codebooks. Evaluated once per corpus
   * row (the same cost class as IvfCells's assignment — CodegenFallback
   * is fine here; the per-PAIR hot path is PqAdc below).
   */
  case class PqEncode(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    // children: int vector array<long>, flattened codebook
    // array<array<long>> (entry j*ksub + c = subvector j of centroid c), m
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "vec_pq_encode"
    @transient private lazy val cb: Array[Array[Long]] = {
      val ad = second.eval(null).asInstanceOf[ArrayData]
      Array.tabulate(ad.numElements())(i => ad.getArray(i).toLongArray())
    }
    override def nullSafeEval(v: Any, cbAny: Any, mAny: Any): Any = {
      val x = v.asInstanceOf[ArrayData].toLongArray()
      val m = mAny.asInstanceOf[Int]
      val ksub = cb.length / m
      val sub = x.length / m
      val codes = new Array[Long](m)
      var j = 0
      while (j < m) {
        var best = Long.MaxValue
        var bestC = 0
        var c = 0
        while (c < ksub) {
          val cv = cb(j * ksub + c)
          var d = 0L
          var i = 0
          while (i < sub && i < cv.length) {
            val t = x(j * sub + i) - cv(i); d += t * t; i += 1
          }
          if (d < best) { best = d; bestC = c } // strict < keeps smaller c on ties
          c += 1
        }
        codes(j) = bestC.toLong
        j += 1
      }
      new GenericArrayData(codes)
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  }

  /**
   * Integer-L2 IVF cell assignment over int8-QUANTIZED vectors: top-
   * `nProbe` centroid INDICES by (squared-L2 asc, index asc) against a
   * trained centroid table passed as foldable array literals. The L2 twin
   * of `IvfCells` (cosine/float) — used with Lloyd-trained integer
   * centroids (Similarity.trainIvfCentroids), where every distance is an
   * exact int64 so the argmin replays bit-for-bit in SQL. Same zero-
   * shuffle, one-corpus-pass plan shape as IvfCells.
   */
  case class IvfCellsL2(first: Expression, second: Expression,
      third: Expression, fourth: Expression)
      extends QuaternaryExpression with CodegenFallback {
    // children: int vector array<long>, centroid vectors array<array<long>>,
    // centroid ids array<long>, nProbe
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "vec_ivf_cells_l2"
    @transient private lazy val cents: Array[Array[Long]] = {
      val ad = second.eval(null).asInstanceOf[ArrayData]
      Array.tabulate(ad.numElements())(i => ad.getArray(i).toLongArray())
    }
    @transient private lazy val cids: Array[Long] =
      third.eval(null).asInstanceOf[ArrayData].toLongArray()
    override def nullSafeEval(v: Any, c2: Any, c3: Any, np: Any): Any = {
      val a = v.asInstanceOf[ArrayData].toLongArray()
      val n = math.min(np.asInstanceOf[Int], cents.length)
      val topD = Array.fill(n)(Long.MaxValue)
      val topCid = new Array[Long](n)
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)
        val m = math.min(a.length, cv.length)
        var d = 0L
        var i = 0
        while (i < m) { val t = a(i) - cv(i); d += t * t; i += 1 }
        // insertion by (d asc, index asc); strict < keeps the earlier
        // (smaller) index on ties, matching the SQL row_number tiebreak
        var p = n
        while (p > 0 && d < topD(p - 1)) p -= 1
        if (p < n) {
          var q = n - 1
          while (q > p) { topD(q) = topD(q - 1); topCid(q) = topCid(q - 1); q -= 1 }
          topD(p) = d; topCid(p) = cids(c)
        }
        c += 1
      }
      var filled = 0
      while (filled < n && topD(filled) != Long.MaxValue) filled += 1
      new GenericArrayData(java.util.Arrays.copyOf(topCid, filled))
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression, q: Expression): Expression =
      copy(f, s, t, q)
  }

  /** Asymmetric-distance computation: Σ_j dtable[j·ksub + codes[j]] — the
    * per-(query, corpus-row) hot path of PQ search, so native codegen
    * like the other pair-loop kernels. `dtable` is the query's
    * precomputed integer sub-distance table (flattened like the
    * codebook). */
  case class PqAdc(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "vec_pq_adc"
    override def nullSafeEval(codes: Any, dt: Any, ks: Any): Any = {
      val c = codes.asInstanceOf[ArrayData]
      val d = dt.asInstanceOf[ArrayData]
      val ksub = ks.asInstanceOf[Int]
      var s = 0L
      var j = 0
      while (j < c.numElements()) {
        s += d.getLong(j * ksub + c.getLong(j).toInt); j += 1
      }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (codes, dtable, ksub) => {
        val j = ctx.freshName("j")
        val acc = ctx.freshName("acc")
        s"""
           |long $acc = 0L;
           |for (int $j = 0; $j < $codes.numElements(); $j++) {
           |  $acc += $dtable.getLong($j * $ksub + (int) $codes.getLong($j));
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine",
      es => CosineSim(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_doti",
      es => DotProductLong(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm",
      es => VecNorm(es.head), "built-in")
    reg.createOrReplaceTempFunction("vec_lsh_bucket",
      es => HyperplaneSig(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("vec_ivf_cells",
      es => IvfCells(es(0), es(1), es(2), es(3)), "built-in")
    reg.createOrReplaceTempFunction("vec_ivf_cells_l2",
      es => IvfCellsL2(es(0), es(1), es(2), es(3)), "built-in")
    reg.createOrReplaceTempFunction("vec_pq_encode",
      es => PqEncode(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("vec_pq_adc",
      es => PqAdc(es(0), es(1), es(2)), "built-in")
  }

  private val D = ArrayType(DoubleType)
  def vec_dot(a: Column, b: Column): Column =
    call_function("vec_dot", a.cast(D), b.cast(D))
  def vec_cosine(a: Column, b: Column): Column =
    call_function("vec_cosine", a.cast(D), b.cast(D))
  def vec_doti(a: Column, b: Column): Column = call_function("vec_doti", a, b)
  def vec_norm(a: Column): Column = call_function("vec_norm", a.cast(D))
  def vec_lsh_bucket(a: Column, planes: Int = 8, seed: Long = 42L): Column =
    call_function("vec_lsh_bucket", a.cast(D), lit(planes), lit(seed))
  def vec_ivf_cells(a: Column, centVecs: Column, centIds: Column, nProbe: Int): Column =
    call_function("vec_ivf_cells", a.cast(D), centVecs, centIds, lit(nProbe))
  def vec_ivf_cells_l2(q: Column, centVecs: Column, centIds: Column, nProbe: Int): Column =
    call_function("vec_ivf_cells_l2", q, centVecs, centIds, lit(nProbe))
  def vec_pq_encode(q: Column, codebook: Column, m: Int): Column =
    call_function("vec_pq_encode", q, codebook, lit(m))
  def vec_pq_adc(codes: Column, dtable: Column, ksub: Int): Column =
    call_function("vec_pq_adc", codes, dtable, lit(ksub))
}
