package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/**
 * Deterministic text-hashing expressions for the dedup family
 * (north-star operators; see the builder brief + SURVEY.md §7.1 step 9):
 * MinHash signatures, SimHash, and winnowing fingerprints. All pure
 * integer math over one pass of the string — no per-row allocation beyond
 * the output arrays — so a 100 TB corpus pays O(bytes) per executor core.
 */
object HashFunctions {

  /** splitmix64 finalizer — cheap, high-quality 64-bit mixer (public
    * domain constant schedule; Steele et al., "Fast Splittable PRNGs"). */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** All sketch hashes below use polynomial hashing over a prime modulus
    * small enough that every intermediate fits in non-overflowing int64:
    * h = Σ code(c_i)·131^(k-1-i) mod P. That choice is deliberate — the
    * exact same integers are computable in ANSI SQL (ascii/substr/%), so
    * the DuckDB oracle can replay MinHash/SimHash/winnowing signatures
    * bit-for-bit instead of settling for rows-only checks. */
  val P: Long = 1000000007L
  val Base: Long = 131L

  /** Mixing constants for the j-th derived hash h_j(x) = (A(j)·x + B(j)) mod P. */
  @inline def hashA(j: Int): Long = ((j + 1).toLong * 2654435761L) % P
  @inline def hashB(j: Int): Long = (j.toLong * 40503L + 17L) % P

  /** Rolling mod-P polynomial hashes of every k-char shingle of `s`.
    * Returns one hash (< P) per start position. */
  def shingleHashes(s: String, k: Int): Array[Long] = {
    val n = s.length
    if (n < k) { // degenerate short-string case: hash the whole string
      var h = 0L; var i = 0
      while (i < n) { h = (h * Base + s.charAt(i)) % P; i += 1 }
      return Array(h)
    }
    val out = new Array[Long](n - k + 1)
    var pow = 1L // 131^k mod P for the rolling update
    var i = 0
    while (i < k) { pow = pow * Base % P; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + s.charAt(i)) % P; i += 1 }
    out(0) = h
    i = k
    while (i < n) {
      h = ((h * Base - s.charAt(i - k) * pow % P + s.charAt(i)) % P + P) % P
      out(i - k + 1) = h
      i += 1
    }
    out
  }

  /** MinHash signature: component j is min over shingles of (A_j·gh + B_j) mod P. */
  def minHashSignature(text: String, k: Int, m: Int): Array[Long] = {
    val hs = shingleHashes(text, k)
    val sig = Array.fill(m)(Long.MaxValue)
    val as = Array.tabulate(m)(hashA)
    val bs = Array.tabulate(m)(hashB)
    var i = 0
    while (i < hs.length) {
      val gh = hs(i)
      var j = 0
      while (j < m) {
        val v = (as(j) * gh + bs(j)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  @inline private def lowerAscii(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
  @inline private def isAsciiAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** 64-bit SimHash over ASCII-alnum tokens of the lowercased text: bit j
    * is the majority over tokens of parity((A_j·th + B_j) mod P). Token =
    * maximal [a-z0-9] run after ASCII lowercasing (identical to SQL
    * string_split_regex(lower(text), '[^a-z0-9]+') on ASCII corpora). */
  def simHash64(text: String): Long = {
    val counts = new Array[Int](64)
    val as = Array.tabulate(64)(hashA)
    val bs = Array.tabulate(64)(hashB)
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && !isAsciiAlnum(lowerAscii(text.charAt(i)))) i += 1
      var h = 0L
      var len = 0
      while (i < n && isAsciiAlnum(lowerAscii(text.charAt(i)))) {
        h = (h * Base + lowerAscii(text.charAt(i))) % P
        i += 1; len += 1
      }
      if (len > 0) {
        var b = 0
        while (b < 64) {
          if (((as(b) * h + bs(b)) % P & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Position multiplier for the winnowing selection key: key = h·2^20 + pos
    * (1-based) so ties inside a window break on the earliest position and
    * the SQL twin can recover h with integer division. */
  val WinnowPosCap: Long = 1048576L

  /** Winnowing fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03): k-gram
    * rolling hashes, min-key per sliding window of w, distinct selected
    * hashes sorted ascending. Robust document fingerprint. Monotonic-deque
    * sliding minimum — O(n) total, no boxing (the per-window rescan +
    * TreeSet variant measured ~4× slower on the bench corpus). */
  def winnow(text: String, k: Int, w: Int): Array[Long] = {
    val hs = shingleHashes(text, k)
    val nh = hs.length
    if (nh <= w) return hs.distinct.sorted
    @inline def key(j: Int): Long = hs(j) * WinnowPosCap + (j + 1)
    val dq = new Array[Int](nh) // deque of candidate indices, keys ascending
    var head = 0; var tail = 0
    var sel = new Array[Long](64)
    var selCount = 0
    var last = -1L // last selected key: consecutive windows usually repeat it
    var i = 0
    while (i < nh) {
      while (tail > head && key(dq(tail - 1)) > key(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (i >= w - 1) {
        while (dq(head) < i - w + 1) head += 1
        val kmin = key(dq(head))
        if (kmin != last) {
          last = kmin
          if (selCount == sel.length) sel = java.util.Arrays.copyOf(sel, sel.length * 2)
          sel(selCount) = kmin / WinnowPosCap; selCount += 1
        }
      }
      i += 1
    }
    val arr = java.util.Arrays.copyOf(sel, selCount)
    java.util.Arrays.sort(arr)
    var widx = 0
    i = 0
    while (i < arr.length) { // in-place dedup of sorted hashes
      if (widx == 0 || arr(i) != arr(widx - 1)) { arr(widx) = arr(i); widx += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(arr, widx)
  }

  /** mod-P Horner fold over the FIRST 16 chars of a token — the
    * SQL-replayable token hash for the sketch family (count-min). Capped
    * length keeps the oracle's positional-power replay bounded; 16 chars
    * disambiguate every realistic vocabulary token. */
  val TokenHashCap = 16
  def modPTokenHash(s: String): Long = {
    val n = math.min(s.length, TokenHashCap)
    var h = 0L
    var i = 0
    while (i < n) { h = (h * Base + s.charAt(i)) % P; i += 1 }
    h
  }

  /** DSIR bigram feature buckets: one pass over the text — ASCII-lowered
    * alnum-run tokens (simHash64's tokenizer, identical to SQL
    * `string_split_regex(lower(text), '[^a-z0-9]+')` on ASCII corpora),
    * capped-16 Horner hash per token, adjacent-pair bucket
    * `(h₁·131 + h₂) mod P mod buckets`. Exists because the composable
    * spelling (`transform(...) → modp_hash16 → zip_with`) pays an
    * interpreted expression call PER TOKEN — this is one call per DOC,
    * the same economics that motivated span_digests. */
  def bigramBuckets(text: String, buckets: Int): Array[Long] = {
    val n = text.length
    val hs = new mutable.ArrayBuffer[Long]()
    var i = 0
    while (i < n) {
      while (i < n && !isAsciiAlnum(lowerAscii(text.charAt(i)))) i += 1
      if (i < n) {
        var h = 0L
        var len = 0
        while (i < n && isAsciiAlnum(lowerAscii(text.charAt(i)))) {
          if (len < TokenHashCap) { h = (h * Base + lowerAscii(text.charAt(i))) % P; len += 1 }
          i += 1
        }
        hs += h
      }
    }
    if (hs.length < 2) return Array.empty
    val out = new Array[Long](hs.length - 1)
    var j = 0
    while (j < out.length) {
      out(j) = (hs(j) * Base + hs(j + 1)) % P % buckets
      j += 1
    }
    out
  }

  /** Bigram-LM transition codes: one pass over the text — the same
    * tokenizer and capped-16 Horner hash as [[bigramBuckets]], but each
    * adjacent pair emits a COMBINED code `p·B + t` where
    * `p = h₁ mod B` (prefix bucket) and `t = (h₁·131 + h₂) mod P mod B`
    * (transition bucket). The combined code keys a proper bucketed
    * conditional P(t|p) = c₂[p,t] / c₁[p] — separable tables can't
    * express the per-pair floor division, so the code space is B² and
    * must stay driver-bounded (B ≤ 256). One expression call per doc
    * for the same economics as bigram_buckets. */
  def pairBuckets(text: String, buckets: Int): Array[Long] = {
    val n = text.length
    val hs = new mutable.ArrayBuffer[Long]()
    var i = 0
    while (i < n) {
      while (i < n && !isAsciiAlnum(lowerAscii(text.charAt(i)))) i += 1
      if (i < n) {
        var h = 0L
        var len = 0
        while (i < n && isAsciiAlnum(lowerAscii(text.charAt(i)))) {
          if (len < TokenHashCap) { h = (h * Base + lowerAscii(text.charAt(i))) % P; len += 1 }
          i += 1
        }
        hs += h
      }
    }
    if (hs.length < 2) return Array.empty
    val out = new Array[Long](hs.length - 1)
    var j = 0
    while (j < out.length) {
      val p = hs(j) % buckets
      val t = (hs(j) * Base + hs(j + 1)) % P % buckets
      out(j) = p * buckets + t
      j += 1
    }
    out
  }

  /** Content-defined chunk boundaries (the LBFS/rsync/FastCDC family):
    * cut AFTER 1-based char position i whenever the rolling hash of the
    * last `w` chars lands on `h mod mask == 0`, for w ≤ i < n (a cut at
    * the final char would leave an empty tail). Because boundaries
    * depend only on LOCAL content, inserting or deleting bytes early in
    * a document shifts at most the chunks that contain the edit — the
    * property fixed-size chunking lacks and the reason storage dedup
    * uses CDC. Rolling hash = Σ_{j=0..w-1} c_{i-j}·131^j mod P
    * (newest char weight 131^0), maintained incrementally in one pass;
    * the SQL replay recomputes it per position from the shared 131-power
    * array. Expected chunk length ≈ mask. */
  def cdcCuts(text: String, w: Int, mask: Int): Array[Int] = {
    require(w > 0 && mask > 0, "cdc_cuts window and mask must be positive")
    val n = text.length
    if (n == 0) return Array.empty
    var powTopW = 1L // 131^w mod P
    var j = 0
    while (j < w) { powTopW = powTopW * Base % P; j += 1 }
    val out = new mutable.ArrayBuffer[Int]()
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * Base + text.charAt(i)) % P
      if (i >= w)
        h = ((h - text.charAt(i - w) * powTopW) % P + P) % P
      // 1-based position i+1; full window present once i+1 >= w
      if (i + 1 >= w && i + 1 < n && h % mask == 0) out += i + 1
      i += 1
    }
    out.toArray
  }

  /** Signed feature hashing (Weinberger et al. 2009, "Feature Hashing
    * for Large Scale Multitask Learning"): one dense integer vector per
    * document, v[j] = Σ_tokens sign(t)·1[bucket(t)=j], with
    * bucket = h mod dim and sign = +1 iff (h div dim) is even over the
    * capped-16 Horner token hash. The sign bit makes collisions cancel
    * in expectation instead of accumulating — the property that lets a
    * 64-dim hashed vector stand in for a vocabulary-sized bag of words.
    * This is the text→vector bridge: it puts raw documents into the
    * SAME vector toolbox (int8 quantizer, IVF cells, cluster balancing)
    * the embeddings table uses, with every coordinate SQL-replayable. */
  def featureHash(text: String, dim: Int): Array[Long] = {
    require(dim > 0, "feature_hash dim must be positive")
    val out = new Array[Long](dim)
    val n = text.length
    var i = 0
    while (i < n) {
      while (i < n && !isAsciiAlnum(lowerAscii(text.charAt(i)))) i += 1
      if (i < n) {
        var h = 0L
        var len = 0
        while (i < n && isAsciiAlnum(lowerAscii(text.charAt(i)))) {
          if (len < TokenHashCap) { h = (h * Base + lowerAscii(text.charAt(i))) % P; len += 1 }
          i += 1
        }
        val j = (h % dim).toInt
        out(j) += (if ((h / dim) % 2 == 0) 1L else -1L)
      }
    }
    out
  }

  // ------------------------------------------------------------ expressions

  case class MinHashSig(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"
    override def nullSafeEval(text: Any, k: Any, m: Any): Any =
      new GenericArrayData(minHashSignature(
        text.toString, k.asInstanceOf[Int], m.asInstanceOf[Int]))
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  }

  case class SimHash(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"
    override def nullSafeEval(v: Any): Any = simHash64(v.toString)
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  case class WinnowFingerprint(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "winnow_fingerprint"
    override def nullSafeEval(text: Any, k: Any, w: Any): Any =
      new GenericArrayData(winnow(
        text.toString, k.asInstanceOf[Int], w.asInstanceOf[Int]))
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  }

  /** All k-token sliding-window md5 digests of a text, one tight loop per
    * document (span-level exact dedup). Tokenization = maximal [a-z0-9]
    * runs after ASCII lowercasing (same spec as simHash64); each window's
    * digest is md5 of the tokens joined by a single space — exactly what
    * SQL `md5(array_to_string(ts[w:w+k-1], ' '))` computes, so the DuckDB
    * oracle replays digests bit-for-bit. A native expression instead of
    * `transform(sequence(...), w -> md5(array_join(slice(...))))` because
    * HOF lambdas are interpreted per element: the per-window slice/join/
    * md5 chain measured 9.4 s at sf0.1 vs ~0.6 s for this loop. Output is
    * the 16-byte binary digest (half the shuffle width of hex). */
  def spanDigests(text: String, k: Int): Array[Array[Byte]] = {
    // tokenize once: (start, end) offsets of lowercased alnum runs
    val n = text.length
    val bytes = new Array[Byte](n) // lowercased ASCII scratch
    val starts = new mutable.ArrayBuffer[Int]()
    val ends = new mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < n) {
      while (i < n && !isAsciiAlnum(lowerAscii(text.charAt(i)))) i += 1
      if (i < n) {
        starts += i
        while (i < n && isAsciiAlnum(lowerAscii(text.charAt(i)))) {
          bytes(i) = lowerAscii(text.charAt(i)).toByte
          i += 1
        }
        ends += i
      }
    }
    val m = starts.length
    if (m < k) return Array.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Array[Byte]](m - k + 1)
    val space = ' '.toByte
    var w = 0
    while (w <= m - k) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(space)
        md.update(bytes, starts(w + j), ends(w + j) - starts(w + j))
        j += 1
      }
      out(w) = md.digest()
      w += 1
    }
    out
  }

  case class SpanDigests(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
    override def prettyName: String = "span_digests"
    override def nullSafeEval(text: Any, k: Any): Any =
      new GenericArrayData(
        spanDigests(text.toString, k.asInstanceOf[Int]).asInstanceOf[Array[Any]])
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** Distinct character n-grams of a string as SORTED 64-bit hashes — the
    * set form used by the dense-corpus exact-Jaccard path. Hashing keeps
    * the per-pair intersect allocation-free (primitive long merge instead
    * of per-element UTF8String churn — measured 40 µs → ~1 µs per pair);
    * 64-bit collisions across a corpus's gram space are ~1e-12 events and
    * accepted (documented divergence from string-exact counting). */
  /** 64-bit rolling hashes (NOT mod-P): the Jaccard intersect counts are
    * compared against a string-exact oracle, so the hash space must be big
    * enough that cross-gram collisions within a pair are ~1e-12 events —
    * mod-P's 2^30 space would collide ~1e-4 per pair. */
  private def shingleHashes64(s: String, k: Int): Array[Long] = {
    val n = s.length
    if (n < k) return Array(mix64(s.hashCode.toLong))
    val out = new Array[Long](n - k + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = h * 1315423911L + s.charAt(i); i += 1 }
    out(0) = mix64(h)
    var pow = 1L
    i = 1
    while (i < k) { pow *= 1315423911L; i += 1 }
    i = k
    while (i < n) {
      h = (h - s.charAt(i - k) * pow) * 1315423911L + s.charAt(i)
      out(i - k + 1) = mix64(h)
      i += 1
    }
    out
  }

  def ngramHashSet(s: String, n: Int): Array[Long] = {
    val hs = if (s.length <= n) Array(mix64(s.hashCode.toLong))
      else shingleHashes64(s, n)
    java.util.Arrays.sort(hs)
    // dedup in place
    var w = 0
    var i = 0
    while (i < hs.length) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(hs, w)
  }

  case class NgramSortedSet(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "ngram_sorted_set"
    override def nullSafeEval(text: Any, n: Any): Any =
      new GenericArrayData(ngramHashSet(text.toString, n.asInstanceOf[Int]))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** Intersection size of two SORTED long arrays — allocation-free linear
    * merge over primitive arrays. */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "sorted_intersect_count"
    override def nullSafeEval(a0: Any, b0: Any): Any = {
      val a = a0.asInstanceOf[ArrayData]
      val b = b0.asInstanceOf[ArrayData]
      val la = a.numElements(); val lb = b.numElements()
      var i = 0; var j = 0; var n = 0
      // direct getLong indexing — no per-pair array materialization
      var av = if (la > 0) a.getLong(0) else 0L
      var bv = if (lb > 0) b.getLong(0) else 0L
      while (i < la && j < lb) {
        if (av == bv) {
          n += 1; i += 1; j += 1
          if (i < la) av = a.getLong(i)
          if (j < lb) bv = b.getLong(j)
        } else if (av < bv) { i += 1; if (i < la) av = a.getLong(i) }
        else { j += 1; if (j < lb) bv = b.getLong(j) }
      }
      n
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  case class ModPTokenHash(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "modp_hash16"
    override def nullSafeEval(v: Any): Any = modPTokenHash(v.toString)
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  case class BigramBuckets(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "bigram_buckets"
    override def nullSafeEval(text: Any, b: Any): Any =
      new GenericArrayData(bigramBuckets(text.toString, b.asInstanceOf[Int]))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  case class FeatureHash(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "feature_hash"
    override def nullSafeEval(text: Any, d: Any): Any =
      new GenericArrayData(featureHash(text.toString, d.asInstanceOf[Int]))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  case class CdcCuts(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "cdc_cuts"
    override def nullSafeEval(text: Any, w: Any, mask: Any): Any =
      new GenericArrayData(cdcCuts(
        text.toString, w.asInstanceOf[Int], mask.asInstanceOf[Int]))
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  }

  case class PairBuckets(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "pair_buckets"
    override def nullSafeEval(text: Any, b: Any): Any =
      new GenericArrayData(pairBuckets(text.toString, b.asInstanceOf[Int]))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** Hamming distance between two 64-bit signatures (for SimHash dedup).
    * Native codegen: this runs in the candidate-pair filter, inside the
    * join's whole-stage span. */
  case class Hamming64(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "hamming64"
    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_sig",
      es => MinHashSig(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash(es.head), "built-in")
    reg.createOrReplaceTempFunction("winnow_fingerprint",
      es => WinnowFingerprint(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("hamming64",
      es => Hamming64(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("ngram_sorted_set",
      es => NgramSortedSet(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("sorted_intersect_count",
      es => SortedIntersectCount(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("modp_hash16",
      es => ModPTokenHash(es.head), "built-in")
    reg.createOrReplaceTempFunction("bigram_buckets",
      es => BigramBuckets(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("span_digests",
      es => SpanDigests(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("pair_buckets",
      es => PairBuckets(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("cdc_cuts",
      es => CdcCuts(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("feature_hash",
      es => FeatureHash(es(0), es(1)), "built-in")
  }

  def minhash_sig(text: Column, k: Int = 5, m: Int = 64): Column =
    call_function("minhash_sig", text, lit(k), lit(m))
  def simhash64(text: Column): Column = call_function("simhash64", text)
  def winnow_fingerprint(text: Column, k: Int = 5, w: Int = 4): Column =
    call_function("winnow_fingerprint", text, lit(k), lit(w))
  def hamming64(a: Column, b: Column): Column = call_function("hamming64", a, b)
  def ngram_sorted_set(text: Column, n: Int): Column =
    call_function("ngram_sorted_set", text, lit(n))
  def sorted_intersect_count(a: Column, b: Column): Column =
    call_function("sorted_intersect_count", a, b)
  def modp_hash16(text: Column): Column = call_function("modp_hash16", text)
  def bigram_buckets(text: Column, buckets: Int): Column =
    call_function("bigram_buckets", text, lit(buckets))
  def span_digests(text: Column, k: Int): Column =
    call_function("span_digests", text, lit(k))
  def pair_buckets(text: Column, buckets: Int): Column =
    call_function("pair_buckets", text, lit(buckets))
  def cdc_cuts(text: Column, w: Int, mask: Int): Column =
    call_function("cdc_cuts", text, lit(w), lit(mask))
  def feature_hash(text: Column, dim: Int): Column =
    call_function("feature_hash", text, lit(dim))
}
