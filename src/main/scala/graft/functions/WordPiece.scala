package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, col, count, explode, lit, regexp_extract_all}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * WordPiece-family tokenization (Schuster & Nakajima 2012; Wu et al.
 * 2016 §3.1) — the SECOND real tokenizer family next to [[Bpe]], sharing
 * its byte-level alphabet but differing in BOTH halves the literature
 * distinguishes them by:
 *
 *  - **training** merges the pair maximizing the LIKELIHOOD score
 *    `count(l,r) / (count(l) · count(r))` — the WordPiece criterion —
 *    not the raw pair count BPE maximizes. Kept float-free: the score
 *    is the fixed-point integer `⌊count(l,r) · 10^12 / (count(l) ·
 *    count(r))⌋` (BigInt intermediate; result ≤ 10^12 fits a Long
 *    because count(l,r) ≤ min(count(l), count(r))), argmax broken by
 *    (score desc, left asc, right asc) — a total order, so training is
 *    deterministic and the DuckDB oracle replays it with HUGEINT `//`
 *    arithmetic bit-for-bit (`wordpiece_train`).
 *  - **inference** is greedy longest-match-first (MaxMatch, the BERT
 *    tokenizer's algorithm): consume the longest vocab piece prefixing
 *    the remaining word, repeat. No merge loop at encode time — one
 *    left-to-right pass, which is why production WordPiece inference is
 *    cheaper than BPE's rank scan.
 *
 * Documented divergences from BERT's tokenizer, chosen deliberately:
 * no `##` continuation markers (pieces are position-independent, which
 * keeps the vocab a single unambiguous string→id map and the SQL replay
 * marker-free) and a byte-level base vocab (all 256 bytes, ids 1..256 —
 * so there is NO [UNK]: arbitrary UTF-8 encodes losslessly, the same
 * totality argument as [[Bpe]]). Same pre-tokenizer, same byte↔symbol
 * bijection, same id layout (0 reserved, 257+ merges in rank order) —
 * every token-budget operator that keys on `bpe_count` can key on
 * `wp_count` unchanged.
 *
 * Scale shape mirrors Bpe exactly: encode is a narrow per-row map (a
 * native expression inside whole-stage codegen, per-executor memo cache
 * keyed on distinct pre-token); training is ONE distributed pre-token
 * groupBy, then the merge loop over the compact frequency table
 * driver-side.
 */
object WordPiece {

  /** Fixed-point scale for the likelihood score (see scaladoc above). */
  val ScoreScale: Long = 1000000000000L

  final case class Model(merges: IndexedSeq[(String, String)]) {
    require(merges.forall { case (l, r) => l != r },
      "fixture contract violated: same-symbol merges are skipped in " +
        "training (keeps the trainer's merge-all rewrite overlap-free " +
        "and the SQL replay single-pass)")

    /** piece (symbol string) → id: 256 byte tokens then merged pieces in
      * rank order — the [[Bpe]] id layout, total over encode output. */
    val ids: Map[String, Int] =
      (Bpe.BaseVocab.zipWithIndex.map { case (s, i) => s -> (i + 1) } ++
        merges.zipWithIndex.map { case ((l, r), i) =>
          (l + r) -> (Bpe.BaseVocab.size + 1 + i) }).toMap

    require(ids.size == Bpe.BaseVocab.size + merges.size,
      "a merge re-derived an existing piece string — greedy longest " +
        "match would be ambiguous; retrain with distinct pieces")

    /** id → piece symbol string (index 0 = reserved, never produced). */
    val vocabById: IndexedSeq[String] =
      "<reserved>" +: Bpe.BaseVocab ++: merges.map { case (l, r) => l + r }

    /** Longest piece in the vocab — the greedy scan's window bound. */
    val maxPieceLen: Int = vocabById.iterator.drop(1).map(_.length).max

    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
    private val CacheCap = 1 << 16

    /** Greedy longest-match-first over the vocab. Total: every single
      * symbol char is a byte token, so the scan always advances. */
    def encodeWord(word: String): Array[Int] = {
      val hit = cache.get(word)
      if (hit != null) return hit
      val mw = Bpe.mapWord(word)
      val out = new scala.collection.mutable.ArrayBuffer[Int](mw.length)
      var pos = 0
      while (pos < mw.length) {
        var len = math.min(maxPieceLen, mw.length - pos)
        var id = -1
        while (id < 0) {
          ids.get(mw.substring(pos, pos + len)) match {
            case Some(i) => id = i
            case None => len -= 1 // len = 1 always hits (byte base vocab)
          }
        }
        out += id
        pos += len
      }
      val arr = out.toArray
      if (cache.size < CacheCap) cache.put(word, arr)
      arr
    }

    private val pretokenRe =
      java.util.regex.Pattern.compile(Bpe.PretokenPattern)

    def encode(text: String): Array[Int] = {
      val out = new scala.collection.mutable.ArrayBuffer[Int](text.length / 3 + 4)
      val m = pretokenRe.matcher(text)
      while (m.find()) out ++= encodeWord(m.group())
      out.toArray
    }

    def decode(tokenIds: Seq[Int]): String =
      Bpe.unmapWord(tokenIds.map { id =>
        require(id > 0 && id < vocabById.length, s"id $id not decodable")
        vocabById(id)
      }.mkString)

    // ------------------------------------------------ oracle SQL emission
    private def q(s: String): String = "'" + s.replace("'", "''") + "'"

    /** DuckDB MAP literal `piece string → id` over the full vocab. */
    def vocabMapSql: String = {
      val entries = ids.toSeq.sortBy(_._2)
      "MAP([" + entries.map(e => q(e._1)).mkString(",") +
        "], [" + entries.map(_._2).mkString(",") + "])"
    }
  }

  /**
   * WordPiece training over a (word, freq) table. Each step: count
   * adjacent pairs AND symbol occurrences (both weighted by word
   * frequency, one count per position), merge the argmax of the
   * fixed-point likelihood score, rewrite all occurrences. Same-symbol
   * pairs skipped (Model contract). Returns merges WITH their scores so
   * the oracle can pin the selection criterion itself, not just the
   * chosen pairs.
   */
  def train(wordFreqs: Seq[(String, Long)], numMerges: Int): IndexedSeq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] = wordFreqs
      .groupMapReduce(wf => Bpe.mapWord(wf._1).map(_.toString).toVector)(_._2)(_ + _)
    val merges = IndexedSeq.newBuilder[(String, String, Long)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val pairs = scala.collection.mutable.HashMap[(String, String), Long]()
      val syms = scala.collection.mutable.HashMap[String, Long]()
      words.foreach { case (w, n) =>
        var i = 0
        while (i < w.length) {
          syms.update(w(i), syms.getOrElse(w(i), 0L) + n)
          if (i < w.length - 1 && w(i) != w(i + 1)) {
            val key = (w(i), w(i + 1))
            pairs.update(key, pairs.getOrElse(key, 0L) + n)
          }
          i += 1
        }
      }
      if (pairs.isEmpty) exhausted = true
      else {
        def score(p: ((String, String), Long)): Long =
          (BigInt(p._2) * ScoreScale / (BigInt(syms(p._1._1)) * syms(p._1._2))).toLong
        val ((l, r), c) = pairs.minBy { case ((pl, pr), n) =>
          (-score(((pl, pr), n)), pl, pr)
        }
        merges += ((l, r, score(((l, r), c))))
        val merged = l + r
        words = words.groupMapReduce { case (w, _) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < w.length) {
            if (i + 1 < w.length && w(i) == l && w(i + 1) == r) {
              out += merged; i += 2
            } else { out += w(i); i += 1 }
          }
          out.result()
        }(_._2)(_ + _)
        k += 1
      }
    }
    merges.result()
  }

  /** The distributed half of training — identical shape to
    * [[Bpe.trainOn]]: one partial-aggregated groupBy to the compact
    * (pre-token, freq) table, merge loop driver-side. */
  def trainOn(df: DataFrame, textCol: String, numMerges: Int): IndexedSeq[(String, String, Long)] = {
    val freqs = df
      .select(explode(regexp_extract_all(col(textCol), lit(Bpe.PretokenPattern),
        lit(0))).as("pt"))
      .groupBy(col("pt")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    train(freqs, numMerges)
  }

  /** The committed fixture (src/main/resources/graft/wordpiece_merges.txt,
    * regenerated by tools/train_wordpiece_fixture.py — trained on the
    * same sf0.1 corpus as the BPE fixture, under the likelihood
    * criterion). */
  lazy val default: Model = {
    val in = getClass.getResourceAsStream("/graft/wordpiece_merges.txt")
    require(in != null, "missing resource /graft/wordpiece_merges.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try Model(Bpe.parseMerges(src.getLines())) finally src.close()
  }

  // ----------------------------------------------- codegen static targets

  def encodeUtf8(s: UTF8String): ArrayData =
    new GenericArrayData(default.encode(s.toString))

  def countUtf8(s: UTF8String): Int = default.encode(s.toString).length

  def decodeArray(ids: ArrayData): UTF8String = {
    val n = ids.numElements()
    val sb = new java.lang.StringBuilder(n * 3)
    var i = 0
    while (i < n) {
      val id = ids.getInt(i)
      require(id > 0 && id < default.vocabById.length,
        s"wp_decode: id $id not decodable (reserved or out of vocab)")
      sb.append(default.vocabById(id))
      i += 1
    }
    UTF8String.fromString(Bpe.unmapWord(sb.toString))
  }

  /** `wp_encode(text)` → array<int> of fixture piece ids. */
  case class WpEncode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "wp_encode"
    override def nullSafeEval(v: Any): Any =
      encodeUtf8(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.WordPiece.encodeUtf8($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** `wp_count(text)` → int true piece count (count-only hot path). */
  case class WpCount(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "wp_count"
    override def nullSafeEval(v: Any): Any =
      countUtf8(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.WordPiece.countUtf8($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** `wp_decode(ids)` → the concatenated piece text (inter-pre-token
    * whitespace not recoverable, same contract as bpe_decode). */
  case class WpDecode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "wp_decode"
    override def nullSafeEval(v: Any): Any =
      decodeArray(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.WordPiece.decodeArray($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("wp_encode",
      es => WpEncode(es.head), "built-in")
    reg.createOrReplaceTempFunction("wp_count",
      es => WpCount(es.head), "built-in")
    reg.createOrReplaceTempFunction("wp_decode",
      es => WpDecode(es.head), "built-in")
  }

  def wp_encode(c: Column): Column = call_function("wp_encode", c)
  def wp_count(c: Column): Column = call_function("wp_count", c)
  def wp_decode(c: Column): Column = call_function("wp_decode", c)
}
