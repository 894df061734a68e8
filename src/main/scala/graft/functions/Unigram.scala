package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unigram-LM tokenization (Kudo 2018; the SentencePiece `unigram`
 * model) — the THIRD tokenizer family, completing the set of published
 * inference algorithms: BPE's merge loop, WordPiece's greedy MaxMatch,
 * and here exact **Viterbi dynamic programming**: the segmentation of a
 * word is the one minimizing the TOTAL piece cost, a global optimum the
 * two greedy families cannot express (a locally longest or
 * lowest-ranked piece can force a bad remainder; Viterbi backtracks).
 *
 * Model = (piece, integer cost) table — cost is the fixed-point
 * `round(-1e6 · ln p(piece))` computed ONCE by the fixture trainer
 * (tools/train_unigram_fixture.py, SentencePiece's seed initialization:
 * frequency-weighted substring counts; EM refinement documented out of
 * scope). No float ever crosses the engine boundary: inference is pure
 * integer min-plus DP, so the DuckDB oracle replays every DP cell
 * exactly (`tokenize_unigram` / `unigram_cost`).
 *
 * Tie-break, pinned: among equal-total-cost candidates for a DP cell,
 * the LONGEST last piece wins (compare (cost asc, k desc)); applied at
 * every cell this yields one canonical segmentation in both engines.
 * Totality: the first 256 pieces are the byte-level base vocab (ids
 * 1..256 in byte order, Laplace-smoothed costs) — arbitrary UTF-8
 * segments, no UNK, same argument as [[Bpe]]/[[WordPiece]].
 *
 * Scale shape: identical to the sibling families — a narrow per-row map
 * (native codegen expressions, per-executor memo cache over distinct
 * pre-tokens); there is no training job here at all, the model is a
 * committed artifact.
 */
object Unigram {

  final case class Model(pieces: IndexedSeq[(String, Long)]) {
    require(pieces.take(256).map(_._1) == Bpe.BaseVocab,
      "fixture contract violated: lines 1..256 must be the byte-level " +
        "base vocab in byte order (ids are positional)")

    /** piece → id, positional: id = line index + 1, 0 reserved. */
    val ids: Map[String, Int] =
      pieces.zipWithIndex.map { case ((p, _), i) => p -> (i + 1) }.toMap
    require(ids.size == pieces.size, "duplicate piece in fixture")

    val vocabById: IndexedSeq[String] = "<reserved>" +: pieces.map(_._1)
    private val costByPiece: Map[String, Long] = pieces.toMap

    val maxPieceLen: Int = pieces.iterator.map(_._1.length).max
    require(maxPieceLen < 64,
      "piece length must stay below the oracle's 64-radix tie-break encoding")

    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, (Array[Int], Long)]()
    private val CacheCap = 1 << 16

    /** Viterbi min-cost segmentation → (piece ids, total cost). */
    def encodeWordWithCost(word: String): (Array[Int], Long) = {
      val hit = cache.get(word)
      if (hit != null) return hit
      val mw = Bpe.mapWord(word)
      val n = mw.length
      val cost = new Array[Long](n + 1)
      val bk = new Array[Int](n + 1)
      var p = 1
      while (p <= n) {
        var bestC = Long.MaxValue
        var bestK = 0
        var k = 1
        val kMax = math.min(p, maxPieceLen)
        while (k <= kMax) {
          costByPiece.get(mw.substring(p - k, p)) match {
            case Some(c) =>
              val tc = cost(p - k) + c
              if (tc < bestC || (tc == bestC && k > bestK)) {
                bestC = tc; bestK = k
              }
            case None => ()
          }
          k += 1
        }
        // totality: k = 1 (a byte piece) always matched
        cost(p) = bestC; bk(p) = bestK
        p += 1
      }
      val out = new scala.collection.mutable.ArrayBuffer[Int](n)
      var pos = n
      while (pos > 0) {
        val k = bk(pos)
        out += ids(mw.substring(pos - k, pos))
        pos -= k
      }
      val res = (out.reverseIterator.toArray, if (n == 0) 0L else cost(n))
      if (cache.size < CacheCap) cache.put(word, res)
      res
    }

    private val pretokenRe =
      java.util.regex.Pattern.compile(Bpe.PretokenPattern)

    def encode(text: String): Array[Int] = {
      val out = new scala.collection.mutable.ArrayBuffer[Int](text.length / 3 + 4)
      val m = pretokenRe.matcher(text)
      while (m.find()) out ++= encodeWordWithCost(m.group())._1
      out.toArray
    }

    /** Total Viterbi cost of the text's pre-token stream — the corpus
      * LM signal (cost/piece ≈ scaled negative log-likelihood), useful
      * as a quality feature exactly like lm_score's bigram scoring. */
    def encodingCost(text: String): Long = {
      var total = 0L
      val m = pretokenRe.matcher(text)
      while (m.find()) total += encodeWordWithCost(m.group())._2
      total
    }

    def decode(tokenIds: Seq[Int]): String =
      Bpe.unmapWord(tokenIds.map { id =>
        require(id > 0 && id < vocabById.length, s"id $id not decodable")
        vocabById(id)
      }.mkString)

    // ------------------------------------------------ oracle SQL emission
    private def q(s: String): String = "'" + s.replace("'", "''") + "'"

    /** DuckDB MAP literal `piece → [id, cost]`. */
    def vocabMapSql: String = {
      val entries = pieces.zipWithIndex
      "MAP([" + entries.map(e => q(e._1._1)).mkString(",") +
        "], [" + entries.map { case ((_, c), i) => s"[${i + 1}, $c]" }
          .mkString(",") + "])"
    }
  }

  def parseVocab(lines: Iterator[String]): IndexedSeq[(String, Long)] =
    lines.filter(_.nonEmpty).map { line =>
      val t = line.split("\t", -1)
      require(t.length == 2, s"bad vocab line: '$line'")
      (t(0), t(1).toLong)
    }.toIndexedSeq

  /** The committed fixture (src/main/resources/graft/unigram_vocab.txt,
    * regenerated by tools/train_unigram_fixture.py). */
  lazy val default: Model = {
    val in = getClass.getResourceAsStream("/graft/unigram_vocab.txt")
    require(in != null, "missing resource /graft/unigram_vocab.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try Model(parseVocab(src.getLines())) finally src.close()
  }

  // ----------------------------------------------- codegen static targets

  def encodeUtf8(s: UTF8String): ArrayData =
    new GenericArrayData(default.encode(s.toString))

  def countUtf8(s: UTF8String): Int = default.encode(s.toString).length

  def costUtf8(s: UTF8String): Long = default.encodingCost(s.toString)

  def decodeArray(ids: ArrayData): UTF8String = {
    val n = ids.numElements()
    val sb = new java.lang.StringBuilder(n * 3)
    var i = 0
    while (i < n) {
      val id = ids.getInt(i)
      require(id > 0 && id < default.vocabById.length,
        s"ug_decode: id $id not decodable (reserved or out of vocab)")
      sb.append(default.vocabById(id))
      i += 1
    }
    UTF8String.fromString(Bpe.unmapWord(sb.toString))
  }

  /** `ug_encode(text)` → array<int> of Viterbi-optimal piece ids. */
  case class UgEncode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "ug_encode"
    override def nullSafeEval(v: Any): Any =
      encodeUtf8(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Unigram.encodeUtf8($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** `ug_count(text)` → int piece count (count-only hot path). */
  case class UgCount(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "ug_count"
    override def nullSafeEval(v: Any): Any =
      countUtf8(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Unigram.countUtf8($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** `ug_cost(text)` → bigint total Viterbi cost (the LM signal). */
  case class UgCost(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "ug_cost"
    override def nullSafeEval(v: Any): Any =
      costUtf8(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Unigram.costUtf8($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** `ug_decode(ids)` → concatenated piece text (same contract as the
    * sibling decoders: inter-pre-token whitespace not recoverable). */
  case class UgDecode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "ug_decode"
    override def nullSafeEval(v: Any): Any =
      decodeArray(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Unigram.decodeArray($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("ug_encode",
      es => UgEncode(es.head), "built-in")
    reg.createOrReplaceTempFunction("ug_count",
      es => UgCount(es.head), "built-in")
    reg.createOrReplaceTempFunction("ug_cost",
      es => UgCost(es.head), "built-in")
    reg.createOrReplaceTempFunction("ug_decode",
      es => UgDecode(es.head), "built-in")
  }

  def ug_encode(c: Column): Column = call_function("ug_encode", c)
  def ug_count(c: Column): Column = call_function("ug_count", c)
  def ug_cost(c: Column): Column = call_function("ug_cost", c)
  def ug_decode(c: Column): Column = call_function("ug_decode", c)
}
