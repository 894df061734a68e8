package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, col, count, explode, lit, regexp_extract_all}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Real byte-pair-encoding tokenization (VERDICT r12 next #1): a
 * merges-table model with the standard greedy merge loop — NOT the
 * regex-run approximation (`TextAnalysis.bpeTokenCount` remains as the
 * cheap lower bound). Every token-budget operator (seq_pack, doc_chunk,
 * budget sampling, DSIR caps) can now key on token counts that match a
 * training tokenizer's, because they ARE a tokenizer's.
 *
 * Semantics (the GPT-2 `bpe()` loop, expressed engine-neutrally so the
 * DuckDB oracle can replay it exactly):
 *
 *  - pre-tokenizer: `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` — lookahead-free,
 *    identical under Java regex and RE2. Merges never cross pre-token
 *    boundaries.
 *  - per pre-token: start from single BYTES of the UTF-8 encoding
 *    (byte-level BPE, the GPT-2 design: every byte is a base token, so
 *    there is NO UNK — arbitrary UTF-8 encodes losslessly); repeatedly
 *    find the adjacent pair with the LOWEST merge rank and merge ALL
 *    its occurrences, until no adjacent pair is in the table.
 *  - symbols are strings over the standard byte↔unicode bijection
 *    (printable bytes map to themselves, the rest to the U+0100+ block)
 *    so every symbol is printable and whitespace-free — safe in a text
 *    merges file, and identity on printable ASCII, which keeps the
 *    DuckDB oracle's per-character replay exact on ASCII corpora.
 *  - the committed fixture guarantees `left != right` for every merge
 *    (training skips same-symbol pairs), which makes "merge all
 *    occurrences" overlap-free: two occurrences can only abut when
 *    left == right. That is what lets the oracle rebuild the sequence
 *    with one list_filter/list_transform pass per merge step instead of
 *    a nested recursion (SparkEntry `tokenize_bpe`).
 *  - token ids: 0 is reserved (never produced — byte-level has no UNK),
 *    1..256 = the 256 bytes in value order (id = byte + 1), 257+ =
 *    merged tokens in rank order. Ids are fixture-stable, independent
 *    of any corpus.
 *
 * Scale shape: encode is a narrow per-row map (no shuffle, no UDF — a
 * native expression inside whole-stage codegen) with a per-executor
 * memo cache keyed on pre-token, the same cache real BPE tokenizers
 * keep: natural-language corpora repeat words, so the merge loop runs
 * once per DISTINCT word per executor, not once per occurrence.
 * Training is the scalable two-phase formulation: ONE distributed
 * groupBy produces the compact (pre-token, freq) table, and the merge
 * loop runs over that driver-side — the classic algorithm's cost model,
 * never an iterative corpus scan.
 */
object Bpe {

  /** Same literal as TextAnalysis.BpeishPattern (kept in both places so
    * neither package depends on the other; BpeSpec pins them equal). */
  val PretokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Byte → symbol char bijection (the byte-level-BPE convention,
    * Radford et al. 2019 §2.2): bytes that are printable in Latin-1
    * ([33,126] ∪ [161,172] ∪ [174,255]) map to their own code points;
    * the remaining 68 bytes map to U+0100.. in byte order. Every symbol
    * string is therefore printable and free of whitespace/control chars
    * (tab and newline are NOT kept), which the tab-separated merges
    * fixture and the space-keyed rank map both rely on. */
  val ByteToChar: IndexedSeq[Char] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    (0 to 255).map { b =>
      if (keep(b)) b.toChar else { val c = (256 + n).toChar; n += 1; c }
    }
  }

  val CharToByte: Map[Char, Int] =
    ByteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** A pre-token as its symbol string: one mapped char per UTF-8 byte.
    * Identity for printable-ASCII input — the property that lets the
    * DuckDB oracle replay the merge loop with per-CHARACTER splits on
    * ASCII corpora while the engine is byte-true on everything. */
  def mapWord(word: String): String = {
    val bytes = word.getBytes(StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(ByteToChar(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** Symbol string → the UTF-8 text it spells (invalid byte sequences —
    * possible only for adversarial id streams, never for encode output —
    * decode to U+FFFD per java.nio's standard replacement). */
  def unmapWord(mapped: String): String = {
    val bytes = new Array[Byte](mapped.length)
    var i = 0
    while (i < mapped.length) {
      bytes(i) = CharToByte.getOrElse(mapped.charAt(i), throw
        new IllegalArgumentException(
          f"not a symbol char: U+${mapped.charAt(i).toInt}%04X")).toByte
      i += 1
    }
    new String(bytes, StandardCharsets.UTF_8)
  }

  /** Fixed base vocabulary: ALL 256 bytes as mapped symbol chars, ids
    * 1..256 in byte order (id = byte + 1) — corpus-independent, so the
    * id space is stable under fixture retraining as long as numMerges
    * holds, and total: no UNK exists at any id. */
  val BaseVocab: IndexedSeq[String] = (0 to 255).map(b => ByteToChar(b).toString)

  final case class Model(merges: IndexedSeq[(String, String)]) {
    require(merges.forall { case (l, r) => l != r },
      "fixture contract violated: a merge with left == right would make " +
        "simultaneous-occurrence merging overlap-sensitive (and the SQL " +
        "oracle unreplayable without nested recursion)")

    /** rank by pair, keyed `left + ' ' + right` — unambiguous because
      * symbols never contain spaces (pre-tokens are whitespace-free),
      * and the same join the oracle's map literal uses. */
    private val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.size * 2)
      merges.zipWithIndex.foreach { case ((l, r), i) =>
        val prev = m.put(l + " " + r, Int.box(i))
        require(prev == null, s"duplicate merge ($l, $r)")
      }
      m
    }

    /** token (symbol string) → id: 256 byte tokens then merged tokens in
      * rank order. Total over encode output — every single symbol char
      * is a byte token and every merge result is here by construction. */
    val ids: Map[String, Int] =
      (BaseVocab.zipWithIndex.map { case (s, i) => s -> (i + 1) } ++
        merges.zipWithIndex.map { case ((l, r), i) =>
          (l + r) -> (BaseVocab.size + 1 + i) }).toMap

    /** id → token symbol string (index 0 = reserved, never produced:
      * byte-level BPE has no UNK). */
    val vocabById: IndexedSeq[String] =
      "<reserved>" +: BaseVocab ++: merges.map { case (l, r) => l + r }

    require(ids.size == BaseVocab.size + merges.size,
      "a merge re-derived an existing token string — ranks would be " +
        "ambiguous; retrain with distinct merges")

    /** Per-model memo: distinct pre-token → ids. Bounded so an
      * adversarial corpus of unique tokens cannot grow it unboundedly;
      * at the cap, encoding still works — it just stops caching. */
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
    private val CacheCap = 1 << 16

    def encodeWord(word: String): Array[Int] = {
      val hit = cache.get(word)
      if (hit != null) return hit
      val mw = mapWord(word)
      var seq: Array[String] = Array.tabulate(mw.length)(i => mw.substring(i, i + 1))
      var done = false
      while (!done && seq.length > 1) {
        // lowest-rank adjacent pair present in the merges table
        var best = Int.MaxValue
        var i = 0
        while (i < seq.length - 1) {
          val r = ranks.get(seq(i) + " " + seq(i + 1))
          if (r != null && r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val (l, r) = merges(best)
          val merged = l + r
          val out = new scala.collection.mutable.ArrayBuffer[String](seq.length)
          var j = 0
          while (j < seq.length) {
            if (j + 1 < seq.length && seq(j) == l && seq(j + 1) == r) {
              out += merged; j += 2
            } else { out += seq(j); j += 1 }
          }
          seq = out.toArray
        }
      }
      val out = seq.map(ids) // total: byte-level vocab covers every symbol
      if (cache.size < CacheCap) cache.put(word, out)
      out
    }

    private val pretokenRe = java.util.regex.Pattern.compile(PretokenPattern)

    def encode(text: String): Array[Int] = {
      val out = new scala.collection.mutable.ArrayBuffer[Int](text.length / 3 + 4)
      val m = pretokenRe.matcher(text)
      while (m.find()) out ++= encodeWord(m.group())
      out.toArray
    }

    def decode(tokenIds: Seq[Int]): String =
      unmapWord(tokenIds.map { id =>
        require(id > 0 && id < vocabById.length, s"id $id not decodable")
        vocabById(id)
      }.mkString)

    // ------------------------------------------------ oracle SQL emission
    private def q(s: String): String = "'" + s.replace("'", "''") + "'"

    /** DuckDB MAP literal `pair → rank`, key = left || ' ' || right. */
    def mergesMapSql: String =
      "MAP([" + merges.map { case (l, r) => q(s"$l $r") }.mkString(",") +
        "], [" + merges.indices.mkString(",") + "])"

    /** DuckDB MAP literal `token string → id` over the full vocab. */
    def vocabMapSql: String = {
      val entries = ids.toSeq.sortBy(_._2)
      "MAP([" + entries.map(e => q(e._1)).mkString(",") +
        "], [" + entries.map(_._2).mkString(",") + "])"
    }
  }

  /**
   * Classic BPE training over a (word, freq) table: pair counts weighted
   * by word frequency (one count per adjacent position), best pair =
   * (count desc, left asc, right asc) — a total order, so training is
   * deterministic — with same-symbol pairs skipped (see Model contract).
   * Mirrors tools/train_bpe_fixture.py line for line.
   */
  def train(wordFreqs: Seq[(String, Long)], numMerges: Int): IndexedSeq[(String, String)] = {
    // words enter as TEXT and train as byte-level symbol sequences — one
    // mapped char per UTF-8 byte, the same alphabet encode runs over, so
    // trainer and encoder agree on every corpus (ADVICE r13: the old
    // per-Scala-char iteration split surrogate pairs differently from
    // Python's per-code-point loop; bytes are engine-independent).
    var words: Map[Vector[String], Long] = wordFreqs
      .groupMapReduce(wf => mapWord(wf._1).map(_.toString).toVector)(_._2)(_ + _)
    val merges = IndexedSeq.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val pairs = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (w, n) =>
        var i = 0
        while (i < w.length - 1) {
          if (w(i) != w(i + 1)) {
            val key = (w(i), w(i + 1))
            pairs.update(key, pairs.getOrElse(key, 0L) + n)
          }
          i += 1
        }
      }
      if (pairs.isEmpty) exhausted = true
      else {
        val best = pairs.minBy { case ((l, r), n) => (-n, l, r) }._1
        merges += best
        val (l, r) = best
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

  /** The distributed half of training: one groupBy over the exploded
    * pre-token stream — partial-aggregated, counts only, never text
    * beyond the distinct words — then the driver-side merge loop over
    * the compact frequency table. */
  def trainOn(df: DataFrame, textCol: String, numMerges: Int): Model = {
    val freqs = df
      .select(explode(regexp_extract_all(col(textCol), lit(PretokenPattern),
        lit(0))).as("pt"))
      .groupBy(col("pt")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    Model(train(freqs, numMerges))
  }

  def parseMerges(lines: Iterator[String]): IndexedSeq[(String, String)] =
    lines.filter(_.nonEmpty).map { line =>
      val t = line.split("\t", -1)
      require(t.length == 2, s"bad merges line: '$line'")
      (t(0), t(1))
    }.toIndexedSeq

  /** The committed fixture (src/main/resources/graft/bpe_merges.txt,
    * regenerated by tools/train_bpe_fixture.py). */
  lazy val default: Model = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "missing resource /graft/bpe_merges.txt")
    val src = scala.io.Source.fromInputStream(in, StandardCharsets.UTF_8.name())
    try Model(parseMerges(src.getLines())) finally src.close()
  }

  // ----------------------------------------------- codegen static targets

  /** Static forwarder for generated code (see TextAnalysis.langIdUtf8). */
  def encodeUtf8(s: UTF8String): ArrayData =
    new GenericArrayData(default.encode(s.toString))

  def countUtf8(s: UTF8String): Int = default.encode(s.toString).length

  /** `bpe_encode(text)` → array<int> of fixture token ids. */
  case class BpeEncode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "bpe_encode"
    override def nullSafeEval(v: Any): Any =
      encodeUtf8(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.encodeUtf8($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** `bpe_count(text)` → int true token count (no array materialized —
    * the count-only hot path for budget operators). */
  case class BpeCount(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "bpe_count"
    override def nullSafeEval(v: Any): Any =
      countUtf8(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.countUtf8($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Static forwarder: ids → the UTF-8 text their byte symbols spell.
    * Out-of-vocab ids (and the reserved 0) fail loudly — decoding a
    * stream the fixture cannot express is a pipeline bug, not a value. */
  def decodeArray(ids: ArrayData): UTF8String = {
    val n = ids.numElements()
    val sb = new java.lang.StringBuilder(n * 3)
    var i = 0
    while (i < n) {
      val id = ids.getInt(i)
      require(id > 0 && id < default.vocabById.length,
        s"bpe_decode: id $id not decodable (reserved or out of vocab)")
      sb.append(default.vocabById(id))
      i += 1
    }
    UTF8String.fromString(unmapWord(sb.toString))
  }

  /** `bpe_decode(ids)` → the concatenated token text (whitespace between
    * pre-tokens is NOT recoverable — BPE tokenizes pre-tokens; callers
    * that need spacing keep the original text column). */
  case class BpeDecode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "bpe_decode"
    override def nullSafeEval(v: Any): Any =
      decodeArray(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.decodeArray($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bpe_encode",
      es => BpeEncode(es.head), "built-in")
    reg.createOrReplaceTempFunction("bpe_count",
      es => BpeCount(es.head), "built-in")
    reg.createOrReplaceTempFunction("bpe_decode",
      es => BpeDecode(es.head), "built-in")
  }

  def bpe_encode(c: Column): Column = call_function("bpe_encode", c)
  def bpe_count(c: Column): Column = call_function("bpe_count", c)
  def bpe_decode(c: Column): Column = call_function("bpe_decode", c)
}
