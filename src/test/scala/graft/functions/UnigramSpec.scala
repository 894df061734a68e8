package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Unigram-LM Viterbi tokenization (Unigram.scala): exact min-cost
 * segmentation (pinned against brute-force enumeration), the global
 * optimum greedy families cannot express, the tie-break contract, byte
 * totality, and the native expressions. Cross-engine DP replay lives in
 * the tokenize_unigram / unigram_cost oracles.
 */
class UnigramSpec extends AnyFunSuite with SparkTestBase {

  /** Toy model: byte base at uniform high cost + given multi-char pieces. */
  private def toy(extra: (String, Long)*): Unigram.Model =
    Unigram.Model(Bpe.BaseVocab.map(_ -> 10L) ++ extra)

  test("Viterbi beats greedy longest-match when the long prefix is a trap") {
    // "abc": ab|c = 2+10, a|bc = 10+1, singles = 30. Greedy MaxMatch
    // grabs "ab" (cost 12); Viterbi backtracks to a|bc (cost 11).
    val m = toy("ab" -> 2L, "bc" -> 1L)
    val (ids, cost) = m.encodeWordWithCost("abc")
    assert(ids.toSeq.map(m.vocabById) == Seq("a", "bc"))
    assert(cost == 11L)
  }

  test("tie-break: equal total cost prefers the longer last piece") {
    // "aa": [aa]=20 ties a|a=10+10 — k desc wins, one piece
    val m = toy("aa" -> 20L)
    assert(m.encodeWordWithCost("aa")._1.toSeq.map(m.vocabById) == Seq("aa"))
    // and when the single-piece parse is strictly worse, it loses
    val m2 = toy("aa" -> 21L)
    assert(m2.encodeWordWithCost("aa")._1.toSeq.map(m2.vocabById) == Seq("a", "a"))
  }

  test("property: Viterbi total cost equals brute-force minimum over all segmentations") {
    val rng = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val alpha = "abcd"
      val pieces = (for {
        len <- 2 to 3
        _ <- 1 to 3
      } yield Seq.fill(len)(alpha(rng.nextInt(alpha.length))).mkString)
        .distinct.map(p => p -> (1L + rng.nextInt(30)))
      val m = toy(pieces: _*)
      val w = Seq.fill(1 + rng.nextInt(7))(alpha(rng.nextInt(alpha.length))).mkString
      def bruteMin(s: String): Long =
        if (s.isEmpty) 0L
        else (1 to math.min(s.length, m.maxPieceLen)).flatMap { k =>
          m.pieces.toMap.get(s.take(k)).map(_ + bruteMin(s.drop(k)))
        }.min
      assert(m.encodeWordWithCost(w)._2 == bruteMin(w),
        s"non-optimal segmentation for '$w'")
    }
  }

  test("byte fallback totality: arbitrary UTF-8 round-trips losslessly") {
    val m = Unigram.default
    for (s <- Seq("hello world", "héllo", "日本語", "🦜 + 𝄞", "a1!?", "")) {
      val pts = Bpe.PretokenPattern.r.findAllIn(s).mkString
      assert(m.decode(m.encode(s).toIndexedSeq) == pts, s"round trip failed on '$s'")
    }
  }

  test("fixture loads: positional ids, byte layout, costs positive") {
    val m = Unigram.default
    assert(m.pieces.length > 256, "fixture must carry multi-char pieces")
    assert(m.ids(Bpe.ByteToChar('a'.toInt).toString) == 'a'.toInt + 1)
    assert(m.vocabById.head == "<reserved>")
    assert(m.pieces.forall(_._2 > 0), "costs are scaled negative logs, > 0")
    assert(m.maxPieceLen < 64, "oracle 64-radix tie-break bound")
  }

  test("encodingCost sums per-occurrence word costs over the pre-token stream") {
    val m = toy("ab" -> 3L)
    // "ab ab!" → pre-tokens ab, ab, '!' → 3 + 3 + 10
    assert(m.encodingCost("ab ab!") == 16L)
  }

  test("expressions: ug_encode/ug_count/ug_cost/ug_decode agree under codegen") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val df = spark.range(2).selectExpr(
      "CASE WHEN id = 0 THEN 'the merge order window' ELSE '' END AS text")
    val out = df.select(
      Unigram.ug_count(col("text")).as("n"),
      size(Unigram.ug_encode(col("text"))).as("m"),
      Unigram.ug_cost(col("text")).as("c"),
      Unigram.ug_decode(Unigram.ug_encode(col("text"))).as("rt"))
    assert(out.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, "ug_* projection not inside a codegen stage")
    val rows = out.collect()
    assert(rows.forall(r => r.getInt(0) == r.getInt(1)))
    assert(rows.map(_.getString(3)).toSeq == Seq("themergeorderwindow", ""))
    assert(rows.head.getLong(2) > 0L && rows.last.getLong(2) == 0L)
  }
}
