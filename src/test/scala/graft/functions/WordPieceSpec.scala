package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * WordPiece tokenization (WordPiece.scala): the likelihood training
 * criterion (vs BPE's raw-count criterion — pinned on a corpus where
 * they CHOOSE DIFFERENT PAIRS), greedy longest-match inference, byte
 * fallback totality, fixture contract, and the native expressions. The
 * cross-engine checks live in the tokenize_wordpiece / wordpiece_train
 * oracles; here the semantics are pinned on hand-computable corpora.
 */
class WordPieceSpec extends AnyFunSuite with SparkTestBase with graft.PropHelper {

  test("training maximizes likelihood, not raw count — diverges from BPE") {
    // "ab" x100 with a,b diluted by "az"/"zb" x100 each:
    //   count(a,b)=100 but c_a=200, c_b=200 -> score 100e12/40000 = 2.5e9
    // "xy" x3 with x,y exclusive:
    //   count(x,y)=3, c_x=c_y=3 -> score 3e12/9 ~ 3.33e11
    // BPE (count criterion) would merge (a,b); WordPiece must pick (x,y).
    val corpus = Seq(("ab", 100L), ("az", 100L), ("zb", 100L), ("xy", 3L))
    val wp = WordPiece.train(corpus, 1)
    assert(wp.head._1 == "x" && wp.head._2 == "y")
    assert(wp.head._3 == 3L * 1000000000000L / 9L) // exact fixed-point score
    val bpe = Bpe.train(corpus, 1)
    assert(bpe.head == ("a", "b"), "precondition: BPE picks the frequent pair")
  }

  test("score tie-break is (score desc, left asc, right asc)") {
    // (x,y) and (p,q) both exclusive with equal counts -> equal scores;
    // (p,q) wins lexicographically
    val m = WordPiece.train(Seq(("xy", 2L), ("pq", 2L)), 1)
    assert(m.head._1 == "p" && m.head._2 == "q")
  }

  test("same-symbol pairs are skipped; training exhausts rather than invents") {
    val m = WordPiece.train(Seq(("aa", 5L), ("ab", 1L)), 8)
    assert(m.map(x => (x._1, x._2)) == Seq(("a", "b")))
  }

  test("inference is greedy longest-match-first, not the merge loop") {
    // merges (b,c) rank 0 then (a,b) rank 1 — vocab pieces {bc, ab}.
    // BPE's rank priority on "abc" merges (b,c) FIRST: [a, bc]. MaxMatch
    // scans left-to-right and takes the longest PREFIX: [ab, c]. Same
    // vocab, different segmentation — the inference-side divergence.
    val m = WordPiece.Model(IndexedSeq(("b", "c"), ("a", "b")))
    assert(m.encodeWord("abc").toSeq.map(m.vocabById) == Seq("ab", "c"))
    val b = Bpe.Model(IndexedSeq(("b", "c"), ("a", "b")))
    assert(b.encodeWord("abc").toSeq.map(b.vocabById) == Seq("a", "bc"))
  }

  test("byte fallback totality: arbitrary UTF-8 round-trips losslessly") {
    val m = WordPiece.default
    for (s <- Seq("hello", "héllo wörld", "日本語テキスト", "🦜 emoji + 𝄞 surrogate",
        "mixed 123 !?", "")) {
      // whitespace is not recoverable (pre-token contract) — compare on
      // the pre-token stream
      val pts = Bpe.PretokenPattern.r.findAllIn(s).mkString
      assert(m.decode(m.encode(s).toIndexedSeq) == pts, s"round trip failed on '$s'")
    }
  }

  test("id layout matches Bpe's: bytes at 1..256, merges from 257, 0 reserved") {
    val m = WordPiece.default
    assert(m.ids(Bpe.ByteToChar('a'.toInt).toString) == 'a'.toInt + 1)
    assert(m.vocabById.head == "<reserved>")
    assert(m.vocabById.length == 257 + m.merges.length)
    m.merges.zipWithIndex.foreach { case ((l, r), i) =>
      assert(m.ids(l + r) == 257 + i)
    }
  }

  test("fixture loads; greedy scan uses the trained 'qu' piece") {
    val m = WordPiece.default
    assert(m.merges.nonEmpty)
    // rank-0 of the committed fixture is (q,u) — the signature likelihood
    // pick (q is almost always followed by u: near-exclusive pair)
    assert(m.merges.head == ("q", "u"))
    val ids = m.encodeWord("quick")
    assert(ids.head == m.ids("qu"), "longest-match must consume the qu piece")
  }

  test("property: greedy invariants — pieces tile the word, each is maximal") {
    val rng = new scala.util.Random(42)
    for (_ <- 0 until 300) {
      val words = Seq.fill(4)(Seq.fill(1 + rng.nextInt(8))(
        ('a' + rng.nextInt(4)).toChar).mkString)
      val freqs = words.map(w => (w, 1L + rng.nextInt(5)))
      val m = WordPiece.Model(
        WordPiece.train(freqs, 1 + rng.nextInt(6)).map(x => (x._1, x._2)))
      for (w <- words) {
        val ids = m.encodeWord(w)
        val pieces = ids.map(m.vocabById)
        assert(pieces.mkString == w, "pieces must tile the word exactly")
        // maximality: at each position the emitted piece is the longest
        // vocab string prefixing the remainder
        var pos = 0
        for (p <- pieces) {
          val longest = (1 to math.min(m.maxPieceLen, w.length - pos)).reverse
            .find(k => m.ids.contains(w.substring(pos, pos + k))).get
          assert(p.length == longest, s"piece '$p' at $pos not maximal in '$w'")
          pos += p.length
        }
      }
    }
  }

  test("expressions: wp_encode/wp_count/wp_decode agree, run under codegen") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val df = spark.range(2).selectExpr(
      "CASE WHEN id = 0 THEN 'the quick brown fox' ELSE '' END AS text")
    val out = df.select(
      WordPiece.wp_count(col("text")).as("n"),
      size(WordPiece.wp_encode(col("text"))).as("m"),
      WordPiece.wp_decode(WordPiece.wp_encode(col("text"))).as("rt"))
    assert(out.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, "wp_* projection not inside a codegen stage")
    val rows = out.collect()
    assert(rows.forall(r => r.getInt(0) == r.getInt(1)))
    assert(rows.map(_.getString(2)).toSeq == Seq("thequickbrownfox", ""))
  }
}
