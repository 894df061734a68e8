package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Real BPE tokenization (Bpe.scala): training determinism, the greedy
 * rank-priority merge loop, fixture contract, id stability, and the
 * native expressions. The cross-engine hash checks live in the
 * tokenize_bpe / seq_pack_bpe / doc_chunk_bpe oracles; here the
 * semantics are pinned on hand-computable corpora.
 */
class BpeSpec extends AnyFunSuite with SparkTestBase {

  test("training: frequency-greedy with deterministic tie-break, same-symbol pairs skipped") {
    // corpus: "ab" x3, "abc" x2, "aa" x5 — pair counts: (a,b)=5, (b,c)=2,
    // (a,a)=5 but SKIPPED. First merge must be (a,b); then "ab"+"c" = 2.
    val merges = Bpe.train(Seq(("ab", 3L), ("abc", 2L), ("aa", 5L)), 8)
    assert(merges.take(2) == Seq(("a", "b"), ("ab", "c")))
    // nothing mergeable remains ("aa" pairs stay skipped) — training
    // stops short of numMerges rather than inventing merges
    assert(merges.length == 2)
  }

  test("training tie-break is (count desc, left asc, right asc)") {
    // (x,y)=2 and (p,q)=2 tie on count; (p,q) wins lexicographically
    val merges = Bpe.train(Seq(("xy", 2L), ("pq", 2L)), 1)
    assert(merges == Seq(("p", "q")))
  }

  test("encode: LOWEST rank merges first even when a later-position pair has an earlier rank") {
    // merges: rank0=(b,c), rank1=(a,b). In "abc": pairs (a,b) rank1 and
    // (b,c) rank0 → (b,c) merges FIRST, so the result is a + bc — the
    // priority semantics, not left-to-right scanning.
    val m = Bpe.Model(IndexedSeq(("b", "c"), ("a", "b")))
    assert(m.encodeWord("abc").toSeq == Seq(m.ids("a"), m.ids("bc")))
    // and all occurrences of the best pair merge in one step: "bcbc"
    assert(m.encodeWord("bcbc").toSeq == Seq(m.ids("bc"), m.ids("bc")))
  }

  test("encode: merges chain through multi-symbol tokens; unknown symbols map to UNK") {
    val m = Bpe.Model(IndexedSeq(("a", "b"), ("ab", "c")))
    assert(m.encodeWord("abc").toSeq == Seq(m.ids("abc")))
    assert(m.encodeWord("abd").toSeq == Seq(m.ids("ab"), m.ids("d")))
    // 'é' is outside the printable-ASCII base vocab → UNK (id 0)
    assert(m.encodeWord("é").toSeq == Seq(Bpe.UnkId))
  }

  test("pre-tokenizer boundaries: merges never cross them; pattern matches TextAnalysis") {
    assert(Bpe.PretokenPattern == graft.operators.TextAnalysis.BpeishPattern)
    val m = Bpe.Model(IndexedSeq(("a", "b")))
    // "a b" pre-tokenizes to ["a", "b"]: no merge across the space
    assert(m.encode("a b").toSeq == Seq(m.ids("a"), m.ids("b")))
    assert(m.encode("ab").toSeq == Seq(m.ids("ab")))
    // digits and punctuation split: "ab1!" → ["ab"], ["1"], ["!"]
    assert(m.encode("ab1!").toSeq ==
      Seq(m.ids("ab"), m.ids("1"), m.ids("!")))
  }

  test("fixture: loads, refuses same-symbol merges by contract, ids are stable") {
    val f = Bpe.default
    assert(f.merges.nonEmpty)
    assert(f.merges.forall { case (l, r) => l != r })
    // id layout: UNK=0, '!'=1 .. '~'=94, merges from 95 in rank order
    assert(f.ids("!") == 1 && f.ids("~") == 94)
    assert(f.ids(f.merges.head._1 + f.merges.head._2) == 95)
    intercept[IllegalArgumentException](
      Bpe.Model(IndexedSeq(("a", "a"))))
  }

  test("decode inverts encode for in-vocab text") {
    val f = Bpe.default
    val words = Seq("window", "sort", "query", "vector", "scan")
    words.foreach { w =>
      assert(f.decode(f.encodeWord(w).toIndexedSeq) == w, s"roundtrip of '$w'")
    }
  }

  test("trainOn: distributed frequency table matches local training") {
    import spark.implicits._
    val df = Seq.fill(3)("ab ab abc").toDF("text")
    val m = Bpe.trainOn(df, "text", 8)
    assert(m.merges == Bpe.train(Seq(("ab", 6L), ("abc", 3L)), 8))
  }

  test("expressions: bpe_encode/bpe_count agree, null-propagate, and run under codegen") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val df = Seq(Some("the window sort"), Some(""), None).toDF("text")
    val got = df.select(
      Bpe.bpe_encode(col("text")).as("ids"),
      Bpe.bpe_count(col("text")).as("n")).collect()
    val local = Bpe.default.encode("the window sort")
    assert(got(0).getSeq[Int](0) == local.toSeq)
    assert(got(0).getInt(1) == local.length)
    assert(got(1).getSeq[Int](0).isEmpty && got(1).getInt(1) == 0)
    assert(got(2).isNullAt(0) && got(2).isNullAt(1))
    // SQL registration surface
    assert(spark.sql("SELECT bpe_count('window window')").head.getInt(0) ==
      2 * Bpe.default.encodeWord("window").length)
  }

  test("memo cache: repeated encodes are consistent (cache hit equals miss)") {
    val f = Bpe.default
    val first = f.encodeWord("columnstore")
    assert(f.encodeWord("columnstore").toSeq == first.toSeq)
  }
}
