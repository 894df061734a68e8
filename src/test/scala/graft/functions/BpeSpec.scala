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
class BpeSpec extends AnyFunSuite with SparkTestBase with graft.PropHelper {

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

  test("encode: merges chain through multi-symbol tokens; non-ASCII falls back to byte tokens") {
    val m = Bpe.Model(IndexedSeq(("a", "b"), ("ab", "c")))
    assert(m.encodeWord("abc").toSeq == Seq(m.ids("abc")))
    assert(m.encodeWord("abd").toSeq == Seq(m.ids("ab"), m.ids("d")))
    // 'é' is U+00E9 = UTF-8 bytes 0xC3 0xA9 → the two byte tokens
    // (id = byte + 1) — byte-level BPE has NO UNK (VERDICT r13 next #2)
    assert(m.encodeWord("é").toSeq == Seq(0xC3 + 1, 0xA9 + 1))
    assert(m.decode(m.encodeWord("é").toIndexedSeq) == "é")
  }

  test("byte mapping: bijective over all 256 bytes; printable ASCII is identity") {
    assert(Bpe.ByteToChar.distinct.length == 256)
    (33 to 126).foreach(b => assert(Bpe.ByteToChar(b) == b.toChar))
    (0 to 255).foreach(b => assert(Bpe.CharToByte(Bpe.ByteToChar(b)) == b))
    // no symbol char is whitespace or a control char (the merges file is
    // tab-separated; the rank map is space-keyed)
    Bpe.ByteToChar.foreach(c => assert(!c.isWhitespace && !c.isControl))
  }

  test("lossless encode→decode on arbitrary UTF-8: emoji, CJK, accents, surrogate pairs") {
    val f = Bpe.default
    // decode(encode(w)) == w for any single pre-token, including symbols
    // far outside ASCII — the byte fallback guarantees totality. (Full
    // texts lose inter-pre-token whitespace by documented contract.)
    val words = Seq("naïve", "日本語", "🚀", "Ω", "Ñandú", "a🚀b",
      "é́", new String(Character.toChars(0x1F9EA)) * 3)
    words.foreach { w =>
      val ids = f.encode(w)
      assert(ids.nonEmpty && ids.forall(_ > 0), s"reserved/invalid id for '$w'")
      // encode runs per pre-token; rebuild what the pre-tokenizer kept
      val kept = {
        val m = java.util.regex.Pattern.compile(Bpe.PretokenPattern).matcher(w)
        val sb = new StringBuilder
        while (m.find()) sb.append(m.group())
        sb.toString
      }
      assert(f.decode(ids.toIndexedSeq) == kept, s"roundtrip of '$w'")
    }
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
    // id layout: 0 reserved, byte b = b+1 (so '!'=34, '~'=127), merges
    // from 257 in rank order
    assert(f.ids("!") == '!'.toInt + 1 && f.ids("~") == '~'.toInt + 1)
    assert(f.ids(f.merges.head._1 + f.merges.head._2) == 257)
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

  test("bpe_decode expression inverts bpe_encode on the pre-token stream; UNK refuses") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val got = Seq("the window sort", "query vector scan")
      .toDF("text")
      .select(Bpe.bpe_decode(Bpe.bpe_encode(col("text"))).as("rt"),
        regexp_replace(col("text"), "\\s+", "").as("want"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1)))
    intercept[Exception](spark.sql("SELECT bpe_decode(array(0))").head)
  }

  // ---------------------------------------------------- property checks

  test("property: greedy encode invariants over arbitrary ASCII words and trained models") {
    import org.scalacheck.Gen
    val wordGen = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.choose('a', 'f')).map(_.mkString))
    val corpusGen = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, wordGen))
    forAllG(corpusGen, Gen.choose(0, 10)) { (corpus, numMerges) =>
      val m = Bpe.Model(Bpe.train(corpus.map(_ -> 1L), numMerges))
      corpus.foreach { w =>
        val ids = m.encodeWord(w)
        // token count bounded by char count; at least 1 for nonempty
        assert(ids.length >= 1 && ids.length <= w.length)
        // decode inverts (all chars a-f are in the base vocab)
        assert(m.decode(ids.toIndexedSeq) == w, s"roundtrip of '$w'")
        // fixpoint: no adjacent pair of the final sequence is mergeable
        val toks = ids.map(m.vocabById)
        toks.zip(toks.drop(1)).foreach { case (l, r) =>
          assert(!m.merges.contains((l, r)),
            s"encode of '$w' stopped with mergeable pair ($l,$r)")
        }
      }
    }
  }

  test("property: training merge count bounded; merges only concatenate existing tokens") {
    import org.scalacheck.Gen
    val wordGen = Gen.choose(2, 10).flatMap(n =>
      Gen.listOfN(n, Gen.choose('a', 'd')).map(_.mkString))
    forAllG(Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, wordGen))) { corpus =>
      val merges = Bpe.train(corpus.map(_ -> 2L), 20)
      // every merge's left/right is a base char or an earlier merge result
      val known = scala.collection.mutable.Set[String]() ++
        corpus.flatMap(_.map(_.toString))
      merges.foreach { case (l, r) =>
        assert(known(l) && known(r), s"merge ($l,$r) from unknown symbols")
        assert(l != r)
        known += (l + r)
      }
      // merged total never exceeds total adjacent pairs available
      assert(merges.length <= corpus.map(w => w.length - 1).sum)
    }
  }
}
