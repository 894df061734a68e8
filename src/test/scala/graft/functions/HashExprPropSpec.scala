package graft.functions

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.PropHelper

/** Property checks for the round-13 one-pass text expressions: the
  * invariants a fuzzer would try to break — tiling, bounds, and
  * locality — over arbitrary (including non-alnum, empty, and
  * control-char-bearing) strings. */
class HashExprPropSpec extends AnyFunSuite with PropHelper {

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 400)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaLowerChar,
      2 -> Gen.const(' '),
      1 -> Gen.numChar,
      1 -> Gen.oneOf('!', '.', ',', '\t', '\n', 'Z', '\u0001')))
  } yield cs.mkString

  test("cdcCuts: cuts are in-range, sorted, distinct; chunks always tile the text") {
    forAllG(textGen, Gen.oneOf(4, 8, 16), Gen.oneOf(16, 64)) { (t, w, mask) =>
      val cuts = HashFunctions.cdcCuts(t, w, mask)
      assert(cuts.toSeq == cuts.sorted.toSeq && cuts.distinct.length == cuts.length)
      cuts.foreach(c => assert(c >= w && c < t.length))
      // bounds 0 < c1 < ... < n tile the text exactly
      val bounds = 0 +: cuts.toSeq :+ t.length
      val rebuilt = bounds.sliding(2).map { case Seq(a, b) => t.substring(a, b) }.mkString
      assert(rebuilt == t)
    }
  }

  test("cdcCuts: locality — an edit never moves cuts more than a window past it") {
    forAllG(textGen.suchThat(_.length > 40), Gen.choose(0, 10)) { (t, at) =>
      val edited = t.substring(0, at) + "EDITINSERT" + t.substring(at)
      val shift = "EDITINSERT".length
      // compare cuts strictly beyond the edit's influence: original cuts
      // after at+w (original coordinates) vs edited cuts after
      // at+shift+w (edited coordinates) — same windows, same hashes
      val before = HashFunctions.cdcCuts(t, 8, 16).filter(_ > at + 8)
      val after = HashFunctions.cdcCuts(edited, 8, 16).filter(_ > at + shift + 8)
      assert(after.toSet == before.map(_ + shift).toSet,
        s"cuts beyond the edit window must shift rigidly: " +
          s"${before.toSeq} vs ${after.toSeq}")
    }
  }

  test("featureHash: L1 mass equals token count; dim bound holds; concat adds") {
    forAllG(textGen, Gen.oneOf(16, 64)) { (t, dim) =>
      val v = HashFunctions.featureHash(t, dim)
      assert(v.length == dim)
      val nTokens = t.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty)
      // each token adds exactly ±1 to one coordinate → Σ|v_j| ≤ tokens,
      // with equality iff no sign cancellation happened
      assert(v.map(math.abs).sum <= nTokens)
      assert((v.map(math.abs).sum - nTokens) % 2 == 0,
        "cancellation removes mass in pairs")
      // additivity: hashing a concatenation (with a separator) sums the parts
      val u = HashFunctions.featureHash(t + " " + t, dim)
      assert(u.toSeq == v.map(_ * 2).toSeq)
    }
  }

  test("pairBuckets: codes in range; count = tokens-1; prefix bucket consistent") {
    forAllG(textGen, Gen.oneOf(16, 64)) { (t, b) =>
      val codes = HashFunctions.pairBuckets(t, b)
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      assert(codes.length == math.max(0, toks.length - 1))
      codes.foreach(c => assert(c >= 0 && c < b.toLong * b))
      // adjacent pairs share the middle token: code_i's transition target
      // token is code_{i+1}'s prefix, so p_{i+1} = h(tok_{i+1}) mod b
      val hs = toks.map(tok => tok.take(16).foldLeft(0L)((a, ch) => (a * 131L + ch) % HashFunctions.P))
      codes.zipWithIndex.foreach { case (c, i) =>
        assert(c / b == hs(i) % b, "prefix bucket must be h(tok_i) mod b")
      }
    }
  }
}
