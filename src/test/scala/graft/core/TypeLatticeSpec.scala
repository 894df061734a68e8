package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.PropHelper
import org.scalacheck.Gen

/** Reference semantics: importer.rb:518-557 (`guess_schema`). */
class TypeLatticeSpec extends AnyFunSuite with PropHelper {
  import TypeLattice._

  test("basic kinds") {
    assert(inferColumn(Seq("1", "2", "3")) == TInteger)
    assert(inferColumn(Seq("1.5", "2")) == TFloat)
    assert(inferColumn(Seq("a", "1")) == TVarchar)
    assert(inferColumn(Seq()) == TVarchar) // never seen → varchar
    assert(inferColumn(Seq("", "  ")) == TVarchar)
  }

  test("comma and pipe decimal separators are floats (importer.rb:528 verbatim)") {
    assert(inferColumn(Seq("3,14")) == TFloat)
    assert(inferColumn(Seq("3|14")) == TFloat) // the [\.|\,] class includes '|'
    assert(inferColumn(Seq("-3,14")) == TFloat)
  }

  test("negative integers are varchar (int regex has no sign)") {
    assert(inferColumn(Seq("-5")) == TVarchar)
  }

  test("int32 overflow demotes to float — but only on non-first values") {
    assert(inferColumn(Seq("1", "2147483648")) == TFloat)
    assert(inferColumn(Seq("1", "99999999999999999999")) == TFloat)
    // first-value overflow is NOT checked (importer.rb:527-535)
    assert(inferColumn(Seq("9999999999")) == TInteger)
    assert(inferColumn(Seq("2147483647")) == TInteger)
    assert(inferColumn(Seq("1", "2147483647")) == TInteger)
  }

  test("float is sticky — no demotion to varchar (no `when \"float\"` branch)") {
    assert(inferColumn(Seq("1.5", "abc")) == TFloat)
    assert(inferColumn(Seq("1", "1.5", "abc")) == TFloat)
  }

  test("varchar is sticky") {
    assert(inferColumn(Seq("abc", "1", "2.5")) == TVarchar)
  }

  test("integer then varchar-looking demotes to varchar") {
    assert(inferColumn(Seq("1", "abc", "1.5")) == TVarchar)
  }

  test("blanks never affect inference (importer.rb:520)") {
    assert(inferColumn(Seq("", "1", " ", "2")) == TInteger)
    assert(inferColumn(Seq(null, "1.5")) == TFloat)
  }

  private val cellGen: Gen[String] = Gen.oneOf(
    Gen.choose(0L, 5000000000L).map(_.toString),
    Gen.choose(-1000.0, 1000.0).map(d => f"$d%.3f"),
    Gen.choose(-1000.0, 1000.0).map(d => f"$d%.2f".replace('.', ',')),
    Gen.alphaStr, Gen.const(""), Gen.const("  "))

  test("merge of split folds equals the sequential fold (associativity)") {
    forAllG(Gen.listOf(cellGen), Gen.chooseNum(0, 64)) { (cells, cut0) =>
      val seqResult = inferColumn(cells)
      val cut = if (cells.isEmpty) 0 else cut0 % (cells.length + 1)
      val (l, r) = cells.splitAt(cut)
      val lState = l.foldLeft(State.empty)(_.update(_))
      val rState = r.foldLeft(State.empty)(_.update(_))
      assert(lState.merge(rState).result == seqResult)
    }
  }

  test("hand-rolled classifiers agree with the reference regexes (property)") {
    val tricky = Seq("", "-", "5", "-5", "3.14", "3,14", "3|14", "-3.14", "3.",
      ".5", "3..4", "3.1.4", "a3", "3a", "00", "1e5", " 3", "3 ", "-.5", "--3.1")
    tricky.foreach { v =>
      assert(TypeLattice.isFloatLooking(v) == TypeLattice.isFloatLookingRe(v), s"float <$v>")
      assert(TypeLattice.isIntLooking(v) == TypeLattice.isIntLookingRe(v), s"int <$v>")
    }
    forAllG(cellGen) { v =>
      assert(TypeLattice.isFloatLooking(v) == TypeLattice.isFloatLookingRe(v), s"float <$v>")
      assert(TypeLattice.isIntLooking(v) == TypeLattice.isIntLookingRe(v), s"int <$v>")
    }
  }

  test("three-way merge is associative") {
    forAllG(Gen.listOfN(5, cellGen), Gen.listOfN(5, cellGen), Gen.listOfN(5, cellGen)) {
      (a, b, c) =>
        val sa = a.foldLeft(State.empty)(_.update(_))
        val sb = b.foldLeft(State.empty)(_.update(_))
        val sc = c.foldLeft(State.empty)(_.update(_))
        assert(sa.merge(sb).merge(sc).result == sa.merge(sb.merge(sc)).result)
        assert(sa.merge(sb).merge(sc).result == inferColumn(a ++ b ++ c))
    }
  }
}
