package graft.operators

import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.PropHelper
import graft.SparkTestBase
import graft.core.TypeLattice

class SchemaInferenceSpec extends AnyFunSuite with SparkTestBase with PropHelper {

  private val cellGen: Gen[String] = Gen.oneOf(
    Gen.choose(0L, 5000000000L).map(_.toString),
    Gen.choose(-1000.0, 1000.0).map(d => f"$d%.3f"),
    Gen.choose(-1000.0, 1000.0).map(d => f"$d%.2f".replace('.', ',')),
    Gen.alphaStr, Gen.const(""), Gen.const("  "), Gen.const(null))

  test("packed byte aggregator ≡ reference State machine (property)") {
    val agg = new SchemaInference.AllColumnsAgg(1)
    forAllG(Gen.listOf(cellGen), Gen.chooseNum(0, 32)) { (cells, cut0) =>
      val expected = TypeLattice.inferColumn(cells.map(Option(_).getOrElse("")))
      val want = expected match {
        case TypeLattice.TInteger => "integer"
        case TypeLattice.TFloat   => "float"
        case TypeLattice.TVarchar => "varchar"
      }
      // sequential fold
      val seqBuf = cells.foldLeft(agg.zero)((b, v) => agg.reduce(b, Row(v)))
      assert(agg.finish(seqBuf) == want, s"seq on $cells")
      // split fold + merge
      val cut = if (cells.isEmpty) 0 else cut0 % (cells.length + 1)
      val (l, r) = cells.splitAt(cut)
      val lb = l.foldLeft(agg.zero)((b, v) => agg.reduce(b, Row(v)))
      val rb = r.foldLeft(agg.zero)((b, v) => agg.reduce(b, Row(v)))
      assert(agg.finish(agg.merge(lb, rb)) == want, s"merge on $cells @ $cut")
    }
  }

  test("inferTypes over a real table matches expectations") {
    val types = SchemaInference.inferTypes(
      spark.read.parquet(sf("lineitem"))
        .select("l_orderkey", "l_quantity", "l_returnflag"))
    assert(types == Map(
      "l_orderkey" -> "integer", "l_quantity" -> "float", "l_returnflag" -> "varchar"))
  }
}
