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

  test("sampled inference agrees with the full fold on homogeneous columns") {
    val df = spark.read.parquet(sf("lineitem"))
      .select("l_orderkey", "l_quantity", "l_returnflag")
    assert(SchemaInference.inferTypesSampled(df, 500) ==
      SchemaInference.inferTypes(df))
  }

  test("hash-sampled inference replays the Sampling.hashUniform subset") {
    val df = spark.read.parquet(sf("lineitem"))
      .select("l_orderkey", "l_quantity")
    val frac = 0.25
    val viaHelper = SchemaInference.inferTypesHashSampled(
      df, org.apache.spark.sql.functions.col("l_orderkey"), frac)
    val manual = SchemaInference.inferTypes(
      Sampling.hashSample(df, "l_orderkey", frac))
    assert(viaHelper == manual)
  }

  test("inferTypesWithFallback: clean sample → no fallback, sampled verdicts") {
    val s = spark; import s.implicits._
    val df = (1 to 300).map(_.toString).toDF("n").coalesce(1)
    val (types, fellBack) = SchemaInference.inferTypesWithFallback(df, 100)
    assert(types == Map("n" -> "integer") && !fellBack)
  }

  test("inferTypesWithFallback: cast-breaking rows past the sample trigger the full fold") {
    val s = spark; import s.implicits._
    // first 150 rows integer-looking, tail is text — a 100-row sample says
    // "integer", the regex-free validation finds cells try_cast refuses,
    // and the exact full fold must win (varchar)
    val rows = (1 to 150).map(_.toString) ++ Seq.fill(50)("abc")
    val df = rows.toDF("v").coalesce(1)
    val (types, fellBack) = SchemaInference.inferTypesWithFallback(df, 100)
    assert(types == Map("v" -> "varchar") && fellBack)
  }

  test("inferTypesWithFallback: cast-safe lattice drift is tolerated (documented divergence)") {
    val s = spark; import s.implicits._
    // "-5" is lattice-varchar (the reference's integer regex is ^[0-9]+$,
    // string.rb quirk parity) but casts to BIGINT fine — the sampled path
    // keeps "integer" because no value would null out. This IS the SURVEY
    // §4 divergence, pinned here so it stays deliberate.
    val rows = (1 to 150).map(_.toString) ++ Seq("-5")
    val df = rows.toDF("v").coalesce(1)
    val (types, fellBack) = SchemaInference.inferTypesWithFallback(df, 100)
    assert(types == Map("v" -> "integer") && !fellBack)
    assert(SchemaInference.inferTypes(df) == Map("v" -> "varchar"))
  }
}
