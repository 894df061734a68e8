package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * The round-18 query-type additions — boosting (soft MUST_NOT),
 * terms_set (per-doc minimum_should_match from doc values) and
 * span_first (position-restricted term) — each pinned by its
 * degenerate equality against the established serve plus a
 * hand-checkable divergence case.
 */
class Bm25QueryTypesSpec extends AnyFunSuite with SparkTestBase {

  private def corpus(): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta noise noise noise noise noise noise noise alpha", 120L),
      (2L, "alpha beta gamma here", 250L),
      (3L, "beta gamma body text longer here now", 400L),
      (4L, "alpha alone", 90L),
      (5L, "gamma delta unrelated", 310L)
    ).toDF("doc_id", "text", "n_chars")
  }

  private def build(positions: Boolean = false): String = {
    val root = Files.createTempDirectory("qt_idx").toString
    TextAnalysis.writeBm25Index(corpus(), "doc_id", "text", root,
      nBuckets = 4, positions = positions, docValueCols = Seq("n_chars"))
    root
  }

  private def rows(df: DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("constant_score: the match set at a fixed score, no statistics") {
    val root = build()
    val got = rows(TextAnalysis.bm25ConstantScoreTopK(spark, root,
      "alpha gamma", boost1000 = 700L, k = 10))
    // match set = docs carrying alpha or gamma (all but none here: 1-5
    // except... doc 1,2,4 alpha; 2,3,5 gamma) at the constant score
    assert(got == Seq(1L, 2L, 3L, 4L, 5L).map(id => (id, 700L)))
    // the plain serve's doc set equals it; only the scores differ
    assert(rows(TextAnalysis.bm25ServeTopK(spark, root, "alpha gamma",
      10)).map(_._1).toSet == got.map(_._1).toSet)
  }

  test("boosting: negBoost 1000 == plain serve; 0 sinks demoted docs to the NOT serve's set") {
    val root = build()
    val q = "alpha beta"
    assert(rows(TextAnalysis.bm25BoostingTopK(spark, root, q, "gamma",
      negBoost1000 = 1000L, k = 10))
      == rows(TextAnalysis.bm25ServeTopK(spark, root, q, k = 10)))
    val zero = rows(TextAnalysis.bm25BoostingTopK(spark, root, q, "gamma",
      negBoost1000 = 0L, k = 10))
    assert(zero.filter(_._2 > 0)
      == rows(TextAnalysis.bm25ServeTopKNot(spark, root, q, "gamma", 10)))
    // demoted docs are PRESENT at score 0 — the soft exclusion
    assert(zero.filter(_._2 == 0).map(_._1).toSet == Set(2L, 3L))
    // a partial demote keeps order within each class and scales exactly
    val plain = rows(TextAnalysis.bm25ServeTopK(spark, root, q, 10)).toMap
    val soft = rows(TextAnalysis.bm25BoostingTopK(spark, root, q, "gamma",
      negBoost1000 = 250L, k = 10)).toMap
    Seq(2L, 3L).foreach(id => assert(soft(id) == plain(id) * 250L / 1000L))
    Seq(1L, 4L).foreach(id => assert(soft(id) == plain(id)))
  }

  test("terms_set: per-doc msm from docvals; constant expression == fixed-m MSM serve") {
    val root = build()
    val q = "alpha beta gamma"
    assert(rows(TextAnalysis.bm25TermsSetTopK(spark, root, q, "2", k = 10))
      == rows(TextAnalysis.bm25ServeTopKMsm(spark, root, q, 2, k = 10)))
    // per-doc thresholds: docs with n_chars >= 300 need 2 matches,
    // shorter ones 1 — doc 5 (310, matches only gamma) drops, doc 4
    // (90, matches only alpha) stays
    val got = rows(TextAnalysis.bm25TermsSetTopK(spark, root, q,
      "CASE WHEN n_chars >= 300 THEN 2 ELSE 1 END", k = 10))
      .map(_._1).toSet
    assert(got == Set(1L, 2L, 3L, 4L))
  }

  test("span_first: only early positions count; a wide end == the plain serve") {
    val root = build(positions = true)
    assert(rows(TextAnalysis.bm25SpanFirstTopK(spark, root, "alpha",
      end = 1000, k = 10))
      == rows(TextAnalysis.bm25ServeTopK(spark, root, "alpha", k = 10)))
    // end=2: doc 1's second 'alpha' (pos 9) no longer counts (tf 2→1);
    // doc 2/4 keep their pos-0 hit
    val tight = rows(TextAnalysis.bm25SpanFirstTopK(spark, root, "alpha",
      end = 2, k = 10)).toMap
    assert(tight.keySet == Set(1L, 2L, 4L))
    // doc 1 restricted tf = 1: its score now uses tf 1 at ITS length
    val lens = Map(1L -> 10L, 2L -> 4L, 3L -> 7L, 4L -> 2L, 5L -> 3L)
    val n = 5L
    val avg1000 = lens.values.sum * 1000L / n
    def w(tf: Long, len: Long): Long = {
      val norm1000 = 250L + (750L * len * 1000L) / avg1000
      (tf * 2200L * 10000L) / (tf * 1000L + (1200L * norm1000) / 1000L)
    }
    val idf = (n - 3L + 1L) * 10000L / (3L + 1L) // df(alpha) = 3
    assert(tight(1L) == idf * w(1L, 10L))
    assert(tight(4L) == idf * w(1L, 2L))
  }

  test("span_not: near-exclude positions drop; absent exclude == plain serve") {
    val root = build(positions = true)
    // exclude term absent from the corpus → bit-identical plain serve
    assert(rows(TextAnalysis.bm25SpanNotTopK(spark, root, "alpha",
      "nosuchterm", dist = 3, k = 10))
      == rows(TextAnalysis.bm25ServeTopK(spark, root, "alpha", k = 10)))
    // include='alpha', exclude='beta', dist=1: doc 1 (alpha@0 beta@1
    // ... alpha@9) loses the pos-0 hit, keeps pos-9 (tf 2→1); doc 2
    // (alpha@0 beta@1) loses its only hit and DROPS; doc 4 (no beta)
    // keeps tf=1
    val got = rows(TextAnalysis.bm25SpanNotTopK(spark, root, "alpha",
      "beta", dist = 1, k = 10)).toMap
    assert(got.keySet == Set(1L, 4L))
    val lens = Map(1L -> 10L, 2L -> 4L, 4L -> 2L)
    val n = 5L
    val avg1000 = (10L + 4L + 7L + 2L + 3L) * 1000L / n
    def w(tf: Long, len: Long): Long = {
      val norm1000 = 250L + (750L * len * 1000L) / avg1000
      (tf * 2200L * 10000L) / (tf * 1000L + (1200L * norm1000) / 1000L)
    }
    val idf = (n - 3L + 1L) * 10000L / (3L + 1L)
    assert(got(1L) == idf * w(1L, 10L))
    assert(got(4L) == idf * w(1L, 2L))
    // dist=0 on distinct single-position spans excludes nothing — the
    // Lucene same-position-overlap default generalizes to a no-op here
    assert(rows(TextAnalysis.bm25SpanNotTopK(spark, root, "alpha",
      "beta", dist = 0, k = 10))
      == rows(TextAnalysis.bm25ServeTopK(spark, root, "alpha", k = 10)))
    // self-exclusion is refused loudly (it matches nothing by definition)
    assertThrows[IllegalArgumentException](
      TextAnalysis.bm25SpanNotTopK(spark, root, "alpha", "alpha", 1, 10))
  }

  test("match_bool_prefix: SHOULD clauses + constant-score prefix; degenerate forms") {
    val root = build()
    // 'beta al': beta scores its clause on docs 1,2,3; 'al*' expands
    // {alpha, alone} -> docs 1,2,4 at the constant 1000; doc 4 matches
    // ONLY the prefix and still surfaces
    val got = rows(TextAnalysis.bm25MatchBoolPrefixTopK(spark, root,
      "beta al", k = 10)).toMap
    val beta = rows(TextAnalysis.bm25ServeTopK(spark, root, "beta",
      k = 10)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    Seq(1L, 2L).foreach(id => assert(got(id) == beta(id) + 1000L))
    assert(got(3L) == beta(3L)) // no al* term in doc 3
    assert(got(4L) == 1000L) // prefix-only doc at the constant
    // a stem matching nothing degenerates to the fixed-terms serve
    assert(rows(TextAnalysis.bm25MatchBoolPrefixTopK(spark, root,
      "beta zzzz", k = 10))
      == rows(TextAnalysis.bm25ServeTopK(spark, root, "beta", k = 10)))
    // prefix-only query: every expansion-matching doc at the constant
    assert(rows(TextAnalysis.bm25MatchBoolPrefixTopK(spark, root,
      "al", k = 10)) == Seq((1L, 1000L), (2L, 1000L), (4L, 1000L)))
  }

  test("pinned: editorial order first at score -1, organic tail deduped, unknown/dead pins skipped") {
    val root = build()
    // pins promote regardless of matching (doc 5 has no alpha/beta);
    // organic = the plain serve minus the pinned ids
    val got = TextAnalysis.bm25PinnedTopK(spark, root, "alpha beta",
      Seq(5L, 3L, 999L), k = 10).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val organic = rows(TextAnalysis.bm25ServeTopK(spark, root,
      "alpha beta", 10)).filterNot(r => Set(5L, 3L).contains(r._1))
    val expect = Seq((1, 5L, -1L), (2, 3L, -1L)) ++
      organic.zipWithIndex.map { case ((id, s), i) => (i + 3, id, s) }
    assert(got == expect)
    // k cuts across the boundary: k=2 returns just the two pins
    assert(TextAnalysis.bm25PinnedTopK(spark, root, "alpha beta",
      Seq(5L, 3L), k = 2).collect().map(_.getLong(1)).toSeq == Seq(5L, 3L))
    // a tombstoned pin is skipped like an unknown one
    TextAnalysis.deleteBm25Docs(spark, root, Seq(5L))
    val afterDel = TextAnalysis.bm25PinnedTopK(spark, root, "alpha beta",
      Seq(5L, 3L), k = 10).collect().map(_.getLong(1)).toSeq
    assert(!afterDel.contains(5L) && afterDel.head == 3L)
    // duplicate pins are refused (one editorial slot per id)
    assertThrows[IllegalArgumentException](
      TextAnalysis.bm25PinnedTopK(spark, root, "alpha", Seq(1L, 1L), 5))
  }

  test("pinned on a BARE postings index: pins trusted minus tombstones (the documented weaker contract)") {
    val root = Files.createTempDirectory("qt_bare").toString
    TextAnalysis.writeBm25Index(corpus(), "doc_id", "text", root,
      nBuckets = 4) // no docValueCols — no per-id existence structure
    // with no sidecar to probe, the unknown id 999 is TRUSTED and pins
    val got = TextAnalysis.bm25PinnedTopK(spark, root, "alpha",
      Seq(5L, 999L), k = 10).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.take(2) == Seq((1, 5L, -1L), (2, 999L, -1L)))
    assert(got.drop(2).map(_._2)
      == rows(TextAnalysis.bm25ServeTopK(spark, root, "alpha", 10))
        .map(_._1).filterNot(Set(5L, 999L)))
    // tombstones still mask even without the sidecar
    TextAnalysis.deleteBm25Docs(spark, root, Seq(5L))
    assert(!TextAnalysis.bm25PinnedTopK(spark, root, "alpha",
      Seq(5L, 999L), k = 10).collect().map(_.getLong(1)).contains(5L))
  }

  test("distance_feature: integer decay contribution; boost 0 == plain serve") {
    val root = build()
    val plain = rows(TextAnalysis.bm25ServeTopK(spark, root, "alpha",
      k = 10)).toMap
    val got = rows(TextAnalysis.bm25DistanceFeatureTopK(spark, root,
      "alpha", "n_chars", origin = 250L, pivot = 100L,
      boost1000 = 1000L, k = 10)).toMap
    // contrib = (1000·100) div (100 + |n_chars − 250|)
    val chars = Map(1L -> 120L, 2L -> 250L, 4L -> 90L)
    got.foreach { case (id, s) =>
      val contrib = 100000L / (100L + math.abs(chars(id) - 250L))
      assert(s == plain(id) + contrib, s"doc $id")
    }
    // doc 2 sits AT the origin: full boost, exactly boost1000
    assert(got(2L) == plain(2L) + 1000L)
    // zero boost degenerates to the plain serve bit for bit
    assert(rows(TextAnalysis.bm25DistanceFeatureTopK(spark, root,
      "alpha", "n_chars", 250L, 100L, 0L, k = 10))
      == rows(TextAnalysis.bm25ServeTopK(spark, root, "alpha", k = 10)))
  }

  test("span_or: single term == plain serve; union scores as one pseudo-term at max df") {
    val root = build(positions = true)
    assert(rows(TextAnalysis.bm25SpanOrTopK(spark, root, Seq("alpha"),
      k = 10))
      == rows(TextAnalysis.bm25ServeTopK(spark, root, "alpha", k = 10)))
    // alpha|gamma: the union position count with idf at max(df)=3 —
    // exactly the one-group synonym blend, cross-checked
    assert(rows(TextAnalysis.bm25SpanOrTopK(spark, root,
      Seq("alpha", "gamma"), k = 10))
      == rows(TextAnalysis.bm25ServeTopKSynonyms(spark, root, "alpha",
        Map("alpha" -> Seq("gamma")), k = 10)))
    // absent members are ignored; all-absent returns empty
    assert(rows(TextAnalysis.bm25SpanOrTopK(spark, root,
      Seq("alpha", "nosuchterm"), k = 10))
      == rows(TextAnalysis.bm25ServeTopK(spark, root, "alpha", k = 10)))
    assert(TextAnalysis.bm25SpanOrTopK(spark, root, Seq("nosuchterm"),
      k = 10).count() == 0L)
  }
}
