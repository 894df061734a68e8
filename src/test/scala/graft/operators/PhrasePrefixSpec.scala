package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * ES match_phrase_prefix (Lucene MultiPhraseQuery with an expanded last
 * position): adjacency with a SpanOr last slot, the expanded position
 * scoring as one pseudo-term at the max member df.
 */
class PhrasePrefixSpec extends AnyFunSuite with SparkTestBase {

  private def corpus(): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "big sort now and then"),
      (2L, "big scan later big slow"),
      (3L, "sort big"),
      (4L, "big big scan"),
      (5L, "nothing here at all")
    ).toDF("doc_id", "text")
  }

  private def freshIndex(): String = {
    val root = Files.createTempDirectory("pp_idx").toString
    TextAnalysis.writeBm25Index(corpus(), "doc_id", "text", root,
      nBuckets = 4, positions = true)
    root
  }

  private def rows(df: DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("a single-variant expansion equals the exact phrase serve bit for bit") {
    val root = freshIndex()
    // 'so*' expands to {sort} alone: max-df blend = sort's own df and
    // the SpanOr last slot = sort's positions — the exact phrase serve
    assert(rows(TextAnalysis.bm25ServePhrasePrefixTopK(spark, root,
      "big so", k = 10))
      == rows(TextAnalysis.bm25ServePhraseTopK(spark, root,
        "big sort", k = 10)))
  }

  test("the SpanOr last slot matches ANY expansion member; overlaps count per final position") {
    val root = freshIndex()
    val got = rows(TextAnalysis.bm25ServePhrasePrefixTopK(spark, root,
      "big s", k = 10)).toMap
    // docs 1 (big sort), 2 (big scan, big slow — tf 2), 4 (big scan,
    // with 'big big' overlapping: one final position → tf 1); doc 3's
    // trailing 'big' has no successor
    assert(got.keySet == Set(1L, 2L, 4L))
    // hand-replay the scoring: n=5, lens 5,5,2,3,4 (tot 19)
    val lens = Map(1L -> 5L, 2L -> 5L, 3L -> 2L, 4L -> 3L, 5L -> 4L)
    val n = 5L
    val avg1000 = 19L * 1000L / 5L
    def idf(dfc: Long): Long = (n - dfc + 1) * 10000L / (dfc + 1)
    def w(tf: Long, len: Long): Long = {
      val norm1000 = 250L + (750L * len * 1000L) / avg1000
      (tf * 2200L * 10000L) / (tf * 1000L + (1200L * norm1000) / 1000L)
    }
    // df(big) = 4; expansion {scan, slow, sort}: dfs 2, 1, 1 → blend 2
    val idfSum = idf(4L) + idf(2L)
    val tf = Map(1L -> 1L, 2L -> 2L, 4L -> 1L)
    tf.foreach { case (id, t) =>
      assert(got(id) == idfSum * w(t, lens(id)), s"doc $id")
    }
  }

  test("a fixed token inside its own stem's expansion stays exact ('big b*')") {
    val root = freshIndex()
    // 'b*' expands to {big} — the fixed token IS the expansion member;
    // only doc 4 carries 'big big' (positions 0,1 → one final slot)
    val got = rows(TextAnalysis.bm25ServePhrasePrefixTopK(spark, root,
      "big b", k = 10))
    assert(got.map(_._1) == Seq(4L))
  }

  test("an absent fixed token or an empty expansion yields the empty result") {
    val root = freshIndex()
    assert(TextAnalysis.bm25ServePhrasePrefixTopK(spark, root,
      "missing s", k = 10).count() == 0L)
    assert(TextAnalysis.bm25ServePhrasePrefixTopK(spark, root,
      "big zz", k = 10).count() == 0L)
  }

  test("maxExpansions caps the variant set in dictionary order (the ES contract)") {
    val root = freshIndex()
    // cap 1 keeps only 'scan' (first in dictionary order among
    // {scan, slow, sort}): doc 1 (big sort) drops out, blend df = 2
    val got = rows(TextAnalysis.bm25ServePhrasePrefixTopK(spark, root,
      "big s", k = 10, maxExpansions = 1)).toMap
    assert(got.keySet == Set(2L, 4L))
  }
}
