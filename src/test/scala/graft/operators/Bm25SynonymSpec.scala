package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Query-time synonym expansion (VERDICT r17 #5): groups score as one
 * pseudo-term with Lucene SynonymQuery semantics — tf summed over
 * members, df = the max member df — the index stays invariant, and an
 * out-of-corpus query term retrieves through its group.
 */
class Bm25SynonymSpec extends AnyFunSuite with SparkTestBase {

  private def corpus(): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "car fast road"),
      (2L, "automobile slow road lane"),
      (3L, "car automobile garage"),
      (4L, "truck slow lane here"),
      (5L, "bike fast path")
    ).toDF("doc_id", "text")
  }

  private def freshIndex(): String = {
    val root = Files.createTempDirectory("syn_idx").toString
    TextAnalysis.writeBm25Index(corpus(), "doc_id", "text", root,
      nBuckets = 4)
    root
  }

  private def scores(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("an empty synonym map degenerates exactly to the plain serve") {
    val root = freshIndex()
    assert(scores(TextAnalysis.bm25ServeTopKSynonyms(spark, root,
      "car road", Map.empty, k = 10))
      == scores(TextAnalysis.bm25ServeTopK(spark, root, "car road", k = 10)))
  }

  test("an out-of-corpus term retrieves via its synonyms") {
    val root = freshIndex()
    // 'vehicle' never occurs; its group {vehicle, car, automobile} hits
    // docs 1, 2, 3 — with doc 3 (two member occurrences) summing tf
    val got = scores(TextAnalysis.bm25ServeTopKSynonyms(spark, root,
      "vehicle", Map("vehicle" -> Seq("car", "automobile")), k = 10))
    assert(got.keySet == Set(1L, 2L, 3L))
  }

  test("group scoring: tf sums over members, df is the max member df") {
    val root = freshIndex()
    val got = scores(TextAnalysis.bm25ServeTopKSynonyms(spark, root,
      "vehicle slow", Map("vehicle" -> Seq("car", "automobile")), k = 10))
    // replay the contract by hand: 5 docs, lens 3,4,3,4,3 (tot 17)
    val docs = corpus().collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = 5L
    val avg1000 = 17L * 1000L / 5L
    def w(tf: Long, len: Long): Long = {
      val norm1000 = 250L + (750L * len * 1000L) / avg1000
      (tf * 2200L * 10000L) / (tf * 1000L + (1200L * norm1000) / 1000L)
    }
    def idf(dfc: Long): Long = (n - dfc + 1) * 10000L / (dfc + 1)
    val groups = Seq(
      ("vehicle", Seq("vehicle", "car", "automobile")),
      ("slow", Seq("slow")))
    val want = docs.map { case (id, toks) =>
      id -> groups.map { case (_, ms) =>
        val tf = toks.count(ms.contains).toLong
        val dfg = ms.map(m => docs.values.count(_.contains(m)).toLong).max
        if (tf > 0) idf(dfg) * w(tf, toks.length.toLong) else 0L
      }.sum
    }.filter(_._2 > 0)
    assert(got == want)
    // and the blend matters: doc 3's group tf is 2 (car + automobile),
    // strictly above either member alone
    assert(docs(3L).count(Seq("car", "automobile").contains) == 2)
  }

  test("synonyms compose with deletes: a tombstoned doc never surfaces") {
    val root = freshIndex()
    TextAnalysis.deleteBm25Docs(spark, root, Seq(3L))
    val got = scores(TextAnalysis.bm25ServeTopKSynonyms(spark, root,
      "vehicle", Map("vehicle" -> Seq("car", "automobile")), k = 10))
    assert(got.keySet == Set(1L, 2L))
  }
}
