package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * The index-time analysis chain (lowercase → whitespace tokenize →
 * Lucene classic stop set → Harman 1991 S-stemmer): rule-by-rule
 * stemmer pins, the string/Column twin equality the oracle depends
 * on, and analyzer parity end-to-end (analyzed index + analyzed query
 * retrieves inflected forms).
 */
class AnalyzerSpec extends AnyFunSuite with SparkTestBase {

  test("S-stemmer rules fire guard-terminally, one rule per word") {
    val cases = Map(
      "queries" -> "query", // -ies → -y
      "movies" -> "movy", // the documented over-stem; rule 1 is blind
      "eies" -> "eies", "aies" -> "aies", // rule-1 guards hold the word
      "taxes" -> "taxe", // -es → -e
      "goes" -> "goes", "sees" -> "sees", "aes" -> "aes", // rule-2 guards
      "sorts" -> "sort", "rows" -> "row", // -s → ∅
      "corpus" -> "corpus", "class" -> "class", // rule-3 guards
      // a bare "s" stems to the empty string — consistently in the
      // string, Column, and SQL twins; the whitespace tokenizer drops
      // the resulting empty token on every side
      "s" -> "", "us" -> "us", // the -us guard beats the bare -s rule
      "sort" -> "sort", "query" -> "query") // no suffix: unchanged
    cases.foreach { case (in, want) =>
      assert(TextAnalysis.sStem(in) == want, s"sStem($in)")
    }
  }

  test("string twin == Column twin on every corpus doc (the oracle seam)") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("text"))
    val both = docs.select(col("doc_id"), col("text"),
        TextAnalysis.analyzeEnglishCol(col("text")).as("col_side"))
      .collect()
    both.foreach { r =>
      assert(TextAnalysis.analyzeEnglish(r.getString(1)) == r.getString(2),
        s"doc ${r.getLong(0)}")
    }
    // and on hand-built edge rows the synthetic corpus lacks
    val edge = Seq("The Queries  GOES classes", "a an and", "", "  ",
      "taxes taxes taxes", "IS this THEIR movies")
    edge.foreach { s =>
      val viaCol = Seq(s).toDF("text")
        .select(TextAnalysis.analyzeEnglishCol(col("text"))).head.getString(0)
      assert(TextAnalysis.analyzeEnglish(s) == viaCol, s"edge '$s'")
    }
  }

  test("stopwords vanish from the analyzed field, stems fold plurals") {
    assert(TextAnalysis.analyzeEnglish("The sorts and the queries")
      == "sort query")
    // an all-stopword input analyzes to the empty string
    assert(TextAnalysis.analyzeEnglish("the a of to") == "")
  }

  test("analyzer parity end-to-end: inflected query hits the analyzed index") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The sort merges rows"), // analyzed: sort merge row
      (2L, "a query scans the table"), // analyzed: query scan table
      (3L, "queries and sorts everywhere"), // analyzed: query sort everywhere
      (4L, "nothing relevant here")
    ).toDF("doc_id", "text")
    val root = Files.createTempDirectory("an_idx").toString
    val analyzed = docs.select(col("doc_id"),
      TextAnalysis.analyzeEnglishCol(col("text")).as("atext"))
    TextAnalysis.writeBm25Index(analyzed, "doc_id", "atext", root,
      nBuckets = 4)
    // the inflected query only matches because BOTH sides analyze:
    // "sorts"→sort, "queries"→query, "the"→∅
    val got = TextAnalysis.bm25ServeTopK(spark, root,
      TextAnalysis.analyzeEnglish("the sorts queries"), k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
    // and the UNanalyzed query text would find nothing: the raw
    // inflections are not index terms
    assert(TextAnalysis.bm25ServeTopK(spark, root, "sorts queries", k = 10)
      .count() == 0L)
  }
}
