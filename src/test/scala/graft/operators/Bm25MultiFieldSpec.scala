package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Multi-field and filtered BM25 serves (VERDICT r16 #3/#4) — the ES
 * `multi_match` best_fields/most_fields pair over per-field indexes,
 * and the bool-query `filter` context over the doc-values sidecar.
 */
class Bm25MultiFieldSpec extends AnyFunSuite with SparkTestBase {

  // two text fields with DIFFERENT statistics (title short, body long)
  // plus structured attributes for the docvals sidecar
  private def corpus(): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta", "alpha alpha common words here beta", "en", 120L),
      (2L, "beta gamma", "common words alpha and more padding text", "en", 90L),
      (3L, "alpha alpha", "gamma common beta beta beta long body text", "de", 200L),
      (4L, "delta", "alpha beta common something else entirely here", "en", 45L),
      (5L, "gamma delta", "no query words at all in this body text", "de", 300L)
    ).toDF("doc_id", "title", "body", "lang", "n_chars")
  }

  private def buildPair(): (String, String) = {
    val docs = corpus()
    val tRoot = Files.createTempDirectory("mf_title").toString
    val bRoot = Files.createTempDirectory("mf_body").toString
    TextAnalysis.writeBm25Index(docs, "doc_id", "title", tRoot, nBuckets = 4)
    TextAnalysis.writeBm25Index(docs, "doc_id", "body", bRoot, nBuckets = 4)
    (tRoot, bRoot)
  }

  private def scores(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("most_fields is the boosted per-field sum; best_fields the max + tie_breaker remainder") {
    val (tRoot, bRoot) = buildPair()
    val q = "alpha beta"
    // per-field ground truth from the single-field serve (k covers all)
    val ts = scores(TextAnalysis.bm25ServeTopK(spark, tRoot, q, k = 10))
    val bs = scores(TextAnalysis.bm25ServeTopK(spark, bRoot, q, k = 10))
    val ids = (ts.keySet ++ bs.keySet).toSeq.sorted
    def boosted(m: Map[Long, Long], id: Long, b: Long): Long =
      m.getOrElse(id, 0L) * b / 1000L

    val most = scores(TextAnalysis.bm25MultiFieldTopK(spark,
      Seq((tRoot, 2000L), (bRoot, 1000L)), q, k = 10,
      mode = "most_fields"))
    ids.foreach { id =>
      val want = boosted(ts, id, 2000) + boosted(bs, id, 1000)
      assert(most.get(id).contains(want), s"most_fields doc $id")
    }

    val best = scores(TextAnalysis.bm25MultiFieldTopK(spark,
      Seq((tRoot, 2000L), (bRoot, 1000L)), q, k = 10,
      mode = "best_fields", tieBreaker1000 = 300L))
    ids.foreach { id =>
      val t = boosted(ts, id, 2000); val b = boosted(bs, id, 1000)
      val want = math.max(t, b) + (t + b - math.max(t, b)) * 300L / 1000L
      assert(best.get(id).contains(want), s"best_fields doc $id")
    }
    // tie_breaker=1000 degenerates best_fields into most_fields
    val b1000 = scores(TextAnalysis.bm25MultiFieldTopK(spark,
      Seq((tRoot, 2000L), (bRoot, 1000L)), q, k = 10,
      mode = "best_fields", tieBreaker1000 = 1000L))
    assert(b1000 == most)
  }

  test("a single field at boost 1000 degenerates to the plain serve exactly") {
    val (_, bRoot) = buildPair()
    val q = "alpha common"
    val plain = TextAnalysis.bm25ServeTopK(spark, bRoot, q, k = 5)
      .collect().map(_.toString).toSeq
    val multi = TextAnalysis.bm25MultiFieldTopK(spark,
      Seq((bRoot, 1000L)), q, k = 5, mode = "best_fields",
      tieBreaker1000 = 300L)
      .collect().map(_.toString).toSeq
    assert(multi == plain)
  }

  test("cross_fields: one field at boost 1000 degenerates to the plain serve exactly") {
    val (tRoot, _) = buildPair()
    val plain = scores(TextAnalysis.bm25ServeTopK(spark, tRoot,
      "alpha beta", k = 10))
    val cross = scores(TextAnalysis.bm25CrossFieldsTopK(spark,
      Seq((tRoot, 1000L)), "alpha beta", k = 10))
    assert(cross == plain)
  }

  test("cross_fields blends df term-centrically and takes the best field's weight") {
    val (tRoot, bRoot) = buildPair()
    val q = "alpha beta"
    val got = scores(TextAnalysis.bm25CrossFieldsTopK(spark,
      Seq((tRoot, 2000L), (bRoot, 1000L)), q, k = 10))
    // replay the contract by hand from the corpus: per-field stats,
    // blended df = min(df_t + df_b, N), per-(doc, term) max boosted w
    val docs = corpus().collect().map(r => (r.getLong(0),
      r.getString(1).split("\\s+").toSeq, r.getString(2).split("\\s+").toSeq))
    val n = docs.length.toLong
    def stats(field: Long => Seq[String]) = {
      val lens = docs.map(d => d._1 -> field(d._1).length.toLong).toMap
      val avg1000 = lens.values.sum * 1000L / n
      (lens, avg1000)
    }
    val byId = docs.map(d => d._1 -> d).toMap
    val (tLens, tAvg) = stats(id => byId(id)._2)
    val (bLens, bAvg) = stats(id => byId(id)._3)
    def w(tf: Long, len: Long, avg1000: Long): Long = {
      val norm1000 = 250L + (750L * len * 1000L) / avg1000
      (tf * 2200L * 10000L) / (tf * 1000L + (1200L * norm1000) / 1000L)
    }
    val terms = q.split(" ").toSeq
    val dfT = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val dfB = terms.map(t => t -> docs.count(_._3.contains(t)).toLong).toMap
    val idf = terms.map { t =>
      val dfc = math.min(dfT(t) + dfB(t), n)
      t -> ((n - dfc + 1) * 10000L / (dfc + 1))
    }.toMap
    val want = docs.map { case (id, title, body) =>
      id -> terms.map { t =>
        val tfT = title.count(_ == t).toLong
        val tfB = body.count(_ == t).toLong
        val wt = if (tfT > 0) w(tfT, tLens(id), tAvg) * 2000L / 1000L else 0L
        val wb = if (tfB > 0) w(tfB, bLens(id), bAvg) * 1000L / 1000L else 0L
        idf(t) * math.max(wt, wb)
      }.sum
    }.filter(_._2 > 0).toMap
    assert(got == want)
    // the blended df is LARGER than either field's own, so cross_fields
    // idf is smaller than the single-field serve's for a shared term —
    // the "rare in each field, common across them" correction
    terms.foreach { t =>
      assert(math.min(dfT(t) + dfB(t), n) >= math.max(dfT(t), dfB(t)))
    }
  }

  test("filter context: predicate intersects candidates pre-topk, scores keep full-corpus stats") {
    val docs = corpus()
    val root = Files.createTempDirectory("bm25filt").toString
    TextAnalysis.writeBm25Index(docs, "doc_id", "body", root,
      nBuckets = 4, docValueCols = Seq("lang", "n_chars"))
    val q = "alpha beta"
    val unfiltered = scores(TextAnalysis.bm25ServeTopK(spark, root, q, 10))
    val filtered = scores(TextAnalysis.bm25ServeTopKFiltered(spark, root,
      q, "lang = 'en' AND n_chars >= 90", k = 10))
    // exactly the en/large candidates survive...
    assert(filtered.keySet == unfiltered.keySet.filter(Set(1L, 2L)))
    // ...and each keeps its UNfiltered score: the filter restricts the
    // doc set, never the statistics (the Lucene filter-context contract)
    filtered.foreach { case (id, s) => assert(unfiltered(id) == s) }
    // the semi-join lands BEFORE the scoring aggregate (never scored ≠
    // scored-then-dropped)
    val plan = TextAnalysis.bm25ServeTopKFiltered(spark, root, q,
      "lang = 'en'", k = 10).queryExecution.optimizedPlan.toString
    val semiAt = plan.indexOf("LeftSemi")
    val aggAt = plan.indexOf("Aggregate")
    assert(semiAt >= 0, plan)
    assert(aggAt >= 0 && aggAt < semiAt, // plan prints top-down
      s"semi-join must sit BELOW the aggregate:\n$plan")
  }

  test("function_score: factor 1000 degenerates to the plain serve; boosts replay exactly") {
    val docs = corpus()
    val root = Files.createTempDirectory("fs_idx").toString
    TextAnalysis.writeBm25Index(docs, "doc_id", "body", root,
      nBuckets = 4, docValueCols = Seq("lang", "n_chars"))
    val q = "alpha beta"
    val plain = scores(TextAnalysis.bm25ServeTopK(spark, root, q, k = 10))
    // the verdict's degenerate form: weight 1000, multiply ≡ plain
    assert(scores(TextAnalysis.bm25FunctionScoreTopK(spark, root, q,
      "1000", k = 10)) == plain)
    // multiply: score' = (score · (1000 + n_chars)) div 1000, exactly
    val nChars = docs.collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val mult = scores(TextAnalysis.bm25FunctionScoreTopK(spark, root, q,
      "1000 + n_chars", k = 10))
    assert(mult == plain.map { case (id, s) =>
      id -> s * (1000L + nChars(id)) / 1000L
    })
    // sum adds the factor in score units
    val add = scores(TextAnalysis.bm25FunctionScoreTopK(spark, root, q,
      "n_chars * 100", k = 10, boostMode = "sum"))
    assert(add == plain.map { case (id, s) => id -> (s + nChars(id) * 100L) })
    // and the boost can REORDER: top-k applies AFTER the boost, so the
    // winner is argmax of the BOOSTED score, not the relevance order
    val strong = TextAnalysis.bm25FunctionScoreTopK(spark, root, q,
      "n_chars * 1000", k = 10).collect().head.getLong(0)
    assert(strong == plain.toSeq
      .map { case (id, s) => (id, s * nChars(id)) }
      .maxBy { case (id, v) => (v, -id) }._1)
  }

  test("docvals ride append and compaction; a sidecar-less append batch raises") {
    import spark.implicits._
    val docs = corpus()
    val root = Files.createTempDirectory("bm25filt2").toString
    TextAnalysis.writeBm25Index(docs, "doc_id", "body", root,
      nBuckets = 4, docValueCols = Seq("lang", "n_chars"))
    // append WITH the attribute columns: carried automatically
    val batch = Seq((6L, "t", "alpha beta fresh doc", "en", 500L))
      .toDF("doc_id", "title", "body", "lang", "n_chars")
    TextAnalysis.appendBm25Segment(batch, "doc_id", "body", root,
      nBuckets = 4)
    val got = scores(TextAnalysis.bm25ServeTopKFiltered(spark, root,
      "alpha beta", "n_chars >= 400", k = 10))
    assert(got.keySet == Set(6L))
    // tombstone + compact: the sidecar compacts with the postings
    TextAnalysis.deleteBm25Docs(spark, root, Seq(1L))
    TextAnalysis.compactBm25Index(spark, root, nBuckets = 4)
    val after = scores(TextAnalysis.bm25ServeTopKFiltered(spark, root,
      "alpha beta", "lang = 'en'", k = 10))
    assert(!after.contains(1L) && after.contains(6L) && after.contains(2L))
    // a batch missing the doc-values columns fails loudly
    val bad = Seq((7L, "alpha")).toDF("doc_id", "body")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.appendBm25Segment(bad, "doc_id", "body", root,
        nBuckets = 4)
    }
    assert(e.getMessage.contains("doc-values"))
    // an index built WITHOUT the sidecar refuses filtered serves loudly
    val plainRoot = Files.createTempDirectory("bm25plain").toString
    TextAnalysis.writeBm25Index(docs, "doc_id", "body", plainRoot,
      nBuckets = 4)
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25ServeTopKFiltered(spark, plainRoot, "alpha",
        "lang = 'en'", k = 5).collect()
    }
  }
}
