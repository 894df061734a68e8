package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.TextAnalysis.QsClause

/**
 * The Lucene classic QueryParser subset (parseQueryString) and its
 * BooleanQuery lowering (queryStringTopK): parse shapes, escapes, loud
 * failures, and the serve's degenerate equalities against the
 * individually-pinned serves.
 */
class QueryStringSpec extends AnyFunSuite with SparkTestBase {

  private def p(q: String) = TextAnalysis.parseQueryString(q)

  // ——— parser ———

  test("occur prefixes, bare terms and trailing wildcards parse") {
    assert(p("+dup sort sc* -big") == Seq(
      QsClause('+', "term", "dup"),
      QsClause('s', "term", "sort"),
      QsClause('s', "prefix", "sc"),
      QsClause('-', "term", "big")))
  }

  test("suffix, infix, fuzzy and phrase shapes parse") {
    assert(p("*ing") == Seq(QsClause('s', "suffix", "ing")))
    assert(p("pre*suf") == Seq(QsClause('s', "infix", "pre*suf")))
    assert(p("hast~") == Seq(QsClause('s', "fuzzy", "hast")))
    assert(p("+\"dup  sort\" x") == Seq(
      QsClause('+', "phrase", "dup sort"),
      QsClause('s', "term", "x")))
  }

  test("everything lowercases (the analyzer contract)") {
    assert(p("+DUP Sc* \"Big Table\"") == Seq(
      QsClause('+', "term", "dup"),
      QsClause('s', "prefix", "sc"),
      QsClause('s', "phrase", "big table")))
  }

  test("backslash escapes turn specials literal") {
    assert(p("foo\\*bar") == Seq(QsClause('s', "term", "foo*bar")))
    assert(p("\\+x") == Seq(QsClause('s', "term", "+x")))
    assert(p("a\\~") == Seq(QsClause('s', "term", "a~")))
    assert(p("say\\\"hi") == Seq(QsClause('s', "term", "say\"hi")))
    // escaped star is literal, so the trailing UNescaped star still
    // makes a prefix clause of the literal-star stem
    assert(p("a\\*b*") == Seq(QsClause('s', "prefix", "a*b")))
  }

  test("malformed query strings fail loudly") {
    assertThrows[IllegalArgumentException](p(""))
    assertThrows[IllegalArgumentException](p("   "))
    assertThrows[IllegalArgumentException](p("dup +"))
    assertThrows[IllegalArgumentException](p("-"))
    assertThrows[IllegalArgumentException](p("\"unterminated"))
    assertThrows[IllegalArgumentException](p("a*b*c"))
    assertThrows[IllegalArgumentException](p("*"))
    assertThrows[IllegalArgumentException](p("+\"\""))
  }

  // ——— lowering: degenerate equalities against the pinned serves ———

  private def corpus(): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta common words here"),
      (2L, "alpha alpha gamma padding text body"),
      (3L, "beta beta gamma common long body text here"),
      (4L, "alpha beta gamma delta"),
      (5L, "delta epsilon nothing shared"),
      (6L, "alphabet soup beta")
    ).toDF("doc_id", "text")
  }

  private def freshIndex(): String = {
    val root = Files.createTempDirectory("qs_idx").toString
    TextAnalysis.writeBm25Index(corpus(), "doc_id", "text", root,
      nBuckets = 4)
    root
  }

  private def rows(df: DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("all-SHOULD terms degenerate to the plain disjunctive serve") {
    val root = freshIndex()
    assert(rows(TextAnalysis.queryStringTopK(spark, root, "alpha beta", 10))
      == rows(TextAnalysis.bm25ServeTopK(spark, root, "alpha beta", 10)))
  }

  test("all-MUST terms degenerate to the conjunctive serve") {
    val root = freshIndex()
    assert(rows(TextAnalysis.queryStringTopK(spark, root, "+alpha +beta", 10))
      == rows(TextAnalysis.bm25ServeTopKAnd(spark, root, "alpha beta", 10)))
  }

  test("SHOULD + MUST_NOT degenerates to the exclusion serve") {
    val root = freshIndex()
    assert(rows(TextAnalysis.queryStringTopK(spark, root, "alpha -gamma", 10))
      == rows(TextAnalysis.bm25ServeTopKNot(spark, root, "alpha", "gamma", 10)))
  }

  test("a lone SHOULD prefix degenerates to the wildcard scoring serve") {
    val root = freshIndex()
    assert(rows(TextAnalysis.queryStringTopK(spark, root, "alpha*", 10))
      == rows(TextAnalysis.bm25ServePrefixTopK(spark, root, "alpha", 10)))
  }

  test("a MUST group requires >= 1 expansion; docs outside it drop") {
    val root = freshIndex()
    // gam* expands to {gamma}; doc 1/6 match beta but carry no gamma
    val got = rows(TextAnalysis.queryStringTopK(spark, root,
      "+gam* beta", 10)).map(_._1).toSet
    assert(got == Set(2L, 3L, 4L))
    // and the group's own terms score: doc 2 has no beta yet qualifies
  }

  test("a MUST wildcard with an empty expansion matches nothing") {
    val root = freshIndex()
    assert(TextAnalysis.queryStringTopK(spark, root, "+zz* alpha", 10)
      .count() == 0L)
  }

  test("a MUST term absent from the dictionary matches nothing") {
    val root = freshIndex()
    assert(TextAnalysis.queryStringTopK(spark, root, "+zzz alpha", 10)
      .count() == 0L)
  }

  test("MUST_NOT wildcard excludes every expansion's docs") {
    val root = freshIndex()
    // -alph* excludes docs carrying alpha OR alphabet (1,2,4,6)
    val got = rows(TextAnalysis.queryStringTopK(spark, root,
      "beta -alph*", 10)).map(_._1).toSet
    assert(got == Set(3L))
  }

  test("escape flags survive length-changing lowercase chars (ADVICE r17)") {
    // "İ".toLowerCase is the TWO-char "i̇" — a whole-string lowercase
    // desyncs the per-char escape flags (IndexOutOfBounds, or a '*'
    // misread as escaped); per-char lowering keeps them aligned
    assert(p("İx*") == Seq(QsClause('s', "prefix", "ix")))
    assert(p("İ\\*x") == Seq(QsClause('s', "term", "i*x")))
  }

  test("a prohibited term inside an expansion drops out, not errors (ADVICE r17)") {
    val root = freshIndex()
    // +alph* expands to {alpha, alphabet}; -alpha excludes docs 1/2/4
    // and drops 'alpha' from the group — doc 6 (alphabet) satisfies the
    // MUST group and survives, the Lucene effective semantics
    val got = rows(TextAnalysis.queryStringTopK(spark, root,
      "+alph* -alpha", 10))
    assert(got.map(_._1) == Seq(6L))
    // the SHOULD twin scores exactly like NOT(alphabet, -alpha)
    assert(rows(TextAnalysis.queryStringTopK(spark, root,
      "alph* -alpha", 10))
      == rows(TextAnalysis.bm25ServeTopKNot(spark, root,
        "alphabet", "alpha", 10)))
    // a MUST group whose expansion empties after the drop matches
    // nothing — every candidate would carry the excluded term
    assert(TextAnalysis.queryStringTopK(spark, root,
      "+gam* -gamma", 10).count() == 0L)
  }

  test("scored-and-prohibited, and phrase-on-plain-index, fail loudly") {
    val root = freshIndex()
    assertThrows[IllegalArgumentException](
      TextAnalysis.queryStringTopK(spark, root, "alpha -alpha", 10))
    assertThrows[IllegalArgumentException](
      TextAnalysis.queryStringTopK(spark, root, "\"alpha beta\"", 10))
    assertThrows[IllegalArgumentException](
      TextAnalysis.queryStringTopK(spark, root, "-alpha", 10))
  }

  // ——— phrase composition over the positional index ———

  private def freshPosIndex(): String = {
    val root = Files.createTempDirectory("qsp_idx").toString
    TextAnalysis.writeBm25Index(corpus(), "doc_id", "text", root,
      nBuckets = 4, positions = true)
    root
  }

  test("a lone SHOULD phrase degenerates to the scored phrase serve") {
    val root = freshPosIndex()
    assert(rows(TextAnalysis.queryStringPhraseTopK(spark, root,
      "\"alpha beta\"", 10))
      == rows(TextAnalysis.bm25ServePhraseTopK(spark, root, "alpha beta", 10)))
  }

  test("MUST phrase anchors the result set; clause scores sum") {
    val root = freshPosIndex()
    // "alpha beta" adjacent in docs 1 and 4 only
    val phr = rows(TextAnalysis.bm25ServePhraseTopK(spark, root,
      "alpha beta", 10)).toMap
    val term = rows(TextAnalysis.queryStringTopK(spark, root, "gamma", 10))
      .toMap
    val got = rows(TextAnalysis.queryStringPhraseTopK(spark, root,
      "+\"alpha beta\" gamma", 10)).toMap
    assert(got.keySet == phr.keySet)
    got.foreach { case (id, s) =>
      assert(s == phr(id) + term.getOrElse(id, 0L), s"doc $id")
    }
  }

  test("SHOULD phrase widens; MUST_NOT phrase excludes the exact phrase only") {
    val root = freshPosIndex()
    // should-phrase ∪ should-term: docs matching either qualify
    val got = rows(TextAnalysis.queryStringPhraseTopK(spark, root,
      "\"alpha beta\" delta", 10)).map(_._1).toSet
    assert(got == Set(1L, 4L, 5L))
    // -"alpha beta" kills 1 and 4 but keeps doc 2 (has alpha, no
    // adjacent beta) — the PHRASE excludes, not its terms (doc 6's
    // 'alphabet' is not the term 'alpha'; exact-term matching)
    val not = rows(TextAnalysis.queryStringPhraseTopK(spark, root,
      "alpha -\"alpha beta\"", 10)).map(_._1).toSet
    assert(not == Set(2L))
  }

  test("prohibited terms mask the phrase frame too") {
    val root = freshPosIndex()
    // doc 1 and 4 carry the phrase; doc 4 carries delta → excluded
    val got = rows(TextAnalysis.queryStringPhraseTopK(spark, root,
      "\"alpha beta\" -delta", 10)).map(_._1).toSet
    assert(got == Set(1L))
  }

  // ——— field scoping ———

  test("field scopes parse; escaped colons stay literal") {
    assert(p("+title:dup body:sc* -title:big") == Seq(
      QsClause('+', "term", "dup", "title"),
      QsClause('s', "prefix", "sc", "body"),
      QsClause('-', "term", "big", "title")))
    assert(p("Title:\"Big Table\"") == Seq(
      QsClause('s', "phrase", "big table", "title")))
    assert(p("foo\\:bar") == Seq(QsClause('s', "term", "foo:bar")))
    assertThrows[IllegalArgumentException](p("title: dup"))
    // single-field serves reject scoped clauses loudly
    val root = freshIndex()
    assertThrows[IllegalArgumentException](
      TextAnalysis.queryStringTopK(spark, root, "title:alpha", 10))
  }

  test("fields serve: per-field statistics, boosts, cross-field must/not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta", "alpha alpha common words here"),
      (2L, "beta gamma", "common words alpha and padding"),
      (3L, "alpha alpha", "gamma common beta beta long body"),
      (4L, "delta", "alpha beta common something else")
    ).toDF("doc_id", "title", "body")
    val tRoot = Files.createTempDirectory("qsf_t").toString
    val bRoot = Files.createTempDirectory("qsf_b").toString
    TextAnalysis.writeBm25Index(docs, "doc_id", "title", tRoot, nBuckets = 4)
    TextAnalysis.writeBm25Index(docs, "doc_id", "body", bRoot, nBuckets = 4)
    val reg = Map("title" -> (tRoot, 2000L), "body" -> (bRoot, 1000L))
    // +title:alpha anchors to docs 1,3; body:gamma adds body score
    val got = rows(TextAnalysis.queryStringFieldsTopK(spark, reg, "body",
      "+title:alpha body:gamma", 10)).toMap
    assert(got.keySet == Set(1L, 3L))
    // scores = boosted per-field single-clause serves summed
    val ts = rows(TextAnalysis.queryStringTopK(spark, tRoot, "alpha", 10)).toMap
    val bs = rows(TextAnalysis.queryStringTopK(spark, bRoot, "gamma", 10)).toMap
    got.foreach { case (id, s) =>
      val want = ts(id) * 2000L / 1000L + bs.getOrElse(id, 0L) * 1000L / 1000L
      assert(s == want, s"doc $id")
    }
    // -title:beta kills a doc even when only its body scored: body
    // 'alpha' docs are {1,2,4}; titles of 1 and 2 carry beta → only 4
    val not = rows(TextAnalysis.queryStringFieldsTopK(spark, reg, "body",
      "alpha -title:beta", 10)).map(_._1).toSet
    assert(not == Set(4L))
    // an unknown field fails loudly; unscoped clauses hit the default
    assertThrows[IllegalArgumentException](
      TextAnalysis.queryStringFieldsTopK(spark, reg, "body",
        "nosuch:alpha", 10))
    assert(rows(TextAnalysis.queryStringFieldsTopK(spark, reg, "body",
      "gamma", 10))
      == rows(TextAnalysis.queryStringTopK(spark, bRoot, "gamma", 10)))
  }

  test("a MUST phrase with an absent term matches nothing") {
    val root = freshPosIndex()
    assert(TextAnalysis.queryStringPhraseTopK(spark, root,
      "+\"alpha zz\" beta", 10).count() == 0L)
    // …but a SHOULD phrase with an absent term just contributes nothing
    assert(rows(TextAnalysis.queryStringPhraseTopK(spark, root,
      "\"alpha zz\" beta", 10))
      == rows(TextAnalysis.bm25ServeTopK(spark, root, "beta", 10)))
  }
}
