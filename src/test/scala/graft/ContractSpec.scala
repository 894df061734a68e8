package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself, pinned: every query has an oracle and
  * vice versa (a missing oracle silently downgrades the correctness gate
  * to rows-only), and the flagship entry returns rows. */
class ContractSpec extends AnyFunSuite with SparkTestBase {

  test("every query has a DuckDB oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    // the exempt set is EXPLICIT and must stay tiny: each member is a
    // non-SQL-replayable algorithm whose correctness is spec-pinned
    // instead (ann_hnsw_served: deterministic construction + recall
    // bounds in HnswSpec — the greedy graph walk has no SQL replay)
    assert((q diff o) == SparkEntry.OracleExempt,
      s"queries missing oracles beyond the exempt set: " +
        s"${(q diff o diff SparkEntry.OracleExempt).toSeq.sorted}")
    assert((o diff q).isEmpty, s"oracles without queries: ${(o diff q).toSeq.sorted}")
  }

  test("oracle SQL never references tables outside the testdata set") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // crude but effective: every FROM/JOIN target is a known table or a
    // CTE defined inside the same statement
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // CTE forms: `name AS (`, `name AS MATERIALIZED (`, `name(cols) AS (`
      val ctes = "(?i)(?:WITH(?:\\s+RECURSIVE)?|,)\\s*([a-z_0-9]+)\\s*(?:\\([^)]*\\))?\\s+AS\\s*(?:MATERIALIZED\\s*)?\\(".r
        .findAllMatchIn(sql).map(_.group(1)).toSet
      // (?<!distinct\s): `x IS NOT DISTINCT FROM y` is a predicate, not a
      // table reference; (?<![a-z_0-9]): a column named `ring_from`
      // must not read as a FROM keyword (found r20)
      val refs = "(?i)(?<!distinct\\s)(?<![a-z_0-9])(?:FROM|JOIN)\\s+([a-z_0-9]+)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = refs -- tables -- ctes.map(_.toLowerCase)
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }

  test("flagship entry returns georeferenced rows (driver smoke shape)") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.contains("wkt"))
    assert(df.limit(5).count() > 0)
  }
}
