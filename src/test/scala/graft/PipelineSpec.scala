package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Sampling, TextAnalysis}

/** Capstone: the curation operators COMPOSE — one DataFrame flows through
  * dedup → PII redaction → quality gate → sequence packing → split
  * assignment, with exact row accounting at every stage. */
class PipelineSpec extends AnyFunSuite with SparkTestBase {

  test("full curation pipeline composes with exact row accounting") {
    val base = spark.read.parquet(sf("documents"))
    val nBase = base.count()
    // inject exact duplicates of the first 10 docs
    val corpus = base.unionAll(
      base.filter(col("doc_id") < 10).withColumn("doc_id", col("doc_id") + 10000))
    assert(corpus.count() == nBase + 10)

    // 1. exact dedup keeps the min-id survivor per digest
    val deduped = Dedup.dropExactDuplicates(corpus, "doc_id", "text")
    assert(deduped.count() == nBase)
    assert(deduped.filter(col("doc_id") >= 10000).count() == 0)

    // 2. PII redaction is row-preserving
    val redacted = TextAnalysis.redactPii(deduped, "text")
      .drop("text").withColumnRenamed("redacted", "text")
    assert(redacted.count() == nBase)

    // 3. quality gate only removes rows (and keeps its stat columns)
    val kept = TextAnalysis.qualityFilter(redacted, "text")
    val nKept = kept.count()
    assert(nKept <= nBase && nKept > 0)

    // 4. sequence packing assigns every kept row to exactly one bin
    val packed = TextAnalysis.packSequences(kept, "source", "doc_id", "text", budget = 300)
    assert(packed.count() == nKept)
    assert(packed.select("source", "doc_id").distinct().count() == nKept)

    // 5. split assignment is exhaustive and disjoint
    val split = Sampling.hashSplit(kept, "doc_id")
    val bySplit = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == nKept)
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
  }
}
