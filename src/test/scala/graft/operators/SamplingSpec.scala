package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SamplingSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = spark.read.parquet(sf("documents"))

  test("hash split: deterministic, exhaustive, ~0.8/0.1/0.1") {
    val once = Sampling.hashSplit(docs, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val again = Sampling.hashSplit(docs, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(once == again) // pure function of id
    val total = once.values.sum
    assert(total == docs.count())
    assert(once("train").toDouble / total > 0.7 && once("train").toDouble / total < 0.9)
  }

  test("hash sample: fraction roughly honored, subset stable under salt") {
    val n = docs.count()
    val s = Sampling.hashSample(docs, "doc_id", 0.2).count()
    assert(s.toDouble / n > 0.1 && s.toDouble / n < 0.3, s"got $s of $n")
    // different salt → different subset (overwhelmingly)
    val a = Sampling.hashSample(docs, "doc_id", 0.2, salt = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs, "doc_id", 0.2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a != b)
  }
}
