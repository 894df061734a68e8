package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Exactly-once streaming index ingest (appendToIvfIndexExactlyOnce):
 * the MergeTable batch-id fence applied to the ANN index's `_cellmap`
 * commit. Proven here, the way MergeTableSpec proves the merge fence:
 *
 *  1. redelivery of an APPLIED batch id is a no-op (fence in manifest);
 *  2. crash before the manifest commit leaves the fence un-advanced, so
 *     the SAME batch id retries cleanly — and lands exactly once
 *     (stranded pre-crash files swept, not double-published);
 *  3. the fenced path's final serve equals the plain batch append's.
 */
class IvfStreamIngestSpec extends AnyFunSuite with SparkTestBase {

  private implicit class CanonOps[T](rows: Array[T]) {
    def sameRows(other: Array[T]): Boolean =
      rows.map(String.valueOf(_: Any)).sorted
        .sameElements(other.map(String.valueOf(_: Any)).sorted)
  }

  private lazy val emb = spark.read.parquet(sf("embeddings"))

  private def dataFileCount(idx: String): Int = new java.io.File(idx).listFiles
    .filter(_.getName.startsWith("cell="))
    .map(_.listFiles.count(f => f.getName.endsWith(".parquet"))).sum

  test("redelivered batch id skips; fresh id applies; serve == plain append") {
    import Similarity.TrainedIndex
    TrainedIndex.invalidate()
    val tmp = java.nio.file.Files.createTempDirectory("graft_ingest_").toString
    val idxA = s"$tmp/fenced"
    val idxB = s"$tmp/plain"
    val base = emb.filter(col("vec_id") < 300)
    val b1 = emb.filter(col("vec_id") >= 300 && col("vec_id") % 2 === 0)
    val b2 = emb.filter(col("vec_id") >= 300 && col("vec_id") % 2 === 1)
    val queries = emb.filter(col("vec_id") < 5)
    Similarity.writeIvfIndex(base, "vec_id", "embedding", idxA, indexKey = "ing-a")
    Similarity.writeIvfIndex(base, "vec_id", "embedding", idxB, indexKey = "ing-b")

    assert(Similarity.lastAppendBatchId(spark, idxA).isEmpty)
    assert(Similarity.appendToIvfIndexExactlyOnce(b1, "vec_id", "embedding",
      idxA, "ing-a", batchId = 0L))
    assert(Similarity.lastAppendBatchId(spark, idxA).contains(0L))
    val filesAfterB1 = dataFileCount(idxA)

    // redelivery of batch 0: no-op, no new files, fence unchanged
    assert(!Similarity.appendToIvfIndexExactlyOnce(b1, "vec_id", "embedding",
      idxA, "ing-a", batchId = 0L))
    assert(dataFileCount(idxA) == filesAfterB1, "redelivery must not touch disk")

    assert(Similarity.appendToIvfIndexExactlyOnce(b2, "vec_id", "embedding",
      idxA, "ing-a", batchId = 1L))
    assert(Similarity.lastAppendBatchId(spark, idxA).contains(1L))

    // the fenced two-batch ingest serves identically to one plain append
    Similarity.appendToIvfIndex(emb.filter(col("vec_id") >= 300),
      "vec_id", "embedding", idxB, "ing-b")
    val servedA = Similarity.ivfTopKServed(spark, idxA, queries,
      "vec_id", "embedding", k = 3, indexKey = "ing-a").collect()
    val servedB = Similarity.ivfTopKServed(spark, idxB, queries,
      "vec_id", "embedding", k = 3, indexKey = "ing-b").collect()
    assert(servedA.map(r => (r.getLong(0), r.getLong(2)))
      .sameRows(servedB.map(r => (r.getLong(0), r.getLong(2)))))
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(tmp))
  }

  test("crash before manifest: fence un-advanced, retry lands exactly once") {
    import Similarity.TrainedIndex
    TrainedIndex.invalidate()
    val tmp = java.nio.file.Files.createTempDirectory("graft_ingestcrash_").toString
    val idx = s"$tmp/idx"
    val base = emb.filter(col("vec_id") < 300)
    val batch = emb.filter(col("vec_id") >= 300 && col("vec_id") < 350)
    val queries = emb.filter(col("vec_id") < 5)
    Similarity.writeIvfIndex(base, "vec_id", "embedding", idx, indexKey = "ing-c")
    Similarity.appendToIvfIndexExactlyOnce(
      emb.filter(col("vec_id") >= 350), "vec_id", "embedding", idx, "ing-c",
      batchId = 0L)

    // batch 1 dies in the only crash window: data-job committed, manifest not
    intercept[RuntimeException] {
      Similarity.appendToIvfIndexHooked(batch, "vec_id", "embedding", idx,
        "ing-c", stride = 20, iters = 3, pqM = None,
        beforeCommit = () => throw new RuntimeException("killed"),
        batchId = Some(1L))
    }
    // fence still at 0 → the redelivered batch 1 is NOT skipped
    assert(Similarity.lastAppendBatchId(spark, idx).contains(0L))

    assert(Similarity.appendToIvfIndexExactlyOnce(batch, "vec_id", "embedding",
      idx, "ing-c", batchId = 1L), "retry after crash must apply")
    assert(Similarity.lastAppendBatchId(spark, idx).contains(1L))

    // exactly once: manifest-served row count == base + both batches,
    // no double-landed stranded files (vacuum swept the crash debris)
    val manifest = graft.sinks.Versioned.readSmallText(spark,
      new org.apache.hadoop.fs.Path(s"$idx/${Similarity.CellMapFile}")).get
    val committed = manifest.split('\n').count(_.contains('\t'))
    val allFiles = dataFileCount(idx)
    assert(committed == allFiles,
      s"manifest lists $committed files but $allFiles on disk — stranded debris")
    val served = Similarity.ivfTopKServed(spark, idx, queries,
      "vec_id", "embedding", k = 3, indexKey = "ing-c").collect()
    // a double-landed batch would surface duplicate neighbor ids
    assert(served.map(r => (r.getLong(0), r.getLong(2))).distinct.length
      == served.length, "served top-k contains duplicates — batch landed twice")
    assert(spark.read.parquet(idx).select(col("vec_id")).distinct().count()
      == spark.read.parquet(idx).count(),
      "index holds duplicate vec_ids — batch landed twice")
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(tmp))
  }
}
