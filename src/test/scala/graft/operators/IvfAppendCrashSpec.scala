package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Crash injection for the ANN index append (VERDICT r10 task 4): the
 * `_cellmap` manifest is the append's commit point, and this spec turns
 * the reasoning comments in Similarity.appendToIvfIndex into a proven
 * property, the way VersionedSpec does for the version-pointer commit.
 *
 * Injected kill window: AFTER the appended cell files' Spark job commits,
 * BEFORE the single-object manifest write — the only window where data is
 * on disk but uncommitted (an earlier kill leaves only `_temporary`
 * debris the committer never published).
 */
class IvfAppendCrashSpec extends AnyFunSuite with SparkTestBase {

  /** Order-insensitive serve equality (see SimilaritySpec.CanonOps). */
  private implicit class CanonOps[T](rows: Array[T]) {
    def sameRows(other: Array[T]): Boolean =
      rows.map(String.valueOf(_: Any)).sorted
        .sameElements(other.map(String.valueOf(_: Any)).sorted)
  }

  private lazy val emb = spark.read.parquet(sf("embeddings"))

  test("append killed before manifest commit: previous index serves; re-commit publishes exactly the batch") {
    import Similarity.TrainedIndex
    TrainedIndex.invalidate()
    val tmp = java.nio.file.Files.createTempDirectory("graft_appcrash_").toString
    val idx = s"$tmp/idx"
    val base = emb.filter(col("vec_id") < 300)
    val batch = emb.filter(col("vec_id") >= 300)
    val queries = emb.filter(col("vec_id") < 5)
    Similarity.writeIvfIndex(base, "vec_id", "embedding", idx,
      indexKey = "crash-app")
    val before = Similarity.ivfTopKServed(spark, idx, queries,
      "vec_id", "embedding", k = 3, indexKey = "crash-app").collect()
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def manifestBytes(): String = {
      val p = new org.apache.hadoop.fs.Path(s"$idx/${Similarity.CellMapFile}")
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in).mkString finally in.close()
    }
    def dataFileCount(): Int = new java.io.File(idx).listFiles
      .filter(_.getName.startsWith("cell="))
      .map(_.listFiles.count(f => f.getName.endsWith(".parquet"))).sum
    val manifestBefore = manifestBytes()
    val filesBefore = dataFileCount()

    // the injected kill
    val boom = intercept[RuntimeException] {
      Similarity.appendToIvfIndexHooked(batch, "vec_id", "embedding", idx,
        "crash-app", stride = 20, iters = 3, pqM = None,
        beforeCommit = () => throw new RuntimeException("killed before manifest commit"))
    }
    assert(boom.getMessage.contains("killed before manifest"))

    // non-vacuity: the batch's files DID land (the job committed) …
    assert(dataFileCount() > filesBefore,
      "injection fired before the data job committed — window not reached")
    // … but the manifest is byte-identical: nothing was committed
    assert(manifestBytes() == manifestBefore)

    // the torn index serves the PRE-append view, bit-for-bit
    val during = Similarity.ivfTopKServed(spark, idx, queries,
      "vec_id", "embedding", k = 3, indexKey = "crash-app").collect()
    assert(during.sameRows(before),
      "a crashed append leaked uncommitted rows into the served view")
    assert(!during.exists(_.getLong(2) >= 300),
      "served results contain batch-only neighbors before any commit")

    // recovery route A: committing the manifest publishes the stranded
    // files — the index now serves exactly what a crash-free append would
    Similarity.writeCellMap(spark, idx)
    val after = Similarity.ivfTopKServed(spark, idx, queries,
      "vec_id", "embedding", k = 3, indexKey = "crash-app").collect()
    val idx2 = s"$tmp/idx2"
    Similarity.writeIvfIndex(base, "vec_id", "embedding", idx2,
      indexKey = "crash-app")
    Similarity.appendToIvfIndex(batch, "vec_id", "embedding", idx2,
      indexKey = "crash-app")
    val clean = Similarity.ivfTopKServed(spark, idx2, queries,
      "vec_id", "embedding", k = 3, indexKey = "crash-app").collect()
    assert(after.sameRows(clean))
    TrainedIndex.invalidate()
  }

  test("crash -> vacuumUncommitted -> retried append lands the batch exactly once") {
    import Similarity.TrainedIndex
    TrainedIndex.invalidate()
    val tmp = java.nio.file.Files.createTempDirectory("graft_appretry_").toString
    val idx = s"$tmp/idx"
    val base = emb.filter(col("vec_id") < 300)
    val batch = emb.filter(col("vec_id") >= 300)
    val queries = emb.filter(col("vec_id") < 5)
    Similarity.writeIvfIndex(base, "vec_id", "embedding", idx,
      indexKey = "retry-app")
    // crash the first attempt after its data-job commit
    intercept[RuntimeException] {
      Similarity.appendToIvfIndexHooked(batch, "vec_id", "embedding", idx,
        "retry-app", stride = 20, iters = 3, pqM = None,
        beforeCommit = () => throw new RuntimeException("boom"))
    }
    // the NAIVE retry (no vacuum) would publish the stranded files PLUS
    // the retried batch — double ingest. The recovery contract: sweep
    // uncommitted debris first, then retry.
    val swept = Similarity.vacuumUncommitted(spark, idx)
    assert(swept.nonEmpty, "vacuum found no stranded files — crash window not reached")
    Similarity.appendToIvfIndex(batch, "vec_id", "embedding", idx,
      indexKey = "retry-app")
    // row-level truth: every batch id appears exactly once in the layout
    val counts = spark.read.parquet(idx).groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(counts == 0, s"$counts ids appear more than once after vacuum+retry")
    // and the served view equals a clean build+append
    val served = Similarity.ivfTopKServed(spark, idx, queries,
      "vec_id", "embedding", k = 3, indexKey = "retry-app").collect()
    val idx2 = s"$tmp/idx2"
    Similarity.writeIvfIndex(base, "vec_id", "embedding", idx2,
      indexKey = "retry-app")
    Similarity.appendToIvfIndex(batch, "vec_id", "embedding", idx2,
      indexKey = "retry-app")
    val clean = Similarity.ivfTopKServed(spark, idx2, queries,
      "vec_id", "embedding", k = 3, indexKey = "retry-app").collect()
    assert(served.sameRows(clean))
    // vacuum on an untouched pre-manifest index is a no-op (nothing is
    // "uncommitted" when no manifest exists)
    val fs = new org.apache.hadoop.fs.Path(idx2)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx2/${Similarity.CellMapFile}"), false)
    assert(Similarity.vacuumUncommitted(spark, idx2).isEmpty)
    TrainedIndex.invalidate()
  }

  test("concurrent serves on one session return identical results (monotonic threshold raise)") {
    import Similarity.TrainedIndex
    TrainedIndex.invalidate()
    val tmp = java.nio.file.Files.createTempDirectory("graft_concserve_").toString
    val idx = s"$tmp/idx"
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", idx,
      indexKey = "conc-serve")
    val queries = emb.filter(col("vec_id") < 5)
    val serial = Similarity.ivfTopKServed(spark, idx, queries,
      "vec_id", "embedding", k = 3, indexKey = "conc-serve").collect()
    // force every serve through the lock-guarded bump path: with the
    // threshold at 1, any multi-file list exceeds it
    val tKey = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    val prev = spark.conf.get(tKey)
    spark.conf.set(tKey, "1")
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val runs = Future.sequence((1 to 4).map(_ => Future {
        Similarity.ivfTopKServed(spark, idx, queries,
          "vec_id", "embedding", k = 3, indexKey = "conc-serve").collect()
      }))
      Await.result(runs, 120.seconds).foreach(r => assert(r.sameRows(serial)))
      // the raise is MONOTONIC and never restored (VERDICT r14 #7: the
      // old set/restore pair held a lock across the whole listing,
      // serializing concurrent serves — the throughput series measured
      // the dense serve collapsing under it). The session-wide elevated
      // threshold is the documented contract: ≥ the probed file-list
      // size, never lowered by a serve.
      assert(spark.conf.get(tKey).toInt > 1,
        "the bump path must have raised the threshold monotonically")
    } finally spark.conf.set(tKey, prev)
    TrainedIndex.invalidate()
  }

  test("compact's manifest re-commit rides the same atomic primitive (no torn window)") {
    // writeCellMap routes through Versioned.atomicOverwrite — one shared
    // commit primitive for pointer swaps and manifest rewrites. Pin the
    // rename leaves no temp debris and the manifest stays parseable.
    import Similarity.TrainedIndex
    TrainedIndex.invalidate()
    val tmp = java.nio.file.Files.createTempDirectory("graft_appcrash2_").toString
    val idx = s"$tmp/idx"
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < 200), "vec_id",
      "embedding", idx, indexKey = "crash-comp")
    Similarity.appendToIvfIndex(emb.filter(col("vec_id") >= 200), "vec_id",
      "embedding", idx, indexKey = "crash-comp")
    Similarity.compactIvfIndex(spark, idx)
    val leftovers = new java.io.File(idx).listFiles
      .filter(_.getName.startsWith(s".${Similarity.CellMapFile}.tmp-"))
    assert(leftovers.isEmpty,
      s"atomic overwrite left temp debris: ${leftovers.map(_.getName).toSeq}")
    val q = emb.filter(col("vec_id") < 5)
    val served = Similarity.ivfTopKServed(spark, idx, q,
      "vec_id", "embedding", k = 3, indexKey = "crash-comp").collect()
    assert(served.length == 5 * 3)
    TrainedIndex.invalidate()
  }
}
