package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Row-level deletes on the materialized ANN index: the `_tombstones`
 * object masks ids at serve time (broadcast anti-join, no data rewrite)
 * and `purgeTombstones` removes them physically under the manifest's
 * commit discipline. Pinned properties:
 *
 *   1. tombstone-filtered serve == serve of an index REBUILT without the
 *      deleted rows under the same trained centroids (the semantic truth)
 *   2. delete is idempotent and merges (two deletes == one union delete)
 *   3. purge: identical serve results, tombstone object gone, dead rows
 *      physically absent, old files GC'd (vacuum finds nothing)
 *   4. purge killed before its manifest swap leaves the tombstone-masked
 *      view served bit-for-bit; vacuum + retry completes it cleanly
 *   5. PQ/ADC serves subtract tombstones too
 *   6. the between-purge cap fails loudly instead of unbounding serves
 */
class IvfDeleteSpec extends AnyFunSuite with SparkTestBase {

  private lazy val emb = spark.read.parquet(sf("embeddings"))

  private def deadIds(): Seq[Long] =
    emb.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toIndexedSeq

  // sameElements comparisons need a total row order: the serve plan's
  // row_number window is per-query, so cross-partition output order is
  // incidental — pin it (ADVICE r12)
  private def serve(idx: String, key: String) =
    Similarity.ivfTopKServed(spark, idx,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3,
      indexKey = key).orderBy(col("query_id"), col("rank")).collect()

  test("tombstone serve == rebuild without the deleted rows (same centroids)") {
    import Similarity.TrainedIndex
    TrainedIndex.invalidate()
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfdel_").toString
    val idx = s"$tmp/idx"
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", idx, indexKey = "del-eq")
    val dead = deadIds()
    assert(dead.nonEmpty)
    Similarity.deleteFromIvfIndex(spark, idx, "vec_id", dead)
    val masked = serve(idx, "del-eq")
    assert(!masked.exists(r => dead.contains(r.getLong(2))),
      "a deleted id surfaced as a neighbor")
    // rebuild on the filtered corpus under the SAME registry key: the
    // cached full-corpus centroids are reused, so any difference could
    // only come from the tombstone mask itself
    val idx2 = s"$tmp/idx2"
    Similarity.writeIvfIndex(emb.filter(!(col("vec_id") % 10 === 7)),
      "vec_id", "embedding", idx2, indexKey = "del-eq")
    assert(masked.sameElements(serve(idx2, "del-eq")))
    TrainedIndex.invalidate()
  }

  test("delete merges and is idempotent; purge serves identically and cleans up") {
    import Similarity.TrainedIndex
    TrainedIndex.invalidate()
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpurge_").toString
    val idx = s"$tmp/idx"
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", idx, indexKey = "del-purge")
    val dead = deadIds()
    val (a, b) = dead.splitAt(dead.length / 2)
    assert(Similarity.deleteFromIvfIndex(spark, idx, "vec_id", a) == a.length)
    // second delete merges; re-deleting `a` too proves idempotence
    assert(Similarity.deleteFromIvfIndex(spark, idx, "vec_id", a ++ b) == dead.length)
    val masked = serve(idx, "del-purge")

    val purged = Similarity.purgeTombstones(spark, idx)
    assert(purged == dead.length)
    // served view unchanged by the physical rewrite
    assert(serve(idx, "del-purge").sameElements(masked))
    // tombstone object gone; a second purge is a no-op
    assert(Similarity.readTombstones(spark, idx).isEmpty)
    assert(Similarity.purgeTombstones(spark, idx) == 0)
    // dead rows physically absent from the committed layout
    val left = spark.read.parquet(idx)
      .filter(col("vec_id").isin(dead.map(Long.box): _*)).count()
    assert(left == 0, s"$left tombstoned rows survived the purge on disk")
    // the old files were GC'd: nothing uncommitted remains
    assert(Similarity.vacuumUncommitted(spark, idx).isEmpty)
    // row conservation: everything not deleted is still there
    assert(spark.read.parquet(idx).count() == emb.count() - dead.length)
    TrainedIndex.invalidate()
  }

  test("purge killed before manifest swap: masked view serves; vacuum + retry completes") {
    import Similarity.TrainedIndex
    TrainedIndex.invalidate()
    val tmp = java.nio.file.Files.createTempDirectory("graft_purgecrash_").toString
    val idx = s"$tmp/idx"
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", idx, indexKey = "purge-crash")
    val dead = deadIds()
    Similarity.deleteFromIvfIndex(spark, idx, "vec_id", dead)
    val masked = serve(idx, "purge-crash")

    val boom = intercept[RuntimeException] {
      Similarity.purgeTombstonesHooked(spark, idx,
        beforeCommit = () => throw new RuntimeException("killed before swap"))
    }
    assert(boom.getMessage.contains("killed before swap"))
    // stranded rewrite files exist but are uncommitted: served view intact
    assert(serve(idx, "purge-crash").sameElements(masked),
      "a crashed purge changed the served view before its commit point")
    val swept = Similarity.vacuumUncommitted(spark, idx)
    assert(swept.nonEmpty, "injection fired before the rewrite job committed")
    // retry completes; the index is clean and serves the same results
    assert(Similarity.purgeTombstones(spark, idx) == dead.length)
    assert(serve(idx, "purge-crash").sameElements(masked))
    assert(Similarity.vacuumUncommitted(spark, idx).isEmpty)
    assert(spark.read.parquet(idx).count() == emb.count() - dead.length)
    TrainedIndex.invalidate()
  }

  test("PQ/ADC serve subtracts tombstones") {
    import Similarity.TrainedIndex
    TrainedIndex.invalidate()
    val tmp = java.nio.file.Files.createTempDirectory("graft_pqdel_").toString
    val idx = s"$tmp/idx"
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", idx,
      indexKey = "del-pq", pqM = Some(8))
    val dead = deadIds()
    Similarity.deleteFromIvfIndex(spark, idx, "vec_id", dead)
    val res = Similarity.pqTopKServed(spark, idx,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3,
      indexKey = "del-pq").orderBy(col("query_id"), col("rank")).collect()
    assert(res.nonEmpty)
    assert(!res.exists(r => dead.contains(r.getLong(2))),
      "a deleted id surfaced through the ADC serve path")
    // purge parity on the PQ layout: codes ride the rewrite untouched,
    // so the post-purge ADC serve is bit-identical to the masked one
    assert(Similarity.purgeTombstones(spark, idx) == dead.length)
    val purged = Similarity.pqTopKServed(spark, idx,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3,
      indexKey = "del-pq").orderBy(col("query_id"), col("rank")).collect()
    assert(purged.sameElements(res),
      "purging a PQ index changed its ADC serve results")
    assert(spark.read.parquet(idx).count() == emb.count() - dead.length)
    TrainedIndex.invalidate()
  }

  test("delete then append: new rows serve, dead rows stay masked — including re-appended ids (documented)") {
    import Similarity.TrainedIndex
    TrainedIndex.invalidate()
    val tmp = java.nio.file.Files.createTempDirectory("graft_delapp_").toString
    val idx = s"$tmp/idx"
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < 300), "vec_id",
      "embedding", idx, indexKey = "del-app")
    val dead = Seq(107L, 207L)
    Similarity.deleteFromIvfIndex(spark, idx, "vec_id", dead)
    // append a batch that RE-INGESTS one dead id plus fresh rows
    Similarity.appendToIvfIndex(
      emb.filter(col("vec_id") >= 300 || col("vec_id") === 107), "vec_id",
      "embedding", idx, indexKey = "del-app")
    val res = Similarity.ivfTopKServed(spark, idx,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3,
      indexKey = "del-app").collect()
    // appended fresh rows are servable candidates (the index grew)...
    assert(spark.read.parquet(idx).filter(col("vec_id") >= 300).count() > 0)
    // ...but every tombstoned id stays masked, INCLUDING the re-appended
    // one — the documented id-level caveat: purge before re-ingesting
    assert(!res.exists(r => dead.contains(r.getLong(2))))
    // the purge removes EVERY row of a tombstoned id — the re-appended
    // copy included (tombstones are id-level, the caveat's full
    // consequence: purge FIRST, then re-ingest)
    Similarity.purgeTombstones(spark, idx)
    assert(spark.read.parquet(idx)
      .filter(col("vec_id").isin(107L, 207L)).count() == 0)
    // with the set cleared, re-ingesting the id works normally
    Similarity.appendToIvfIndex(emb.filter(col("vec_id") === 107), "vec_id",
      "embedding", idx, indexKey = "del-app")
    assert(spark.read.parquet(idx).filter(col("vec_id") === 107).count() == 1)
    TrainedIndex.invalidate()
  }

  test("tombstone cap fails loudly; mixed id columns refused") {
    import Similarity.TrainedIndex
    TrainedIndex.invalidate()
    val tmp = java.nio.file.Files.createTempDirectory("graft_delcap_").toString
    val idx = s"$tmp/idx"
    Similarity.writeIvfIndex(emb.limit(50), "vec_id", "embedding", idx,
      indexKey = "del-cap")
    Similarity.deleteFromIvfIndex(spark, idx, "vec_id", Seq(1L, 2L))
    val mixed = intercept[IllegalArgumentException] {
      Similarity.deleteFromIvfIndex(spark, idx, "other_id", Seq(3L))
    }
    assert(mixed.getMessage.contains("refusing to mix"))
    val over = intercept[IllegalArgumentException] {
      Similarity.deleteFromIvfIndex(spark, idx, "vec_id",
        0L until (Similarity.MaxTombstones.toLong + 1))
    }
    assert(over.getMessage.contains("purgeTombstones"))
    TrainedIndex.invalidate()
  }
}
