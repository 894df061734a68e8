package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * HNSW delete + compaction (VERDICT r17 #3) — the IVF lifecycle matrix
 * applied to the graph index: tombstones mask immediately through the
 * walk's acceptance filter (dead nodes still traversed for
 * connectivity), compaction rebuilds survivor graphs bit-identically
 * to a fresh build, and the manifest swap is the crash fence.
 */
class HnswDeleteSpec extends AnyFunSuite with SparkTestBase {

  private def emb: DataFrame =
    spark.read.parquet(sf("embeddings"))

  private def queries: DataFrame =
    emb.filter(col("vec_id") < 20)

  private def freshIndex(nSegments: Int = 4): String = {
    val idx = Files.createTempDirectory("hnsw_del").toString + "/idx"
    Hnsw.buildHnswIndex(emb, "vec_id", "embedding", idx,
      m = 8, efConstruction = 64, nSegments = nSegments)
    idx
  }

  private def serve(idx: String): Seq[(Long, Int, Long, Long)] =
    Hnsw.hnswTopK(spark, idx, queries, "vec_id", "embedding",
      k = 3, efSearch = 64)
      .orderBy(col("query_id"), col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("tombstones mask immediately; every query still fills its top-k") {
    val idx = freshIndex()
    val before = serve(idx)
    // kill ids that actually appear in results (the hardest case) plus
    // one absent id (idempotence against never-present ids)
    val dead = before.map(_._3).distinct.take(5) :+ 999999999L
    assert(Hnsw.deleteHnswVectors(spark, idx, dead) == dead.length)
    val after = serve(idx)
    assert(after.forall(r => !dead.contains(r._3)),
      "a tombstoned id surfaced in a serve")
    // the walk routes THROUGH dead nodes: ranks close up and every
    // query still returns k survivors
    assert(after.groupBy(_._1).forall(_._2.map(_._2).sorted == Seq(1, 2, 3)))
    // deleting the same ids again is a no-op on the merged set
    assert(Hnsw.deleteHnswVectors(spark, idx, dead.take(2)) == dead.length)
    assert(serve(idx) == after)
  }

  test("a deleted vector no longer self-retrieves; recall holds vs survivor brute force") {
    import spark.implicits._
    val idx = freshIndex()
    val dead = (0L until 10L).toSet
    Hnsw.deleteHnswVectors(spark, idx, dead)
    val got = serve(idx)
    // self-retrieval: a LIVE query vector still finds itself first;
    // dead ids never appear even for their own identical query vector
    got.groupBy(_._1).foreach { case (qid, rows) =>
      if (!dead.contains(qid))
        assert(rows.minBy(_._2)._3 == qid, s"query $qid lost itself")
      rows.foreach(r => assert(!dead.contains(r._3)))
    }
    // recall@3 vs the exact brute force over the SURVIVOR corpus
    val vecs = emb.filter(!col("vec_id").isin(dead.toSeq: _*))
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val qs = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        s += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else s / math.sqrt(na * nb)
    }
    val exact = qs.map { case (qid, qv) =>
      qid -> vecs.map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
    }.toMap
    val hits = got.groupBy(_._1).map { case (qid, rows) =>
      rows.map(_._3).count(exact(qid).contains)
    }.sum
    val recall = hits.toDouble / (qs.length * 3)
    assert(recall >= 0.9, s"survivor recall@3 $recall < 0.9")
  }

  test("append refuses overlapping ids — including deleted-but-unpurged ones (ADVICE r17)") {
    val idx = freshIndex()
    val overlapping = emb.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id")) // same ids as the base
    val e = intercept[IllegalArgumentException] {
      Hnsw.appendHnswSegments(overlapping, "vec_id", "embedding", idx)
    }
    assert(e.getMessage.contains("disjoint"))
    // a deleted id's rows still sit in the base files → still refused
    // (the documented delete → compact → re-append order)
    Hnsw.deleteHnswVectors(spark, idx, Seq(3L))
    intercept[IllegalArgumentException] {
      Hnsw.appendHnswSegments(emb.filter(col("vec_id") === 3L),
        "vec_id", "embedding", idx)
    }
    // disjoint ids append fine after the guard
    Hnsw.appendHnswSegments(
      emb.filter(col("vec_id") < 5)
        .withColumn("vec_id", col("vec_id") + 1000000L),
      "vec_id", "embedding", idx)
  }

  test("compaction == a fresh build over the survivors, bit for bit; tombstones clear") {
    val idx = freshIndex(nSegments = 4)
    val before = serve(idx)
    val preCompact = graft.sinks.Versioned
      .currentVersion(spark, s"$idx/manifest").get
    val dead = (0L until 25L).filter(_ % 3 == 0)
    Hnsw.deleteHnswVectors(spark, idx, dead)
    assert(Hnsw.compactHnswSegments(spark, idx, m = 8,
      efConstruction = 64, nSegments = 4) == 1)
    // the replaced dirs survive for the retained pre-compact version —
    // as-of still serves; with tombstones cleared by the compact, the
    // as-of view shows the PRE-delete corpus (deletes are live state,
    // not versioned — the documented IVF/Lucene caveat)
    val asof = Hnsw.hnswTopK(spark, idx, queries, "vec_id", "embedding",
      k = 3, efSearch = 64, asOf = Some(preCompact))
      .orderBy(col("query_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(asof == before)
    // deterministic construction ⇒ the compacted index serves exactly
    // like a fresh build over the survivor corpus at the same params
    val fresh = Files.createTempDirectory("hnsw_fresh").toString + "/idx"
    Hnsw.buildHnswIndex(emb.filter(!col("vec_id").isin(dead: _*)),
      "vec_id", "embedding", fresh, m = 8, efConstruction = 64,
      nSegments = 4)
    assert(serve(idx) == serve(fresh))
    // the tombstone object is gone and the dead rows are physically out
    assert(Similarity.readTombstones(spark, idx).isEmpty)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val live = spark.read.parquet(
      s"$idx/${graft.sinks.Versioned.read(spark, s"$idx/manifest").collect().map(_.getString(0)).head}")
    assert(live.filter(col("vec_id").isin(dead: _*)).count() == 0)
    assert(live.select(countDistinct(col("vec_id"))).head.getLong(0)
      == emb.count() - dead.length)
  }

  test("as-of serve reads the retained pre-append manifest (index time travel)") {
    val idx = Files.createTempDirectory("hnsw_asof").toString + "/idx"
    Hnsw.buildHnswIndex(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", idx, m = 8, efConstruction = 64,
      nSegments = 4)
    val v = graft.sinks.Versioned.currentVersion(spark, s"$idx/manifest").get
    Hnsw.appendHnswSegments(emb.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", idx, m = 8, efConstruction = 64,
      nNewSegments = 4)
    def rows(asOf: Option[String]) =
      Hnsw.hnswTopK(spark, idx, queries, "vec_id", "embedding",
        k = 3, efSearch = 64, asOf = asOf)
        .orderBy(col("query_id"), col("rank")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSeq
    // determinism makes the as-of serve BIT-IDENTICAL to a fresh build
    // over the pre-append corpus at the same parameters
    val fresh = Files.createTempDirectory("hnsw_asof_f").toString + "/idx"
    Hnsw.buildHnswIndex(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", fresh, m = 8, efConstruction = 64,
      nSegments = 4)
    val asof = rows(Some(v))
    assert(asof == serve(fresh))
    // the live serve sees the appended odd half; the as-of one cannot
    assert(asof.forall(_._3 % 2 == 0))
    assert(rows(None).exists(_._3 % 2 != 0))
  }

  test("compaction killed before the manifest swap leaves the masked view; retry completes") {
    val idx = freshIndex()
    val dead = Seq(1L, 2L, 3L)
    Hnsw.deleteHnswVectors(spark, idx, dead)
    val masked = serve(idx)
    val boom = intercept[RuntimeException] {
      Hnsw.compactHnswSegmentsHooked(spark, idx, 8, 64, 4,
        beforeCommit = () => throw new RuntimeException("killed before swap"))
    }
    assert(boom.getMessage.contains("killed before swap"))
    // the orphan rebuild dir is invisible: the served view is unchanged
    assert(serve(idx) == masked)
    assert(Similarity.readTombstones(spark, idx).nonEmpty)
    // ...and it is GC-able garbage: vacuum sweeps it (no retained
    // version names it), while every version-named dir survives — the
    // served view is still untouched after the sweep
    val swept = Hnsw.vacuumHnswOrphans(spark, idx, minAgeMillis = 0L)
    assert(swept.exists(_.startsWith("cmp-")), s"swept: $swept")
    assert(serve(idx) == masked)
    // retry completes: tombstones clear, dead ids stay out, every
    // query fills its top-k over the rebuilt survivor graphs (the
    // rebuilt walk may rank differently from the MASKED walk — the
    // bit-identity contract is vs a fresh survivor build, pinned above)
    assert(Hnsw.compactHnswSegments(spark, idx) >= 1)
    val after = serve(idx)
    assert(after.forall(r => !dead.contains(r._3)))
    assert(after.groupBy(_._1).forall(_._2.map(_._2).sorted == Seq(1, 2, 3)))
    assert(Similarity.readTombstones(spark, idx).isEmpty)
  }

  test("compaction killed AFTER the swap leaves stale tombstones; re-append self-heals them (ADVICE r18)") {
    val idx = freshIndex()
    val dead = Seq(1L, 2L, 3L)
    Hnsw.deleteHnswVectors(spark, idx, dead)
    // crash in the post-swap/pre-clear window: the manifest now names
    // only the compacted (survivor) segments, but the tombstone object
    // survives — stale ids that reference nothing in the live base
    val boom = intercept[RuntimeException] {
      Hnsw.compactHnswSegmentsHooked(spark, idx, 8, 64, 4,
        beforeCommit = () => (),
        afterSwap = () => throw new RuntimeException("killed after swap"))
    }
    assert(boom.getMessage.contains("killed after swap"))
    assert(Similarity.readTombstones(spark, idx).exists(_._2.nonEmpty),
      "the crash window under test requires the tombstones to survive")
    // the documented recovery workflow — delete → compact → re-append —
    // must WORK: the batch passes the base-disjointness guard (the rows
    // are physically gone) and the stale tombstones must not silently
    // mask the re-appended vectors. The batch deliberately uses a
    // NON-vec_id id column: the repair must probe through the caller's
    // idCol, not the tombstone file's key name (review r19)
    Hnsw.appendHnswSegments(
      emb.filter(col("vec_id").isin(dead: _*))
        .withColumnRenamed("vec_id", "id"),
      "id", "embedding", idx)
    // the stale ids left the tombstone set (self-heal) and serve again
    assert(Similarity.readTombstones(spark, idx).forall(
      _._2.toSet.intersect(dead.toSet).isEmpty))
    val got = serve(idx)
    dead.foreach { id =>
      assert(got.filter(_._1 == id).minBy(_._2)._3 == id,
        s"re-appended id $id did not self-retrieve — still masked")
    }
  }
}
