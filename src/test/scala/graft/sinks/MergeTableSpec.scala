package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Copy-on-write MERGE on the manifest-backed keyed table. Pinned:
 *
 *   1. merge algebra == the reference DataFrame computation
 *      (upsert replaces, delete removes, insert adds)
 *   2. THE SCALE PIN: untouched-bucket files carry into the new manifest
 *      BY NAME — a merge rewrites only the buckets its batch hashes into
 *   3. crash before the version commit leaves the old version served
 *      bit-for-bit; stranded data files never surface; vacuumData sweeps
 *   4. time travel: the pre-merge version still reads exactly as
 *      published; vacuum + vacuumData reclaim it on request
 *   5. duplicate batch keys are refused (no deterministic meaning)
 */
class MergeTableSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs =
    spark.read.parquet(sf("documents")).select("doc_id", "text", "n_chars")

  private def collectSorted(df: DataFrame): Seq[(Long, String)] =
    df.select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toIndexedSeq

  private def mkBatch() = {
    val upd = docs.filter(col("doc_id") % 7 === 3)
      .withColumn("text", concat(col("text"), lit(":upd")))
      .withColumn("_del", lit(false))
    val del = docs.filter(col("doc_id") % 13 === 5 && col("doc_id") % 7 =!= 3)
      .withColumn("_del", lit(true))
    val ins = docs.filter(col("doc_id") % 11 === 2)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .withColumn("text", concat(lit("ins:"), col("text")))
      .withColumn("_del", lit(false))
    upd.unionByName(del).unionByName(ins)
  }

  private def reference(): Seq[(Long, String)] = {
    val survivors = docs.filter(col("doc_id") % 7 =!= 3 && col("doc_id") % 13 =!= 5)
    val upd = docs.filter(col("doc_id") % 7 === 3)
      .withColumn("text", concat(col("text"), lit(":upd")))
    val ins = docs.filter(col("doc_id") % 11 === 2)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .withColumn("text", concat(lit("ins:"), col("text")))
    collectSorted(survivors.unionByName(upd).unionByName(ins))
  }

  test("merge algebra: upsert replaces, delete removes, insert adds") {
    val root = java.nio.file.Files.createTempDirectory("graft_merge_").toString + "/t"
    MergeTable.publish(docs, root, "doc_id", nBuckets = 16)
    val stats = MergeTable.merge(spark, root, mkBatch(), "doc_id",
      deleteFlagCol = Some("_del"))
    assert(collectSorted(MergeTable.read(spark, root)) == reference())
    assert(stats.bucketsTouched > 0 && stats.filesWritten > 0)
  }

  test("racing merges under CAS: lost merge is DETECTED (raises), never last-writer-won; retry lands on the winner's state") {
    // VERDICT r12 next #4, the MergeTable half: two merges race to the
    // pointer swap; the conditional put admits the first and rejects the
    // second. The loser must RAISE — a silently-last-writer-won merge
    // would drop committed rows — and a clean retry applies on top of
    // the winner. The loser's stranded files never surface and are
    // reclaimed by vacuumData.
    val root = java.nio.file.Files.createTempDirectory("graft_mergerace_").toString + "/t"
    MergeTable.publish(docs, root, "doc_id", nBuckets = 16)
    val mergeA = docs.filter(col("doc_id") === 1)
      .withColumn("text", lit("A-won")).withColumn("_del", lit(false))
    val mergeB = docs.filter(col("doc_id") === 2)
      .withColumn("text", lit("B-raced")).withColumn("_del", lit(false))
    val firstWins = new java.util.concurrent.atomic.AtomicBoolean(true)
    // lease claims ride the same primitive: apply them for real (always)
    // so the firstWins CAS budget is spent on the POINTER swaps the race
    // is about, not on the writers' lease handshakes
    Versioned.setConditionalPut { (s, target, bytes) =>
      if (target.getName == Lease.LeaseFile ||
          firstWins.compareAndSet(true, false)) {
        val fsys = target.getFileSystem(s.sessionState.newHadoopConf())
        val out = fsys.create(target, true)
        try out.write(bytes) finally out.close()
        true
      } else false
    }
    try {
      MergeTable.merge(spark, root, mergeA, "doc_id", Some("_del"))
      val err = intercept[java.io.IOException](
        MergeTable.merge(spark, root, mergeB, "doc_id", Some("_del")))
      assert(err.getMessage.contains("conditional put"))
    } finally Versioned.clearConditionalPut()
    // winner's merge serves; the lost merge's row is NOT applied
    val afterRace = collectSorted(MergeTable.read(spark, root)).toMap
    assert(afterRace(1L) == "A-won")
    assert(afterRace(2L) != "B-raced", "a rejected merge mutated the table")
    // retry with the precondition clear: applied on top of the winner
    MergeTable.merge(spark, root, mergeB, "doc_id", Some("_del"))
    val afterRetry = collectSorted(MergeTable.read(spark, root)).toMap
    assert(afterRetry(1L) == "A-won" && afterRetry(2L) == "B-raced")
    // the raced attempt's stranded data files are unreferenced by any
    // committed version: vacuumData sweeps them, the table is unchanged
    assert(MergeTable.vacuumData(spark, root).nonEmpty)
    assert(collectSorted(MergeTable.read(spark, root)).toMap == afterRetry)
  }

  test("rebucket: full rewrite restores lookup and merge economics; crash leaves old bucketing servable; time travel crosses it") {
    // VERDICT r12 next #5: an under-bucketed table (2 buckets for 500
    // rows) pays ~n/2 rows per lookup probe and per touched-bucket merge.
    val root = java.nio.file.Files.createTempDirectory("graft_rebkt_").toString + "/t"
    MergeTable.publish(docs, root, "doc_id", nBuckets = 2)
    val contentBefore = collectSorted(MergeTable.read(spark, root))
    def lookupBytes(): Long = {
      val files = MergeTable.readKeys(spark, root, "doc_id",
        docs.filter(col("doc_id") === 7L).select("doc_id")).inputFiles
      assert(files.nonEmpty)
      files.map(f => new java.io.File(new java.net.URI(f)).length).sum
    }
    val bytesBefore = lookupBytes()

    // crash injection: the rewrite lands its files, the commit never
    // happens — the 2-bucket manifest stays live and serves bit-for-bit
    intercept[RuntimeException](MergeTable.rebucketHooked(spark, root, 32,
      () => throw new RuntimeException("killed before manifest swap")))
    assert(collectSorted(MergeTable.read(spark, root)) == contentBefore)
    assert(MergeTable.vacuumData(spark, root).nonEmpty,
      "the crashed rewrite left no strands to sweep?")
    assert(collectSorted(MergeTable.read(spark, root)) == contentBefore)

    // the real rebucket: content identical, lookups scan ~16× fewer bytes
    val t0 = System.currentTimeMillis()
    MergeTable.rebucket(spark, root, 32)
    assert(collectSorted(MergeTable.read(spark, root)) == contentBefore)
    val bytesAfter = lookupBytes()
    assert(bytesAfter * 4 < bytesBefore,
      s"lookup scans $bytesAfter bytes after rebucket vs $bytesBefore before — no improvement")
    // a single-key merge now touches 1-of-32, not 1-of-2
    val one = docs.filter(col("doc_id") === 9)
      .withColumn("text", lit("post-rebucket")).withColumn("_del", lit(false))
    val stats = MergeTable.merge(spark, root, one, "doc_id", Some("_del"))
    assert(stats.bucketsTouched == 1)
    assert(stats.filesCarried == 31,
      s"expected 31 carried single-file buckets, got ${stats.filesCarried}")
    // time travel: the pre-rebucket 2-bucket version still reads whole
    val preVersion = Versioned.versionAsOf(spark, root, t0 - 1).get
    assert(collectSorted(MergeTable.readVersion(spark, root, preVersion)) == contentBefore)
    // merges after the rebucket land correctly
    assert(collectSorted(MergeTable.read(spark, root)).toMap.get(9L).contains("post-rebucket"))
    // a no-op rebucket is refused
    intercept[IllegalArgumentException](MergeTable.rebucket(spark, root, 32))
  }

  test("scale pin: untouched-bucket files carry by name; only touched buckets rewrite") {
    val root = java.nio.file.Files.createTempDirectory("graft_mergecow_").toString + "/t"
    val v1 = MergeTable.publish(docs, root, "doc_id", nBuckets = 64)
    // one single-key batch touches exactly one bucket
    val one = docs.filter(col("doc_id") === 1)
      .withColumn("text", lit("rewritten")).withColumn("_del", lit(false))
    val stats = MergeTable.merge(spark, root, one, "doc_id", Some("_del"))
    assert(stats.bucketsTouched == 1)
    val manifestOf = (v: String) => Versioned.readSmallText(spark,
      new org.apache.hadoop.fs.Path(s"$root/$v", MergeTable.ManifestFile)).get
      .split('\n').filter(_.contains('\t')).toSet
    val before = manifestOf(v1)
    val after = manifestOf(Versioned.currentVersion(spark, root).get)
    val carried = before.intersect(after)
    // with 64 buckets and one touched, the overwhelming majority carries
    assert(carried.size == stats.filesCarried)
    assert(carried.nonEmpty && (before -- after).nonEmpty)
    // and the carried lines are from DIFFERENT buckets than the rewrite
    val touchedBucket = (before -- after).map(_.split('\t')(0)).head
    assert(!carried.exists(_.split('\t')(0) == touchedBucket))
    // correctness unaffected
    val got = collectSorted(MergeTable.read(spark, root))
    val want = collectSorted(docs.filter(col("doc_id") =!= 1)
      .unionByName(docs.filter(col("doc_id") === 1)
        .withColumn("text", lit("rewritten"))))
    assert(got == want)
  }

  test("crash before commit: old version serves; vacuumData sweeps the strands") {
    val root = java.nio.file.Files.createTempDirectory("graft_mergecrash_").toString + "/t"
    MergeTable.publish(docs, root, "doc_id", nBuckets = 16)
    val before = collectSorted(MergeTable.read(spark, root))
    val boom = intercept[RuntimeException] {
      MergeTable.mergeHooked(spark, root, mkBatch(), "doc_id", Some("_del"),
        beforeCommit = () => throw new RuntimeException("killed before commit"))
    }
    assert(boom.getMessage.contains("killed before commit"))
    // served view untouched; stranded files invisible to readers
    assert(collectSorted(MergeTable.read(spark, root)) == before)
    val swept = MergeTable.vacuumData(spark, root)
    assert(swept.nonEmpty, "injection fired before the data job committed")
    // retry lands the merge exactly once
    MergeTable.merge(spark, root, mkBatch(), "doc_id", Some("_del"))
    assert(collectSorted(MergeTable.read(spark, root)) == reference())
  }

  test("time travel reads the pre-merge version; vacuum + vacuumData reclaim") {
    val root = java.nio.file.Files.createTempDirectory("graft_mergett_").toString + "/t"
    val v1 = MergeTable.publish(docs, root, "doc_id", nBuckets = 16)
    val base = collectSorted(MergeTable.read(spark, root))
    MergeTable.merge(spark, root, mkBatch(), "doc_id", Some("_del"))
    // the old version still reads exactly as published (shared files)
    assert(collectSorted(MergeTable.readVersion(spark, root, v1)) == base)
    // nothing is unreferenced yet — both versions' files are live
    assert(MergeTable.vacuumData(spark, root).isEmpty)
    // drop the old version, then its exclusive files become sweepable
    assert(Versioned.vacuum(spark, root) == Seq(v1))
    val swept = MergeTable.vacuumData(spark, root)
    assert(swept.nonEmpty)
    assert(collectSorted(MergeTable.read(spark, root)) == reference())
  }

  test("exactly-once CDC: redelivered batches skip; crash before commit replays cleanly") {
    val root = java.nio.file.Files.createTempDirectory("graft_mergeeo_").toString + "/t"
    MergeTable.publish(docs, root, "doc_id", nBuckets = 16)
    val b0 = docs.filter(col("doc_id") < 5)
      .withColumn("text", concat(col("text"), lit(":b0")))
    // batch 0 applies once; the duplicate delivery is a no-op
    assert(MergeTable.mergeExactlyOnce(spark, root, b0, "doc_id", batchId = 0L))
    val after0 = collectSorted(MergeTable.read(spark, root))
    assert(!MergeTable.mergeExactlyOnce(spark, root, b0, "doc_id", batchId = 0L))
    assert(collectSorted(MergeTable.read(spark, root)) == after0)
    assert(MergeTable.lastBatchId(spark, root).contains(0L))
    // crash before batch 1's commit: the id fence stays at 0, retry applies
    val b1 = docs.filter(col("doc_id") >= 5 && col("doc_id") < 8)
      .withColumn("text", concat(col("text"), lit(":b1")))
    intercept[RuntimeException] {
      MergeTable.mergeHooked(spark, root, b1, "doc_id", None,
        beforeCommit = () => throw new RuntimeException("boom"),
        batchId = Some(1L))
    }
    assert(MergeTable.lastBatchId(spark, root).contains(0L))
    assert(MergeTable.mergeExactlyOnce(spark, root, b1, "doc_id", batchId = 1L))
    assert(MergeTable.lastBatchId(spark, root).contains(1L))
    // an ad-hoc (non-streaming) merge carries the fence forward
    val adhoc = docs.filter(col("doc_id") === 100)
      .withColumn("text", lit("adhoc")).withColumn("_del", lit(false))
    MergeTable.merge(spark, root, adhoc, "doc_id", Some("_del"))
    assert(MergeTable.lastBatchId(spark, root).contains(1L))
    assert(!MergeTable.mergeExactlyOnce(spark, root, b1, "doc_id", batchId = 1L))
  }

  test("streaming CDC: foreachBatch upserts == one batch merge of the union") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mergestream_").toString
    val root = s"$tmp/t"
    MergeTable.publish(docs, root, "doc_id", nBuckets = 16)
    val updates = docs.filter(col("doc_id") < 20)
      .withColumn("text", concat(lit("cdc:"), col("text")))
    // two staged files → maxFilesPerTrigger=1 forces two micro-batches
    val feed = s"$tmp/feed"
    updates.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(feed)
    updates.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(feed)
    var applied = 0
    val q = spark.readStream.schema(updates.schema)
      .option("maxFilesPerTrigger", 1).parquet(feed)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          // deliver every batch TWICE — the at-least-once contract the
          // fence must absorb
          if (MergeTable.mergeExactlyOnce(spark, root, batch, "doc_id", id))
            applied += 1
          assert(!MergeTable.mergeExactlyOnce(spark, root, batch, "doc_id", id))
        }
        ()
      }
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream drain timed out")
    assert(applied >= 2, s"expected >=2 applied micro-batches, got $applied")
    // parity: the drained table == one batch merge of all updates
    val root2 = s"$tmp/t2"
    MergeTable.publish(docs, root2, "doc_id", nBuckets = 16)
    MergeTable.merge(spark, root2, updates, "doc_id")
    assert(collectSorted(MergeTable.read(spark, root)) ==
      collectSorted(MergeTable.read(spark, root2)))
  }

  test("readKeys: bucket-pruned lookup == full-scan filter, scanning only touched buckets") {
    val root = java.nio.file.Files.createTempDirectory("graft_mergelk_").toString + "/t"
    MergeTable.publish(docs, root, "doc_id", nBuckets = 64)
    val keys = docs.filter(col("doc_id").isin(1L, 2L, 3L)).select("doc_id")
    val got = MergeTable.readKeys(spark, root, "doc_id", keys)
    // exactness: == the full read filtered to the keys
    assert(collectSorted(got) ==
      collectSorted(MergeTable.read(spark, root)
        .filter(col("doc_id").isin(1L, 2L, 3L))))
    // THE PRUNING PIN: the lookup's scan reads at most 3 buckets' files,
    // a strict subset of the table's
    // inputFiles includes the keys frame's own source; keep the table side
    val scanned = got.inputFiles.toSet.filter(_.contains("/bucket="))
    val all = MergeTable.read(spark, root).inputFiles.toSet
    val scannedBuckets = scanned.map(f => f.split("/").find(_.startsWith("bucket=")).get)
    assert(scannedBuckets.size <= 3,
      s"lookup scanned ${scannedBuckets.size} buckets for 3 keys")
    assert(scanned.subsetOf(all) && scanned.size < all.size,
      s"lookup scanned ${scanned.size}/${all.size} files — no pruning happened")
    // the small lookup rides the In-pushdown path over key-sorted files
    assert(got.queryExecution.executedPlan.toString
      .contains("PushedFilters: [In(doc_id"),
      "small key set should push an In predicate to the scan")
    // a key set past IsInPushdownLimit switches to the broadcast semi-join
    // path with identical results
    val manyKeys = docs.filter(
      col("doc_id") < MergeTable.IsInPushdownLimit + 16).select("doc_id")
    val many = MergeTable.readKeys(spark, root, "doc_id", manyKeys)
    assert(many.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(collectSorted(many) ==
      collectSorted(MergeTable.read(spark, root)
        .filter(col("doc_id") < MergeTable.IsInPushdownLimit + 16)))
    // absent keys return empty, not error
    val none = MergeTable.readKeys(spark, root, "doc_id",
      docs.filter(col("doc_id") === -1).select("doc_id"))
    assert(none.count() == 0)
  }

  test("collectKeys: mixed-generation roots (append-only schema drift) union with nulls, not AnalysisException (ADVICE r21)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ck_").toString
    // legacy generation: (tok, dfc) — pre-stats dictionary shape
    val legacy = Seq(("alpha", 3L), ("beta", 1L)).toDF("tok", "dfc")
    MergeTable.publish(legacy, s"$base/old", "tok", nBuckets = 4)
    // current generation: the same columns plus appended stats columns
    val fresh = Seq(("alpha", 2L, 7L, 11L), ("gamma", 5L, 9L, 13L))
      .toDF("tok", "dfc", "maxtf", "minlen")
    MergeTable.publish(fresh, s"$base/new", "tok", nBuckets = 4)
    val keys = Seq("alpha", "beta", "gamma").toDF("tok")
    // order roots BOTH ways: the union must tolerate either side leading
    for (roots <- Seq(Seq(s"$base/old", s"$base/new"),
                      Seq(s"$base/new", s"$base/old"))) {
      val rows = MergeTable.collectKeys(spark, roots, "tok", keys)
      assert(rows.size == 4, s"expected 4 rows, got ${rows.size}")
      // every row carries the superset arity; legacy rows read null in
      // the stats columns — the serve paths' isNullAt fallback trigger
      assert(rows.forall(_.length == 4))
      val legacyRows = rows.filter(r =>
        (r.getString(0) == "alpha" && r.getLong(1) == 3L) ||
          r.getString(0) == "beta")
      assert(legacyRows.size == 2 && legacyRows.forall(r =>
        r.isNullAt(r.fieldIndex("maxtf")) && r.isNullAt(r.fieldIndex("minlen"))))
      assert(rows.filter(r => !r.isNullAt(r.fieldIndex("maxtf")))
        .map(r => (r.getString(0),
          r.getLong(r.fieldIndex("maxtf")))).toSet == Set(("alpha", 7L), ("gamma", 9L)))
    }
  }

  test("schema evolution: a declared new column joins from this version on; old rows read null") {
    val root = java.nio.file.Files.createTempDirectory("graft_mergeevo_").toString + "/t"
    val v1 = MergeTable.publish(docs, root, "doc_id", nBuckets = 16)
    val batch = docs.filter(col("doc_id") < 10)
      .withColumn("text", concat(col("text"), lit(":v2")))
      .withColumn("quality", col("doc_id") * 10)
    MergeTable.merge(spark, root, batch, "doc_id",
      newColumns = Seq("quality"))
    val now = MergeTable.read(spark, root)
    assert(now.columns.contains("quality"))
    val byId = now.select(col("doc_id").cast("long"), col("quality").cast("long"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // batch rows carry values; carried/survivor rows read null
    (0L until 10L).foreach(id => assert(byId(id).contains(id * 10)))
    assert(byId.filter(_._1 >= 10).values.forall(_.isEmpty),
      "pre-evolution rows must read null in the new column")
    // the pre-merge version keeps its own schema — time travel is exact
    assert(!MergeTable.readVersion(spark, root, v1).columns.contains("quality"))
    // point lookups work across the evolution boundary
    val lk = MergeTable.readKeys(spark, root, "doc_id",
      docs.filter(col("doc_id").isin(3L, 50L)).select("doc_id"))
      .select(col("doc_id").cast("long"), col("quality").cast("long"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(lk(3L).contains(30L) && lk(50L).isEmpty)
    // a second merge WITHOUT the column keeps the evolved schema (batch
    // must now carry it — missing data columns fail loudly)
    val e1 = intercept[Exception] {
      MergeTable.merge(spark, root,
        docs.filter(col("doc_id") === 20), "doc_id")
    }
    assert(e1.getMessage.contains("quality"))
    // declaring a column the table already has is refused
    val e2 = intercept[IllegalArgumentException] {
      MergeTable.merge(spark, root, batch, "doc_id", newColumns = Seq("quality"))
    }
    assert(e2.getMessage.contains("already has it"))
  }

  test("self-compacting: the live manifest never exceeds nBuckets files across many merges") {
    val root = java.nio.file.Files.createTempDirectory("graft_mergesc_").toString + "/t"
    MergeTable.publish(docs, root, "doc_id", nBuckets = 8)
    (0 until 5).foreach { i =>
      MergeTable.merge(spark, root,
        docs.filter(col("doc_id") === i.toLong)
          .withColumn("text", lit(s"m$i")), "doc_id")
    }
    // a merge rewrites touched buckets WHOLESALE — no intra-bucket
    // appends — so unlike the ANN index's append path there is no live
    // compaction debt: the manifest stays ≤ nBuckets files forever
    val manifest = Versioned.readSmallText(spark,
      new org.apache.hadoop.fs.Path(
        s"$root/${Versioned.currentVersion(spark, root).get}",
        MergeTable.ManifestFile)).get
    assert(manifest.split('\n').count(_.contains('\t')) <= 8,
      "live manifest sprawled past one file per bucket")
    // the only sprawl is DEAD files from superseded versions — on disk
    // until vacuum, then gone, with the live view unchanged
    val want = collectSorted(MergeTable.read(spark, root))
    Versioned.vacuum(spark, root)
    assert(MergeTable.vacuumData(spark, root).nonEmpty,
      "superseded versions should have left dead files to sweep")
    assert(collectSorted(MergeTable.read(spark, root)) == want)
  }

  test("readAsOf: the timestamp resolves to the version live at that moment") {
    val root = java.nio.file.Files.createTempDirectory("graft_mergeasof_").toString + "/t"
    MergeTable.publish(docs, root, "doc_id", nBuckets = 8)
    val base = collectSorted(MergeTable.read(spark, root))
    val t1 = System.currentTimeMillis()
    Thread.sleep(1100) // mtime granularity can be a full second
    MergeTable.merge(spark, root,
      docs.filter(col("doc_id") === 1).withColumn("text", lit("v2")), "doc_id")
    // as of t1: the pre-merge state; as of now: the live state
    assert(collectSorted(MergeTable.readAsOf(spark, root, t1)) == base)
    assert(collectSorted(MergeTable.readAsOf(spark, root,
      System.currentTimeMillis())) ==
      collectSorted(MergeTable.read(spark, root)))
    // predating the table fails loudly
    intercept[IllegalArgumentException](MergeTable.readAsOf(spark, root, 1000L))
  }

  test("rebucket carries the CDC watermark: redelivered batches still skip after a re-layout") {
    val root = java.nio.file.Files.createTempDirectory("graft_rebktcdc_").toString + "/t"
    MergeTable.publish(docs, root, "doc_id", nBuckets = 2)
    val b7 = docs.filter(col("doc_id") === 7)
      .withColumn("text", lit("batch-7"))
    assert(MergeTable.mergeExactlyOnce(spark, root, b7, "doc_id", batchId = 7L))
    assert(MergeTable.lastBatchId(spark, root).contains(7L))
    MergeTable.rebucket(spark, root, 16)
    // the replay fence survived the full rewrite
    assert(MergeTable.lastBatchId(spark, root).contains(7L))
    // a redelivery of batch 7 is still absorbed; batch 8 applies
    assert(!MergeTable.mergeExactlyOnce(spark, root,
      b7.withColumn("text", lit("dup-7")), "doc_id", batchId = 7L))
    assert(collectSorted(MergeTable.read(spark, root)).toMap.apply(7L) == "batch-7")
    assert(MergeTable.mergeExactlyOnce(spark, root,
      docs.filter(col("doc_id") === 8).withColumn("text", lit("batch-8")),
      "doc_id", batchId = 8L))
    assert(MergeTable.lastBatchId(spark, root).contains(8L))
    assert(collectSorted(MergeTable.read(spark, root)).toMap.apply(8L) == "batch-8")
  }

  test("retention policy on a merge table: vacuum + vacuumData keep the horizon readable; beyond it names the horizon") {
    val root = java.nio.file.Files.createTempDirectory("graft_mergeret_").toString + "/t"
    Versioned.setRetention(spark, root, Versioned.Retention(keepLast = Some(2)))
    MergeTable.publish(docs, root, "doc_id", nBuckets = 8)
    Thread.sleep(20); val t1 = System.currentTimeMillis(); Thread.sleep(20)
    MergeTable.merge(spark, root,
      docs.filter(col("doc_id") === 1).withColumn("text", lit("m1"))
        .withColumn("_del", lit(false)), "doc_id", Some("_del"))
    Thread.sleep(20); val t2 = System.currentTimeMillis(); Thread.sleep(20)
    MergeTable.merge(spark, root,
      docs.filter(col("doc_id") === 2).withColumn("text", lit("m2"))
        .withColumn("_del", lit(false)), "doc_id", Some("_del"))
    // vacuum honors keep_last=2: the publish-time version goes, the
    // post-m1 version stays; vacuumData keeps every file a RETAINED
    // version references, so the horizon stays fully readable
    assert(Versioned.vacuum(spark, root).length == 1)
    MergeTable.vacuumData(spark, root)
    val asOfM1 = collectSorted(MergeTable.readAsOf(spark, root, t2)).toMap
    assert(asOfM1(1L) == "m1" && asOfM1(2L) != "m2",
      "the inside-horizon AS-OF view must predate merge m2")
    val err = intercept[IllegalArgumentException](
      MergeTable.readAsOf(spark, root, t1))
    assert(err.getMessage.contains("keep_last=2"), err.getMessage)
  }

  test("duplicate batch keys are refused") {
    val root = java.nio.file.Files.createTempDirectory("graft_mergedup_").toString + "/t"
    MergeTable.publish(docs, root, "doc_id", nBuckets = 16)
    val dup = docs.filter(col("doc_id") < 2)
      .unionByName(docs.filter(col("doc_id") < 2))
    val e = intercept[IllegalArgumentException] {
      MergeTable.merge(spark, root, dup, "doc_id")
    }
    assert(e.getMessage.contains("duplicated keys"))
  }

  test("zone maps: a range read scans only overlapping files; results equal the full-scan filter") {
    // VERDICT r13 next #4: bucket routing serves point lookups, but a
    // range predicate on the key hashes everywhere — per-file key
    // [min,max] in the manifest is the data-skipping half of the layout.
    val root = java.nio.file.Files.createTempDirectory("graft_zone_").toString + "/t"
    MergeTable.publish(docs, root, "doc_id", nBuckets = 16)
    val all = MergeTable.rangeFiles(spark, root, None, None)
    assert(all.size >= 16, s"expected ~one file per bucket, saw ${all.size}")
    // doc_ids are 0..499 hashed across 16 buckets: every bucket's file
    // spans most of the id range, so a WIDE range prunes nothing…
    val wide = MergeTable.rangeFiles(spark, root, Some(0L), Some(10000L))
    assert(wide.toSet == all.toSet)
    // …but after a merge INSERTS a small distant key range (1M+), those
    // rows land in the few rewritten buckets whose zones disclose them; a
    // range read in the new region must scan ONLY those files
    val inserts = docs.filter(col("doc_id") < 3)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .withColumn("text", concat(lit("ins:"), col("text")))
    MergeTable.merge(spark, root, inserts, "doc_id")
    val allAfter = MergeTable.rangeFiles(spark, root, None, None)
    val highOnly = MergeTable.rangeFiles(spark, root, Some(1000000L), None)
    assert(highOnly.nonEmpty && highOnly.size < allAfter.size,
      s"range read did not prune: ${highOnly.size} of ${allAfter.size} files")
    // pruned high-range files are exactly those whose zones reach 1M —
    // i.e. only rewritten (merge-touched) files can appear
    val stats2 = MergeTable.read(spark, root)
      .filter(col("doc_id") >= 1000000L).count()
    val ranged = MergeTable.readRange(spark, root, Some(1000000L), None)
    assert(ranged.count() == stats2)
    // correctness: a mid-corpus range equals the unpruned filter, column
    // for column
    val lo = 100L; val hi = 260L
    val expect = MergeTable.read(spark, root)
      .filter(col("doc_id") >= lo && col("doc_id") <= hi)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val got = MergeTable.readRange(spark, root, Some(lo), Some(hi))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(got == expect)
    // open bounds
    assert(MergeTable.readRange(spark, root, None, Some(5L)).count() ==
      MergeTable.read(spark, root).filter(col("doc_id") <= 5L).count())
  }

  test("zone maps survive merge carry and rebucket; pre-zone manifests scan everything") {
    val root = java.nio.file.Files.createTempDirectory("graft_zone2_").toString + "/t"
    MergeTable.publish(docs, root, "doc_id", nBuckets = 8)
    MergeTable.merge(spark, root, mkBatch(), "doc_id", deleteFlagCol = Some("_del"))
    // carried (untouched-bucket) files keep their zone entries: a range
    // read over the whole space still names every file — no entry was
    // dropped by the merge's manifest rewrite
    val after = MergeTable.readRange(spark, root, Some(0L), None)
    assert(collectSorted(after) == reference())
    // rebucket recomputes zones for the full re-layout
    MergeTable.rebucket(spark, root, 32)
    val high = MergeTable.rangeFiles(spark, root, Some(1000000L), None)
    val all = MergeTable.rangeFiles(spark, root, None, None)
    assert(high.size < all.size, "rebucket lost the zone map")
    assert(collectSorted(MergeTable.readRange(spark, root, Some(0L), None)) == reference())
    // pre-zone manifest compatibility: strip the zone fields from the
    // live manifest by hand; reads must degrade to scan-everything, not
    // fail or drop rows
    val live = Versioned.currentVersion(spark, root).get
    val mPath = s"$root/$live/${MergeTable.ManifestFile}"
    val txt = scala.io.Source.fromFile(mPath).mkString
    val stripped = txt.split('\n').map { l =>
      if (l.nonEmpty && l.contains('\t')) l.split('\t').take(2).mkString("\t") else l
    }.mkString("\n")
    val fw = new java.io.FileWriter(mPath); fw.write(stripped); fw.close()
    // the hand edit invalidates hadoop's local-fs sidecar checksum
    new java.io.File(s"$root/$live/.${MergeTable.ManifestFile}.crc").delete()
    assert(MergeTable.rangeFiles(spark, root, Some(1000000L), None).toSet ==
      MergeTable.rangeFiles(spark, root, None, None).toSet,
      "zone-less manifest must scan everything")
    assert(collectSorted(MergeTable.readRange(spark, root, Some(0L), None)) == reference())
  }

  test("zone maps on FLOAT keys round-trip exactly: a bound equal to a file's max never prunes it (ADVICE r14)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_zonef_").toString + "/t"
    // 0.1f.toDouble = 0.10000000149…d, but Float.toString writes "0.1" —
    // parsing the stored zone straight to double made a file whose max IS
    // 0.1f compare BELOW the exactly-widened query bound and get pruned,
    // silently dropping matching rows. The parser now routes float zones
    // back through the float domain, so the round-trip is exact.
    val df = Seq((0.025f, 1L), (0.05f, 2L), (0.075f, 3L), (0.1f, 4L),
      (0.3f, 5L), (0.7f, 6L)).toDF("k", "id")
    MergeTable.publish(df, root, "k", nBuckets = 4)
    val exact = MergeTable.readRange(spark, root, Some(0.1f), Some(0.1f))
      .collect()
    assert(exact.length == 1 && exact.head.getLong(1) == 4L,
      s"bound == file max must not prune: got ${exact.length} rows")
    val ge = MergeTable.readRange(spark, root, Some(0.1f), None)
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(ge == Seq(4L, 5L, 6L))
    // and the zones still PRUNE where they should: a band past the data
    assert(MergeTable.rangeFiles(spark, root, Some(10.0f), None).isEmpty ||
      MergeTable.readRange(spark, root, Some(10.0f), None).count() == 0)
  }

  test("range layout: tight zone bands manifest-prune point and range reads; mutation refuses (VERDICT r14 #8)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_rangelay_").toString + "/t"
    val df = (0L to 999L).map(i => (f"k$i%04d", i)).toDF("k", "v")
    MergeTable.publishRange(df, root, "k", nParts = 8)
    // point lookups route by zone band, not hash — exact results
    val got = MergeTable.readKeys(spark, root, "k",
      Seq("k0042", "k0999", "nope").toDF("k"))
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(got == Seq(42L, 999L))
    // the manifest file list is a sorted dictionary: a band scan names
    // only the overlapping files (hash layout scans all here)
    val all = MergeTable.rangeFiles(spark, root, None, None)
    val band = MergeTable.rangeFiles(spark, root, Some("k0100"), Some("k0200"))
    assert(all.size == 8, s"expected 8 range files, got ${all.size}")
    assert(band.nonEmpty && band.size <= 2,
      s"a 10% band must prune to ~1 of 8 files, got ${band.size}")
    val ranged = MergeTable.readRange(spark, root, Some("k0100"), Some("k0200"))
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(ranged == (100L to 200L).toSeq)
    // full read works and carries no bucket column
    assert(MergeTable.read(spark, root).count() == 1000L)
    // immutable by contract: merge and rebucket refuse loudly
    val e1 = intercept[IllegalArgumentException](
      MergeTable.merge(spark, root,
        Seq(("k0001", 7L)).toDF("k", "v"), "k"))
    assert(e1.getMessage.contains("range"))
    val e2 = intercept[IllegalArgumentException](
      MergeTable.rebucket(spark, root, 4))
    assert(e2.getMessage.contains("range"))
  }
}
