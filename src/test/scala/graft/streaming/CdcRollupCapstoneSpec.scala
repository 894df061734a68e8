package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Rollup
import graft.sinks.MergeTable

/**
 * The CDC→merge→rollup capstone (VERDICT r13 next #6): a file-feed CDC
 * stream drives `mergeExactlyOnce` into the keyed table AND a
 * delta-rollup refresh of a served aggregate, in one `foreachBatch`.
 * Both sinks carry their own batch-id fence; this spec crash-kills the
 * window BETWEEN them and proves the pair composes — no hole (the
 * rollup still folds the killed batch after redelivery) and no
 * double-apply (neither fence re-applies) — against the one-shot batch
 * equivalent.
 *
 * The composition works because the rollup delta is derived from the
 * table's own VERSION HISTORY (versionForBatch + versionDelta), not
 * from pre-merge live state: after the crash, the redelivered batch
 * finds the merge already committed (fence skips) and recomputes the
 * SAME signed delta from the same version pair.
 */
class CdcRollupCapstoneSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs =
    spark.read.parquet(sf("documents")).select("doc_id", "source", "text", "n_chars")

  private def oneShot(): Seq[(String, Long, Long)] = {
    val finalState = docs.filter(col("doc_id") % 7 =!= 3)
      .unionByName(docs.filter(col("doc_id") % 7 === 3)
        .withColumn("n_chars", col("n_chars") + lit(5L)))
      .unionByName(docs.filter(col("doc_id") % 11 === 2)
        .withColumn("doc_id", col("doc_id") + lit(10000000L)))
    finalState.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toIndexedSeq
  }

  private def servedRollup(root: String): Seq[(String, Long, Long)] =
    Rollup.serve(spark, root)
      .select(col("source"), col("n").cast("long"), col("s_n_chars").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toIndexedSeq

  test("crash between the merge fence and the rollup fence: redelivery closes the hole, never double-applies") {
    val base = java.nio.file.Files.createTempDirectory("graft_capstone_").toString
    val root = s"$base/table"; val rollRoot = s"$base/rollup"
    val feed = s"$base/feed"; val ckpt = s"$base/ckpt"
    MergeTable.publish(docs, root, "doc_id", nBuckets = 16)
    Rollup.publish(docs, Seq("source"), Seq("n_chars"), rollRoot)
    val upd = docs.filter(col("doc_id") % 7 === 3)
      .withColumn("text", concat(col("text"), lit(":cdc")))
      .withColumn("n_chars", col("n_chars") + lit(5L))
    val ins = docs.filter(col("doc_id") % 11 === 2)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
      .withColumn("text", concat(lit("ins:"), col("text")))
    upd.coalesce(1).write.mode("append").parquet(feed)
    ins.coalesce(1).write.mode("append").parquet(feed)

    val rollupApplies = new java.util.concurrent.atomic.AtomicInteger(0)
    def runStream(killBatch: Option[Long]): Either[Throwable, Unit] = {
      val q = spark.readStream.schema(upd.schema)
        .option("maxFilesPerTrigger", 1).parquet(feed)
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          if (!batch.isEmpty) {
            MergeTable.mergeExactlyOnce(spark, root, batch, "doc_id", id)
            // THE KILL WINDOW: merge committed, rollup not yet refreshed
            if (killBatch.contains(id))
              throw new RuntimeException(s"killed after merge of batch $id")
            MergeTable.versionForBatch(spark, root, id).foreach {
              case (Some(prev), v) =>
                if (Rollup.refreshDeltaExactlyOnce(
                    MergeTable.versionDelta(spark, root, prev, v),
                    Seq("source"), Seq("n_chars"), rollRoot, id))
                  rollupApplies.incrementAndGet()
                ()
              case _ => ()
            }
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try { q.awaitTermination(120000); Right(()) }
      catch { case e: org.apache.spark.sql.streaming.StreamingQueryException =>
        Left(e) }
      finally if (q.isActive) q.stop()
    }

    // run 1: batch 0 merges, then dies before the rollup refresh
    val crash = runStream(killBatch = Some(0L))
    assert(crash.isLeft && crash.left.exists(
      _.getMessage.contains("killed after merge of batch 0")))
    // the hole is real at this point: table has batch 0, rollup does not
    assert(MergeTable.lastBatchId(spark, root).contains(0L),
      "kill fired before the merge committed — window not reached")
    assert(Rollup.lastBatchId(spark, rollRoot).isEmpty,
      "rollup advanced past the kill — window not reached")

    // run 2: same checkpoint. foreachBatch redelivers batch 0 (its epoch
    // never committed): the merge fence skips, the version pair is found,
    // the SAME delta folds into the rollup exactly once; batch 1 proceeds.
    assert(runStream(killBatch = None).isRight)
    assert(MergeTable.lastBatchId(spark, root).contains(1L))
    assert(Rollup.lastBatchId(spark, rollRoot).contains(1L))
    assert(rollupApplies.get == 2, s"each batch folds exactly once, saw ${rollupApplies.get}")

    // the served rollup equals the one-shot aggregate of the final state
    assert(servedRollup(rollRoot) == oneShot())
    // and a third, fully-redundant run changes nothing (both fences skip)
    assert(runStream(killBatch = None).isRight)
    assert(rollupApplies.get == 2, "a replayed run re-applied a fenced batch")
    assert(servedRollup(rollRoot) == oneShot())
    // table state is the merged algebra too (the other sink of the pair)
    val tableAgg = MergeTable.read(spark, root).groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toIndexedSeq
    assert(tableAgg == oneShot())
  }

  test("deletes flow through the delta rollup: retractions subtract; emptied keys leave") {
    // versionDelta emits a -1 row with NO +1 pair for a deleted key, so
    // refreshDeltaExactlyOnce retracts its contribution — and a dimension
    // whose count reaches zero disappears from the served rollup.
    val base = java.nio.file.Files.createTempDirectory("graft_caprm_").toString
    val root = s"$base/table"; val rollRoot = s"$base/rollup"
    // one source small enough to delete entirely
    val victim = docs.select(col("source")).distinct().orderBy("source")
      .head().getString(0)
    MergeTable.publish(docs, root, "doc_id", nBuckets = 8)
    Rollup.publish(docs, Seq("source"), Seq("n_chars"), rollRoot)
    val v0 = graft.sinks.Versioned.currentVersion(spark, root).get
    val batch = docs.filter(col("source") === victim)
      .withColumn("_del", lit(true))
      .unionByName(docs.filter(col("doc_id") === 1 && col("source") =!= victim)
        .withColumn("n_chars", col("n_chars") + lit(7L))
        .withColumn("_del", lit(false)))
    MergeTable.merge(spark, root, batch, "doc_id", deleteFlagCol = Some("_del"))
    val v1 = graft.sinks.Versioned.currentVersion(spark, root).get
    assert(Rollup.refreshDeltaExactlyOnce(
      MergeTable.versionDelta(spark, root, v0, v1),
      Seq("source"), Seq("n_chars"), rollRoot, batchId = 0L))
    val served = servedRollup(rollRoot)
    assert(!served.exists(_._1 == victim),
      s"fully-deleted source '$victim' still in the rollup: $served")
    val expect = docs.filter(col("source") =!= victim)
      .withColumn("n_chars", when(col("doc_id") === 1, col("n_chars") + lit(7L))
        .otherwise(col("n_chars")))
      .groupBy("source").agg(count(lit(1)).as("n"), sum("n_chars").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toIndexedSeq
    assert(served == expect)
  }

  test("versionDelta reads only the touched buckets' files and cancels unchanged survivors") {
    val base = java.nio.file.Files.createTempDirectory("graft_vdelta_").toString
    val root = s"$base/table"
    MergeTable.publish(docs, root, "doc_id", nBuckets = 16)
    val v0 = graft.sinks.Versioned.currentVersion(spark, root).get
    // one small batch: 3 updates — touches ≤ 3 buckets
    val batch = docs.filter(col("doc_id").isin(10L, 11L, 12L))
      .withColumn("n_chars", col("n_chars") + lit(100L))
    MergeTable.merge(spark, root, batch, "doc_id")
    val v1 = graft.sinks.Versioned.currentVersion(spark, root).get
    val delta = MergeTable.versionDelta(spark, root, v0, v1)
    // survivors rewritten unchanged cancel: only the 3 updated keys
    // surface, each as a (-old, +new) pair
    val rows = delta.select(col("doc_id"), col("n_chars"), col("__weight"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._3))
    assert(rows.map(_._1).distinct.toSeq == Seq(10L, 11L, 12L))
    assert(rows.length == 6, s"expected 3 (+1,-1) pairs, saw ${rows.toSeq}")
    rows.grouped(2).foreach { case Array((id, oldN, wOld), (id2, newN, wNew)) =>
      assert(id == id2 && wOld == -1L && wNew == 1L && newN == oldN + 100L)
    }
    // scale pin: the diff's plan reads only files the manifests disagree
    // on — strictly fewer than a full two-version read
    val scanned = delta.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.length
      }).sum
    val fullV1 = MergeTable.readVersion(spark, root, v1)
      .queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.length
      }).sum
    assert(scanned < fullV1,
      s"versionDelta scanned $scanned files vs $fullV1 for one version — not pruned")
  }
}
