package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sinks.Versioned

/** Incremental rollup maintenance: associative-merge correctness, the
  * no-history-rescan refresh plan, and the versioned crash story. */
class RollupSpec extends AnyFunSuite with SparkTestBase {

  private val dims = Seq("hr", "event_type")
  private val sums = Seq("value")

  private def facts(ids: Range) = {
    import spark.implicits._
    ids.map { i =>
      (i.toLong % 5, if (i % 3 == 0) "view" else "click", i.toDouble / 4)
    }.toDF("hr", "event_type", "value")
  }

  test("publish + N refreshes == one-shot aggregate over everything") {
    val root = Files.createTempDirectory("graft_rollup_").toString
    val (base, b1, b2) = (facts(0 until 40), facts(40 until 70), facts(70 until 100))
    Rollup.publish(base, dims, sums, root)
    Rollup.refresh(b1, dims, sums, root)
    Rollup.refresh(b2, dims, sums, root)
    val served = Rollup.serve(spark, root)
      .orderBy("hr", "event_type").collect()
    val oneShot = Rollup.aggregate(base.unionAll(b1).unionAll(b2), dims, sums)
      .orderBy("hr", "event_type").collect()
    assert(served.length == oneShot.length)
    served.zip(oneShot).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getString(1) == b.getString(1))
      assert(a.getLong(2) == b.getLong(2), "counts must merge exactly")
      // double sums merge associatively up to fp reassociation
      assert(math.abs(a.getDouble(3) - b.getDouble(3)) < 1e-9)
    }
  }

  test("refresh never rescans history: its plan reads rollup + batch only") {
    val root = Files.createTempDirectory("graft_rollup_").toString
    val baseDir = Files.createTempDirectory("graft_rollup_facts_").toString
    facts(0 until 60).write.parquet(s"$baseDir/facts.parquet")
    val base = spark.read.parquet(s"$baseDir/facts.parquet")
    Rollup.publish(base, dims, sums, root)
    val liveBefore = Versioned.resolve(spark, root)
    // the EXACT frame refresh executes (Rollup.mergedFrame is what
    // refresh writes): its scanned files must be the live rollup version
    // + the batch — NOT the 60-row fact history
    val batch = facts(60 until 75)
    val merged = Rollup.mergedFrame(batch, dims, sums, root)
    val scanned = merged.inputFiles.toSet
    assert(scanned.nonEmpty && scanned.forall(_.contains(liveBefore)),
      s"refresh scan must be rollup-version files only (batch is in-memory here): $scanned")
    assert(!scanned.exists(_.contains(baseDir)),
      "refresh must never rescan the fact history")
  }

  test("streaming ingest: foreachBatch micro-batches refresh the rollup; serve == one-shot") {
    // the streaming-cube shape, same proof as the ANN ingest spec: facts
    // arrive as a file stream, each micro-batch folds in via the SAME
    // Rollup.refresh the batch path uses, and the drained rollup equals
    // the one-shot aggregate over everything
    val root = Files.createTempDirectory("graft_rollup_").toString
    val feed = Files.createTempDirectory("graft_rollup_feed_").toString
    Rollup.publish(facts(0 until 40), dims, sums, root)
    facts(40 until 70).coalesce(1).write.mode("append").parquet(feed)
    facts(70 until 100).coalesce(1).write.mode("append").parquet(feed)
    var batches = 0
    val q = spark.readStream.schema(facts(0 until 1).schema)
      .option("maxFilesPerTrigger", 1).parquet(feed)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // the production wiring: the REAL foreachBatch batch id drives
        // the exactly-once gate, so a redelivered micro-batch cannot
        // double-count
        if (!batch.isEmpty &&
            Rollup.refreshExactlyOnce(batch, dims, sums, root, id))
          batches += 1
      }
      .option("checkpointLocation", s"$feed-ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream drain timed out")
    assert(batches >= 2, s"expected >=2 refreshing micro-batches, got $batches")
    val served = Rollup.serve(spark, root).orderBy("hr", "event_type").collect()
    val oneShot = Rollup.aggregate(facts(0 until 100), dims, sums)
      .orderBy("hr", "event_type").collect()
    assert(served.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      oneShot.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq)
  }

  test("sketch-state rollup: HLL register max-merge is exactly the one-shot registers") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_rollup_").toString
    val rows = (0 until 500).map(i => (s"g${i % 3}", i.toLong * 7 + 1))
      .toDF("grp0", "key")
    def state(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, "grp0", "key")
    Rollup.publishState(state(rows.filter(col("key") % 2 === 0)), root)
    Rollup.refreshState(state(rows.filter(col("key") % 2 === 1)),
      Seq("grp", "bucket"), Seq("max_rho" -> (c => max(c))), root)
    val merged = Rollup.serve(spark, root)
      .orderBy("grp", "bucket").collect().toSeq
    val oneShot = state(rows).orderBy("grp", "bucket").collect().toSeq
    // register merge is integer max — order-free, EXACT, no tolerance
    assert(merged == oneShot)
  }

  test("histogram-state rollup: sum-merge == one-shot; cumulated bins pick exact percentiles") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val root = Files.createTempDirectory("graft_rollup_").toString
    // g0: values 1..100 once each → p50 = 50, p95 = 95 (sparse bins
    // elsewhere don't shift ranks); g1: 90×1 and 10×10 → p50 = 1, p95 = 10
    val rows = ((1 to 100).map(v => ("g0", v.toLong)) ++
      Seq.fill(90)(("g1", 1L)) ++ Seq.fill(10)(("g1", 10L)))
      .toDF("grp", "q")
    def hist(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("grp"), col("q")).agg(count(lit(1)).as("cnt"))
    Rollup.publishState(hist(rows.filter(col("q") % 2 === 0)), root)
    Rollup.refreshState(hist(rows.filter(col("q") % 2 === 1)),
      Seq("grp", "q"), Seq("cnt" -> (c => sum(c))), root)
    val merged = Rollup.serve(spark, root).orderBy("grp", "q")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val oneShot = hist(rows).orderBy("grp", "q")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(merged.sameElements(oneShot),
      "histogram sum-merge must be exactly the one-shot histogram")
    val wc = Window.partitionBy(col("grp")).orderBy(col("q"))
    val wt = Window.partitionBy(col("grp"))
    val ps = Rollup.serve(spark, root)
      .withColumn("cum", sum(col("cnt")).over(wc))
      .withColumn("total", sum(col("cnt")).over(wt))
      .groupBy(col("grp"))
      .agg(min(when(col("cum") * 100 >= col("total") * 50, col("q"))).as("p50"),
        min(when(col("cum") * 100 >= col("total") * 95, col("q"))).as("p95"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ps("g0") == ((50L, 95L)), ps.toString)
    assert(ps("g1") == ((1L, 10L)), ps.toString)
  }

  test("exactly-once refresh: a replayed micro-batch is skipped, a crashed one reapplies") {
    val root = Files.createTempDirectory("graft_rollup_").toString
    Rollup.publish(facts(0 until 40), dims, sums, root)
    val b1 = facts(40 until 70)
    assert(Rollup.refreshExactlyOnce(b1, dims, sums, root, batchId = 0))
    val afterOnce = Rollup.serve(spark, root)
      .orderBy("hr", "event_type").collect().map(_.getLong(2)).toSeq
    // foreachBatch redelivery: same batch id arrives again → skipped,
    // served counts unchanged (a plain refresh would double-count)
    assert(!Rollup.refreshExactlyOnce(b1, dims, sums, root, batchId = 0))
    assert(Rollup.serve(spark, root)
      .orderBy("hr", "event_type").collect().map(_.getLong(2)).toSeq == afterOnce)
    // crash BEFORE the pointer commit: the version dir exists but was
    // never committed → live id unchanged → the redelivered batch APPLIES
    val b2 = facts(70 until 90)
    intercept[RuntimeException] {
      graft.sinks.Versioned.publish(spark, root) { dir =>
        Rollup.mergedFrame(b2, dims, sums, root).write.parquet(dir)
        throw new RuntimeException("crash before batch-id record + commit")
      }
    }
    assert(Rollup.lastBatchId(spark, root).contains(0L), "live id must be unchanged")
    assert(Rollup.refreshExactlyOnce(b2, dims, sums, root, batchId = 1))
    // net effect: every batch folded exactly once
    val served = Rollup.serve(spark, root)
      .orderBy("hr", "event_type").collect().map(_.getLong(2)).toSeq
    val oneShot = Rollup.aggregate(facts(0 until 90), dims, sums)
      .orderBy("hr", "event_type").collect().map(_.getLong(2)).toSeq
    assert(served == oneShot)
  }

  test("refresh is a versioned publish: previous rollup retained and readable") {
    val root = Files.createTempDirectory("graft_rollup_").toString
    val v1 = Rollup.publish(facts(0 until 40), dims, sums, root)
    val v2 = Rollup.refresh(facts(40 until 70), dims, sums, root)
    assert(v1 != v2 && Versioned.currentVersion(spark, root).contains(v2))
    // the pre-refresh rollup reads exactly as published (rollback target)
    val old = Versioned.readVersion(spark, root, v1)
    val expect = Rollup.aggregate(facts(0 until 40), dims, sums)
    assert(old.orderBy("hr", "event_type").collect().map(_.getLong(2)).toSeq ==
      expect.orderBy("hr", "event_type").collect().map(_.getLong(2)).toSeq)
  }
}
