package graft.sinks

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.TextAnalysis

/** The maintenance-writer lease (VERDICT r15 #5): a racing writer is
  * blocked BEFORE it publishes any debris, a crashed holder's claim
  * expires and the next writer recovers, release is holder-checked,
  * and nested maintenance scopes on one root re-enter the outer claim
  * instead of deadlocking on themselves. */
class LeaseSpec extends AnyFunSuite with SparkTestBase {

  private def freshRoot(): String =
    Files.createTempDirectory("lease").toString

  private def corpus(n: Int = 12) = {
    import spark.implicits._
    (1L to n.toLong).map(i => (i, s"common data row token$i"))
      .toDF("doc_id", "text")
  }

  test("acquire fails while a rival's claim is live, wins after release") {
    val root = freshRoot()
    Lease.acquire(spark, root, "writer-a", ttlMillis = 60000)
    val e = intercept[Lease.LeaseHeldException] {
      Lease.acquire(spark, root, "writer-b", ttlMillis = 60000)
    }
    assert(e.getMessage.contains("writer-a"))
    Lease.release(spark, root, "writer-a")
    Lease.acquire(spark, root, "writer-b", ttlMillis = 60000)
    assert(Lease.current(spark, root).exists(_.holder == "writer-b"))
    Lease.release(spark, root, "writer-b")
  }

  test("expired claim is recoverable without any janitor step") {
    val root = freshRoot()
    val base = System.currentTimeMillis()
    Lease.clock = () => base
    try {
      Lease.acquire(spark, root, "crashed-writer", ttlMillis = 1000)
      // the holder dies without releasing; time passes past the TTL
      Lease.clock = () => base + 1001
      val c = Lease.acquire(spark, root, "recovering-writer",
        ttlMillis = 60000)
      assert(c.holder == "recovering-writer")
    } finally Lease.clock = () => System.currentTimeMillis()
  }

  test("re-acquire by the same holder renews instead of failing") {
    val root = freshRoot()
    val first = Lease.acquire(spark, root, "writer-a", ttlMillis = 1000)
    val second = Lease.acquire(spark, root, "writer-a", ttlMillis = 60000)
    assert(second.expiresAtMillis >= first.expiresAtMillis)
    Lease.release(spark, root, "writer-a")
  }

  test("commit aborts when the operation outlived its TTL and a rival claimed (ADVICE r16)") {
    val root = freshRoot()
    val base = System.currentTimeMillis()
    Lease.clock = () => base
    try {
      val e = intercept[Lease.LeaseLostException] {
        Lease.withLease(spark, root, ttlMillis = 1000) {
          // the job runs long: the clock passes our TTL and a rival
          // legitimately acquires the now-expired lease
          Lease.clock = () => base + 1001
          Lease.acquire(spark, root, "rival", ttlMillis = 60000)
          // our pointer commit must abort BEFORE the swap, not stomp
          // the rival's work (the lost-update the lease exists to stop)
          Versioned.atomicOverwrite(spark,
            new org.apache.hadoop.fs.Path(root, Versioned.Pointer),
            "v-stale\n".getBytes("UTF-8"))
        }
      }
      assert(e.getMessage.contains("outlived"))
      // the rival's claim survives our abort (release is holder-checked)
      assert(Lease.current(spark, root).exists(_.holder == "rival"))
      // ...and the stale pointer was never written
      assert(Versioned.currentVersion(spark, root).isEmpty)
    } finally Lease.clock = () => System.currentTimeMillis()
  }

  test("commit aborts after TTL expiry even with no rival (expired claim is not ours)") {
    val root = freshRoot()
    val base = System.currentTimeMillis()
    Lease.clock = () => base
    try {
      intercept[Lease.LeaseLostException] {
        Lease.withLease(spark, root, ttlMillis = 1000) {
          Lease.clock = () => base + 1001
          Versioned.atomicOverwrite(spark,
            new org.apache.hadoop.fs.Path(root, Versioned.Pointer),
            "v-stale\n".getBytes("UTF-8"))
        }
      }
      assert(Versioned.currentVersion(spark, root).isEmpty)
    } finally Lease.clock = () => System.currentTimeMillis()
  }

  test("renew extends a live claim so a long job can heartbeat past the TTL") {
    val root = freshRoot()
    val base = System.currentTimeMillis()
    Lease.clock = () => base
    try {
      Lease.withLease(spark, root, ttlMillis = 1000) {
        Lease.clock = () => base + 800 // near expiry, still live
        Lease.renew(spark, root, ttlMillis = 60000)
        Lease.clock = () => base + 5000 // far past the ORIGINAL ttl
        // commit now succeeds under the renewed claim
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sessionState.newHadoopConf())
        fs.mkdirs(new org.apache.hadoop.fs.Path(root, "v-a"))
        Versioned.commit(spark, root, "v-a")
      }
      assert(Versioned.currentVersion(spark, root).contains("v-a"))
    } finally Lease.clock = () => System.currentTimeMillis()
  }

  test("heartbeat carries a TTL-outliving operation to a successful commit (VERDICT r17 #2)") {
    val root = freshRoot()
    val base = System.currentTimeMillis()
    Lease.clock = () => base
    try {
      Lease.withLeaseHeartbeat(spark, root, intervalMillis = 100) {
        // the persisted horizon is SHORT — interval × grace, never a
        // maintenance-sized TTL: a crash at any moment leaves a claim
        // rivals can take over within the grace window
        val c0 = Lease.current(spark, root).get
        assert(c0.expiresAtMillis <= base + 100 * Lease.HeartbeatGraceFactor)
        // the job runs far past the original horizon…
        Lease.clock = () => base + 10000
        // …and the heartbeat re-extends from the advanced clock
        val deadline = System.currentTimeMillis() + 5000
        while (!Lease.current(spark, root).exists(_.live(base + 10000)) &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(20)
        val c1 = Lease.current(spark, root).get
        assert(c1.live(base + 10000), "heartbeat never re-extended")
        // prompt-recovery bound: the extension reaches only grace past
        // the beat — a crash NOW stalls rivals ≤ 300 fake-ms, not 10 min
        assert(c1.expiresAtMillis <= base + 10000 +
          100 * Lease.HeartbeatGraceFactor)
        // and the commit-time check passes under the extended claim
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sessionState.newHadoopConf())
        fs.mkdirs(new org.apache.hadoop.fs.Path(root, "v-hb"))
        Versioned.commit(spark, root, "v-hb")
      }
      assert(Versioned.currentVersion(spark, root).contains("v-hb"))
    } finally Lease.clock = () => System.currentTimeMillis()
  }

  test("a stalled heartbeat holder loses to a rival and aborts instead of stomping") {
    val root = freshRoot()
    val base = System.currentTimeMillis()
    Lease.clock = () => base
    try {
      intercept[Lease.LeaseLostException] {
        Lease.withLeaseHeartbeat(spark, root, intervalMillis = 2000) {
          // the whole job stalls past the grace window (e.g. a long GC
          // pause freezing the heartbeat too); a rival legitimately
          // acquires the expired claim
          Lease.clock = () => base + 2000 * Lease.HeartbeatGraceFactor + 1
          Lease.acquire(spark, root, "rival", ttlMillis = 600000)
          // let the heartbeat fire once: it must DETECT the loss and
          // stop, not stomp the rival's live claim
          Thread.sleep(2300)
          assert(Lease.current(spark, root).exists(_.holder == "rival"))
          // our commit aborts loudly before the pointer swap
          Versioned.atomicOverwrite(spark,
            new org.apache.hadoop.fs.Path(root, Versioned.Pointer),
            "v-stale\n".getBytes("UTF-8"))
        }
      }
      assert(Lease.current(spark, root).exists(_.holder == "rival"))
    } finally Lease.clock = () => System.currentTimeMillis()
  }

  test("renew outside a lease scope raises; unleased roots commit freely") {
    val root = freshRoot()
    intercept[IllegalStateException] {
      Lease.renew(spark, root)
    }
    // no lease held on this thread → verifyHeld is a no-op and plain
    // publishes keep working exactly as before
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "v-b"))
    Versioned.commit(spark, root, "v-b")
    assert(Versioned.currentVersion(spark, root).contains("v-b"))
  }

  test("release of a lease someone else holds is a no-op") {
    val root = freshRoot()
    Lease.acquire(spark, root, "writer-a", ttlMillis = 60000)
    Lease.release(spark, root, "stale-writer")
    assert(Lease.current(spark, root)
      .exists(c => c.holder == "writer-a" && c.live(System.currentTimeMillis())))
    Lease.release(spark, root, "writer-a")
  }

  test("racing BM25 append raises before publishing any segment debris") {
    val root = freshRoot()
    TextAnalysis.writeBm25Index(corpus(), "doc_id", "text", root,
      nBuckets = 4)
    val segsDir = new java.io.File(s"$root/segs")
    val before = segsDir.list().sorted.toSeq
    // a rival maintenance writer holds the lease (e.g. a long compaction
    // on another driver); our append must fail WITHOUT writing a segment
    Lease.acquire(spark, root, "rival-compactor", ttlMillis = 60000)
    intercept[Lease.LeaseHeldException] {
      TextAnalysis.appendBm25Segment(corpus(), "doc_id", "text", root,
        nBuckets = 4)
    }
    assert(segsDir.list().sorted.toSeq == before,
      "losing writer left segment debris on disk")
    Lease.release(spark, root, "rival-compactor")
    // after the rival releases, the same append succeeds
    assert(TextAnalysis.appendBm25Segment(
      corpus(), "doc_id", "text", root, nBuckets = 4).nonEmpty)
  }

  test("racing compaction and vacuum are blocked by a held lease too") {
    val root = freshRoot()
    TextAnalysis.writeBm25Index(corpus(), "doc_id", "text", root,
      nBuckets = 4)
    TextAnalysis.appendBm25Segment(corpus(24), "doc_id", "text", root,
      nBuckets = 4)
    Lease.acquire(spark, root, "rival", ttlMillis = 60000)
    intercept[Lease.LeaseHeldException] {
      TextAnalysis.compactBm25Index(spark, root)
    }
    intercept[Lease.LeaseHeldException] {
      TextAnalysis.vacuumBm25Orphans(spark, root, minAgeMillis = 0)
    }
    intercept[Lease.LeaseHeldException] {
      TextAnalysis.deleteBm25Docs(spark, root, Seq(1L))
    }
    Lease.release(spark, root, "rival")
    assert(TextAnalysis.compactBm25Index(spark, root) == 2)
  }

  test("MergeTable maintenance (merge / exactly-once / rebucket) honors the lease") {
    import spark.implicits._
    val root = freshRoot() + "/mt"
    MergeTable.publish(
      (1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"), root, "k", 4)
    Lease.acquire(spark, root, "rival", ttlMillis = 60000)
    intercept[Lease.LeaseHeldException] {
      MergeTable.merge(spark, root,
        Seq((1L, "patched")).toDF("k", "v"), "k")
    }
    intercept[Lease.LeaseHeldException] {
      MergeTable.mergeExactlyOnce(spark, root,
        Seq((2L, "patched")).toDF("k", "v"), "k", batchId = 1L)
    }
    intercept[Lease.LeaseHeldException] {
      MergeTable.rebucket(spark, root, 8)
    }
    Lease.release(spark, root, "rival")
    assert(MergeTable.merge(spark, root,
      Seq((1L, "patched")).toDF("k", "v"), "k").bucketsTouched == 1)
    assert(MergeTable.read(spark, root).filter($"k" === 1L)
      .select("v").as[String].head() == "patched")
  }

  test("exactly-once append nests its internal vacuum under one claim") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.expr
    val root = freshRoot() + "/ivf"
    val vecs = corpus(16).selectExpr("doc_id AS id",
      "array(CAST(doc_id AS FLOAT), CAST(doc_id % 4 AS FLOAT)) AS vec")
    Similarity.writeIvfIndex(vecs, "id", "vec", root, "k4", stride = 4)
    val batch = vecs.withColumn("id", expr("id + 100"))
    // appendToIvfIndexExactlyOnce runs vacuumUncommitted inside its own
    // lease scope — re-entrancy must let the nested call through
    assert(Similarity.appendToIvfIndexExactlyOnce(
      batch, "id", "vec", root, "k4", batchId = 1L, stride = 4))
    // and a held rival lease blocks the whole composite before any write
    Lease.acquire(spark, root, "rival", ttlMillis = 60000)
    intercept[Lease.LeaseHeldException] {
      Similarity.appendToIvfIndexExactlyOnce(
        batch.withColumn("id", expr("id + 100")),
        "id", "vec", root, "k4", batchId = 2L, stride = 4)
    }
    Lease.release(spark, root, "rival")
  }
}
